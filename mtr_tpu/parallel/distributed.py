"""Multi-host orchestration.

Reads are embarrassingly parallel, so the multi-host strategy is plain
data parallelism with deterministic output order:

  * every process streams the same FASTA and processes reads whose index
    satisfies idx % process_count == process_index (round-robin keeps
    per-host load balanced across length distributions);
  * the arena-reuse quirks (stale buffer contents) are PER-PROCESS in
    the reference too only in the sense of one sequential binary — for
    multi-host runs we replay the arena sequentially over ALL reads on
    every host (cheap: one memcpy per read) so each host's per-read
    buffers match the single-process run bit-for-bit;
  * records are written to per-process files; merge_outputs interleaves
    them back into single-process order.

Initialization uses jax.distributed when coordinator env vars are
present; otherwise this degrades to a single process.
"""

from __future__ import annotations

import os

from mtr_tpu.config import MTRConfig, DEFAULT_CONFIG


def init_distributed() -> tuple[int, int]:
    """Returns (process_index, process_count)."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def run_file_sharded(
    path: str,
    out_path_prefix: str,
    cfg: MTRConfig = DEFAULT_CONFIG,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Process this host's share of the reads; writes
    {out_path_prefix}.part{pid} plus a .meta file with the read indices
    handled (for the deterministic merge)."""
    from mtr_tpu.io.fasta import iter_fasta
    from mtr_tpu.oracle.arena import Arena
    from mtr_tpu.oracle.directional_index import fill_directional_index_with_end
    from mtr_tpu.pipeline import ReadState, make_batcher, process_batch

    if process_index is None or process_count is None:
        process_index, process_count = init_distributed()

    arena = Arena(cfg.max_input_length)
    # honor cfg.backend exactly like the single-process path — a
    # multi-host run on hosts without usable devices must still be able
    # to use the host/hybrid engines
    batcher = make_batcher(cfg)
    batch: list[ReadState] = []
    batch_rids: list[int] = []
    out_f = open(f"{out_path_prefix}.part{process_index}", "w")
    meta_f = open(f"{out_path_prefix}.meta{process_index}", "w")

    def flush():
        nonlocal batch, batch_rids
        if not batch:
            return
        for rid, records in zip(batch_rids, process_batch(batch, batcher, cfg)):
            meta_f.write(f"{rid}\t{len(records)}\n")
            for rec in records:
                out_f.write(rec.format_record() + "\n")
        out_f.flush()
        meta_f.flush()
        batch = []
        batch_rids = []

    min_rsl = 100
    for ridx, read in enumerate(iter_fasta(path, cfg.max_input_length)):
        arena.load_read(read.codes)  # replay arena on every host (bit-exactness)
        if ridx % process_count != process_index:
            continue
        L = read.length
        org_eff = arena.org_input[: L + 1].copy()
        rsl = min_rsl if L < min_rsl * 10 else L // 10
        di, di_end, di_w = fill_directional_index_with_end(
            arena, L, rsl, manhattan=cfg.manhattan_distance
        )
        batch.append(ReadState(read, org_eff, di, di_end, di_w))
        batch_rids.append(ridx)
        if len(batch) >= cfg.reads_per_batch:
            flush()
    flush()
    out_f.close()
    meta_f.close()


def merge_outputs(out_path_prefix: str, process_count: int, out) -> None:
    """Deterministic single-process-order merge of per-host outputs."""
    parts = []
    for pid in range(process_count):
        lines = open(f"{out_path_prefix}.part{pid}").read().splitlines(True)
        meta = [
            (int(a), int(b))
            for a, b in (
                ln.split("\t") for ln in open(f"{out_path_prefix}.meta{pid}")
            )
        ]
        pos = 0
        for rid, n in meta:
            parts.append((rid, lines[pos : pos + n]))
            pos += n
    parts.sort(key=lambda t: t[0])
    for _rid, lines in parts:
        out.writelines(lines)
