"""mtr_tpu — a TPU-native tandem-repeat detection framework.

Re-implements the full capability surface of the mTR reference tool
(directional-index repeat localization, de Bruijn unit inference,
wrap-around dynamic-programming alignment, unit polishing, interval
chaining) as a batched, device-accelerated framework built on
JAX/XLA/Pallas for the compute path and a native C++ host runtime for
the sequential per-read logic.

Layering (top to bottom):
  cli              — mTR-compatible command line driver
  pipeline         — batched production pipeline (device kernels + host runtime)
  oracle/          — bit-exact NumPy reference implementation (the referee)
  ops/             — JAX/Pallas device kernels (DI stencil, wrap-around DP)
  parallel/        — jax.sharding mesh utilities, multi-chip data parallelism
  chaining         — interval chaining + record output
  io/, utils/      — FASTA streaming, MT19937, encodings, timers
  testutil/        — synthetic data generators and accuracy evaluators
"""

__version__ = "0.1.0"

from mtr_tpu.config import MTRConfig  # noqa: F401
