"""lgteun_tpu — a TPU-native pan-sharpening framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
LGTEUN reference suite (lms-07/LGTEUN, IJCAI 2023): a config-driven
model zoo (3 classical + 7 deep methods), a Wald-protocol dataset
pipeline, a reference/no-reference IQA metric suite, and an
iteration-based training/eval runner — engineered for TPU:

- NHWC layouts, bf16-friendly compute, resizes expressed as MXU matmuls
- jit-compiled train/eval steps; no Python in the hot loop
- batch ("data parallel") sharding over a `jax.sharding.Mesh`, with
  optional spatial sharding for full-resolution scenes
- Pallas kernels for the window-attention hot path
- pure-PyTree checkpoints (orbax), not pickled module objects

Reference layer map: see SURVEY.md §1; component inventory §2.
"""

__version__ = "0.1.0"

from lgteun_tpu.registry import MODELS, DATASETS  # noqa: F401
