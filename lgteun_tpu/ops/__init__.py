import os as _os


def fuse_level() -> int:
    """Staged kernel-fusion level for the TPU inference fast path
    (env LGTEUN_FUSE_LEVEL, read at trace time):

      3            whole-LGB-block megakernel (ops/lgb_block_kernel)
                   for full-res blocks — one VMEM residence per block;
                   bottleneck keeps the level-2 composition. On-chip
                   proven (scripts/prove_kernels.py) but measured
                   slightly SLOWER than level 2 at the headline shape
                   (24.7 vs 26.25 MP/s, see ROOFLINE.md) — kept as an
                   explicit opt-in, not the default
      2 (default)  every fused Pallas kernel: LN+mixer head, packed
                   window attention with tanh-form softmax, block tail
                   (row-tiled and roll-based), fused global mixer
      1            the on-chip-proven subset only: packed v3 window
                   attention (exp softmax), fused LN+FFN; the mixer
                   head / block tail / global-mixer kernels fall back
                   to their XLA compositions
      0            no Pallas kernels — plain XLA channel-major trunk

    Exists as a reliability ladder: bench.py retries a failed run at a
    lower level so a Mosaic regression in one kernel can never zero out
    the benchmark (each level is strictly more conservative)."""
    try:
        return int(_os.environ.get("LGTEUN_FUSE_LEVEL", "2"))
    except ValueError:
        return 2


from lgteun_tpu.ops.resize import (  # noqa: F401
    resize_bicubic,
    resize_bilinear,
    upsample,
    downsample,
    resize_matrix,
)
from lgteun_tpu.ops.filters import (  # noqa: F401
    filter2d_reflect101,
    gaussian_kernel_1d,
    pyr_down,
    box_filter,
)
