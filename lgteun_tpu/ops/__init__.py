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
