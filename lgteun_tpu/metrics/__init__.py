from lgteun_tpu.metrics.numpy_ref import (  # noqa: F401
    DYNAMIC_RANGE,
    ref_evaluate,
    no_ref_evaluate,
    psnr,
    ssim,
    qindex,
    sam,
    ergas,
    scc,
    d_lambda,
    d_s,
    qnr,
)
from lgteun_tpu.metrics.jax_metrics import (  # noqa: F401
    ref_evaluate_batch,
    no_ref_evaluate_batch,
    qindex_global,
    d_lambda_global,
    d_s_global,
)
