from lgteun_tpu.utils.viz import linear_stretch, save_preview_png  # noqa: F401
from lgteun_tpu.utils.io import load_mat, save_mat  # noqa: F401
