from lgteun_tpu.data.tiff import read_tiff, write_tiff  # noqa: F401
from lgteun_tpu.data.dataset import PSDataset, scan_pairs  # noqa: F401
from lgteun_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
from lgteun_tpu.data.pipeline import (  # noqa: F401
    data_normalize,
    data_denormalize,
    train_iterator,
    eval_batches,
)
