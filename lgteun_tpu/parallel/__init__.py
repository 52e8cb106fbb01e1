from lgteun_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from lgteun_tpu.parallel.scene import fuse_scene  # noqa: F401
