"""Device-mesh helpers: batch (data) sharding over ICI.

The reference's only multi-device feature is single-process
`nn.DataParallel` (reference: models/base/base_model.py:95-96). The
TPU-native equivalent is GSPMD batch sharding: batches are sharded over
a named mesh axis, parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically when the jitted train step
consumes sharded batches with replicated params.

An optional `space` axis shards the image H dimension for
full-resolution scenes (2-D "context parallelism", beyond reference
capability; halo exchange is handled by XLA's conv padding when the
spatial axis is sharded).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]


def make_mesh(mesh_shape: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Create a Mesh; default uses every device on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    names = tuple(mesh_shape)
    sizes = tuple(mesh_shape[n] for n in names)
    n_needed = int(np.prod(sizes))
    dev_array = np.asarray(devices[:n_needed]).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`; everything else
    replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """device_put every array in the batch with batch-dim sharding."""
    sh = batch_sharding(mesh, axis)
    return {k: (v if k == "image_id" else jax.device_put(v, sh))
            for k, v in batch.items()}
