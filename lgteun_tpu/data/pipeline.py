"""Host-side input pipeline: batching, normalisation, augmentation,
device prefetch.

Replaces the reference's torch DataLoader + per-batch GPU copies
(reference: base_model.py:176-181, configs/unlg_former.py:44-64) with a
TPU-idiomatic pipeline: the (small) split lives in pinned host numpy,
batches are assembled with a numpy RNG, normalised, optionally
augmented, and shipped to device asynchronously while the previous step
computes (double-buffered prefetch).

Normalisation divides by 2**bit_depth - 0.5 (reference:
dataset/utils.py:232-249). Flip augmentation follows
`data_augmentation`'s ud/lr flips (reference dataset/utils.py:155-229;
the crop modes are declared but commented out of the shipped train
loop, reference base_model.py:179-180 — flips are implemented, crops
are not scheduled by default).
"""

from __future__ import annotations

import itertools
from typing import Iterator

import jax
import numpy as np

__all__ = [
    "data_normalize", "data_denormalize",
    "train_iterator", "eval_batches", "prefetch_to_device",
]


def data_normalize(batch: dict, bit_depth: int = 11) -> dict:
    """/ (2**bit_depth - 0.5) on every array entry
    (reference dataset/utils.py:232-249)."""
    max_value = 2.0 ** bit_depth - 0.5
    return {k: (v if k == "image_id" else v / max_value) for k, v in batch.items()}


def data_denormalize(img, bit_depth: int = 11):
    """* (2**bit_depth - 0.5) (reference dataset/utils.py:252-263)."""
    return img * (2.0 ** bit_depth - 0.5)


_FLIP_KEYS = ("input_lr", "input_pan", "input_pan_l", "target")


def _augment(batch: dict, rng: np.random.Generator, aug: dict | None) -> dict:
    if not aug:
        return batch
    out = dict(batch)
    if rng.random() < aug.get("ud_flip", 0.0):
        for k in _FLIP_KEYS:
            if k in out:
                out[k] = out[k][:, ::-1, :, :]
    if rng.random() < aug.get("lr_flip", 0.0):
        for k in _FLIP_KEYS:
            if k in out:
                out[k] = out[k][:, :, ::-1, :]
    return out


def train_iterator(dataset, batch_size: int, *, bit_depth: int = 11,
                   normalize: bool = True, aug_dict: dict | None = None,
                   seed: int = 19971118,
                   drop_remainder: bool = True) -> Iterator[dict]:
    """Infinite shuffled batch iterator over a PSDataset (epoch-less,
    like the reference's `while iter < max_iter` loop,
    reference base_model.py:175-176)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    keys = [k for k in dataset[0] if k != "image_id"]
    # Queue of shuffled indices, refilled with fresh permutations: works
    # for any batch_size (including > dataset size) and never stalls.
    queue: list[int] = []
    while True:
        while len(queue) < batch_size:
            queue.extend(rng.permutation(n).tolist())
        idx, queue = queue[:batch_size], queue[batch_size:]
        batch = {k: np.stack([dataset[i][k] for i in idx]) for k in keys}
        batch = _augment(batch, rng, aug_dict)
        if normalize:
            batch = data_normalize(batch, bit_depth)
        yield {k: np.ascontiguousarray(v) for k, v in batch.items()}


def eval_batches(dataset, batch_size: int, *, bit_depth: int = 11,
                 normalize: bool = True,
                 pad_to_batch: bool = True) -> Iterator[tuple[dict, int]]:
    """Ordered batches for evaluation; yields (batch, n_valid). The last
    batch is padded (repeat last sample) so jitted eval never retraces
    on a ragged final batch — n_valid says how many rows are real."""
    n = len(dataset)
    keys = [k for k in dataset[0] if k != "image_id"]
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        n_valid = len(idx)
        if pad_to_batch and n_valid < batch_size:
            idx = idx + [idx[-1]] * (batch_size - n_valid)
        batch = {k: np.stack([dataset[i][k] for i in idx]) for k in keys}
        if normalize:
            batch = data_normalize(batch, bit_depth)
        batch["image_id"] = [dataset.pairs[i][0] for i in idx]
        yield batch, n_valid


def prefetch_to_device(iterator: Iterator[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Double-buffered host->device prefetch: keeps `size` batches in
    flight so H2D transfer overlaps the training step (the TPU
    equivalent of DataLoader worker prefetch)."""
    queue = []

    def put(batch):
        if sharding is not None:
            queue.append(jax.device_put(batch, sharding))
        else:
            queue.append(jax.device_put(batch))

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        put(batch)
    for batch in it:
        yield queue.pop(0)
        put(batch)
    while queue:
        yield queue.pop(0)
