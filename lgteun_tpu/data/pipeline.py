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
_LR_KEYS = ("input_lr", "input_pan_l")  # crop offsets at 1x (others 4x)


def _crop_resize(imgs: np.ndarray, crop_st: tuple[int, int], n: int) -> np.ndarray:
    """Crop to (n-1)/n size at crop_st, bicubic(align_corners=True)
    resize back (reference dataset/utils.py:178-191)."""
    from lgteun_tpu.ops.resize import resize_bicubic

    _, h, w, _ = imgs.shape
    ch = h // n * (n - 1)
    cw = w // n * (n - 1)
    cropped = imgs[:, crop_st[0]:crop_st[0] + ch, crop_st[1]:crop_st[1] + cw, :]
    return np.asarray(resize_bicubic(cropped, (h, w), align_corners=True))


def _draw_aug(rng: np.random.Generator, aug: dict | None):
    """Consume this iteration's augmentation RNG draws and return the
    decisions. Split from `_augment` so the stream can be replayed
    without loading any data (checkpoint-resume fast-forward)."""
    if not aug:
        return None
    ud = rng.random() < aug.get("ud_flip", 0.0)
    lr = rng.random() < aug.get("lr_flip", 0.0)
    crops = []
    for key, n in (("r4_crop", 4), ("r2_crop", 2)):
        if rng.random() < aug.get(key, 0.0):
            crops.append((n, rng.random(), rng.random()))
    return ud, lr, crops


def _augment(batch: dict, decisions) -> dict:
    """Flip + random-crop augmentation (reference dataset/utils.py:155-229;
    note the reference's shipped train loop has the augmentation call
    commented out — base_model.py:179-180 — so parity runs disable this
    by passing aug_dict=None)."""
    if not decisions:
        return batch
    ud, lr, crops = decisions
    out = dict(batch)
    if ud:
        for k in _FLIP_KEYS:
            if k in out:
                out[k] = out[k][:, ::-1, :, :]
    if lr:
        for k in _FLIP_KEYS:
            if k in out:
                out[k] = out[k][:, :, ::-1, :]
    for n, u0, u1 in crops:
        lr_h = out["input_lr"].shape[1]
        lr_w = out["input_lr"].shape[2]
        d0 = int(lr_h // n * u0)
        d1 = int(lr_w // n * u1)
        for k in _FLIP_KEYS:
            if k in out:
                st = (d0, d1) if k in _LR_KEYS else (d0 * 4, d1 * 4)
                out[k] = _crop_resize(out[k], st, n)
    return out


def train_iterator(dataset, batch_size: int, *, bit_depth: int = 11,
                   normalize: bool = True, aug_dict: dict | None = None,
                   seed: int = 19971118, start_iter: int = 0,
                   drop_remainder: bool = True) -> Iterator[dict]:
    """Infinite shuffled batch iterator over a PSDataset (epoch-less,
    like the reference's `while iter < max_iter` loop,
    reference base_model.py:175-176).

    ``start_iter`` fast-forwards the shuffle/augmentation RNG stream by
    replaying its draws without loading any data, so a resumed run sees
    the exact batches an uninterrupted run would (checkpoint-resume
    determinism the reference's DataLoader restart lacks)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    keys = [k for k in dataset[0] if k != "image_id"]
    # Queue of shuffled indices, refilled with fresh permutations: works
    # for any batch_size (including > dataset size) and never stalls.
    queue: list[int] = []
    for _ in range(start_iter):
        while len(queue) < batch_size:
            queue.extend(rng.permutation(n).tolist())
        queue = queue[batch_size:]
        _draw_aug(rng, aug_dict)
    while True:
        while len(queue) < batch_size:
            queue.extend(rng.permutation(n).tolist())
        idx, queue = queue[:batch_size], queue[batch_size:]
        batch = {k: np.stack([dataset[i][k] for i in idx]) for k in keys}
        batch = _augment(batch, _draw_aug(rng, aug_dict))
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
