"""Pan-sharpening dataset: directory scanning + sample loading.

Mirrors the reference data contract (reference: dataset/ps_dataset.py):
a directory holds `{id}_lr.tif` [h,w,C], `{id}_pan.tif` [H,W] and
optionally `{id}_mul.tif` [H,W,C] ground truth; samples are keyed by the
`*_pan.tif` files (reference ps_dataset.py:38-42). Each sample dict has

    input_lr    [h, w, C]   float32 (HWC — TPU-native layout; the
                            reference uses CHW)
    input_pan   [H, W, 1]   float32
    input_pan_l [H/4, W/4, 1] float32 — two cv2.pyrDown passes
                            (reference ps_dataset.py:57)
    target      [H, W, C]   float32 (when present)
    image_id    str

Quirk: the reference's comment claims input_pan_l is [1,64,64], but its
code applies `cv2.pyrDown` twice (128 -> 32); we reproduce the CODE.

Loading is eager-cached: the whole split fits comfortably in host RAM
(~1000 tiles x ~200 KB), so samples are decoded once and served from
numpy arrays — no worker processes needed (the reference uses 4 torch
DataLoader workers; on TPU the pipeline is host-prefetched instead).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from lgteun_tpu.data.tiff import read_tiff as _read_tiff_py

__all__ = ["PSDataset", "scan_pairs"]


def read_tiff(path: str):
    """Native C++ decode when available (lgteun_tpu/native), pure-Python
    codec otherwise."""
    try:
        from lgteun_tpu.native import read_tiff_native

        arr = read_tiff_native(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    return _read_tiff_py(path)


def scan_pairs(image_dirs: list[str]) -> list[tuple[str, str]]:
    """[(image_id, path_prefix)] for every `*_pan.tif` found
    (reference ps_dataset.py:38-42)."""
    pairs = []
    for d in image_dirs:
        for name in sorted(os.listdir(d)):
            if name.endswith("pan.tif"):
                image_id = name.split("_")[0]
                pairs.append((image_id, os.path.join(d, image_id)))
    return pairs


def _pyr_down_np(img: np.ndarray) -> np.ndarray:
    """cv2.pyrDown on a 2-D array (host-side numpy; see
    ops/filters.pyr_down for the on-device version)."""
    from scipy import ndimage

    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    kernel = np.outer(k, k)
    blurred = ndimage.correlate(img.astype(np.float64), kernel, mode="mirror")
    return blurred[::2, ::2]


@dataclass
class PSDataset:
    """Eagerly-cached pan-sharpening split."""

    image_dirs: list[str]
    bit_depth: int = 11
    norm_input: bool = False
    _samples: list[dict] = field(default_factory=list, repr=False)

    def __post_init__(self):
        self.pairs = scan_pairs(self.image_dirs)
        has_target_dir = len(self.image_dirs) == 1
        max_value = 2.0 ** self.bit_depth - 0.5
        for image_id, prefix in self.pairs:
            lr = read_tiff(f"{prefix}_lr.tif").astype(np.float32)
            pan = read_tiff(f"{prefix}_pan.tif").astype(np.float32)
            if lr.ndim == 2:
                lr = lr[:, :, None]
            sample = {
                "input_lr": lr,
                "input_pan": pan[:, :, None],
                "input_pan_l": _pyr_down_np(_pyr_down_np(pan)).astype(
                    np.float32)[:, :, None],
                "image_id": image_id,
            }
            mul_path = f"{prefix}_mul.tif"
            if has_target_dir and os.path.exists(mul_path):
                tgt = read_tiff(mul_path).astype(np.float32)
                if tgt.ndim == 2:
                    tgt = tgt[:, :, None]
                sample["target"] = tgt
            if self.norm_input:
                for k, v in sample.items():
                    if k != "image_id":
                        sample[k] = v / max_value
            self._samples.append(sample)

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, idx: int) -> dict:
        return self._samples[idx]

    @property
    def ms_chans(self) -> int:
        return self._samples[0]["input_lr"].shape[-1]

    def stacked(self, keys: tuple[str, ...] | None = None) -> dict:
        """Whole split as stacked arrays {key: [N, ...]} for batched
        device-side evaluation."""
        if not self._samples:
            return {}
        if keys is None:
            keys = tuple(k for k in self._samples[0] if k != "image_id")
        out = {k: np.stack([s[k] for s in self._samples]) for k in keys}
        out["image_id"] = [s["image_id"] for s in self._samples]
        return out
