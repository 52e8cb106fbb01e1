""".mat round-trips (reference dataset/utils.py:88-94)."""

from __future__ import annotations

import scipy.io as sio

__all__ = ["load_mat", "save_mat"]


def load_mat(path: str, name: str):
    return sio.loadmat(path)[name]


def save_mat(path: str, name: str, data) -> None:
    sio.savemat(path, {name: data})
