"""Moving-MNIST loader.

Re-derivation of the reference's MMNIST path (`kernel_train.py:99-112`):
`.npy` files of shape ``[T_raw, N, 64, 64]`` uint8/float, scaled /255,
truncated to ``total_time_steps``, and rearranged into the film-strip
layout ``[N, 64, T, 64]`` (quirk ledger #7).  All transforms are pure
numpy on the host; batching/prefetch lives in ``pipeline.py``.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["load_mmnist", "mmnist_paths"]


def mmnist_paths(root: str) -> tuple[str, str]:
    return (
        os.path.join(root, "mmnist", "mnist_training_set.npy"),
        os.path.join(root, "mmnist", "mnist_test_set.npy"),
    )


def load_mmnist(path: str, total_time_steps: int, *, mmap: bool = True) -> np.ndarray:
    """Load an MMNIST ``.npy`` -> film-strip ``[N, 64, T, 64, 1]`` float32.

    The raw array is ``[T_raw, N, H, W]``; the reference transposes to
    ``[N, T, H, W]`` then to the film-strip ``[N, H, T, W]``
    (`kernel_train.py:102-103`).  Memory-maps the file and slices before
    materializing so only T frames are ever read.
    """
    raw = np.load(path, mmap_mode="r" if mmap else None)
    clip = np.asarray(raw[:total_time_steps])  # [T, N, H, W]
    clip = clip.astype(np.float32) / 255.0
    strip = np.transpose(clip, (1, 2, 0, 3))  # [N, H, T, W]
    return strip[..., None]  # channel dim
