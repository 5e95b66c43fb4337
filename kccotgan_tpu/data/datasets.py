"""Dataset dispatch: name -> (train iterator, test batch).

Mirror of the reference trainer's dname dispatch
(`kernel_train.py:84-131`), plus the ``synthetic`` fixture dataset the
reference lacks.  Every loader emits film-strip batches
``[B, H, T, W, C]`` float32 in [0, 1].
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from ..config import TrainConfig
from .mmnist import load_mmnist, mmnist_paths
from .pipeline import ArrayDataset, GeneratorDataset
from .synthetic import bouncing_blobs

__all__ = ["make_dataset"]


def _drop_alpha(batch: np.ndarray, channels: int) -> np.ndarray:
    # `kernel_train.py:303`: keep the first `channels` channels.
    return batch[..., :channels]


def _collect_batch(it: Iterator[np.ndarray], n: int) -> np.ndarray | None:
    """Stack the first ``n`` samples of a generator, or None if it
    yields fewer (e.g. an empty/short test directory)."""
    samples = []
    for sample in it:
        samples.append(np.asarray(sample, dtype=np.float32))
        if len(samples) == n:
            return np.stack(samples)
    return None


def make_dataset(cfg: TrainConfig) -> tuple[Iterator[np.ndarray], np.ndarray | None]:
    """Returns (train batch iterator over n_epochs, one test batch)."""
    m = cfg.model
    b, t = cfg.batch_size, cfg.total_time_steps

    if cfg.dname == "synthetic":
        data = bouncing_blobs(
            max(4 * b, 32), t, m.x_height, m.x_width, channels=m.n_channels,
            seed=cfg.seed,
        )
        ds = ArrayDataset(data, b, seed=cfg.seed)
        test = bouncing_blobs(b, t, m.x_height, m.x_width, channels=m.n_channels, seed=cfg.seed + 1)
        return ds.repeat(cfg.n_epochs), test

    if cfg.dname == "mmnist":
        train_path, test_path = mmnist_paths(cfg.data_path)
        train = load_mmnist(train_path, t)
        ds = ArrayDataset(train, b, seed=cfg.seed)
        test = None
        if os.path.exists(test_path):
            test = load_mmnist(test_path, t)[:b]
        return ds.repeat(cfg.n_epochs), test

    if cfg.dname == "mazes" or cfg.dname in _gqn_names():
        from .gqn import GqnReader

        name = cfg.dname
        reader = GqnReader(
            name, t, cfg.data_path, mode="train",
            custom_frame_size=m.x_height, seed=cfg.seed,
        )
        gen = GeneratorDataset(reader.samples, b)
        test_path = os.path.join(cfg.data_path, name, f"np_{name}_test.npy")
        test = None
        if os.path.exists(test_path):
            raw = np.load(test_path)[:b, :, :t]
            test = _drop_alpha(raw.astype(np.float32), m.n_channels)
        return gen.repeat(cfg.n_epochs), test

    if cfg.dname == "robot_push":
        from .bair import robot_push_samples

        root = os.path.join(cfg.data_path, "softmotion30_44k")
        train_gen = GeneratorDataset(
            lambda: robot_push_samples(root, t, train=True), b
        )
        test = None
        try:
            test_it = robot_push_samples(root, t, train=False)
            test = np.stack([next(test_it) for _ in range(b)])
        except (FileNotFoundError, StopIteration):
            pass
        return train_gen.repeat(cfg.n_epochs), test

    if cfg.dname == "kth":
        from .kth import kth_samples

        # Split dirs mirror the reference: kth/ for train, kth_test/
        # for the rollout-sampling test stream (`data_utils.py:163-166`,
        # `kernel_train.py:89-98`).
        root = os.path.join(cfg.data_path, "kth")
        test_root = os.path.join(cfg.data_path, "kth_test")
        gen = GeneratorDataset(
            lambda: kth_samples(root, b, m.x_height, m.x_width, t, seed=cfg.seed),
            b,
        )
        test = None
        if os.path.isdir(test_root):
            test_it = kth_samples(
                test_root, b, m.x_height, m.x_width, t, seed=cfg.seed + 1
            )
            test = _collect_batch(test_it, b)
        return gen.repeat(cfg.n_epochs), test

    if cfg.dname == "penn_action":
        from .penn import penn_samples

        # The reference has no Penn test stream (`kernel_train.py:84-88`
        # sets only batched_x); we draw a held-out batch with a distinct
        # seed so rollout sampling works on this dataset too.
        root = os.path.join(cfg.data_path, "penn_frames")
        gen = GeneratorDataset(
            lambda: penn_samples(root, b, m.x_height, m.x_width, t, seed=cfg.seed),
            b,
        )
        test = None
        if os.path.isdir(root):
            test_it = penn_samples(
                root, b, m.x_height, m.x_width, t, seed=cfg.seed + 1
            )
            test = _collect_batch(test_it, b)
        return gen.repeat(cfg.n_epochs), test

    if cfg.dname in ("animation", "human_action", "ucf"):
        from .generic import flat_feature_samples

        pattern = os.path.join(cfg.data_path, cfg.dname, "*.tfrecord")
        gen = GeneratorDataset(
            lambda: flat_feature_samples(
                pattern, m.x_height, m.x_width, t, m.n_channels, seed=cfg.seed
            ),
            b,
        )
        return gen.repeat(cfg.n_epochs), None

    raise ValueError(f"unknown dataset {cfg.dname!r}")


def _gqn_names():
    from .gqn import GQN_DATASETS

    return GQN_DATASETS.keys()
