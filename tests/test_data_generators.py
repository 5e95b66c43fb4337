"""Generator-style loaders (KTH / Penn Action) on synthetic fixtures."""

import os

import numpy as np
import pytest


def test_penn_loader(tmp_path, rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from kccotgan_tpu.data.penn import penn_samples

    t, hw = 4, 16
    for vid in range(2):
        d = tmp_path / f"{vid:04d}"
        d.mkdir()
        for i in range(t * 2 + 2):  # > 2*T frames -> stride 2 path
            arr = rng.integers(0, 256, size=(hw + 4, hw + 6, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:06d}.jpg")
    out = list(
        penn_samples(str(tmp_path), batch_size=3, height=hw, width=hw,
                     time_steps=t, seed=0)
    )
    assert len(out) == 3
    for strip in out:
        assert strip.shape == (hw, t, hw, 3)
        assert strip.dtype == np.float32
        assert 0.0 <= strip.min() and strip.max() <= 1.0
    del PIL


def test_penn_every_frame_when_short(tmp_path, rng):
    pytest.importorskip("PIL")
    from PIL import Image

    from kccotgan_tpu.data.penn import penn_samples

    t, hw = 4, 8
    d = tmp_path / "0001"
    d.mkdir()
    for i in range(t + 1):  # < 2*T frames -> every-frame path
        arr = rng.integers(0, 256, size=(hw, hw, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i:06d}.jpg")
    out = list(penn_samples(str(tmp_path), 1, hw, hw, time_steps=t, seed=0))
    assert len(out) == 1 and out[0].shape == (hw, t, hw, 3)


def _write_avi(path, n_frames, hw, rng):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10, (hw, hw)
    )
    if not w.isOpened():
        pytest.skip("cv2 VideoWriter lacks codec support in this image")
    for _ in range(n_frames):
        w.write(rng.integers(0, 256, size=(hw, hw, 3), dtype=np.uint8))
    w.release()
    if not os.path.getsize(path):
        pytest.skip("cv2 produced an empty video file")


def test_kth_loader(tmp_path, rng):
    pytest.importorskip("cv2")
    from kccotgan_tpu.data.kth import kth_samples

    t, hw = 4, 24
    d = tmp_path / "walking"
    d.mkdir()
    _write_avi(d / "person01_walking_d1.avi", 20, hw, rng)
    out = list(
        kth_samples(str(tmp_path), batch_size=2, height=16, width=16,
                    time_steps=t, seed=1)
    )
    assert len(out) == 2
    for strip in out:
        assert strip.shape == (16, t, 16, 3)
        assert strip.dtype == np.float32


def test_kth_train_test_split(tmp_path, rng):
    """make_dataset honors the kth/ vs kth_test/ split dirs
    (reference `data_utils.py:163-166`, `kernel_train.py:89-98`)."""
    pytest.importorskip("cv2")
    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data.datasets import make_dataset

    t, hw = 4, 24
    for split in ("kth", "kth_test"):
        d = tmp_path / split / "walking"
        d.mkdir(parents=True)
        _write_avi(d / "person01_walking_d1.avi", 20, hw, rng)

    cfg = TrainConfig(
        dname="kth", batch_size=2, total_time_steps=t, int_time_steps=2,
        data_path=str(tmp_path), n_epochs=1,
        model=ModelConfig(x_height=16, x_width=16, n_channels=3),
    )
    train_it, test = make_dataset(cfg)
    batch = next(train_it)
    assert batch.shape == (2, 16, t, 16, 3)
    assert test is not None and test.shape == (2, 16, t, 16, 3)

    # without kth_test/ the test stream is absent, not an error
    import shutil

    shutil.rmtree(tmp_path / "kth_test")
    _, test2 = make_dataset(cfg)
    assert test2 is None
