"""Visualization utilities: grid math parity + writers produce files."""

import os

import numpy as np
import pytest

from kccotgan_tpu.utils import (
    display_frames,
    samples_to_video,
    save_low_d,
    save_video_gif,
    video_grid,
)

NX, NY, T, H, W, C = 2, 3, 4, 8, 8, 1


def _samples(rng):
    return rng.uniform(size=(NX * NY, H, T * W, C)).astype(np.float32)


def _reference_grid(samples):
    """The reference's reshape chain (`data_utils.py:452-456`) verbatim
    in numpy — oracle for `video_grid`."""
    s = samples.reshape(NX, NY, H, T, W, -1)
    s = np.concatenate(s, 1)
    s = np.concatenate(s, 2)
    return np.transpose(s, [1, 0, 2, 3])[..., :3]


def test_video_grid_matches_reference_reshape(rng):
    s = _samples(rng)
    got = video_grid(s, NX, NY, time_steps=T, x_height=H, x_width=W)
    want = _reference_grid(s)
    assert got.shape == (T, NX * H, NY * W, C)
    np.testing.assert_array_equal(got, want)


def test_save_low_d(rng, tmp_path):
    data = rng.normal(size=(16, 30, 1)).astype(np.float32)
    out = save_low_d(data, str(tmp_path / "low_d.png"), input_len=10)
    assert os.path.getsize(out) > 0


def test_display_frames(rng, tmp_path):
    x = rng.uniform(size=(6, H, T, W, C)).astype(np.float32)
    out = display_frames(x, str(tmp_path / "frames.png"), rows=3, seed=0)
    assert os.path.getsize(out) > 0


def test_samples_to_video_html(rng):
    html = samples_to_video(_samples(rng), NX, NY, time_steps=T, x_height=H, x_width=W)
    assert "<script" in html and "animation" in html.lower()


def test_save_video_gif(rng, tmp_path):
    pytest.importorskip("PIL")
    out = save_video_gif(
        _samples(rng), str(tmp_path / "vid.gif"), NX, NY,
        time_steps=T, x_height=H, x_width=W,
    )
    assert os.path.getsize(out) > 0
