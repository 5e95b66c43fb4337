"""Data pipeline tests: TFRecord/proto IO (parity vs TF oracle),
GQN/BAIR/generic loaders on synthetic fixtures, MMNIST transforms."""

import io
import os

import numpy as np
import pytest

from kccotgan_tpu.data import (
    ArrayDataset,
    bouncing_blobs,
    encode_example,
    encode_sequence_example,
    iter_tfrecord,
    load_mmnist,
    parse_example,
    parse_sequence_example,
    write_mmnist_fixture,
    write_tfrecord,
)


def test_tfrecord_roundtrip(tmp_path):
    recs = [b"hello", b"x" * 1000, b""]
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord(path, recs)
    out = list(iter_tfrecord(path, verify_crc=True))
    assert out == recs


def test_example_roundtrip():
    feats = {
        "frames": [b"jpegdata1", b"jpegdata2"],
        "pos": [1.5, -2.25, 0.0],
        "ids": [3, 7, 123456789],
    }
    parsed = parse_example(encode_example(feats))
    assert parsed["frames"] == feats["frames"]
    np.testing.assert_allclose(parsed["pos"], feats["pos"])
    assert parsed["ids"] == feats["ids"]


def test_sequence_example_roundtrip():
    ctx = {"0/image_aux1/encoded": [b"\x01\x02"], "0/action": [0.5, 1.0]}
    fl = {"obs": [[1.0, 2.0], [3.0, 4.0]]}
    pctx, pfl = parse_sequence_example(encode_sequence_example(ctx, fl))
    assert pctx["0/image_aux1/encoded"] == ctx["0/image_aux1/encoded"]
    np.testing.assert_allclose(pctx["0/action"], ctx["0/action"])
    np.testing.assert_allclose(pfl["obs"], fl["obs"])


@pytest.mark.reference_oracle
def test_tfrecord_parity_vs_tf(tmp_path):
    """Our framing+proto must interop with real TF both directions."""
    import tensorflow as tf

    # TF writes -> we read
    path = str(tmp_path / "tf.tfrecord")
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "x": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[1.0, 2.0, 3.0])
                ),
                "s": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"abc"])
                ),
            }
        )
    )
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    recs = list(iter_tfrecord(path, verify_crc=True))
    parsed = parse_example(recs[0])
    np.testing.assert_allclose(parsed["x"], [1.0, 2.0, 3.0])
    assert parsed["s"] == [b"abc"]

    # we write -> TF reads
    ours = str(tmp_path / "ours.tfrecord")
    write_tfrecord(ours, [encode_example({"x": [9.0], "s": [b"z"]})])
    got = next(iter(tf.data.TFRecordDataset(ours)))
    ex2 = tf.train.Example.FromString(got.numpy())
    assert list(ex2.features.feature["x"].float_list.value) == [9.0]
    assert ex2.features.feature["s"].bytes_list.value[0] == b"z"


def test_mmnist_fixture_roundtrip(tmp_path):
    path = str(tmp_path / "mnist_training_set.npy")
    write_mmnist_fixture(path, num_videos=4, time_steps=8)
    strips = load_mmnist(path, total_time_steps=6)
    assert strips.shape == (4, 64, 6, 64, 1)
    assert strips.dtype == np.float32
    assert 0.0 <= strips.min() and strips.max() <= 1.0


def test_array_dataset_batching():
    data = bouncing_blobs(7, 4, 16, 16)
    ds = ArrayDataset(data, batch_size=2, seed=0)
    batches = list(ds.epoch())
    assert len(batches) == 3  # ragged tail dropped
    assert batches[0].shape == (2, 16, 4, 16, 1)


def _fake_jpeg(h=8, w=8):
    from PIL import Image

    buf = io.BytesIO()
    arr = (np.random.default_rng(0).uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def test_gqn_reader_fixture(tmp_path):
    from kccotgan_tpu.data.gqn import GQN_DATASETS, GqnReader, gqn_record_files

    info = GQN_DATASETS["shepard_metzler_5_parts"]
    files = gqn_record_files(info, "train", str(tmp_path))
    # create only the first 2 shards, 2 videos each
    jpeg = _fake_jpeg(info.frame_size, info.frame_size)
    rec = encode_example({"frames": [jpeg] * info.sequence_size})
    for f in files[:2]:
        write_tfrecord(f, [rec, rec])

    reader = GqnReader(
        "shepard_metzler_5_parts", time_steps=4, root=str(tmp_path),
        custom_frame_size=32,
    )
    it = reader.samples()
    strip = next(it)
    assert strip.shape == (32, 4, 32, 3)
    assert strip.dtype == np.float32


def test_bair_reader_fixture(tmp_path):
    from kccotgan_tpu.data.bair import robot_push_samples

    root = tmp_path / "softmotion30_44k"
    frames = {
        f"{i}/image_aux1/encoded": [
            bytes(bytearray(np.full(64 * 64 * 3, i, np.uint8)))
        ]
        for i in range(30)
    }
    write_tfrecord(
        str(root / "train" / "shard0.tfrecord"),
        [encode_sequence_example(frames)] * 2,
    )
    it = robot_push_samples(str(root), time_steps=5, train=True)
    strip = next(it)
    assert strip.shape == (64, 5, 64, 3)
    # frame t filled with value t/255
    np.testing.assert_allclose(strip[:, 3], 3 / 255.0, rtol=1e-6)


def test_generic_flat_loader(tmp_path):
    from kccotgan_tpu.data.generic import flat_feature_samples

    h = w = 4
    t, c = 3, 1
    video = np.arange(h * t * w * c, dtype=np.float32)
    write_tfrecord(
        str(tmp_path / "a.tfrecord"),
        [encode_example({"x": list(map(float, video))})],
    )
    it = flat_feature_samples(str(tmp_path / "*.tfrecord"), h, w, t, c)
    out = next(it)
    assert out.shape == (h, t, w, c)
    np.testing.assert_allclose(out.ravel(), video)


def test_make_dataset_synthetic():
    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import make_dataset

    cfg = TrainConfig(
        dname="synthetic", batch_size=2, total_time_steps=4, int_time_steps=2,
        n_epochs=1,
        model=ModelConfig(x_height=16, x_width=16, n_channels=1),
    )
    it, test = make_dataset(cfg)
    batch = next(it)
    assert batch.shape == (2, 16, 4, 16, 1)
    assert test.shape == (2, 16, 4, 16, 1)
