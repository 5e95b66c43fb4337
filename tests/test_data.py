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


# ---------------------------------------------------------------------------
# Streaming pipeline combinators (tf.data-equivalent semantics:
# shuffle buffer, cycle/block interleave, ordered parallel decode).
# ---------------------------------------------------------------------------


def test_shuffle_stream_is_seeded_permutation():
    from kccotgan_tpu.data.pipeline import shuffle_stream

    src = list(range(50))
    out = list(shuffle_stream(iter(src), 10, seed=3))
    assert sorted(out) == src          # nothing lost or duplicated
    assert out != src                  # actually shuffled
    out2 = list(shuffle_stream(iter(src), 10, seed=3))
    assert out == out2                 # deterministic under a seed


def test_interleave_cycle_block_order():
    from kccotgan_tpu.data.pipeline import interleave

    # Three sources of 4 items; cycle 2, block 2 => round-robin blocks
    # of 2 between the two open slots, refilling from the third.
    sources = {"a": ["a0", "a1", "a2", "a3"], "b": ["b0", "b1", "b2", "b3"],
               "c": ["c0", "c1", "c2", "c3"]}
    out = list(interleave(iter("abc"), lambda k: iter(sources[k]),
                          cycle_length=2, block_length=2))
    assert out == ["a0", "a1", "b0", "b1", "a2", "a3", "b2", "b3",
                   "c0", "c1", "c2", "c3"]
    assert sorted(out) == sorted(sum(sources.values(), []))


def test_parallel_map_preserves_order():
    from kccotgan_tpu.data.pipeline import parallel_map

    got = list(parallel_map(lambda x: x * x, range(40), workers=4))
    assert got == [x * x for x in range(40)]


def test_generator_dataset_shuffle_buffer():
    from kccotgan_tpu.data.pipeline import GeneratorDataset

    def factory():
        for i in range(12):
            yield np.full((2, 2), i, np.float32)

    ds = GeneratorDataset(factory, batch_size=1, shuffle_buffer=12, seed=0)
    shuffled = [int(b[0, 0, 0]) for b in ds.repeat(1, shuffle=True)]
    plain = [int(b[0, 0, 0]) for b in ds.repeat(1, shuffle=False)]
    assert plain == list(range(12))
    assert sorted(shuffled) == plain and shuffled != plain


def test_gqn_reader_interleaves_files(tmp_path):
    """Records must alternate across concurrently-open shards (the
    tf.data interleave(cycle=4, block=16) behavior, `data_utils.py:420`)."""
    from kccotgan_tpu.data.gqn import GQN_DATASETS, GqnReader, gqn_record_files

    info = GQN_DATASETS["shepard_metzler_5_parts"]
    files = gqn_record_files(info, "train", str(tmp_path))
    values = [30, 220]  # constant-intensity JPEG per shard -> identifiable
    for f, v in zip(files[:2], values):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.full((8, 8, 3), v, np.uint8)).save(buf, "JPEG")
        rec = encode_example({"frames": [buf.getvalue()] * info.sequence_size})
        write_tfrecord(f, [rec, rec])

    reader = GqnReader(
        "shepard_metzler_5_parts", time_steps=2, root=str(tmp_path),
        custom_frame_size=8, shuffle_files=False,
        cycle_length=2, block_length=1, decode_workers=2,
    )
    it = reader.samples()
    means = [float(next(it).mean()) * 255 for _ in range(4)]
    # block_length=1 round-robin: shard0, shard1, shard0, shard1
    assert abs(means[0] - means[2]) < 10 and abs(means[1] - means[3]) < 10
    assert abs(means[0] - means[1]) > 100


def test_gqn_reader_shuffles_file_order(tmp_path):
    from kccotgan_tpu.data.gqn import GQN_DATASETS, GqnReader, gqn_record_files

    info = GQN_DATASETS["shepard_metzler_5_parts"]
    files = gqn_record_files(info, "train", str(tmp_path))
    n = 8
    for i, f in enumerate(files[:n]):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.full((8, 8, 3), 20 + 25 * i, np.uint8)).save(buf, "JPEG")
        rec = encode_example({"frames": [buf.getvalue()] * info.sequence_size})
        write_tfrecord(f, [rec])

    reader = GqnReader(
        "shepard_metzler_5_parts", time_steps=2, root=str(tmp_path),
        custom_frame_size=8, shuffle_files=True, shuffle_buffer=8,
        cycle_length=1, block_length=1, decode_workers=0, seed=5,
    )
    it = reader.samples()
    order = [round((float(next(it).mean()) * 255 - 20) / 25) for _ in range(n)]
    assert order != list(range(n))   # not sequential file order
