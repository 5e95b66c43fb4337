"""Native C++ TFRecord/proto reader vs the pure-Python oracle.

The native library (`native/kccot_io.cc`) must produce byte-identical
results to `kccotgan_tpu.data.tfrecord` on records written by the
pure-Python encoder — framing, masked CRC32C, Example and
SequenceExample parsing.
"""

import struct

import numpy as np
import pytest

from kccotgan_tpu.data import tfrecord as py_io

native_io = pytest.importorskip("kccotgan_tpu.data.native_io")

if not native_io.available():
    pytest.skip("native library unavailable (no compiler?)", allow_module_level=True)


def _example_records(rng, n=5):
    recs = []
    for i in range(n):
        feats = {
            "x": rng.normal(size=(16,)).astype(np.float32).tolist(),
            "label": [int(rng.integers(0, 1000)), -3, 2**40],
            "name": [f"sample-{i}".encode(), b"\x00\xff raw"],
        }
        recs.append(py_io.encode_example(feats))
    return recs


def test_masked_crc32c_matches(rng):
    for n in (0, 1, 7, 8, 9, 63, 64, 1000):
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        assert native_io.masked_crc32c(data) == py_io.masked_crc32c(data)


def test_framing_roundtrip(rng, tmp_path):
    recs = _example_records(rng)
    path = str(tmp_path / "t.tfrecord")
    py_io.write_tfrecord(path, recs)
    got = list(native_io.iter_tfrecord(path, verify_crc=True))
    assert got == recs


def test_framing_detects_corruption(rng, tmp_path):
    recs = _example_records(rng, n=2)
    path = str(tmp_path / "bad.tfrecord")
    py_io.write_tfrecord(path, recs)
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte of record 0
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(native_io.iter_tfrecord(path, verify_crc=True))
    # without verification the (corrupted) payload still round-trips
    assert len(list(native_io.iter_tfrecord(path))) == 2


def test_parse_example_parity(rng):
    for rec in _example_records(rng):
        want = py_io.parse_example(rec)
        got = native_io.parse_example(rec)
        assert set(got) == set(want)
        assert got["name"] == want["name"]
        assert got["label"] == want["label"]
        np.testing.assert_allclose(got["x"], want["x"], rtol=0, atol=0)


def test_parse_example_arrays_parity(rng):
    """The array-native parse (both backends) must equal the list-based
    oracle value-for-value, with float32/int64 numpy dtypes."""
    for rec in _example_records(rng):
        want = py_io.parse_example(rec)
        for impl in (py_io, native_io):
            got = impl.parse_example_arrays(rec)
            assert set(got) == set(want)
            assert got["name"] == want["name"]
            assert got["x"].dtype == np.float32
            assert got["label"].dtype == np.int64
            np.testing.assert_array_equal(got["x"], np.asarray(want["x"], np.float32))
            np.testing.assert_array_equal(got["label"], np.asarray(want["label"]))


def test_parse_sequence_example_parity(rng):
    ctx = {
        "0/image_aux1/encoded": [bytes(rng.integers(0, 256, 64, dtype=np.uint8))],
        "meta": [3, 1, 4],
    }
    fl = {
        "frames": [[b"jpegdata1"], [b"jpegdata22"], [b"jpegdata333"]],
        "actions": [
            rng.normal(size=4).astype(np.float32).tolist() for _ in range(3)
        ],
    }
    rec = py_io.encode_sequence_example(ctx, fl)
    want_ctx, want_fl = py_io.parse_sequence_example(rec)
    got_ctx, got_fl = native_io.parse_sequence_example(rec)
    assert got_ctx["0/image_aux1/encoded"] == want_ctx["0/image_aux1/encoded"]
    assert got_ctx["meta"] == want_ctx["meta"]
    assert got_fl["frames"] == want_fl["frames"]
    for g, w in zip(got_fl["actions"], want_fl["actions"]):
        np.testing.assert_allclose(g, w)


def test_unpacked_float_and_varint_int(rng):
    """Hand-built record with UNPACKED repeated fields (older writers)."""

    def varint(x):
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            if x:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # Feature{ FloatList{ value: 1.5 value: -2.25 } } with wire-type 5
    floats = b"".join(
        varint(1 << 3 | 5) + struct.pack("<f", v) for v in (1.5, -2.25)
    )
    float_feat = varint(2 << 3 | 2) + varint(len(floats)) + floats
    # Feature{ Int64List{ value: 7 value: 300 } } unpacked varints
    ints = b"".join(varint(1 << 3 | 0) + varint(v) for v in (7, 300))
    int_feat = varint(3 << 3 | 2) + varint(len(ints)) + ints

    def map_entry(key, feat):
        e = (
            varint(1 << 3 | 2) + varint(len(key)) + key
            + varint(2 << 3 | 2) + varint(len(feat)) + feat
        )
        return varint(1 << 3 | 2) + varint(len(e)) + e

    features = map_entry(b"f", float_feat) + map_entry(b"i", int_feat)
    rec = varint(1 << 3 | 2) + varint(len(features)) + features

    want = py_io.parse_example(rec)
    got = native_io.parse_example(rec)
    np.testing.assert_allclose(got["f"], want["f"])
    assert got["i"] == want["i"] == [7, 300]
    # unpacked wire forms through the array-native parse too
    for impl in (py_io, native_io):
        arr = impl.parse_example_arrays(rec)
        np.testing.assert_array_equal(arr["f"], np.asarray(want["f"], np.float32))
        np.testing.assert_array_equal(arr["i"], np.asarray([7, 300]))


def test_bair_loader_through_native(rng, tmp_path):
    """End-to-end: the BAIR loader (routed through io dispatch) reads a
    synthetic fixture identically under both backends."""
    from kccotgan_tpu.data import io as dispatch
    from kccotgan_tpu.data.bair import robot_push_samples

    t, hw = 4, 8
    ctx = {}
    video = rng.integers(0, 256, size=(30, 64, 64, 3), dtype=np.uint8)
    for i in range(30):
        ctx[f"{i}/image_aux1/encoded"] = [video[i].tobytes()]
    rec = py_io.encode_sequence_example(ctx)
    d = tmp_path / "bair" / "train"
    d.mkdir(parents=True)
    py_io.write_tfrecord(str(d / "shard0.tfrecord"), [rec])

    assert dispatch.backend() == "native"
    out = list(robot_push_samples(str(tmp_path / "bair"), time_steps=t))
    assert len(out) == 1 and out[0].shape == (64, t, 64, 3)
    want = np.transpose(video[:t].astype(np.float32) / 255.0, (1, 0, 2, 3))
    np.testing.assert_allclose(out[0], want)
    del hw
