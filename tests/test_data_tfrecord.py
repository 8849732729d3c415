"""TFRecord codec round-trip tests + cross-validation against TensorFlow
(TF is available in the test environment only; the library has no TF dep)."""

import numpy as np
import pytest

from sph3d_gcn_tpu.data.tfrecord import (
    TFRecordWriter,
    decode_example,
    encode_example,
    read_examples,
    read_records,
)


def _sample_features():
    rng = np.random.default_rng(0)
    return {
        "xyz_raw": rng.standard_normal((32, 3)).astype(np.float32).tobytes(),
        "label": np.int64(7),
        "weights": rng.standard_normal(5).astype(np.float32),
        "ids": np.arange(4, dtype=np.int64),
    }


def test_roundtrip(tmp_path):
    path = tmp_path / "a.tfrecord"
    feats = _sample_features()
    with TFRecordWriter(path) as w:
        w.write_example(feats)
        w.write_example(feats)
    examples = list(read_examples(path, verify_crc=True))
    assert len(examples) == 2
    ex = examples[0]
    assert ex["xyz_raw"][0] == feats["xyz_raw"]
    assert ex["label"].tolist() == [7]
    np.testing.assert_allclose(ex["weights"], feats["weights"], rtol=1e-6)
    assert ex["ids"].tolist() == [0, 1, 2, 3]


def test_negative_int64_roundtrip(tmp_path):
    path = tmp_path / "n.tfrecord"
    with TFRecordWriter(path) as w:
        w.write_example({"v": np.array([-1, -5, 3], np.int64)})
    (ex,) = read_examples(path, verify_crc=True)
    assert ex["v"].tolist() == [-1, -5, 3]


def test_corruption_detected(tmp_path):
    path = tmp_path / "c.tfrecord"
    with TFRecordWriter(path) as w:
        w.write_example({"v": np.array([1.0], np.float32)})
    raw = bytearray(path.read_bytes())
    raw[-6] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(IOError):
        list(read_records(path, verify_crc=True))


@pytest.mark.filterwarnings("ignore")
def test_tensorflow_can_read_our_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "ours.tfrecord")
    feats = _sample_features()
    with TFRecordWriter(path) as w:
        w.write_example(feats)
    ds = tf.data.TFRecordDataset([path])
    raw = next(iter(ds)).numpy()
    parsed = tf.io.parse_single_example(
        raw,
        {
            "xyz_raw": tf.io.FixedLenFeature([], tf.string),
            "label": tf.io.FixedLenFeature([], tf.int64),
            "weights": tf.io.FixedLenFeature([5], tf.float32),
            "ids": tf.io.FixedLenFeature([4], tf.int64),
        },
    )
    assert parsed["xyz_raw"].numpy() == feats["xyz_raw"]
    assert int(parsed["label"]) == 7
    np.testing.assert_allclose(parsed["weights"].numpy(), feats["weights"], rtol=1e-6)


@pytest.mark.filterwarnings("ignore")
def test_we_can_read_tensorflow_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "theirs.tfrecord")
    xyz = np.random.default_rng(1).standard_normal((16, 3)).astype(np.float32)
    # Write with TF exactly like the reference writers
    # (ref io/make_tfrecord_modelnet.py:117-120).
    example = tf.train.Example(
        features=tf.train.Features(
            feature={
                "xyz_raw": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[xyz.tobytes()])
                ),
                "label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[3])
                ),
            }
        )
    )
    with tf.io.TFRecordWriter(path) as w:
        w.write(example.SerializeToString())
    (ex,) = read_examples(path, verify_crc=True)
    got = np.frombuffer(ex["xyz_raw"][0], np.float32).reshape(16, 3)
    np.testing.assert_array_equal(got, xyz)
    assert ex["label"].tolist() == [3]


def test_decode_encode_identity():
    feats = {"a": np.array([1.5, 2.5], np.float32), "b": np.array([9], np.int64)}
    ex = decode_example(encode_example(feats))
    np.testing.assert_allclose(ex["a"], feats["a"])
    assert ex["b"].tolist() == [9]
