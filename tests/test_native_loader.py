"""Native C++ loader core: build, parity with the Python reader, CRC."""

import numpy as np
import pytest

from sph3d_gcn_tpu.data import native_loader
from sph3d_gcn_tpu.data.tfrecord import (
    TFRecordWriter,
    _masked_crc,
    read_records,
)

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no C++ toolchain"
)


def _write(path, n=20, seed=0):
    rng = np.random.default_rng(seed)
    with TFRecordWriter(path) as w:
        for i in range(n):
            w.write_example(
                {
                    "xyz_raw": rng.standard_normal((64, 3))
                    .astype(np.float32)
                    .tobytes(),
                    "label": np.int64(i),
                }
            )


def test_crc32c_matches_python(tmp_path):
    for payload in (b"", b"a", b"hello world", bytes(range(256)) * 7):
        assert native_loader.masked_crc32c(payload) == _masked_crc(payload)


def test_native_reader_matches_python(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    _write(path)
    py = list(read_records(path, verify_crc=True))
    nat = list(native_loader.read_records_native(path, verify_crc=True))
    assert len(py) == len(nat) == 20
    for a, b in zip(py, nat):
        assert a == b


def test_native_reader_detects_corruption(tmp_path):
    path = str(tmp_path / "c.tfrecord")
    _write(path, n=3)
    raw = bytearray(open(path, "rb").read())
    raw[40] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(native_loader.read_records_native(path, verify_crc=True))


def test_native_examples_decode(tmp_path):
    path = str(tmp_path / "e.tfrecord")
    _write(path, n=4)
    examples = list(native_loader.read_examples_native(path, verify_crc=True))
    assert [int(e["label"][0]) for e in examples] == [0, 1, 2, 3]
