"""Standalone TFRecord + tf.train.Example IO (no TensorFlow dependency).

The reference stores every dataset as TFRecords of ``tf.train.Example``
protos (`io/make_tfrecord_*.py`) and parses them with ``tf.data``
(e.g. ref modelnet40_cls/train_modelnet.py:118-138). This module
re-implements both sides natively so users can read the reference's
existing record files and write compatible ones:

- TFRecord framing: {uint64 length, masked crc32c(length), payload,
  masked crc32c(payload)} per record.
- A minimal protobuf wire-format codec for the Example message tree
  (Example > Features > map<string, Feature> > Bytes/Float/Int64List).

crc32c uses the ``google_crc32c`` C extension when present, else a pure
Python fallback (slow, but only needed where the extension is missing).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np

try:  # fast C implementation
    import google_crc32c

    def _crc32c(data: bytes) -> int:
        return google_crc32c.value(data)

except ImportError:  # pragma: no cover - fallback
    _CRC_TABLE = None

    def _crc32c(data: bytes) -> int:
        global _CRC_TABLE
        if _CRC_TABLE is None:
            poly = 0x82F63B78
            table = []
            for i in range(256):
                crc = i
                for _ in range(8):
                    crc = (crc >> 1) ^ (poly if crc & 1 else 0)
                table.append(crc)
            _CRC_TABLE = table
        crc = 0xFFFFFFFF
        for b in data:
            crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Protobuf wire helpers (just enough for tf.train.Example)
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, value: int) -> None:
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field: int, wire_type: int) -> int:
    return (field << 3) | wire_type


def _length_delimited(field: int, payload: bytes) -> bytes:
    out = bytearray()
    _write_varint(out, _tag(field, 2))
    _write_varint(out, len(payload))
    out.extend(payload)
    return bytes(out)


def _encode_feature(value) -> bytes:
    """Encode one Feature (field 1 bytes_list / 2 float_list / 3 int64_list)."""
    arr = np.asarray(value)
    if arr.dtype.kind in ("U", "S", "O") or isinstance(value, (bytes, str)):
        items = value if isinstance(value, (list, tuple)) else [value]
        payload = bytearray()
        for item in items:
            if isinstance(item, str):
                item = item.encode("utf-8")
            payload.extend(_length_delimited(1, item))
        return _length_delimited(1, bytes(payload))
    if arr.dtype.kind == "f":
        data = arr.astype("<f4").ravel().tobytes()
        inner = _length_delimited(1, data)  # packed floats, field 1
        return _length_delimited(2, inner)
    if arr.dtype.kind in ("i", "u", "b"):
        payload = bytearray()
        _write_varint(payload, _tag(1, 2))
        body = bytearray()
        for v in arr.ravel().tolist():
            _write_varint(body, v & 0xFFFFFFFFFFFFFFFF)
        _write_varint(payload, len(body))
        payload.extend(body)
        return _length_delimited(3, bytes(payload))
    raise TypeError(f"Unsupported feature dtype: {arr.dtype}")


def encode_example(features: dict) -> bytes:
    """Encode {name: value} into a serialized tf.train.Example.

    Values: bytes/str (BytesList), float arrays (FloatList), int arrays
    (Int64List). NumPy float arrays intended as raw bytes (the reference's
    ``xyz_raw`` pattern, ref io/make_tfrecord_modelnet.py:117-120) should be
    passed as ``arr.tobytes()``.
    """
    feats = bytearray()
    for name, value in features.items():
        entry = _length_delimited(1, name.encode("utf-8")) + _length_delimited(
            2, _encode_feature(value)
        )
        feats.extend(_length_delimited(1, entry))
    return _length_delimited(1, bytes(feats))


def _decode_feature(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        assert wire == 2, f"unexpected wire type {wire} in Feature"
        size, pos = _read_varint(buf, pos)
        body = buf[pos : pos + size]
        pos += size
        if field == 1:  # BytesList
            out = []
            p = 0
            while p < len(body):
                t, p = _read_varint(body, p)
                assert t >> 3 == 1
                n, p = _read_varint(body, p)
                out.append(body[p : p + n])
                p += n
            return out
        if field == 2:  # FloatList
            p = 0
            vals = []
            while p < len(body):
                t, p = _read_varint(body, p)
                assert t >> 3 == 1
                if t & 7 == 2:  # packed
                    n, p = _read_varint(body, p)
                    vals.append(np.frombuffer(body, "<f4", n // 4, p))
                    p += n
                else:  # unpacked fixed32
                    vals.append(np.frombuffer(body, "<f4", 1, p))
                    p += 4
            return np.concatenate(vals) if vals else np.zeros(0, "<f4")
        if field == 3:  # Int64List
            p = 0
            vals = []
            while p < len(body):
                t, p = _read_varint(body, p)
                assert t >> 3 == 1
                if t & 7 == 2:
                    n, p = _read_varint(body, p)
                    end = p + n
                    while p < end:
                        v, p = _read_varint(body, p)
                        vals.append(v)
                else:
                    v, p = _read_varint(body, p)
                    vals.append(v)
            arr = np.array(vals, np.uint64).astype(np.int64)
            return arr
    return None


def decode_example(data: bytes) -> dict:
    """Decode a serialized tf.train.Example into {name: value}."""
    out = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        assert tag >> 3 == 1 and tag & 7 == 2, "expected Example.features"
        size, pos = _read_varint(data, pos)
        feats = data[pos : pos + size]
        pos += size
        fpos = 0
        while fpos < len(feats):
            ftag, fpos = _read_varint(feats, fpos)
            assert ftag >> 3 == 1 and ftag & 7 == 2
            fsize, fpos = _read_varint(feats, fpos)
            entry = feats[fpos : fpos + fsize]
            fpos += fsize
            name = None
            value = None
            epos = 0
            while epos < len(entry):
                etag, epos = _read_varint(entry, epos)
                esize, epos = _read_varint(entry, epos)
                body = entry[epos : epos + esize]
                epos += esize
                if etag >> 3 == 1:
                    name = body.decode("utf-8")
                else:
                    value = _decode_feature(body)
            out[name] = value
    return out


# ---------------------------------------------------------------------------
# Record framing
# ---------------------------------------------------------------------------


class TFRecordWriter:
    """Write TFRecord files compatible with tf.data readers."""

    def __init__(self, path: str | os.PathLike):
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", _masked_crc(record)))

    def write_example(self, features: dict) -> None:
        self.write(encode_example(features))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(
    path: str | os.PathLike, verify_crc: bool = False
) -> Iterator[bytes]:
    """Iterate raw records of a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if verify_crc:
                if _masked_crc(header) != hcrc:
                    raise IOError(f"corrupt record header in {path}")
                if _masked_crc(data) != dcrc:
                    raise IOError(f"corrupt record payload in {path}")
            yield data


def read_examples(
    path: str | os.PathLike, verify_crc: bool = False
) -> Iterator[dict]:
    """Iterate decoded Examples of a TFRecord file."""
    for record in read_records(path, verify_crc):
        yield decode_example(record)
