"""ctypes bindings for the native C++ record-loader core.

Builds ``libsph3dloader.so`` on first use if the toolchain is available
(mirroring the reference's compile-on-setup op build, ref compile.sh) and
falls back to the pure-Python reader transparently when it isn't.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from collections.abc import Iterator

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_LIB_PATH = os.path.join(_DIR, "libsph3dloader.so")
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["sh", os.path.join(_DIR, "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.sph3d_masked_crc32c.restype = ctypes.c_uint32
    lib.sph3d_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.sph3d_tfrecord_scan.restype = ctypes.c_int64
    lib.sph3d_tfrecord_scan.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.sph3d_tfrecord_read.restype = ctypes.c_int64
    lib.sph3d_tfrecord_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def masked_crc32c(data: bytes) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    return lib.sph3d_masked_crc32c(data, len(data))


_ERRORS = {
    -1: "cannot open file",
    -2: "truncated record file",
    -3: "CRC mismatch (corrupt record)",
    -4: "capacity exceeded",
}


def read_records_native(
    path: str | os.PathLike, verify_crc: bool = False
) -> Iterator[bytes]:
    """Native-scan TFRecord reader: C++ does the framing walk + CRC checks
    and one bulk payload read; Python slices out the records."""
    lib = _load()
    if lib is None:
        from sph3d_gcn_tpu.data.tfrecord import read_records

        yield from read_records(path, verify_crc)
        return

    path = os.fspath(path)
    cap = max(1024, os.path.getsize(path) // 16 + 16)
    offsets = np.zeros(cap, np.int64)
    lengths = np.zeros(cap, np.int64)
    count = lib.sph3d_tfrecord_scan(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
        1 if verify_crc else 0,
    )
    if count < 0:
        raise IOError(f"{path}: {_ERRORS.get(count, 'read error')}")
    total = int(lengths[:count].sum())
    buf = np.zeros(total, np.uint8)
    got = lib.sph3d_tfrecord_read(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        total,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        count,
    )
    if got < 0:
        raise IOError(f"{path}: {_ERRORS.get(got, 'read error')}")
    raw = buf.tobytes()
    pos = 0
    for i in range(count):
        n = int(lengths[i])
        yield raw[pos : pos + n]
        pos += n


def read_examples_native(
    path: str | os.PathLike, verify_crc: bool = False
) -> Iterator[dict]:
    from sph3d_gcn_tpu.data.tfrecord import decode_example

    for record in read_records_native(path, verify_crc):
        yield decode_example(record)
