"""Data pipeline: augmentations, TFRecord IO, preprocessing, merge metrics."""

from sph3d_gcn_tpu.data.tfrecord import (
    TFRecordWriter,
    decode_example,
    encode_example,
    read_examples,
    read_records,
)

__all__ = [
    "TFRecordWriter",
    "decode_example",
    "encode_example",
    "read_examples",
    "read_records",
]
