"""Codec plugin surface (SURVEY.md §2.2 E15, mirroring reference R14).

A codec is a plain object with:
  - ``name``:       registry key
  - ``kind``:       "int" (numpy integer array) or "str" (pyarrow string array)
  - ``estimate(sample) -> float``:  estimated encoded bytes for the sample
    (cheap, analytic; the selector extrapolates to the full column)
  - ``encode(values) -> (params: dict, payload: bytes)``
  - ``decode(params, payload, n) -> values``   (exact inverse, bit-identical)

Int codecs see/return ``np.ndarray`` of int64 (the column wrapper in
``codecs/__init__.py`` owns dtype restoration, validity bitmaps, CRCs
and the optional zstd general-purpose topper).  Str codecs see/return
``pa.Array`` of type string with no nulls.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa


def b64e(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


def b64d(s: str) -> bytes:
    return base64.b64decode(s.encode("ascii"))


@dataclass
class EncodedColumn:
    """One encoded column chunk — a row of the container file (SURVEY §1.2)."""

    column: str
    codec: str
    params: dict = field(default_factory=dict)
    payload: bytes = b""
    n_values: int = 0
    plain_bytes: int = 0  # canonical uncompressed size (for ratio metrics)
    crc32: int = 0  # over canonical decoded bytes

    @property
    def encoded_bytes(self) -> int:
        # params travel as JSON in the container; count their payload-ish
        # members (b64 blobs) via the serialized length at write time.
        return len(self.payload)


class CodecError(ValueError):
    pass


def str_to_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """pa string array -> (lengths int64, concatenated utf8 bytes). Zero-copy-ish."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if arr.null_count:
        raise CodecError("str codecs operate on null-free arrays (wrapper fills)")
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = buffers[2].to_pybytes()[off[0] : off[-1]] if buffers[2] is not None else b""
    lengths = np.diff(off).astype(np.int64)
    return lengths, data


def parts_to_str(lengths: np.ndarray, data: bytes) -> pa.Array:
    off = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=off[1:])
    return pa.StringArray.from_buffers(
        len(lengths), pa.py_buffer(off.astype(np.int32).tobytes()), pa.py_buffer(data)
    )


def canonical_int_bytes(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.int64).tobytes()


def canonical_str_bytes(arr: pa.Array) -> bytes:
    lengths, data = str_to_parts(arr)
    return lengths.tobytes() + data
