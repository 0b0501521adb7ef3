"""Deterministic vectorized hashing (no PYTHONHASHSEED dependence).

Used for partition bucket assignment (stable across processes, so a
resume run reproduces the same part_ids — SURVEY.md §2.2 E3/E7),
content hashes for exact dedup, and counter-based synthetic data
generation (FIXTURES.md F1b).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 mix function, vectorized; input/output uint64."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def u01(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> uniform float64 in [0, 1)."""
    return (h >> np.uint64(11)).astype(np.float64) * (2.0**-53)


def _string_parts(arr: pa.Array | pa.ChunkedArray):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    buf = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    return off.astype(np.int64), buf


def hash_strings_u64(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Vectorized FNV-1a over each string's utf8 bytes -> uint64 per row.

    One numpy pass per byte-column of a (n, max_len) padded matrix —
    total work is O(total_bytes), no Python per-row loop.
    """
    off, buf = _string_parts(arr)
    n = len(off) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.diff(off)
    max_len = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET ^ np.uint64(seed), dtype=np.uint64)
    if max_len == 0:
        return splitmix64(h)
    mat = np.zeros((n, max_len), dtype=np.uint8)
    total = int(off[-1] - off[0])
    if total:
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(off[0], off[-1]) - np.repeat(off[:-1], lens)
        mat[rows, cols] = buf[off[0] : off[-1]]
    with np.errstate(over="ignore"):
        for c in range(max_len):
            active = c < lens
            hc = (h ^ mat[:, c].astype(np.uint64)) * _FNV_PRIME
            h = np.where(active, hc, h)
    # finalize so short strings still diffuse into high bits
    return splitmix64(h)
