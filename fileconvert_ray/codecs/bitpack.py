"""Bit-packing primitives (vectorized numpy, no Python per-value loops).

Little-endian bit order: value v occupies bits [i*w, (i+1)*w) of the
payload, LSB first.  Width 0 encodes a stream of zeros as zero bytes.
These are the shared kernels under ``for_bitpack`` / ``rle`` /
``dict`` (SURVEY.md §2.2 codec table).
"""

from __future__ import annotations

import numpy as np

# Process packing in bounded chunks so the (n, w) bit matrix stays small
# even when a caller packs a whole 128 MiB block's worth of values.
_CHUNK = 1 << 20


def bit_width(max_delta: int) -> int:
    """Bits needed to represent values in [0, max_delta]."""
    if max_delta <= 0:
        return 0
    return int(max_delta).bit_length()


def _pack_matrix(v: np.ndarray, width: int) -> bytes:
    """Reference path (any width<=64): explicit bit matrix + packbits."""
    shifts = np.arange(width, dtype=np.uint64)
    out = []
    for s in range(0, len(v), _CHUNK):
        chunk = v[s : s + _CHUNK]
        bits = ((chunk[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        out.append(np.packbits(bits.ravel(), bitorder="little").tobytes())
    return b"".join(out) if len(out) != 1 else out[0]


def _unpack_matrix(buf: np.ndarray, width: int, n: int) -> np.ndarray:
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64)).astype(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    for s in range(0, n, _CHUNK):
        m = min(_CHUNK, n - s)
        b0 = s * width // 8  # byte-aligned because _CHUNK*width % 8 == 0
        nbits = m * width
        bits = np.unpackbits(
            buf[b0 : b0 + (nbits + 7) // 8], count=nbits, bitorder="little"
        ).reshape(m, width)
        out[s : s + m] = bits.astype(np.uint64) @ weights
    return out


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned values (must fit in `width` bits) LSB-first.

    Fast path: groups of 8 values = exactly `width` output bytes; each
    value is shifted into a little-endian uint64 and OR-accumulated as
    bytes — 8 vectorized ops per group column regardless of width
    (memory traffic ~8 B/value instead of `width` B/value for the
    naive bit-matrix).  Works for width <= 57 (shift+offset must fit
    in 64 bits); byte-width multiples use a straight astype; the
    matrix path covers the rest.
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 8:
        return v.astype(np.uint8).tobytes()
    if width == 16:
        return v.astype(np.uint16).tobytes()
    if width == 32:
        return v.astype(np.uint32).tobytes()
    if width == 64:
        return v.tobytes()
    if width > 57:
        return _pack_matrix(v, width)
    total = (n * width + 7) // 8
    groups = (n + 7) // 8
    if groups * 8 != n:
        v = np.concatenate([v, np.zeros(groups * 8 - n, dtype=np.uint64)])
    V = v.reshape(groups, 8)
    out = np.zeros((groups, width + 8), dtype=np.uint8)
    for j in range(8):
        bit = j * width
        col, off = bit // 8, bit % 8
        shifted = (V[:, j] << np.uint64(off))[:, None].view(np.uint8)  # (G, 8) LE bytes
        out[:, col : col + 8] |= shifted
    return out[:, :width].tobytes()[:total]


def unpack_bits(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    buf = np.frombuffer(payload, dtype=np.uint8)
    if width == 8:
        return buf[:n].astype(np.uint64)
    if width == 16:
        return np.frombuffer(payload, dtype=np.uint16, count=n).astype(np.uint64)
    if width == 32:
        return np.frombuffer(payload, dtype=np.uint32, count=n).astype(np.uint64)
    if width == 64:
        return np.frombuffer(payload, dtype=np.uint64, count=n).copy()
    if width > 57:
        return _unpack_matrix(buf, width, n)
    groups = (n + 7) // 8
    padded = np.zeros((groups, width + 8), dtype=np.uint8)
    flat = np.zeros(groups * width, dtype=np.uint8)
    flat[: len(buf)] = buf[: groups * width]
    padded[:, :width] = flat.reshape(groups, width)
    out = np.empty((groups, 8), dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    for j in range(8):
        bit = j * width
        col, off = bit // 8, bit % 8
        words = np.ascontiguousarray(padded[:, col : col + 8]).view(np.uint64)[:, 0]
        out[:, j] = (words >> np.uint64(off)) & mask
    return out.reshape(-1)[:n]


def packed_nbytes(n: int, width: int) -> int:
    if width == 0 or n == 0:
        return 0
    full, rem = divmod(n, _CHUNK)
    size = full * (_CHUNK * width // 8)
    if rem:
        size += (rem * width + 7) // 8
    return size
