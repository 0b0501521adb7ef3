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


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned values (must fit in `width` bits) LSB-first."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    out = []
    for s in range(0, n, _CHUNK):
        chunk = v[s : s + _CHUNK]
        bits = ((chunk[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        out.append(np.packbits(bits.ravel(), bitorder="little").tobytes())
    if len(out) == 1:
        return out[0]
    # Chunk boundaries are bit-aligned only when chunk_len*width % 8 == 0;
    # _CHUNK is a multiple of 8 so every full chunk is byte-aligned.
    return b"".join(out)


def unpack_bits(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    buf = np.frombuffer(payload, dtype=np.uint8)
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


def packed_nbytes(n: int, width: int) -> int:
    if width == 0 or n == 0:
        return 0
    full, rem = divmod(n, _CHUNK)
    size = full * (_CHUNK * width // 8)
    if rem:
        size += (rem * width + 7) // 8
    return size
