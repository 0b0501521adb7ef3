"""Integer codecs: plain, frame-of-reference + bit-pack, RLE, dictionary.

All operate on ``np.ndarray`` (canonicalized to int64 by the column
wrapper).  Every encode has an exact, bit-identical decode
(reference round-trip contract, SURVEY.md §2.1 R13 -> §2.2 E9).
Int64 overflow on frame-of-reference deltas wraps in two's complement
on encode and unwraps identically on decode, so extreme-range columns
degrade to width-64 (i.e. plain-sized) rather than corrupting.
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits

MINIBLOCK = 4096


# ---------------------------------------------------------------- plain


class PlainInt:
    name = "plain"
    kind = "int"

    def estimate(self, sample: np.ndarray) -> float:
        return len(sample) * 8.0

    def encode(self, values: np.ndarray):
        return {}, np.ascontiguousarray(values, dtype=np.int64).tobytes()

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.int64, count=n)


# ------------------------------------------------- frame-of-reference


def _for_deltas(block: np.ndarray) -> tuple[int, np.ndarray]:
    mn = int(block.min())
    with np.errstate(over="ignore"):
        d = (block - np.int64(mn)).view(np.uint64)
    return mn, d


class ForBitpack:
    """Per-miniblock min subtraction + LSB-first bit-packing (SURVEY §2.2)."""

    name = "for_bitpack"
    kind = "int"

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        bits = 0
        for s in range(0, len(sample), MINIBLOCK):
            block = sample[s : s + MINIBLOCK]
            _, d = _for_deltas(block)
            bits += len(block) * bit_width(int(d.max()))
        return bits / 8.0 + 9.0 * ((len(sample) + MINIBLOCK - 1) // MINIBLOCK)

    def encode(self, values: np.ndarray):
        values = np.ascontiguousarray(values, dtype=np.int64)
        n = len(values)
        nblocks = (n + MINIBLOCK - 1) // MINIBLOCK
        mins = np.empty(nblocks, dtype=np.int64)
        widths = np.empty(nblocks, dtype=np.uint8)
        parts = []
        for b in range(nblocks):
            block = values[b * MINIBLOCK : (b + 1) * MINIBLOCK]
            mn, d = _for_deltas(block)
            w = bit_width(int(d.max()))
            mins[b] = mn
            widths[b] = w
            parts.append(pack_bits(d, w))
        header = mins.tobytes() + widths.tobytes()
        params = {"nb": nblocks, "hl": len(header)}
        return params, header + b"".join(parts)

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        nblocks = params["nb"]
        mins = np.frombuffer(payload, dtype=np.int64, count=nblocks)
        widths = np.frombuffer(payload, dtype=np.uint8, count=nblocks, offset=nblocks * 8)
        out = np.empty(n, dtype=np.int64)
        pos = params["hl"]
        for b in range(nblocks):
            m = min(MINIBLOCK, n - b * MINIBLOCK)
            w = int(widths[b])
            nbytes = packed_nbytes(m, w)
            d = unpack_bits(payload[pos : pos + nbytes], w, m)
            pos += nbytes
            with np.errstate(over="ignore"):
                out[b * MINIBLOCK : b * MINIBLOCK + m] = (
                    d + np.uint64(np.int64(mins[b]).astype(np.uint64))
                ).view(np.int64)
        return out


# ------------------------------------------------------------------ RLE


class Rle:
    """(value, run-length) pairs; both streams recursively FOR+bit-packed."""

    name = "rle"
    kind = "int"

    def __init__(self):
        self._for = ForBitpack()

    def _runs(self, values: np.ndarray):
        n = len(values)
        if n == 0:
            return values.astype(np.int64), np.array([], dtype=np.int64)
        starts = np.concatenate(([0], np.flatnonzero(values[1:] != values[:-1]) + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        return values[starts].astype(np.int64), lens.astype(np.int64)

    def estimate(self, sample: np.ndarray) -> float:
        vals, lens = self._runs(sample)
        if len(vals) == 0:
            return 0.0
        return self._for.estimate(vals) + self._for.estimate(lens) + 16.0

    def encode(self, values: np.ndarray):
        vals, lens = self._runs(np.ascontiguousarray(values, dtype=np.int64))
        pv, bv = self._for.encode(vals)
        pl, bl = self._for.encode(lens)
        params = {"nr": len(vals), "v": pv, "l": pl, "vlen": len(bv)}
        return params, bv + bl

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        nr = params["nr"]
        vals = self._for.decode(params["v"], payload[: params["vlen"]], nr)
        lens = self._for.decode(params["l"], payload[params["vlen"] :], nr)
        if nr == 0:
            return np.zeros(0, dtype=np.int64)
        return np.repeat(vals, lens)


# ----------------------------------------------------------- dict(int)


class DictInt:
    """Distinct-value dictionary + bit-packed indices."""

    name = "dict"
    kind = "int"

    def __init__(self):
        self._for = ForBitpack()

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        uniq = np.unique(sample)
        w = bit_width(len(uniq) - 1)
        return len(sample) * w / 8.0 + self._for.estimate(uniq) + 16.0

    def encode(self, values: np.ndarray):
        values = np.ascontiguousarray(values, dtype=np.int64)
        uniq, inv = np.unique(values, return_inverse=True)
        w = bit_width(len(uniq) - 1) if len(uniq) else 0
        pd_, bd = self._for.encode(uniq)
        bi = pack_bits(inv.astype(np.uint64), w)
        params = {"nd": len(uniq), "w": w, "d": pd_, "dlen": len(bd)}
        return params, bd + bi

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        nd = params["nd"]
        uniq = self._for.decode(params["d"], payload[: params["dlen"]], nd)
        inv = unpack_bits(payload[params["dlen"] :], params["w"], n).astype(np.int64)
        if nd == 0:
            return np.zeros(0, dtype=np.int64)
        return uniq[inv]
