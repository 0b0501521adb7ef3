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
        return float(sample.nbytes)

    def encode(self, values: np.ndarray):
        values = np.ascontiguousarray(values)
        return {"dt": values.dtype.str}, values.tobytes()

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.dtype(params.get("dt", "<i8")), count=n)


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
            block = sample[s : s + MINIBLOCK].astype(np.int64, copy=False)
            _, d = _for_deltas(block)
            bits += len(block) * bit_width(int(d.max()))
        return bits / 8.0 + 9.0 * ((len(sample) + MINIBLOCK - 1) // MINIBLOCK)

    def encode(self, values: np.ndarray):
        values = np.ascontiguousarray(values)
        n = len(values)
        nblocks = (n + MINIBLOCK - 1) // MINIBLOCK
        mins = np.empty(nblocks, dtype=np.int64)
        widths = np.empty(nblocks, dtype=np.uint8)
        parts = []
        for b in range(nblocks):
            # per-miniblock int64 upcast stays cache-resident (4096 vals)
            block = values[b * MINIBLOCK : (b + 1) * MINIBLOCK].astype(np.int64, copy=False)
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


# --------------------------------------------------------- escape-bytes


class EscBytes:
    """Byte-aligned escape coding for entropy-skewed ids.

    One uint8 per value (255 = escape marker), escaped values in
    byte-PLANE order appended after.  Bit-packing hides symbol
    boundaries from the zstd topper's FSE entropy stage; byte-aligned
    streams let it model the actual id distribution — measured 17%
    smaller than dict+bitpack+zstd on zipf-distributed token ids
    (BASELINE.md).  Exact for any int64 (frame-of-reference shift,
    two's-complement wrap like ForBitpack)."""

    name = "esc"
    kind = "int"

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        s = sample.astype(np.int64, copy=False)
        with np.errstate(over="ignore"):
            d = (s - np.int64(int(s.min()))).view(np.uint64)
        mx = int(d.max())
        w = 2 if mx < (1 << 16) else (4 if mx < (1 << 32) else 8)
        return float(len(s) + int((d >= 255).sum()) * w)

    def encode(self, values: np.ndarray):
        # DRAM-traffic + branch-miss minimized (round-2 verdict #8):
        # when min == 0 — the normal case for token ids — the reference
        # shift is skipped entirely (d is a zero-copy view); the escape
        # byte stream is one branchless np.minimum (boolean fancy
        # indexing costs ~15x the streaming passes — measured, this VM);
        # escape values come out via flatnonzero + take (int-index
        # gather, ~2x faster than a boolean gather); and the width is
        # derived from the (tiny) escape set instead of a full max()
        # pass.  4M-value chunk: 37 ms -> 21 ms single-thread.
        v = np.ascontiguousarray(values)
        n = len(v)
        if n == 0:
            return {"ref": 0, "w": 2, "ne": 0}, b""
        if v.dtype.kind in "iu" and v.dtype.itemsize <= 4:
            # int32-native: shift exact in uint32 two's-complement —
            # no int64 upcast (that pass alone saturates DRAM at high
            # worker counts)
            if v.dtype != np.int32 and v.dtype != np.uint32:
                v = v.astype(np.int32)
            mn = int(v.min())
            if mn == 0:
                d = v.view(np.uint32)
            else:
                with np.errstate(over="ignore"):
                    d = v.view(np.uint32) - np.uint32(mn & 0xFFFFFFFF)
            widths = ((1 << 16, 2, np.uint16), (1 << 63, 4, np.uint32))
        else:
            v = v.astype(np.int64, copy=False)
            mn = int(v.min())
            if mn == 0:
                d = v.view(np.uint64)
            else:
                with np.errstate(over="ignore"):
                    d = (v - np.int64(mn)).view(np.uint64)
            widths = ((1 << 16, 2, np.uint16), (1 << 32, 4, np.uint32), (1 << 63, 8, np.uint64))
        b1 = np.minimum(d, d.dtype.type(255)).astype(np.uint8)
        esc_vals = d.take(np.flatnonzero(d >= 255))
        mx = int(esc_vals.max()) if len(esc_vals) else 0
        for bound, w, dt in widths:
            if mx < bound:
                break
        esc = esc_vals.astype(dt, copy=False)
        if len(esc):
            eb = np.ascontiguousarray(esc).view(np.uint8).reshape(-1, w)
            planes = b"".join(np.ascontiguousarray(eb[:, j]).tobytes() for j in range(w))
        else:
            planes = b""
        return {"ref": mn, "w": w, "ne": int(len(esc))}, b1.tobytes() + planes

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        ref, w, ne = int(params["ref"]), int(params["w"]), int(params["ne"])
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        b1 = np.frombuffer(payload, dtype=np.uint8, count=n)
        d = b1.astype(np.uint64)
        if ne:
            planes = np.frombuffer(payload, dtype=np.uint8, offset=n, count=ne * w).reshape(w, ne)
            esc = np.zeros(ne, dtype=np.uint64)
            for j in range(w):
                esc |= planes[j].astype(np.uint64) << np.uint64(8 * j)
            # int-index scatter: boolean masked assignment costs ~15x
            d[np.flatnonzero(b1 == 255)] = esc
        with np.errstate(over="ignore"):
            return (d + np.int64(ref).astype(np.uint64)).view(np.int64)


# --------------------------------------------------- run-extracted esc


_GAP_SLICE_MAX = 4096  # slice-concat path bound: Python loop over runs


def gather_gaps(v: np.ndarray, rstarts: np.ndarray, rlens: np.ndarray,
                keep: np.ndarray) -> np.ndarray:
    """Residue (non-run values).  Runs are few by construction (only
    >= MINRUN survive), so concatenating the gap SLICES is a straight
    memcpy (~6x faster than flatnonzero+take on a 4M chunk — measured);
    adversarially run-dense data falls back to the int-index gather."""
    if len(rstarts) > _GAP_SLICE_MAX:
        return v.take(np.flatnonzero(keep))
    parts = []
    prev = 0
    for s, l in zip(rstarts.tolist(), rlens.tolist()):
        if s > prev:
            parts.append(v[prev:s])
        prev = s + l
    if prev < len(v):
        parts.append(v[prev:])
    if not parts:
        return v[:0]
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def scatter_gaps(out: np.ndarray, resid: np.ndarray, rstarts: np.ndarray,
                 rlens: np.ndarray, keep: np.ndarray) -> None:
    """Inverse of gather_gaps: place residue values into the gaps."""
    if len(rstarts) > _GAP_SLICE_MAX:
        out[np.flatnonzero(keep)] = resid
        return
    prev = 0
    pos = 0
    for s, l in zip(rstarts.tolist(), rlens.tolist()):
        if s > prev:
            out[prev:s] = resid[pos : pos + (s - prev)]
            pos += s - prev
        prev = s + l
    if prev < len(out):
        out[prev:] = resid[pos:]


class RunEsc:
    """Run extraction in front of EscBytes (`resc`).

    The zstd topper's LZ stage codes a length-136 run as a match at
    ~2 bits/token; extracting runs >= MINRUN first and coding the
    residue as an esc stream lets the FSE entropy stage model the
    residue's i.i.d. distribution without match interference — measured
    0.9056 vs 0.9113 B/token for esc alone on the F1b bench corpus,
    within 1% of that corpus's order-0+runs entropy floor (0.896,
    BASELINE.md round 2).  Runs are (start-delta, length, value)
    streams, each esc-coded; the residue is everything else in order.
    """

    name = "resc"
    kind = "int"
    MINRUN = 8

    def __init__(self):
        self._esc = EscBytes()

    @staticmethod
    def _find_runs(values: np.ndarray, minrun: int):
        """Long-run (starts, lens, keep-mask); keep is None when there
        are no long runs so callers skip the residue gather entirely.

        Detects ONLY runs >= minrun via a cumsum sliding window over the
        equal-to-next mask (a window of minrun-1 consecutive equals is a
        hit; hits merge into maximal runs), instead of enumerating every
        run — a zipf stream has ~0.9 runs per value, so the old
        all-runs path built 3.7M-element starts/lens arrays and a
        17 ms np.repeat to find 59 long runs (round-2 verdict #8;
        4M-value chunk: 45 ms -> ~13 ms)."""
        n = len(values)
        empty = np.zeros(0, dtype=np.int64)
        if n < minrun:
            return empty, empty, None
        eq = values[1:] == values[:-1]
        c = np.empty(n, dtype=np.int64)
        c[0] = 0
        np.cumsum(eq, dtype=np.int64, out=c[1:])
        k = minrun - 1
        hits = np.flatnonzero(c[k:] - c[:-k] == k)  # values[i..i+k] all equal
        if len(hits) == 0:
            return empty, empty, None
        brk = np.flatnonzero(np.diff(hits) > 1)
        firsts = hits[np.concatenate(([0], brk + 1))]
        lasts = hits[np.concatenate((brk, [len(hits) - 1]))]
        rstarts = firsts.astype(np.int64)
        rlens = (lasts - firsts + minrun).astype(np.int64)
        total_run = int(rlens.sum())
        offs = np.repeat(np.cumsum(rlens) - rlens, rlens)
        run_idx = np.arange(total_run, dtype=np.int64) - offs + np.repeat(rstarts, rlens)
        keep = np.ones(n, dtype=bool)
        keep[run_idx] = False
        return rstarts, rlens, keep

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        _, rlens, keep = self._find_runs(sample, self.MINRUN)
        resid = sample if keep is None else sample[keep]
        return self._esc.estimate(resid) + 6.0 * len(rlens) + 24.0

    def encode(self, values: np.ndarray):
        # native dtype end-to-end: EscBytes and the run streams handle
        # int32 without the int64 upcast pass
        v = np.ascontiguousarray(values)
        rstarts, rlens, keep = self._find_runs(v, self.MINRUN)
        resid = v if keep is None else gather_gaps(v, rstarts, rlens, keep)
        pr, br = self._esc.encode(resid)
        # run starts are increasing: delta-code before esc
        pp, bp = self._esc.encode(np.diff(np.concatenate(([0], rstarts))))
        pl, bl = self._esc.encode(rlens.astype(np.int64))
        pv, bv = self._esc.encode(v[rstarts] if len(rstarts) else np.zeros(0, dtype=np.int64))
        params = {
            "nr": int(len(rstarts)),
            "nres": int(len(resid)),
            "r": pr, "p": pp, "l": pl, "v": pv,
            "sz": [len(br), len(bp), len(bl)],
        }
        return params, br + bp + bl + bv

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        nr, nres = params["nr"], params["nres"]
        s0, s1, s2 = params["sz"]
        o1, o2, o3 = s0, s0 + s1, s0 + s1 + s2
        resid = self._esc.decode(params["r"], payload[:o1], nres)
        if nr == 0:
            return resid
        rstarts = np.cumsum(self._esc.decode(params["p"], payload[o1:o2], nr))
        rlens = self._esc.decode(params["l"], payload[o2:o3], nr)
        rvals = self._esc.decode(params["v"], payload[o3:], nr)
        out = np.empty(n, dtype=np.int64)
        if len(rstarts) <= _GAP_SLICE_MAX:
            for s, l, rv in zip(rstarts.tolist(), rlens.tolist(), rvals.tolist()):
                out[s : s + l] = rv
            scatter_gaps(out, resid, rstarts, rlens, None)
        else:
            keep = np.ones(n, dtype=bool)
            total_run = int(rlens.sum())
            offs = np.repeat(np.cumsum(rlens) - rlens, rlens)
            run_idx = np.arange(total_run, dtype=np.int64) - offs + np.repeat(rstarts, rlens)
            keep[run_idx] = False
            out[run_idx] = np.repeat(rvals, rlens)
            out[np.flatnonzero(keep)] = resid
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
            return np.zeros(0, dtype=np.int64), np.array([], dtype=np.int64)
        starts = np.concatenate(([0], np.flatnonzero(values[1:] != values[:-1]) + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        return values[starts].astype(np.int64), lens.astype(np.int64)

    def estimate(self, sample: np.ndarray) -> float:
        vals, lens = self._runs(sample)
        if len(vals) == 0:
            return 0.0
        return self._for.estimate(vals) + self._for.estimate(lens) + 16.0

    def encode(self, values: np.ndarray):
        vals, lens = self._runs(np.ascontiguousarray(values))
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


# ------------------------------------------------- dict(int), byte-aligned


class DictZ:
    """Dictionary with BYTE-ALIGNED indices (8/16/32 bit), designed to
    compose with the wrapper's zstd topper: aligning symbols to bytes
    lets zstd's FSE entropy-code skewed distributions below the
    bit-packed width (e.g. zipf over 31 symbols: ~4.2 bits real entropy
    vs 5-bit packing).  The estimator uses sample order-0 entropy plus
    a 12% safety margin so it only wins when entropy clearly beats the
    packed width."""

    name = "dictz"
    kind = "int"

    def __init__(self):
        self._for = ForBitpack()

    @staticmethod
    def _index_dtype(nd: int):
        if nd <= 1 << 8:
            return np.uint8
        if nd <= 1 << 16:
            return np.uint16
        return np.uint32

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        uniq, counts = np.unique(sample, return_counts=True)
        p = counts / counts.sum()
        entropy = float(-(p * np.log2(p)).sum())
        return len(sample) * entropy / 8.0 * 1.12 + self._for.estimate(uniq) + 64.0

    def encode(self, values: np.ndarray):
        values = np.ascontiguousarray(values)
        # probe distinct count on a slice to pick the index width, then
        # gather indices at that width directly (single pass)
        nd_probe = len(np.unique(values[: 1 << 16]))
        dt = self._index_dtype(max(1, nd_probe * 4))
        uniq, inv = DictInt._unique_inverse(values, index_dtype=dt)
        real_dt = self._index_dtype(max(1, len(uniq)))
        if np.dtype(real_dt).itemsize > np.dtype(dt).itemsize:
            # probe under-estimated distinct count: codes built at the
            # narrow width have wrapped — rebuild at the correct width
            # (narrowing astype would keep the wrapped values)
            uniq, inv = DictInt._unique_inverse(values, index_dtype=real_dt)
        elif real_dt != dt:
            inv = inv.astype(real_dt)
        pd_, bd = self._for.encode(uniq)
        params = {"nd": len(uniq), "d": pd_, "dlen": len(bd)}
        return params, bd + inv.tobytes()

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        nd = params["nd"]
        uniq = self._for.decode(params["d"], payload[: params["dlen"]], nd)
        inv = np.frombuffer(
            payload, dtype=self._index_dtype(max(1, nd)), count=n, offset=params["dlen"]
        ).astype(np.int64)
        if nd == 0:
            return np.zeros(0, dtype=np.int64)
        return uniq[inv]


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
        # sample-distinct underestimates full-column distinct; pad the
        # index width by one bit so dict only wins when it clearly wins
        w = min(64, bit_width(len(uniq) - 1) + 1)
        return len(sample) * w / 8.0 + self._for.estimate(uniq) + 16.0

    @staticmethod
    def _unique_inverse(values: np.ndarray, index_dtype=np.int64, return_counts=False):
        """np.unique(return_inverse) but O(n + range) via bincount when
        the value range is small (the common case for token columns) —
        sort-based unique was the encode hot spot.  ``index_dtype``
        lets the caller get byte-width indices from a single gather
        (no extra astype pass — this box is memory-bandwidth-bound)."""
        if len(values) == 0:
            z = np.zeros(0, dtype=np.int64), np.zeros(0, dtype=index_dtype)
            return (*z, np.zeros(0, dtype=np.int64)) if return_counts else z
        mn, mx = int(values.min()), int(values.max())
        rng = mx - mn + 1
        bound = max(1 << 22, 4 * len(values))
        if 0 < rng <= bound:
            if 0 <= mn and mx + 1 <= bound:
                # no subtraction pass; bincount accepts any int dtype
                counts = np.bincount(values, minlength=mx + 1)
                present = counts > 0
                code = (np.cumsum(present) - 1).astype(index_dtype)
                uniq = np.flatnonzero(present)
                if return_counts:
                    return uniq.astype(np.int64), code[values], counts[present]
                return uniq.astype(np.int64), code[values]
            shifted = values.astype(np.int64) - mn
            counts = np.bincount(shifted, minlength=rng)
            present = counts > 0
            code = (np.cumsum(present) - 1).astype(index_dtype)
            uniq = np.flatnonzero(present) + mn
            if return_counts:
                return uniq.astype(np.int64), code[shifted], counts[present]
            return uniq.astype(np.int64), code[shifted]
        uniq, inv, counts = np.unique(values, return_inverse=True, return_counts=True)
        if return_counts:
            return uniq.astype(np.int64), inv.astype(index_dtype, copy=False), counts
        return uniq.astype(np.int64), inv.astype(index_dtype, copy=False)

    def encode(self, values: np.ndarray):
        values = np.ascontiguousarray(values)
        uniq, inv = self._unique_inverse(values)
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


# --------------------------------------------------------- delta-zigzag


class DeltaZigzag:
    """Delta + zigzag in front of EscBytes (`dz`) for sorted or
    near-sorted int columns (sequential ids, timestamps, offsets).

    Consecutive deltas of such columns are tiny signed ints; zigzag
    folds them to small non-negatives so the esc stream is ~1 byte per
    value with near-constant content — which the zstd topper then
    collapses by orders of magnitude (a regular-cadence timestamp
    column becomes a few hundred bytes regardless of length).  All
    arithmetic is two's-complement-wrapping on the uint64 views, so the
    transform is a bijection on any int64 input (unsorted data simply
    produces large zigzags and loses the auto-selection trial to esc —
    selection stays size-driven, SURVEY §2.2 E4).
    """

    name = "dz"
    kind = "int"

    def __init__(self):
        self._esc = EscBytes()

    @staticmethod
    def _fwd(values: np.ndarray) -> tuple[int, np.ndarray]:
        v = np.ascontiguousarray(values).astype(np.int64, copy=False)
        if len(v) == 0:
            return 0, v
        u = v.view(np.uint64)
        with np.errstate(over="ignore"):
            d = np.empty_like(u)
            d[0] = 0
            np.subtract(u[1:], u[:-1], out=d[1:])  # wrapping delta
            s = d.view(np.int64)
            zz = (s << np.int64(1)) ^ (s >> np.int64(63))
        return int(v[0]), zz

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        _, zz = self._fwd(sample)
        return self._esc.estimate(zz)

    def encode(self, values: np.ndarray):
        base, zz = self._fwd(values)
        ip, ipay = self._esc.encode(zz)
        return {"base": base, "i": ip}, ipay

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        zz = self._esc.decode(params["i"], payload, n)
        with np.errstate(over="ignore"):
            d = (zz.view(np.uint64) >> np.uint64(1)).view(np.int64) ^ -(zz & np.int64(1))
            out = np.cumsum(d.view(np.uint64), dtype=np.uint64)
            out += np.uint64(np.int64(params["base"]).astype(np.uint64))
        return out.view(np.int64)
