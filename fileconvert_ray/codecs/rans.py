"""Static order-0 rANS over the full (dict-mapped) value alphabet.

Why: the `esc` byte decomposition costs ~1% of entropy (splitting a
token id into escape-byte + plane bytes and coding each stream order-0
loses the cross-stream correlation), and zstd's FSE stage quantizes
probabilities per 128 KiB block.  Coding the ids DIRECTLY against one
exact order-0 table closes both gaps — on the F1b bench corpus the
order-0+runs floor is 0.896 B/token (BASELINE.md round 2) and this
codec (wrapped in run extraction, `rrans`) lands within ~1% of it.

Public-knowledge algorithm (Duda 2013, arXiv:1311.2540; layout follows
the widely-published 64-bit/32-bit-renorm "rans64" construction):

  encode symbol s:  x' = (x // f_s) << P | (x % f_s) + c_s
  decode:           slot = x & (2^P-1); s = sym[slot]
                    x = f_s * (x >> P) + slot - c_s
  states live in [2^32, 2^64); renormalization moves 32-bit words, and
  b = 2^32 >= 2^P guarantees at most one renorm per symbol.

Vectorization: L interleaved lanes (lane l owns the strided positions
l, l+L, l+2L, ... so each step touches one contiguous slice — no
transpose copies), all lanes stepped together with numpy — the
per-symbol serial dependence is per-lane, so each of the m = ceil(n/L)
steps is a handful of kernels over L-element arrays.  Per-lane word
streams are stored lane-major with per-lane counts, so decode pops
each lane's words with an independent pointer — no cross-lane ordering
subtleties.  Tail lanes are padded with symbol 0 (cost: <= L-1 extra
symbols, microscopic) so every lane runs exactly m steps.
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_width
from .intcodecs import DictInt, ForBitpack

_B32 = np.uint64(32)
_LOW32 = np.uint64(0xFFFFFFFF)
_STATE_MIN = 1 << 32
MAX_DISTINCT = 1 << 18


def quantize_freqs(counts: np.ndarray, P: int) -> np.ndarray:
    """Scale counts to sum exactly 2^P with every present symbol >= 1."""
    total = int(counts.sum())
    target = 1 << P
    scaled = np.maximum(1, (counts.astype(np.float64) * target / total).astype(np.int64))
    excess = int(scaled.sum()) - target
    if excess > 0:
        # shave from the largest entries (most slack, least KL damage)
        order = np.argsort(-scaled)
        for i in order:
            if excess <= 0:
                break
            take = min(excess, int(scaled[i]) - max(1, int(scaled[i]) // 2))
            scaled[i] -= take
            excess -= take
        if excess > 0:  # pathological: shave all the way down to 1
            for i in order:
                if excess <= 0:
                    break
                take = min(excess, int(scaled[i]) - 1)
                scaled[i] -= take
                excess -= take
    elif excess < 0:
        scaled[int(np.argmax(scaled))] += -excess
    assert int(scaled.sum()) == target and int(scaled.min()) >= 1
    return scaled.astype(np.uint64)


class Rans:
    """Registry codec: int64 values -> dict map -> interleaved rANS."""

    name = "rans"
    kind = "int"
    LANES = 4096

    def __init__(self):
        from .intcodecs import RunEsc

        self._for = ForBitpack()
        self._resc = RunEsc()  # compacts the dict-diff and freq streams

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        uniq, counts = np.unique(sample, return_counts=True)
        if len(uniq) > MAX_DISTINCT:
            return float("inf")
        p = counts / counts.sum()
        entropy = float(-(p * np.log2(p)).sum())
        # entropy + freq table + dict + per-lane state overhead
        return len(sample) * entropy / 8.0 + 2.5 * len(uniq) + 64.0

    def encode(self, values: np.ndarray):
        # native dtype in; ids in int32 (D <= 2^18 << 2^31) — halves the
        # per-step gather traffic in the lane loop
        v = np.ascontiguousarray(values)
        if v.dtype.kind not in "iu":
            v = v.astype(np.int64)
        n = len(v)
        if n == 0:
            return {"n": 0, "D": 0}, b""
        uniq, ids, counts = DictInt._unique_inverse(
            v, index_dtype=np.int32, return_counts=True
        )
        D = len(uniq)
        # sorted uniq -> delta-code (diffs are overwhelmingly 1 for dense
        # id alphabets; RunEsc turns those runs into a few bytes)
        pd_, bd = self._resc.encode(np.diff(np.concatenate(([0], uniq))))
        if D > MAX_DISTINCT:
            raise ValueError(f"rans: {D} distinct values exceeds {MAX_DISTINCT}")
        if D == 1:
            return {"n": n, "D": 1, "d": pd_, "dlen": len(bd)}, bd
        P = min(20, max(12, bit_width(D - 1) + 4))
        freq = quantize_freqs(counts, P)
        cum = np.zeros(D, dtype=np.uint64)
        np.cumsum(freq[:-1], out=cum[1:])

        # cap lanes so m >= 64: per-lane state/count overhead then stays
        # <=0.2 B/value even on selector-sized samples, and the fixed
        # cost the selector's linear projection sees is honest.
        # Lane l owns the STRIDED positions l, l+L, l+2L, ... — step j
        # then reads/writes the contiguous slice [j*L, (j+1)*L), so
        # neither encode nor decode pays a transpose copy.
        L = max(1, min(self.LANES, n // 64))
        m = -(-n // L)
        ids_pad = np.zeros(L * m, dtype=np.int32)
        ids_pad[:n] = ids

        x = np.full(L, _STATE_MIN, dtype=np.uint64)
        words = np.empty((m, L), dtype=np.uint64)  # full states; low 32 taken at assembly
        emitted = np.empty((m, L), dtype=bool)
        shift = np.uint64(64 - P)
        Pu = np.uint64(P)
        five = np.uint64(5)
        with np.errstate(over="ignore"):
            for j in range(m - 1, -1, -1):
                s = ids_pad[j * L : (j + 1) * L]
                f = freq[s]
                c = cum[s]
                renorm = x >= (f << shift)
                words[j] = x
                emitted[j] = renorm
                # branchless renorm: shift by 32*renorm in place (no
                # np.where allocation on the hot path)
                x >>= renorm.astype(np.uint64) << five
                q, r = np.divmod(x, f)
                x = (q << Pu) + r + c
        # step-major assembly: one contiguous boolean extraction gives
        # blocks in ascending j, lanes ascending within a block — the
        # exact order decode consumes with a single forward pointer
        # (the per-lane-pointer layout needed a transpose copy here and
        # a gather per decode step)
        stream = (words[emitted] & _LOW32).astype(np.uint32)
        pf, freq_b = self._resc.encode(freq.astype(np.int64))
        states_b = x.tobytes()
        stream_b = stream.tobytes()
        params = {
            "n": n, "D": D, "P": P, "L": L, "m": m,
            "d": pd_, "dlen": len(bd), "f": pf,
            "sz": [len(freq_b), len(states_b)],
        }
        return params, bd + freq_b + states_b + stream_b

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        if params.get("n", 0) == 0 or n == 0:
            return np.zeros(0, dtype=np.int64)
        D = params["D"]
        uniq = np.cumsum(self._resc.decode(params["d"], payload[: params["dlen"]], D))
        if D == 1:
            return np.full(n, uniq[0], dtype=np.int64)
        P, L, m = params["P"], params["L"], params["m"]
        fsz, ssz = params["sz"]
        off = params["dlen"]
        freq = self._resc.decode(params["f"], payload[off : off + fsz], D).astype(np.uint64)
        off += fsz
        x = np.frombuffer(payload, dtype=np.uint64, count=L, offset=off).copy()
        off += ssz
        stream = np.frombuffer(payload, dtype=np.uint32, offset=off)

        cum = np.zeros(D, dtype=np.uint64)
        np.cumsum(freq[:-1], out=cum[1:])
        # one packed slot table instead of three (slot2sym, freq, cum):
        # sym in bits [42,60), freq in [21,42), cum in [0,21) — P <= 20
        # so freq <= 2^20 and cum < 2^20 both fit 21 bits, D <= 2^18
        # fits 18.  ONE gather per decode step instead of three.
        reps = freq.astype(np.int64)
        packed = (
            (np.repeat(np.arange(D, dtype=np.uint64), reps) << np.uint64(42))
            | (np.repeat(freq, reps) << np.uint64(21))
            | np.repeat(cum, reps)
        )
        # strided-lane layout (see encode): step j decodes the contiguous
        # slice [j*L, (j+1)*L) directly into the output — no transpose.
        # Renorm words arrive in step-major blocks, so ONE forward scalar
        # pointer replaces the per-lane pointer array + its gathers.
        out = np.empty(m * L, dtype=np.int32)
        mask = np.uint64((1 << P) - 1)
        m21 = np.uint64((1 << 21) - 1)
        Pu = np.uint64(P)
        state_min = np.uint64(_STATE_MIN)
        p = 0
        with np.errstate(over="ignore"):
            for j in range(m):
                slot = (x & mask).astype(np.int64)  # intp index: no per-gather cast
                pv = packed[slot]
                out[j * L : (j + 1) * L] = (pv >> np.uint64(42)).astype(np.int32)
                x = ((pv >> np.uint64(21)) & m21) * (x >> Pu) + slot.astype(np.uint64) - (
                    pv & m21
                )
                renorm = x < state_min
                cnt = int(renorm.sum())
                if cnt:
                    w = stream[p : p + cnt]
                    x[renorm] = (x[renorm] << _B32) | w.astype(np.uint64)
                    p += cnt
        return uniq[out[:n]]


class RunRans:
    """`rrans` — run extraction (RunEsc's splitter) + rANS residue.

    The homes-in-on-the-floor combination for token streams: runs cost
    ~5 bytes each, the i.i.d. residue is coded against its exact
    order-0 table."""

    name = "rrans"
    kind = "int"

    def __init__(self):
        from .intcodecs import EscBytes, RunEsc

        self._runesc = RunEsc()
        self._rans = Rans()
        self._esc = EscBytes()

    def estimate(self, sample: np.ndarray) -> float:
        if len(sample) == 0:
            return 0.0
        _, rlens, keep = self._runesc._find_runs(sample, self._runesc.MINRUN)
        resid = sample if keep is None else sample[keep]
        return self._rans.estimate(resid) + 6.0 * len(rlens) + 24.0

    def encode(self, values: np.ndarray):
        v = np.ascontiguousarray(values).astype(np.int64, copy=False)
        rstarts, rlens, keep = self._runesc._find_runs(v, self._runesc.MINRUN)
        from .intcodecs import gather_gaps
        resid = v if keep is None else gather_gaps(v, rstarts, rlens, keep)
        pr, br = self._rans.encode(resid)
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
        resid = self._rans.decode(params["r"], payload[:o1], nres)
        if nr == 0:
            return resid
        rstarts = np.cumsum(self._esc.decode(params["p"], payload[o1:o2], nr))
        rlens = self._esc.decode(params["l"], payload[o2:o3], nr)
        rvals = self._esc.decode(params["v"], payload[o3:], nr)
        out = np.empty(n, dtype=np.int64)
        keep = np.ones(n, dtype=bool)
        total_run = int(rlens.sum())
        offs = np.repeat(np.cumsum(rlens) - rlens, rlens)
        run_idx = np.arange(total_run, dtype=np.int64) - offs + np.repeat(rstarts, rlens)
        keep[run_idx] = False
        out[run_idx] = np.repeat(rvals, rlens)
        from .intcodecs import scatter_gaps
        scatter_gaps(out, resid, rstarts, rlens, keep)
        return out
