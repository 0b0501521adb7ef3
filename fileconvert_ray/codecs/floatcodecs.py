"""ALP-style float codec (kind="fixed").

Adaptive Lossless floating-Point: most "double" columns in analytic
tables are decimals in disguise (prices, discounts, rates stored as
the nearest float64 to d/10^e).  For those, v == int64(round(v*10^e))
is a lossless integer view, and the integer stream compresses with
the existing frame-of-reference bit-packer far below any byte-level
scheme.  Values the integer view cannot reproduce bit-exactly (NaN,
inf, -0.0, genuinely continuous values) are stored as positional
exceptions with their raw IEEE bytes, so the round-trip is ALWAYS
bit-identical regardless of how decimal-like the column really is.

Public algorithm: Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point Compression", SIGMOD 2024 (this is a from-scratch
vectorized reimplementation of the published idea, single-exponent
variant, delegating integer packing to our ForBitpack).

The codec DECLINES (raises CodecError) when a sample shows the column
is not decimal-like (< 70% exact), so the measured-size selector in
``selector.py`` silently skips it and `plane`/`plain` win as before.

Fixed-kind contract (see codecs/__init__.py): encode receives the
column as a C-contiguous ``uint8`` array of shape (n, w) holding the
raw little-endian value bytes; decode must return the same layout.
Only w=8 (float64) and w=4 (float32) are supported — decimal128
(w=16) and float16 (w=2, routed via the int16 path when nullable)
decline.
"""

from __future__ import annotations

import numpy as np

from .base import CodecError, b64d, b64e
from .intcodecs import ForBitpack

# |int| bound keeping FOR deltas (max-min) inside int64 with headroom
_MAX_ABS = float(1 << 51)
# decimal exponents tried; 10^e exact in float64 through e=22, int64
# digits cap the useful range at 18
_EXPS = tuple(range(0, 19))
_SAMPLE_N = 4096


def _float_view(data: np.ndarray, allow_f16: bool = False) -> tuple[np.ndarray, int]:
    if data.ndim != 2:
        raise CodecError("alp: expected (n, w) byte layout")
    w = data.shape[1]
    if w == 8:
        return data.reshape(-1).view("<f8"), w
    if w == 4:
        return data.reshape(-1).view("<f4"), w
    if w == 2 and allow_f16:
        # null-free float16 reaches the fixed path directly (nullable
        # f16 rides the int16 view, codecs/__init__.py)
        return data.reshape(-1).view("<f2"), w
    raise CodecError(f"alp: unsupported value width {w}")


def _exact_mask(v: np.ndarray, w: int, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(exact_mask, int64 digits) for exponent e — the check runs the
    SAME int64 -> float64 divide the decoder runs, so -0.0 and any
    double-rounding asymmetry land in the exception set, never in a
    silent mismatch."""
    p = 10.0 ** e
    f64 = v.astype(np.float64, copy=False)
    d = np.rint(f64 * p)
    safe = np.isfinite(d) & (np.abs(d) < _MAX_ABS)
    di = np.where(safe, d, 0.0).astype(np.int64)
    rec = di.astype(np.float64) / p
    if w == 4:
        rec32 = rec.astype(np.float32)
        exact = safe & (rec32.view(np.int32) == v.view(np.int32))
    else:
        exact = safe & (rec.view(np.int64) == v.view(np.int64))
    return exact, di


class AlpRd:
    """ALP-RD ("real doubles") — the paper's scheme for genuinely
    continuous floats where the decimal integer view fails: cut each
    IEEE word into a LEFT part (top L bits: sign + exponent + leading
    mantissa bits, few distinct patterns when magnitudes cluster) and
    a RIGHT part (the remaining mantissa bits, incompressible — packed
    raw).  Left patterns are dictionary-coded (2^c entries chosen by
    frequency on a sample); patterns outside the dictionary ride a
    positional-exception stream.  Pure bit split — no rounding — so
    the round-trip is bit-identical for every input including NaN/inf.

    On the synthetic embeddings table (float32, magnitudes < 1) this
    saves ~4-5 bits/value vs plain; zstd cannot reach those savings
    because they live below byte granularity."""

    name = "alp_rd"
    kind = "fixed"
    auto = True
    _MAX_L = 16
    _SAMPLE = 1 << 16

    def estimate(self, sample: np.ndarray) -> float:
        try:
            params, payload = self.encode(sample)
        except CodecError:
            return float("inf")
        return float(len(payload))

    def _plan(self, u: np.ndarray, width: int) -> tuple[int, int, np.ndarray]:
        """(L, code_bits, dict_keys) minimizing modeled bytes on a sample."""
        n = len(u)
        s = u if n <= self._SAMPLE else u[:: max(1, n // self._SAMPLE)]
        best = None
        for L in range(1, self._MAX_L + 1):
            left = s >> np.uint64(width - L)
            uniq, counts = np.unique(left, return_counts=True)
            order = np.argsort(counts)[::-1]
            for c in (1, 2, 3, 4, 5):
                keys = uniq[order[: 1 << c]]
                cov = counts[order[: 1 << c]].sum() / len(s)
                bytes_est = (
                    len(s) * (width - L + c) / 8.0
                    + (1.0 - cov) * len(s) * 6.0
                    + len(keys) * 8.0
                )
                if best is None or bytes_est < best[0]:
                    best = (bytes_est, L, c, np.sort(keys))
        bytes_est, L, c, keys = best
        if bytes_est >= len(s) * width / 8.0 * 0.98:
            raise CodecError("alp_rd: no win over plain on this column")
        return L, c, keys

    def encode(self, values: np.ndarray):
        data = np.ascontiguousarray(values)
        v, w = _float_view(data, allow_f16=True)
        width = w * 8
        n = len(v)
        if n == 0:
            return {"w": w, "L": 1, "c": 1, "d": "", "k": 0, "rl": 0, "cl": 0}, b""
        u = v.view({2: np.uint16, 4: np.uint32, 8: np.uint64}[w]).astype(np.uint64)
        L, c, keys = self._plan(u, width)
        shift = np.uint64(width - L)
        left = u >> shift
        right = u & np.uint64((1 << (width - L)) - 1)
        idx = np.searchsorted(keys, left)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx_c] == left
        codes = np.where(hit, idx_c, 0).astype(np.uint64)
        exc_idx = np.flatnonzero(~hit)
        from .bitpack import pack_bits

        right_pay = pack_bits(right, width - L)
        code_pay = pack_bits(codes, c)
        exc_pos = exc_idx.astype(np.uint32).tobytes()
        exc_left = left[exc_idx].astype(np.uint16).tobytes()
        params = {
            "w": w,
            "L": L,
            "c": c,
            "d": b64e(keys.astype(np.uint64).tobytes()),
            "k": int(len(exc_idx)),
            "rl": len(right_pay),
            "cl": len(code_pay),
        }
        return params, right_pay + code_pay + exc_pos + exc_left

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        w = int(params["w"])
        if n == 0:
            return np.empty((0, w), dtype=np.uint8)
        width = w * 8
        L, c, k = int(params["L"]), int(params["c"]), int(params["k"])
        rl, cl = int(params["rl"]), int(params["cl"])
        keys = np.frombuffer(b64d(params["d"]), dtype=np.uint64)
        from .bitpack import unpack_bits

        right = unpack_bits(payload[:rl], width - L, n)
        codes = unpack_bits(payload[rl : rl + cl], c, n)
        left = keys[np.clip(codes, 0, len(keys) - 1).astype(np.int64)]
        if k:
            pos = np.frombuffer(payload, dtype=np.uint32, count=k, offset=rl + cl)
            exc_left = np.frombuffer(
                payload, dtype=np.uint16, count=k, offset=rl + cl + 4 * k
            )
            left[pos.astype(np.int64)] = exc_left.astype(np.uint64)
        u = (left << np.uint64(width - L)) | right
        if w == 8:
            out = np.ascontiguousarray(u).view(np.uint8).reshape(n, 8)
        else:
            dt = {2: np.uint16, 4: np.uint32}[w]
            out = np.ascontiguousarray(u.astype(dt)).view(np.uint8).reshape(n, w)
        return out


class Alp:
    name = "alp"
    kind = "fixed"
    auto = True

    def __init__(self) -> None:
        self._fb = ForBitpack()

    def estimate(self, sample: np.ndarray) -> float:
        # the selector measures real encoded sizes; keep the analytic
        # path honest-but-cheap for API parity with the other codecs
        try:
            params, payload = self.encode(sample)
        except CodecError:
            return float("inf")
        return float(len(payload))

    def _pick_exponent(self, v: np.ndarray, w: int) -> int:
        n = len(v)
        if n > _SAMPLE_N:
            # head + middle + tail windows: cheap and representative
            k = _SAMPLE_N // 3
            s = np.concatenate([v[:k], v[(n - k) // 2 : (n - k) // 2 + k], v[-k:]])
        else:
            s = v
        best_e, best_score = -1, 0.0
        for e in _EXPS:
            exact, _ = _exact_mask(s, w, e)
            score = float(exact.mean()) if len(s) else 0.0
            if score > best_score + 1e-9:
                best_e, best_score = e, score
            if score > 0.999999:
                break  # smallest fully-exact exponent: smallest digits
        if best_score < 0.7:
            raise CodecError("alp: column is not decimal-like")
        return best_e

    def encode(self, values: np.ndarray):
        data = np.ascontiguousarray(values)
        v, w = _float_view(data)
        n = len(v)
        if n == 0:
            fbp, fbpay = self._fb.encode(np.empty(0, dtype=np.int64))
            return {"e": 0, "w": w, "fb": fbp, "fl": len(fbpay), "k": 0}, fbpay
        e = self._pick_exponent(v, w)
        exact, di = _exact_mask(v, w, e)
        exc_idx = np.flatnonzero(~exact)
        if len(exc_idx) > n // 4:
            raise CodecError("alp: too many exceptions on the full chunk")
        if len(exc_idx):
            # park exceptions on a common in-range value so they cost
            # ~nothing in the FOR miniblocks
            fill = di[exact][0] if exact.any() else np.int64(0)
            di[exc_idx] = fill
        fbp, fbpay = self._fb.encode(di)
        exc_pos = exc_idx.astype(np.uint32).tobytes()
        exc_raw = data[exc_idx].tobytes()
        params = {"e": int(e), "w": w, "fb": fbp, "fl": len(fbpay), "k": int(len(exc_idx))}
        return params, fbpay + exc_pos + exc_raw

    def decode(self, params: dict, payload: bytes, n: int) -> np.ndarray:
        w = int(params["w"])
        fl = int(params["fl"])
        k = int(params["k"])
        di = self._fb.decode(params["fb"], payload[:fl], n)
        p = 10.0 ** int(params["e"])
        rec = di.astype(np.float64) / p
        if w == 4:
            out = np.ascontiguousarray(rec.astype(np.float32)).view(np.uint8).reshape(n, 4)
        else:
            out = np.ascontiguousarray(rec).view(np.uint8).reshape(n, 8)
        if k:
            pos = np.frombuffer(payload, dtype=np.uint32, count=k, offset=fl).astype(np.int64)
            raw = np.frombuffer(
                payload, dtype=np.uint8, count=k * w, offset=fl + 4 * k
            ).reshape(k, w)
            out[pos] = raw
        return out
