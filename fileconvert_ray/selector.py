"""Codec auto-selector (SURVEY.md §2.2 E4).

The generalization of the reference's sample-based schema inference
(SURVEY §2.1 R5 — narrow a candidate set from evidence in a sample):
sample <=4096 values of a column chunk with a deterministic stride,
run each registered codec's cheap analytic size estimator, pick the
argmin.  The wrapper in ``codecs/__init__.py`` re-checks the real
encoded size against plain and falls back, so an estimator lie can
cost speed but never size (hard part (d) in SURVEY §7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SAMPLE_N = 4096


def _sample_int(values: np.ndarray) -> np.ndarray:
    n = len(values)
    if n <= SAMPLE_N:
        return values
    # contiguous runs matter for RLE: sample a few contiguous windows
    # rather than a stride (a stride destroys run structure).
    k = 8
    win = SAMPLE_N // k
    starts = (np.arange(k) * (n - win) // max(1, k - 1)).astype(np.int64)
    return np.concatenate([values[s : s + win] for s in starts])


def _sample_str(arr: pa.Array) -> pa.Array:
    n = len(arr)
    if n <= SAMPLE_N:
        return arr
    k = 8
    win = SAMPLE_N // k
    starts = [int(i * (n - win) / max(1, k - 1)) for i in range(k)]
    return pa.concat_arrays([arr.slice(s, win) for s in starts])


def select(values, kind: str, candidates: list[str] | None = None, zstd: bool = True) -> str:
    """Return the codec name with the smallest MEASURED encoded size on
    the sample: each candidate really encodes the <=4096-value sample
    and, when the zstd topper is on, the payload is really compressed —
    analytic estimates can't rank byte-aligned codecs (esc, dictz)
    against bit-packed ones because only the former gain from the
    topper's entropy stage.  Cost is microseconds and is amortized by
    the per-(source, column) choice cache in the encode actors."""
    import json

    from .codecs import INT_CODECS, STR_CODECS

    if not zstd:
        candidates = [
            c for c in (candidates or ["plain", "for_bitpack", "rle", "dict", "fsst", "esc"])
        ]
    if kind == "int":
        sample = _sample_int(np.ascontiguousarray(values, dtype=np.int64))
        table = INT_CODECS
    else:
        sample = _sample_str(values if isinstance(values, pa.Array) else pa.array(values))
        table = STR_CODECS
    if len(sample) == 0:
        return "plain"
    best, best_size = "plain", float("inf")
    for name, codec in table.items():
        if candidates is not None and name not in candidates:
            continue
        try:
            cparams, payload = codec.encode(sample)
            size = float(len(payload) + len(json.dumps(cparams)))
            if zstd and len(payload) > 64:
                z = pa.compress(payload, codec="zstd", asbytes=True)
                size = min(size, float(len(z) + len(json.dumps(cparams))))
        except Exception:
            continue
        if size < best_size:
            best, best_size = name, size
    return best
