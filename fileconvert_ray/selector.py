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
    """Return the codec name with the smallest estimated encoded size.

    ``zstd=False`` excludes codecs whose estimate assumes the zstd
    topper (dictz's byte-aligned indices only pay off under entropy
    coding)."""
    from .codecs import INT_CODECS, STR_CODECS

    if not zstd:
        candidates = [c for c in (candidates or ["plain", "for_bitpack", "rle", "dict", "fsst"])]
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
            est = float(codec.estimate(sample))
        except Exception:
            continue
        if est < best_size:
            best, best_size = name, est
    return best
