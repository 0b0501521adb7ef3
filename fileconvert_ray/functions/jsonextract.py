"""Semi-structured (JSON string column) field extraction.

The engine treats JSON payload columns the way a 100-TB pipeline has
to: the overwhelmingly common flat shape is parsed by ONE vectorized
Arrow ``extract_regex`` kernel pass, and only the rows that fail the
strict pattern fall back to ``json.loads`` — so the Python-loop cost
is O(irregular rows), not O(rows).  The strict pattern anchors the
whole string (``^{"key": int}$``-style), so the fast path can never
mis-parse a nested / reordered / quoted payload: anything unusual is
a non-match and takes the exact parser.

SURVEY.md §2.2 E-rows context: this is the semi-structured sibling of
the R7 cast + R8 projection transforms (reference parity: column
extraction expressed over a JSON-typed column instead of a native
one).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["json_int_field", "extract_json_int"]


def json_int_field(col, key: str) -> pa.Array:
    """Extract ``key`` from a flat-JSON string column as int64.

    Returns an int64 array with a null wherever the input is null or
    the key is absent / non-integer.  Fast path: one anchored
    ``extract_regex`` over the whole column (matches ``{"key": N}``
    with any whitespace and any OTHER keys around it, as long as the
    match is unambiguous — the pattern requires the key to appear as a
    real member boundary).  Every non-matching row is re-parsed with
    ``json.loads`` so irregular payloads (nested objects, reordered
    escapes, floats) are handled exactly, never silently wrong.

    Values stay in int64 end to end — never round-tripped through
    float64, so |v| > 2^53 is exact (round-4 advice).  An integer that
    does not fit int64 at all is reported as null (out of the output
    type's representable range), on both the fast and fallback paths:
    fast-path matches longer than 18 digits are demoted to the exact
    parser rather than risking a cast error.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # Anchored flat-object pattern with NO string-typed values: every
    # member is "name": <number|true|false|null>.  With no string
    # values there is no embedded-quote text for the key pattern to
    # false-positive inside (`{"s": "\"k\":5,", "k": 7}` does NOT
    # match and takes the exact parser), and RE2 needs no lookarounds.
    k = re.escape(key)
    member = r'"[^"\\]+"\s*:\s*(?:-?[0-9][0-9.eE+\-]*|true|false|null)'
    pat = (
        r"^\{\s*(?:" + member + r"\s*,\s*)*"
        + r'"' + k + r'"\s*:\s*(?P<v>-?\d+)'
        + r"\s*(?:,\s*" + member + r")*\s*\}$"
    )
    m = pc.extract_regex(pc.fill_null(col, ""), pat)
    v = pc.struct_field(m, "v")
    # any <=18-char match ("-" + 17 digits / 18 digits) surely fits
    # int64; longer matches (19+ digits, possibly > 2^63) take the
    # fallback so the vectorized cast below can never raise
    v = pc.if_else(pc.less_equal(pc.utf8_length(v), 18), v, pa.scalar(None, pa.string()))
    v64 = pc.cast(v, pa.int64())
    out = pc.fill_null(v64, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=True)
    valid = pc.is_valid(v64).to_numpy(zero_copy_only=False).copy()

    miss = np.flatnonzero(~valid)
    if miss.size:
        raw = col.take(pa.array(miss.astype(np.int64))).to_pylist()
        for i, s in zip(miss, raw):
            if s is None:
                continue
            try:
                val = json.loads(s).get(key)
            except (ValueError, AttributeError):
                continue
            if isinstance(val, bool) or not isinstance(val, int):
                continue
            if not (-(1 << 63) <= val < (1 << 63)):
                continue  # unrepresentable in the int64 output -> null
            out[i] = val
            valid[i] = True
    return pa.Array.from_pandas(out, mask=~valid, type=pa.int64())


def extract_json_int(ds, column: str, key: str, out_col: str):
    """Dataset-level projection: append ``out_col`` = int64 ``key``
    extracted from the JSON string ``column``.  One zero-copy
    map_batches pass; the kernel is vectorized per the module note."""

    def ext(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, json_int_field(batch.column(column), key))

    return ds.map_batches(ext, batch_format="pyarrow", zero_copy_batch=True)
