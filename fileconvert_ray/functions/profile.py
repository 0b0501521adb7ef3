"""Table profiler — per-column statistics as a Ray Data pipeline.

The schema-inspection sibling of the reference's inference surface
(SURVEY.md §2.1 R5): for every column of a parquet table report
row count, null count, EXACT distinct count, and min/max (numeric
columns as float64, string columns as strings).

Scale shape:
- Pass 1 (min/max/nulls) reduces each block to ONE row per column;
  the exchange is a groupby over O(columns) keys with O(blocks)
  rows per group — never row-level data.
- Pass 2 (exact distinct) emits each block's per-column distinct
  values once, canonicalized to strings (Arrow's float/temporal →
  string casts are injective, so string distinctness == value
  distinctness), then collapses them in a (column, value) groupby.
  The exchange moves O(Σ per-column distinct) — the inherent cost of
  exact DISTINCT in any engine; the HLL sketch path
  (functions/sketches.py) is the approximate alternative when the
  domain is unbounded.
- List/struct columns get rows/nulls only (distinct and min/max are
  not well-ordered there).

The driver never sees more than O(columns) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_parquet"]


def _is_numeric(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_boolean(t)
    )


def _is_string(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _num_view(col: pa.Array, t: pa.DataType) -> pa.Array:
    """Order-preserving float64 view of a numeric column (timestamps
    as epoch microseconds — the engine's temporal canonicalization).
    Used ONLY for the min/max report, whose output schema is float64:
    the cast is explicitly lossy (safe=False) so int64 values above
    2^53 report a rounded min/max instead of raising.  The exact
    distinct pass never comes through here (round-4 advice)."""
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        col = pc.cast(col, pa.int64())
    return pc.cast(col, pa.float64(), safe=False)


def profile_parquet(path: str, columns: list[str] | None = None):
    """Profile a parquet table; returns a pa.Table with one row per
    column: (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    schema = pq.read_schema(path)
    names = columns or list(schema.names)
    types = {n: schema.field(n).type for n in names}
    simple = [n for n in names if _is_numeric(types[n]) or _is_string(types[n])]

    ds = rd.read_parquet(path, columns=names)

    def block_stats(batch: pa.Table) -> pa.Table:
        rows = {
            "column": [], "n_rows": [], "n_nulls": [],
            "min_num": [], "max_num": [], "min_str": [], "max_str": [],
        }
        for n in names:
            col = batch.column(n)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = types[n]
            rows["column"].append(n)
            rows["n_rows"].append(batch.num_rows)
            rows["n_nulls"].append(int(pc.sum(pc.is_null(col)).as_py() or 0))
            mn = mx = None
            ms = xs = None
            if batch.num_rows > int(rows["n_nulls"][-1]) and _is_numeric(t):
                mm = pc.min_max(_num_view(col, t))
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            elif batch.num_rows > int(rows["n_nulls"][-1]) and _is_string(t):
                mm = pc.min_max(col)
                ms, xs = mm["min"].as_py(), mm["max"].as_py()
            rows["min_num"].append(mn)
            rows["max_num"].append(mx)
            rows["min_str"].append(ms)
            rows["max_str"].append(xs)
        return pa.Table.from_pydict(
            {
                "column": pa.array(rows["column"], type=pa.string()),
                "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
                "n_nulls": pa.array(rows["n_nulls"], type=pa.int64()),
                "min_num": pa.array(rows["min_num"], type=pa.float64()),
                "max_num": pa.array(rows["max_num"], type=pa.float64()),
                "min_str": pa.array(rows["min_str"], type=pa.string()),
                "max_str": pa.array(rows["max_str"], type=pa.string()),
            }
        )

    def col_rollup(group: pa.Table) -> pa.Table:
        name = group.column("column")[0].as_py()
        mn = pc.min(group.column("min_num")).as_py()
        mx = pc.max(group.column("max_num")).as_py()
        ms = pc.min(group.column("min_str")).as_py()
        xs = pc.max(group.column("max_str")).as_py()
        return pa.Table.from_pydict(
            {
                "column": pa.array([name], type=pa.string()),
                "n_rows": pa.array([int(pc.sum(group.column("n_rows")).as_py())]),
                "n_nulls": pa.array([int(pc.sum(group.column("n_nulls")).as_py())]),
                "min_num": pa.array([mn], type=pa.float64()),
                "max_num": pa.array([mx], type=pa.float64()),
                "min_str": pa.array([ms], type=pa.string()),
                "max_str": pa.array([xs], type=pa.string()),
            }
        )

    stats = (
        ds.map_batches(block_stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .map_groups(col_rollup, batch_format="pyarrow")
        .to_pandas()  # O(columns)
    )

    # pass 2: exact distinct over the orderable columns.  Integer-family
    # columns (ints, timestamps, dates, bools) canonicalize through
    # int64 -> string (injective at full 64-bit precision); ONLY real
    # floating columns go through float64 — routing ints through
    # float64 would collapse distinct values above 2^53 (round-4
    # advice), breaking the EXACT-distinct contract for id-like keys.
    def block_distinct(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for n in simple:
            col = batch.column(n)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = types[n]
            if pa.types.is_floating(t):
                col = pc.cast(col, pa.float64())
            elif _is_numeric(t):
                col = pc.cast(col, pa.int64())
            u = pc.unique(col.drop_null())
            s = pc.cast(u, pa.string()).to_pylist()
            cols.extend([n] * len(s))
            vals.extend(s)
        return pa.Table.from_pydict(
            {
                "column": pa.array(cols, type=pa.string()),
                "v": pa.array(vals, type=pa.string()),
                "one": pa.array(np.ones(len(cols), dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    pairs = (
        ds.map_batches(block_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["column", "v"])
        .aggregate(Sum("one", alias_name="one"))
    )

    def ones(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "column": batch.column("column"),
                "n_distinct": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    dist = (
        pairs.map_batches(ones, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .to_pandas()  # O(columns)
    )

    out = stats.merge(dist, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    out = out.sort_values("column", ignore_index=True)
    return pa.Table.from_pydict(
        {
            "column": pa.array(out["column"], type=pa.string()),
            "n_rows": pa.array(out["n_rows"].to_numpy(dtype=np.int64)),
            "n_nulls": pa.array(out["n_nulls"].to_numpy(dtype=np.int64)),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(dtype=np.int64)),
            "min_num": pa.array(out["min_num"], type=pa.float64()),
            "max_num": pa.array(out["max_num"], type=pa.float64()),
            "min_str": pa.array(out["min_str"], type=pa.string()),
            "max_str": pa.array(out["max_str"], type=pa.string()),
        }
    )
