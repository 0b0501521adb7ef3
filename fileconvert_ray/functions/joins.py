"""Custom join operators Ray Data lacks natively (brief: "when the
reference has an operator Ray Data lacks — as-of join, range join —
implement it as a composition of map_batches + groupby().map_groups +
sort if semantics allow").

As-of join: for every left row, the single right row with the largest
``on`` value <= the left row's ``on`` value, within the same ``by``
key (the classic "latest prior observation" join; DuckDB's ASOF JOIN
is the oracle).

Partitioning assumption (documented per the brief): both sides are
co-partitioned by the ``by`` key via one hash shuffle of (key, on,
projected columns) rows — O(left + right) tiny rows through the
exchange, never more than one group's rows in memory at once.  Within
a group the match is one ``np.searchsorted`` over the sorted right
side — no pairwise work.  Skewed ``by`` keys behave like any groupby
hot key: salt or pre-split upstream if one key dominates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left_ds, right_ds, *, by: str, on: str, right_cols: list[str],
              right_prefix: str = "r_"):
    """Backward as-of join (right.on <= left.on, latest wins), inner.

    Returns a Dataset with the left schema plus ``right_prefix + c``
    for each c in ``right_cols`` (+ ``right_prefix + on``).
    """
    left_schema_names: list[str] = []

    def tag_left(batch: pa.Table) -> pa.Table:
        return batch.append_column("_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = [by, on] + [c for c in right_cols if c not in (by, on)]
        batch = batch.select(cols)
        return batch.append_column("_side", pa.array(np.ones(batch.num_rows, dtype=np.int8)))

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    right_tagged = right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)

    # union needs one schema: pad each side with the other's columns as
    # nulls.  Schemas are known only at runtime, so pad lazily per batch
    # against the declared output layout.
    lschema = left_tagged.schema().base_schema
    rschema = right_tagged.schema().base_schema
    lnames = [n for n in lschema.names if n != "_side"]
    rnames = [n for n in rschema.names if n != "_side"]
    all_fields = [(n, lschema.field(n).type) for n in lnames]
    all_fields += [
        ("_r" + n, rschema.field(n).type) for n in rnames if True
    ]
    all_fields.append(("_side", pa.int8()))
    union_schema = pa.schema(all_fields)

    def pad(batch: pa.Table) -> pa.Table:
        is_left = batch.column("_side")[0].as_py() == 0 if batch.num_rows else True
        arrays = []
        for f in union_schema:
            if f.name == "_side":
                arrays.append(batch.column("_side"))
            elif f.name == by:
                # the groupby key must be populated on BOTH sides
                arrays.append(pc.cast(batch.column(by), f.type))
            elif f.name.startswith("_r"):
                src = f.name[2:]
                if not is_left and src in batch.column_names:
                    arrays.append(pc.cast(batch.column(src), f.type))
                else:
                    arrays.append(pa.nulls(batch.num_rows, f.type))
            else:
                if is_left and f.name in batch.column_names:
                    arrays.append(pc.cast(batch.column(f.name), f.type))
                else:
                    arrays.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    merged = left_tagged.map_batches(pad, batch_format="pyarrow").union(
        right_tagged.map_batches(pad, batch_format="pyarrow")
    )

    out_fields = [(n, lschema.field(n).type) for n in lnames]
    out_fields += [
        (right_prefix + n, rschema.field(n).type) for n in rnames if n != by
    ]
    out_schema = pa.schema(out_fields)

    def empty_out() -> pa.Table:
        return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)

    def join_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out()
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        if not lmask.any() or not rmask.any():
            return empty_out()
        lt = group.filter(pa.array(lmask))
        rt = group.filter(pa.array(rmask))
        r_on = pc.cast(rt.column("_r" + on), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(r_on, kind="stable")
        r_on = r_on[order]
        l_on = pc.cast(lt.column(on), pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(r_on, l_on, side="right") - 1
        keep = idx >= 0
        lt = lt.filter(pa.array(keep))
        take = pa.array(order[idx[keep]].astype(np.int64))
        arrays = [lt.column(n) for n in lnames]
        for n in rnames:
            if n == by:
                continue
            arrays.append(rt.column("_r" + n).take(take))
        return pa.Table.from_arrays(
            [pc.cast(a, f.type) for a, f in zip(arrays, out_schema)], schema=out_schema
        )

    return merged.groupby(by).map_groups(join_group, batch_format="pyarrow")
