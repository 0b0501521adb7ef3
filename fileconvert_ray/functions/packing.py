"""Sequence packing — concatenate tokenized documents in a global
deterministic order and re-chunk into fixed-length training sequences
(the standard "pack to 2048/4096-token rows" step in front of LLM
training).  SURVEY.md §2 extension; no reference analogue (FileConvert
is a converter — this is a training-data-pipeline operator the brief
asks for beyond the reference).

Scale shape
-----------
Packing is a global prefix-sum, not a global sort:

1. **Range bucketing** — docs are split into ``n_buckets`` contiguous
   ranges of the integer order key (min/max from a column-pruned stats
   pass; O(batches) rows to the driver).
2. **Token prefix sums** — a second pruned pass sums ``n_tok`` per
   bucket; the driver cumsums the O(n_buckets) totals into per-bucket
   base offsets.  No token ever moves for this.
3. **Fragment emit** — ``groupby(bucket)`` co-partitions each range;
   inside a group the docs are sorted by the order key, token global
   positions are one vectorized cumsum, and each CONTIGUOUS run of the
   flat token stream belonging to one output chunk becomes a fragment
   row ``(chunk_id, cpos, frag:list<int32>)``.  A doc emits at most
   ``n_tok/seq_len + 1`` fragments; every token crosses the exchange
   exactly once (same cost as any repartition — there is no cheaper
   way to materialize packed rows).
4. **Assembly** — ``groupby(chunk_id)`` concatenates each chunk's (at
   most ``n_buckets + docs_in_chunk``) fragments in ``cpos`` order.

Driver memory is O(n_buckets); worker memory is O(bucket tokens),
bounded by the range split.  Skew note: bucket ranges are uniform in
the KEY space, not the token mass — a pathological id distribution
concentrates mass in one bucket; at scale the stats pass's per-bucket
totals are exactly the signal to re-split (same bucket-plan idea as
stages/partition.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FRAG_SCHEMA = pa.schema(
    [("chunk_id", pa.int64()), ("cpos", pa.int64()), ("frag", pa.list_(pa.int32()))]
)
# boundaries=True: fragments / chunks additionally carry the within-chunk
# offsets at which a (non-empty) document STARTS — the attention-reset
# positions a trainer needs so packed rows don't attend across documents.
FRAG_B_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.int64()),
        ("cpos", pa.int64()),
        ("frag", pa.list_(pa.int32())),
        ("bnd", pa.list_(pa.int32())),
    ]
)
PACKED_SCHEMA = pa.schema(
    [("chunk_id", pa.int64()), ("tokens", pa.list_(pa.int32())), ("n_tok", pa.int64())]
)
PACKED_B_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.int64()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int64()),
        ("doc_starts", pa.list_(pa.int32())),
    ]
)


def _flat_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 values, per-row lengths) of a list<int32> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat, lens


def pack_sequences(ds, *, seq_len: int, order_col: str = "doc_id",
                   tokens_col: str = "tokens", n_tok_col: str = "n_tok",
                   n_buckets: int = 16, boundaries: bool = False):
    """Pack ``ds``'s token lists into fixed-length rows.

    ``order_col`` must be an integer column: the global concatenation
    order is ascending ``order_col`` (ties are not allowed — ids are
    unique by contract).  Returns a Dataset with PACKED_SCHEMA; the
    trailing partial chunk is kept (n_tok < seq_len on at most one
    row).

    ``boundaries=True`` adds a ``doc_starts: list<int32>`` column —
    the ascending within-chunk offsets where a non-empty document
    begins (PACKED_B_SCHEMA).  These are the attention-reset /
    position-id-reset offsets for packed-sequence training; an offset
    of 0 appears only when a document happens to start exactly at a
    chunk boundary.  Zero-token documents contribute no boundary (they
    occupy no positions).  Cost: the same fragment rows carry an extra
    O(docs) int32 list — no extra pass, no extra exchange.
    """
    L = int(seq_len)
    B = int(n_buckets)
    f_schema = FRAG_B_SCHEMA if boundaries else FRAG_SCHEMA
    p_schema = PACKED_B_SCHEMA if boundaries else PACKED_SCHEMA

    # ---- pass 1: key range (column-pruned; O(batches) partials)
    def minmax(batch: pa.Table) -> pa.Table:
        k = batch.column(order_col)
        if batch.num_rows == 0:
            return pa.Table.from_pydict({"mn": [], "mx": []},
                                        schema=pa.schema([("mn", pa.int64()), ("mx", pa.int64())]))
        return pa.Table.from_pydict(
            {"mn": [pc.min(k).as_py()], "mx": [pc.max(k).as_py()]}
        )

    mm = ds.select_columns([order_col]).map_batches(minmax, batch_format="pyarrow").to_pandas()
    if len(mm) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.Table.from_pydict({f.name: [] for f in p_schema},
                                                  schema=p_schema))
    lo_id, hi_id = int(mm.mn.min()), int(mm.mx.max())
    span = max(hi_id - lo_id + 1, 1)
    width = (span + B - 1) // B  # bucket b covers ids [lo_id + b*width, ...)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return np.minimum((ids - lo_id) // width, B - 1)

    # ---- pass 2: per-bucket token totals (column-pruned) -> base offsets
    def bucket_partials(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(order_col), pa.int64()).to_numpy(zero_copy_only=False)
        nt = pc.cast(batch.column(n_tok_col), pa.int64()).to_numpy(zero_copy_only=False)
        b = bucket_of(ids)
        tot = np.bincount(b, weights=nt.astype(np.float64), minlength=B).astype(np.int64)
        nz = np.flatnonzero(tot)
        return pa.Table.from_pydict({"b": nz.astype(np.int64), "toks": tot[nz]})

    parts = (
        ds.select_columns([order_col, n_tok_col])
        .map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("b").sum("toks")
        .to_pandas()
    )
    totals = np.zeros(B, dtype=np.int64)
    totals[parts["b"].to_numpy()] = parts["sum(toks)"].to_numpy()
    base = np.concatenate(([0], np.cumsum(totals)))[:B]  # bucket -> global start

    # ---- pass 3: fragment emit per bucket
    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(order_col), pa.int64()).to_numpy(zero_copy_only=False)
        return batch.append_column("_pb", pa.array(bucket_of(ids)))

    def frag_emit(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in f_schema}, schema=f_schema)
        g = group.sort_by(order_col)
        b = int(g.column("_pb")[0].as_py())
        flat, lens = _flat_tokens(g.column(tokens_col))
        n = len(flat)
        if n == 0:
            return pa.Table.from_pydict({f.name: [] for f in f_schema}, schema=f_schema)
        if n >= (1 << 31):
            # fragment list offsets are int32; a bucket this large must
            # be split finer rather than silently wrapping
            raise ValueError(
                f"bucket {b} holds {n} tokens (>= 2^31): raise n_buckets "
                "so each key range stays under 2^31 tokens"
            )
        gpos0 = int(base[b])
        # chunk id per token of the contiguous stream [gpos0, gpos0+n)
        first_chunk = gpos0 // L
        # run boundaries: every multiple of L inside the range
        first_cut = (first_chunk + 1) * L - gpos0
        cuts = np.arange(first_cut, n, L, dtype=np.int64)
        run_starts = np.concatenate(([0], cuts))
        offsets = np.concatenate((run_starts, [n])).astype(np.int32)
        chunk_ids = first_chunk + np.arange(len(run_starts), dtype=np.int64)
        cpos = (gpos0 + run_starts) % L
        frags = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
        if not boundaries:
            return pa.Table.from_arrays(
                [pa.array(chunk_ids), pa.array(cpos), frags], schema=FRAG_SCHEMA
            )
        # non-empty doc starts, LOCAL to this bucket's flat stream
        doc_starts = np.concatenate(([0], np.cumsum(lens)))[:-1][lens > 0]
        # slice of doc_starts falling inside each run; a doc start at
        # local p in run r sits at within-chunk offset cpos[r] + (p -
        # run_starts[r])  (each run lies inside exactly one chunk)
        bcuts = np.searchsorted(doc_starts, np.concatenate((run_starts, [n])))
        run_idx = np.repeat(np.arange(len(run_starts)), np.diff(bcuts))
        bnd_flat = (cpos[run_idx] + doc_starts[bcuts[0]:bcuts[-1]] - run_starts[run_idx]).astype(
            np.int32
        )
        bnd = pa.ListArray.from_arrays(
            pa.array(bcuts.astype(np.int32)), pa.array(bnd_flat, type=pa.int32())
        )
        return pa.Table.from_arrays(
            [pa.array(chunk_ids), pa.array(cpos), frags, bnd], schema=FRAG_B_SCHEMA
        )

    frags = (
        ds.select_columns([order_col, tokens_col, n_tok_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(frag_emit, batch_format="pyarrow")
    )

    # ---- pass 4: assemble chunks from <= n_buckets+docs fragments each
    def assemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in p_schema},
                                        schema=p_schema)
        g = group.sort_by("cpos")
        flat = pc.list_flatten(g.column("frag").combine_chunks())
        n = len(flat)
        cid = g.column("chunk_id")[0].as_py()
        toks = pa.ListArray.from_arrays(pa.array([0, n], type=pa.int32()), flat)
        cols = [pa.array([cid], type=pa.int64()), toks, pa.array([n], type=pa.int64())]
        if boundaries:
            # fragment bnd offsets are already chunk-relative and each
            # fragment's list is ascending; cpos order makes the
            # concatenation globally ascending
            bflat = pc.list_flatten(g.column("bnd").combine_chunks())
            cols.append(
                pa.ListArray.from_arrays(pa.array([0, len(bflat)], type=pa.int32()), bflat)
            )
        return pa.Table.from_arrays(cols, schema=p_schema)

    return frags.groupby("chunk_id").map_groups(assemble, batch_format="pyarrow")
