"""Distributed BPE merge-rule training over the tokens column — the
tokenizer-training primitive a training-data engine needs alongside
encode/dedup (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — public algorithm, original
vectorized implementation).

Per round:
  1. Pair counting: every batch packs its adjacent token pairs into
     u64 keys ((a << 32) | b, doc-boundary pairs masked out) and
     pre-reduces with np.unique — the partial/combiner shape, so the
     groupby-sum exchange moves O(distinct pairs per block), not
     O(tokens).
  2. Top-pair election: one vectorized top-1 partial per block (max
     count, ties to the smaller packed key), then O(blocks) tiny rows
     to the driver for the final argmax — never the pair table.
  3. Merge apply: one streaming map_batches pass rewrites the corpus
     (greedy leftmost non-overlapping, the classic BPE apply) fully
     vectorized: match mask -> run-parity keep -> boundary-aware
     list rebuild.  The new corpus is materialized so round r+1
     counts the merged sequences.

At 100-TB scale you train merges on a SAMPLE (``sample_frac``) —
merge ranks converge long before full-corpus counts — and only the
final apply passes stream the whole corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MERGE_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("left", pa.int64()),
        ("right", pa.int64()),
        ("count", pa.int64()),
        ("new_id", pa.int64()),
    ]
)


def _flat_tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """tokens list column -> (flat int64 values, int64 doc start offsets)."""
    col = batch.column("tokens")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.cast(col.flatten(), pa.int64()).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))
    return flat, starts


def _pair_count_partial(batch: pa.Table) -> pa.Table:
    flat, starts = _flat_tokens(batch)
    n = len(flat)
    if n < 2:
        return pa.Table.from_pydict(
            {"pair": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
        )
    keys = (flat[:-1].astype(np.uint64) << np.uint64(32)) | flat[1:].astype(np.uint64)
    valid = np.ones(n - 1, dtype=bool)
    inner = starts[1:-1]  # doc boundaries: pair (last of doc i, first of doc i+1)
    valid[inner[(inner > 0) & (inner < n)] - 1] = False
    uniq, cnt = np.unique(keys[valid], return_counts=True)
    return pa.Table.from_pydict(
        {"pair": pa.array(uniq.view(np.int64)), "cnt": pa.array(cnt.astype(np.int64))}
    )


def _block_top(batch: pa.Table) -> pa.Table:
    """Per-block top-1 partial: max count, ties to the smaller pair key."""
    if batch.num_rows == 0:
        return batch
    cnt_col = "sum(cnt)" if "sum(cnt)" in batch.column_names else "cnt"
    cnt = batch.column(cnt_col).to_numpy(zero_copy_only=False)
    pair = batch.column("pair").to_numpy(zero_copy_only=False)
    best = cnt == cnt.max()
    i = np.flatnonzero(best)[np.argmin(pair[best])]
    return batch.slice(int(i), 1)


def _top_pair(corpus) -> tuple[int, int, int] | None:
    """(left, right, count) of the most frequent adjacent pair, or None."""
    counts = (
        corpus.map_batches(_pair_count_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("pair")
        .sum("cnt")
        .map_batches(_block_top, batch_format="pyarrow")
    )
    best_cnt, best_pair = -1, None
    for bt in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for p, c in zip(bt.column("pair").to_pylist(), bt.column("sum(cnt)").to_pylist()):
            if c > best_cnt or (c == best_cnt and np.uint64(p) < np.uint64(best_pair)):
                best_cnt, best_pair = c, p
    if best_pair is None:
        return None
    u = np.uint64(best_pair)
    return int(u >> np.uint64(32)), int(u & np.uint64(0xFFFFFFFF)), int(best_cnt)


def apply_merge_batch(batch: pa.Table, *, left: int, right: int, new_id: int) -> pa.Table:
    """Greedy leftmost non-overlapping (left, right) -> new_id rewrite.

    Overlapping matches only arise when left == right (runs like
    x,x,x); greedy keeps every other match within a run, which is
    exactly run-parity on the match mask — no sequential scan."""
    flat, starts = _flat_tokens(batch)
    n = len(flat)
    other = [c for c in batch.column_names if c != "tokens"]
    if n < 2:
        return batch
    m = np.zeros(n - 1, dtype=bool)
    m[:] = (flat[:-1] == left) & (flat[1:] == right)
    inner = starts[1:-1]
    m[inner[(inner > 0) & (inner < n)] - 1] = False
    if not m.any():
        return batch
    # run-parity keep: within each maximal run of consecutive matches,
    # keep positions 0, 2, 4, ... (greedy leftmost)
    idx = np.arange(n - 1, dtype=np.int64)
    run_start = np.where(m & ~np.concatenate(([False], m[:-1])), idx, -1)
    run_start = np.maximum.accumulate(run_start)
    keep = m & (((idx - run_start) & 1) == 0)
    kept_pos = np.flatnonzero(keep)
    out = flat.copy()
    out[kept_pos] = new_id
    drop = np.zeros(n, dtype=bool)
    drop[kept_pos + 1] = True
    out = out[~drop]
    lens = np.diff(starts)
    doc_of_kept = np.searchsorted(starts, kept_pos, side="right") - 1
    merged_per_doc = np.bincount(doc_of_kept, minlength=len(lens))
    new_lens = lens - merged_per_doc
    new_offsets = np.concatenate(([0], np.cumsum(new_lens)))
    tokens = pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32()), pa.array(out.astype(np.int32))
    )
    arrays = [tokens if c == "tokens" else batch.column(c) for c in batch.column_names]
    t = pa.Table.from_arrays(arrays, names=batch.column_names)
    if "n_tok" in other:
        t = t.set_column(
            t.column_names.index("n_tok"), "n_tok", pa.array(new_lens, type=pa.int32())
        )
    return t


def expand_merge_batch(batch: pa.Table, *, left: int, right: int, new_id: int) -> pa.Table:
    """Inverse of apply_merge_batch: every ``new_id`` expands back to
    the (left, right) pair.  Exact inverse of the greedy apply — the
    merged symbol is a bijection with the pair, so expansion needs no
    parity logic.  Vectorized scatter: each original element lands at
    its index plus the number of expansions before it."""
    flat, starts = _flat_tokens(batch)
    n = len(flat)
    if n == 0:
        return batch
    pos = np.flatnonzero(flat == new_id)
    if len(pos) == 0:
        return batch
    ins = np.zeros(n, dtype=np.int64)
    ins[pos] = 1
    before = np.concatenate(([0], np.cumsum(ins)[:-1]))  # expansions before i
    target = np.arange(n, dtype=np.int64) + before
    out = np.empty(n + len(pos), dtype=np.int64)
    out[target] = flat
    out[target[pos]] = left
    out[target[pos] + 1] = right
    lens = np.diff(starts)
    doc_of_pos = np.searchsorted(starts, pos, side="right") - 1
    new_lens = lens + np.bincount(doc_of_pos, minlength=len(lens))
    tokens = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(new_lens))), type=pa.int32()),
        pa.array(out.astype(np.int32)),
    )
    arrays = [tokens if c == "tokens" else batch.column(c) for c in batch.column_names]
    t = pa.Table.from_arrays(arrays, names=batch.column_names)
    if "n_tok" in batch.column_names:
        t = t.set_column(
            t.column_names.index("n_tok"), "n_tok", pa.array(new_lens, type=pa.int32())
        )
    return t


def apply_rules_batch(batch: pa.Table, *, rules: list) -> pa.Table:
    """Apply an ordered merge-rule list [(left, right, new_id), ...]
    (training order) in one map stage."""
    for left, right, new_id in rules:
        batch = apply_merge_batch(batch, left=int(left), right=int(right),
                                  new_id=int(new_id))
    return batch


def expand_rules_batch(batch: pa.Table, *, rules: list) -> pa.Table:
    """Undo an ordered merge-rule list: expand in REVERSE training
    order (later rules may reference earlier new_ids)."""
    for left, right, new_id in reversed(rules):
        batch = expand_merge_batch(batch, left=int(left), right=int(right),
                                   new_id=int(new_id))
    return batch


def bpe_merge_rounds(ds, *, rounds: int = 4, vocab_base: int | None = None,
                     sample_frac: float | None = None) -> pa.Table:
    """Train ``rounds`` BPE merges over a tokseq Dataset; returns the
    merge table (round, left, right, count, new_id) — O(rounds) rows.
    ``vocab_base`` (first new symbol id) is computed distributedly
    when not given."""
    if sample_frac is not None:
        ds = ds.random_sample(sample_frac, seed=7)
    if vocab_base is None:
        def max_partial(batch: pa.Table) -> pa.Table:
            flat, _ = _flat_tokens(batch)
            m = int(flat.max()) if len(flat) else -1
            return pa.Table.from_pydict({"m": [m]})

        mx = ds.map_batches(max_partial, batch_format="pyarrow",
                            zero_copy_batch=True).max("m")
        vocab_base = int(mx or 0) + 1
    corpus = ds.materialize()
    rows = []
    for r in range(rounds):
        top = _top_pair(corpus)
        if top is None or top[2] < 2:
            break
        left, right, cnt = top
        new_id = vocab_base + r
        rows.append((r, left, right, cnt, new_id))
        corpus = corpus.map_batches(
            apply_merge_batch, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"left": left, "right": right, "new_id": new_id},
        ).materialize()
    return pa.Table.from_pydict(
        {
            "round": pa.array([x[0] for x in rows], type=pa.int32()),
            "left": pa.array([x[1] for x in rows], type=pa.int64()),
            "right": pa.array([x[2] for x in rows], type=pa.int64()),
            "count": pa.array([x[3] for x in rows], type=pa.int64()),
            "new_id": pa.array([x[4] for x in rows], type=pa.int64()),
        },
        schema=MERGE_SCHEMA,
    )


def bpe_reference(token_lists: list[list[int]], rounds: int, vocab_base: int):
    """Pure-Python reference (tests): same greedy-leftmost semantics."""
    corpus = [list(t) for t in token_lists]
    out = []
    for r in range(rounds):
        counts: dict[tuple[int, int], int] = {}
        for doc in corpus:
            for i in range(len(doc) - 1):
                p = (doc[i], doc[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], -((kv[0][0] << 32) | kv[0][1])))
        (left, right), cnt = best
        if cnt < 2:
            break
        new_id = vocab_base + r
        out.append((r, left, right, cnt, new_id))
        nxt = []
        for doc in corpus:
            nd, i = [], 0
            while i < len(doc):
                if i + 1 < len(doc) and doc[i] == left and doc[i + 1] == right:
                    nd.append(new_id)
                    i += 2
                else:
                    nd.append(doc[i])
                    i += 1
            nxt.append(nd)
        corpus = nxt
    return out
