"""Corpus diff: content-level comparison of two encoded stores.

The audit end of the merge/dedup family (SURVEY.md §2 extension):
after a re-crawl, a migration, or a vendor handoff, the question is
"what actually changed between these two corpora?" — answered here by
CONTENT identity (functions/dedup.token_content_hashes: the token
sequence alone, doc_id/source excluded — the same identity merge's
cross-store exact dedup and the content_hash annotator use), so
re-idd copies compare as unchanged.

Scale shape: each side streams a projected (n_tok, tokens) container
decode into one uint64 hash per doc; only (hash, side) rows cross the
exchange (16 B/doc).  Distinct-per-side then diff is ONE groupby over
O(distinct contents) keys; the result is three counters.  No driver
materialization anywhere.

Deleted (tombstoned) docs are excluded on both sides — the diff
compares the corpora as served.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def corpus_diff(a_dir: str, b_dir: str):
    """Dataset of exactly three rows: ``status`` in
    ``{"removed", "common", "added"}`` and ``n_contents`` — distinct
    token contents seen only in A, in both, and only in B."""
    import ray.data as rd

    from ..functions.dedup import token_content_hashes
    from ..stages.decoder import decode_dataset

    def hashed(out_dir: str, side: int):
        def h(batch: pa.Table) -> pa.Table:
            hh = token_content_hashes(batch).view(np.int64)
            return pa.table(
                {
                    "h": pa.array(hh),
                    "side": pa.array(
                        np.full(len(hh), side, dtype=np.int64)
                    ),
                }
            )

        return decode_dataset(out_dir, columns=["tokens", "n_tok"]).map_batches(
            h, batch_format="pyarrow", zero_copy_batch=True
        )

    both = hashed(a_dir, 1).union(hashed(b_dir, 2))

    # per-hash side bitmask: 1=A only, 2=B only, 3=both.  min/max of
    # {1,2} reconstruct the set without a distinct pass: min==max==1 ->
    # A only, ==2 -> B only, min<max -> both.
    per_hash = both.groupby("h").aggregate(
        rd.aggregate.Min("side"), rd.aggregate.Max("side")
    )

    def classify(batch: pa.Table) -> pa.Table:
        mn = batch.column("min(side)").to_numpy(zero_copy_only=False)
        mx = batch.column("max(side)").to_numpy(zero_copy_only=False)
        removed = int((mx == 1).sum())
        added = int((mn == 2).sum())
        common = int(((mn == 1) & (mx == 2)).sum())
        return pa.table(
            {
                "status": pa.array(["removed", "common", "added"]),
                "n_contents": pa.array(
                    [removed, common, added], type=pa.int64()
                ),
            }
        )

    partial = per_hash.map_batches(classify, batch_format="pyarrow")
    final = partial.groupby("status").sum("n_contents")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": batch.column("status"),
                "n_contents": batch.column("sum(n_contents)"),
            }
        )

    return final.map_batches(rename, batch_format="pyarrow")
