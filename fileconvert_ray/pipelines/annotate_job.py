"""Derived annotations over an encoded corpus — co-partitioned side
tables, zero-shuffle attach.

Training pipelines continuously attach per-document scores (quality,
repetition, length stats) to an already-encoded corpus; re-encoding
100 TB to add a float column is absurd, and a doc_id join at read
time is an all-to-all shuffle.  ``run_annotate`` instead computes the
annotation PER PARTITION (one Ray task per container, streaming
chunk decode, column-pruned to what the annotator needs) and writes
``ann/{name}/{part_id}.parquet`` — the side table inherits the
corpus's partitioning, so ``decode_dataset(...,
with_annotations=[name])`` attaches it with an in-task doc_id join
against ONLY that partition's file.  No shuffle at write, none at
read.

Annotators are deterministic token-level functions (registered in
``ANNOTATORS``), so every annotation is DuckDB-oracle-checkable
through the word-level equivalents on the original documents:

- ``token_stats``: n_tok, n_distinct, distinct_ratio (type-token
  ratio), repetition_ratio (1 - distinct_ratio), max_run (longest
  immediate-repeat run) — the standard cheap quality signals.

Lifecycle: annotation files are tmp+renamed (atomic, idempotent
re-run skips existing), and a partition rewritten later (purge /
compaction) simply no longer matches its annotation file name —
``decode_dataset`` raises on a missing annotation for a served
partition, so stale attach is loud, and ``run_annotate`` re-run fills
the gaps.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _token_stats(batch: pa.Table) -> pa.Table:
    """Per-doc token-level quality stats; vectorized over the flat
    token buffer with one np.unique per doc-segment boundary trick:
    lengths come from the list offsets, distinct counts via a sort
    within segments (lexsort on (segment, token))."""
    toks = batch.column("tokens").combine_chunks()
    ids = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    n = len(lens)
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)

    # distinct tokens per doc: sort (seg, id) pairs, count boundaries
    if len(ids):
        order = np.lexsort((ids, seg))
        s_seg, s_ids = seg[order], ids[order]
        new = np.empty(len(ids), dtype=bool)
        new[0] = True
        np.not_equal(s_seg[1:], s_seg[:-1], out=new[1:])
        new[1:] |= s_ids[1:] != s_ids[:-1]
        n_distinct = np.bincount(s_seg[new], minlength=n)
        # longest immediate-repeat run per doc (in original order):
        # r[i] = i - (last non-continuation at or before i) + 1
        cont = np.empty(len(ids), dtype=bool)
        cont[0] = False
        cont[1:] = (ids[1:] == ids[:-1]) & (seg[1:] == seg[:-1])
        last_start = np.maximum.accumulate(
            np.where(~cont, np.arange(len(ids)), -1)
        )
        r = np.arange(len(ids)) - last_start + 1
        max_run = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_run, seg, r)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
        max_run = np.zeros(n, dtype=np.int64)

    safe = np.maximum(lens, 1).astype(np.float64)
    distinct_ratio = n_distinct / safe
    return pa.table(
        {
            "doc_id": pc.cast(batch.column("doc_id"), pa.string()),
            "n_tok": pa.array(lens, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
            "distinct_ratio": pa.array(distinct_ratio, type=pa.float64()),
            "repetition_ratio": pa.array(1.0 - distinct_ratio, type=pa.float64()),
            "max_run": pa.array(max_run, type=pa.int64()),
        }
    )


def _content_hash(batch: pa.Table) -> pa.Table:
    """Per-doc uint64 content hash over the TOKEN SEQUENCE alone
    (functions/dedup.token_content_hashes — the same identity merge's
    cross-store exact dedup uses, id/source excluded on purpose).
    Stored as int64 bit-pattern (parquet has no uint64).  Use cases:
    audit joins between stores, grouping re-crawled copies, and
    export-packed ann_filter carve-outs by known-content lists."""
    from ..functions.dedup import token_content_hashes

    n_tok = pc.list_value_length(batch.column("tokens")).cast(pa.int64())
    t = pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "tokens": batch.column("tokens"),
            "n_tok": n_tok,
        }
    )
    h = token_content_hashes(t).view(np.int64)
    return pa.table(
        {
            "doc_id": pc.cast(batch.column("doc_id"), pa.string()),
            "content_hash": pa.array(h),
        }
    )


# name -> (columns needed from the container, batch fn)
ANNOTATORS = {
    "token_stats": (["doc_id", "tokens"], _token_stats),
    "content_hash": (["doc_id", "tokens"], _content_hash),
}


def ann_dir(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "ann", name)


def run_annotate(out_dir: str, name: str = "token_stats") -> dict:
    """One Ray task per completed partition: stream-decode the needed
    columns, compute the annotation, land ann/{name}/{part_id}.parquet
    atomically.  Idempotent — existing files are skipped, so a re-run
    after purge/compaction fills only the gaps."""
    import ray.data as rd

    from ..state.manifest import JobDirs, completed_partitions

    if name not in ANNOTATORS:
        raise ValueError(f"unknown annotator {name!r}; have {sorted(ANNOTATORS)}")
    cols, fn = ANNOTATORS[name]
    dirs = JobDirs(out_dir)
    adir = ann_dir(out_dir, name)
    os.makedirs(adir, exist_ok=True)
    pids = sorted(completed_partitions(out_dir))
    todo = [p for p in pids if not os.path.exists(os.path.join(adir, f"{p}.parquet"))]

    def annotate(batch: pa.Table):
        from ..stages.decoder import iter_partition_chunks

        empty = pa.table(
            {"doc_id": pa.array([], pa.string()),
             "tokens": pa.array([], pa.list_(pa.int32()))}
        )
        out_rows = []
        for pid in batch.column("pid").to_pylist():
            parts = [
                fn(t)
                for t in iter_partition_chunks(dirs.container_path(pid), cols)
            ]
            t = pa.concat_tables(parts) if parts else fn(empty)
            tmp = os.path.join(adir, f".{pid}.tmp.parquet")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(adir, f"{pid}.parquet"))
            out_rows.append({"pid": pid, "n_rows": t.num_rows})
        return pa.Table.from_pylist(out_rows) if out_rows else pa.table(
            {"pid": pa.array([], pa.string()), "n_rows": pa.array([], pa.int64())}
        )

    written = 0
    if todo:
        res = (
            rd.from_items([{"pid": p} for p in todo])
            .map_batches(annotate, batch_format="pyarrow", batch_size=1)
            .to_pandas()
        )
        written = int(len(res))
    return {
        "ok": True,
        "annotator": name,
        "partitions": len(pids),
        "written": written,
        "skipped": len(pids) - len(todo),
        "dir": adir,
    }


def read_annotation(out_dir: str, name: str, part_id: str) -> pa.Table:
    p = os.path.join(ann_dir(out_dir, name), f"{part_id}.parquet")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"annotation {name!r} missing for partition {part_id} — the "
            "partition was rewritten after annotation (purge/compaction)? "
            "Re-run run_annotate to fill the gap."
        )
    return pq.read_table(p)
