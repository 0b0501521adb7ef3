"""Upsert — new-or-updated token sequences applied to an encoded
corpus as ONE maintenance call: the training-data refresh op (re-crawled
documents, re-tokenized shards) that neither append nor delete covers
alone.

``run_upsert(out_dir, shard_files, cfg)`` composes the two existing
machines in a crash-safe order:

    1. SEAL any unsealed generation (run_encode_files over the already
       recorded lineage).  Required first: a tombstone can only target
       COMPLETED partitions, so every pre-existing version of an
       incoming doc must be queryable before the delete pass — an
       unsealed generation could otherwise re-materialize an old
       version later, untombstoned (a duplicate).
    2. TOMBSTONE every incoming doc_id (pipelines.delete_job.run_delete
       — plan-routed, no corpus scan; ids new to the corpus are simply
       not found).  Runs strictly BEFORE any new row lands, so the
       delete can never hit the new versions.
    3. APPEND the shards as a new ingest generation
       (run_encode_files; completed partitions untouched).

Re-running after a crash converges without intent records because the
steps are idempotent in this order: a crash during (2) re-deletes on
the next call (the old versions are still physically present, the new
files are still unrecorded); a crash during (3) means the shards are
already in the lineage, so the next call SKIPS the delete (nothing is
"new") and run_encode_files finishes the unsealed generation behind
the resume filter.  The one reader-visible intermediate state is
"old version tombstoned, new version not yet appended" — a temporarily
missing doc, never a duplicate and never a half-row.

Like purge/compaction, upsert is offline maintenance: readers should
not overlap the window if they need one exact version of each doc.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def run_upsert(out_dir: str, shard_files, cfg=None, ds_from_files=None) -> dict:
    """Apply ``shard_files`` (tokseq parquet, the NEW versions) to the
    encoded corpus at ``out_dir``.  Returns
    ``{"replaced", "added", "sealed_first", "metrics"}`` where
    ``replaced`` counts incoming ids that had an existing version
    (now tombstoned) and ``metrics`` is the encode metrics Dataset of
    the passes this call ran."""
    from ..state.manifest import read_plan
    from .delete_job import run_delete
    from .encode_job import EncodeConfig, run_encode_files

    if cfg is None:
        cfg = EncodeConfig(out_dir=out_dir)
    if cfg.out_dir != out_dir:
        raise ValueError(f"cfg.out_dir ({cfg.out_dir}) != out_dir ({out_dir})")
    if not cfg.resume:
        raise ValueError("run_upsert is incremental by definition; cfg.resume must stay True")

    files = sorted({os.path.abspath(p) for p in shard_files})
    if not files:
        raise ValueError("run_upsert: empty shard list")

    try:
        plan = read_plan(out_dir)
    except FileNotFoundError:
        plan = None
    if plan is not None and "generations" not in plan:
        raise RuntimeError(
            f"{out_dir} was built by run_encode (no file lineage); upsert "
            "needs a generational plan — rebuild with run_encode_files."
        )
    gens = list(plan["generations"]) if plan else []
    known = sorted({fe["path"] for g in gens for fe in g["files"]})
    new_files = [p for p in files if p not in set(known)]

    sealed_first = False
    if any(not g.get("sealed") for g in gens):
        # step 1: finish what a previous interrupted ingest started
        run_encode_files(known, cfg).materialize()
        sealed_first = True

    replaced = 0
    if new_files:
        # step 2: tombstone the existing versions of every incoming id.
        # One column-pruned read of the incoming batch — O(upsert batch),
        # never O(corpus).
        ids: set[str] = set()
        for p in new_files:
            ids.update(
                str(d)
                for d in pq.read_table(p, columns=["doc_id"]).column("doc_id").to_pylist()
            )
        res = run_delete(out_dir, sorted(ids))
        replaced = int(res["found"])

    # step 3: append (or, when new_files is empty, resume/seal only —
    # run_encode_files is a no-op on a fully sealed recorded corpus)
    metrics = run_encode_files(sorted(set(known) | set(files)), cfg, ds_from_files=ds_from_files)
    added = len(new_files)
    return {
        "replaced": replaced,
        "added_files": added,
        "sealed_first": sealed_first,
        "metrics": metrics,
    }
