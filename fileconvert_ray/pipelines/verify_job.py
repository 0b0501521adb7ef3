"""Decode-verify job (SURVEY.md §3.2b) — the engine's R13 round-trip contract.

Re-derives the same partitions from the original input (plan.json makes
bucket assignment deterministic), then per partition: read container ->
decode -> align on doc_id -> assert token-array equality bit-identical
(values, n_tok, source, doc_id).  Emits one (part_id, n_rows, ok,
n_mismatch) row per partition; zip-by-partition, so no join shuffle
beyond the part_id groupby (SURVEY §2.2 E10).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..stages.decoder import read_partition
from ..stages.encoder import flat_tokens
from ..stages.partition import make_assigner
from ..state.manifest import JobDirs, read_plan

VERIFY_SCHEMA = pa.schema(
    [
        ("part_id", pa.string()),
        ("n_rows", pa.int64()),
        ("ok", pa.bool_()),
        ("n_mismatch", pa.int64()),
    ]
)


def compare_tokseq(a: pa.Table, b: pa.Table) -> int:
    """Number of mismatching rows between two doc_id-sorted tokseq tables."""
    if a.num_rows != b.num_rows:
        return max(a.num_rows, b.num_rows)
    if a.num_rows == 0:
        return 0
    bad = np.zeros(a.num_rows, dtype=bool)
    for col in ("doc_id", "source"):
        bad |= ~np.asarray(
            pa.compute.equal(a.column(col).combine_chunks(), b.column(col).combine_chunks())
        )
    na = a.column("n_tok").to_numpy(zero_copy_only=False)
    nb = b.column("n_tok").to_numpy(zero_copy_only=False)
    bad |= na != nb
    fa = flat_tokens(a).to_numpy(zero_copy_only=False)
    fb = flat_tokens(b).to_numpy(zero_copy_only=False)
    if len(fa) != len(fb):
        return int(bad.sum()) + 1
    tok_bad = fa != fb
    if tok_bad.any():
        # map flat mismatches back to rows
        offsets = np.concatenate(([0], np.cumsum(na.astype(np.int64))))
        rows = np.searchsorted(offsets, np.flatnonzero(tok_bad), side="right") - 1
        bad[np.unique(rows)] = True
    return int(bad.sum())


def make_verifier(out_dir: str):
    dirs = JobDirs(out_dir)

    def verify_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pydict({k: [] for k in VERIFY_SCHEMA.names}, schema=VERIFY_SCHEMA)
        part_id = group.column("part_id")[0].as_py()
        path = dirs.container_path(part_id)
        if not os.path.exists(path):
            return pa.Table.from_pydict(
                {"part_id": [part_id], "n_rows": [group.num_rows], "ok": [False],
                 "n_mismatch": [group.num_rows]},
                schema=VERIFY_SCHEMA,
            )
        original = group.drop_columns(["part_id"]).sort_by("doc_id")
        try:
            decoded = read_partition(path).sort_by("doc_id")
            n_bad = compare_tokseq(original, decoded)
        except Exception:
            # a corrupt container (CRC mismatch, truncated payload) is a
            # verify failure for this partition, not a job crash
            n_bad = group.num_rows
        return pa.Table.from_pydict(
            {"part_id": [part_id], "n_rows": [group.num_rows], "ok": [n_bad == 0],
             "n_mismatch": [n_bad]},
            schema=VERIFY_SCHEMA,
        )

    return verify_group


def run_verify(ds_factory, out_dir: str):
    """Returns the per-partition verify Dataset; any ok=False is a failure."""
    plan = read_plan(out_dir)["buckets"]
    ds = ds_factory().map_batches(
        make_assigner(plan), batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("part_id").map_groups(
        make_verifier(out_dir), batch_format="pyarrow"
    )
