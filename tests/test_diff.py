"""Corpus diff (pipelines/diff_job.py): content-level store compare."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.pipelines.diff_job import corpus_diff
from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files


def _mk_store(tmp_path, name, docs):
    """docs: list of (doc_id, tokens).  Returns the encode out dir."""
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs]),
        "tokens": pa.array([v for _, v in docs], pa.list_(pa.int32())),
        "n_tok": pa.array([len(v) for _, v in docs], pa.int32()),
        "source": pa.array(["s"] * len(docs)),
    })
    sh = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, sh)
    out = str(tmp_path / f"enc_{name}")
    run_encode_files([sh], EncodeConfig(out_dir=out, target_partition_tokens=100)).materialize()
    return out


def _counts(ds) -> dict:
    return {r["status"]: int(r["n_contents"]) for r in ds.take_all()}


def test_corpus_diff_identity_and_reid(ray_session, tmp_path):
    """Self-diff is all-common; re-idd copies count as unchanged; a
    removed + an added content show up on the right sides."""
    a = _mk_store(tmp_path, "a", [("1", [1, 2]), ("2", [3, 4, 5]), ("3", [9])])
    assert _counts(corpus_diff(a, a)) == {"removed": 0, "common": 3, "added": 0}

    # b: same contents under FRESH ids, minus [9], plus [7, 7]
    b = _mk_store(tmp_path, "b", [("10", [1, 2]), ("20", [3, 4, 5]), ("30", [7, 7])])
    assert _counts(corpus_diff(a, b)) == {"removed": 1, "common": 2, "added": 1}
    # direction flips cleanly
    assert _counts(corpus_diff(b, a)) == {"removed": 1, "common": 2, "added": 1}

    # duplicate contents within one side count once (distinct contents)
    c = _mk_store(tmp_path, "c", [("1", [1, 2]), ("2", [1, 2]), ("3", [1, 2])])
    assert _counts(corpus_diff(a, c)) == {"removed": 2, "common": 1, "added": 0}


def test_corpus_diff_cli(ray_session, tmp_path):
    a = _mk_store(tmp_path, "x", [("1", [1, 2])])
    b = _mk_store(tmp_path, "y", [("9", [1, 2]), ("8", [4])])
    r = subprocess.run(
        [sys.executable, "-m", "fileconvert_ray", "corpus-diff", a, b],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res == {"ok": True, "removed": 0, "common": 1, "added": 1}
