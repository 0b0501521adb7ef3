"""CLI smoke tests (reference R6 argv surface; round-1 verdict gap #3).

Each invocation is a fresh subprocess owning its own Ray session, so
these do NOT use the shared ray_session fixture.
"""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="2")
    out = subprocess.run(
        [sys.executable, "-m", "fileconvert_ray", *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_convert_roundtrip(tmp_path):
    from fileconvert_ray.sources.csvio import write_fixture_csv

    csv_in = str(tmp_path / "in.csv")
    write_fixture_csv(csv_in, n=200)
    pq_dir = str(tmp_path / "pq")
    r = run_cli("convert", csv_in, "--out", pq_dir, "--type", "id=int64")
    assert r["ok"]
    files = [f for f in os.listdir(pq_dir) if f.endswith(".parquet")]
    assert files
    t = pq.read_table(pq_dir)
    assert t.num_rows == 200
    csv_out = str(tmp_path / "csv_back")
    r = run_cli("convert", pq_dir, "--out", csv_out, "--to", "csv")
    assert r["ok"]


def test_cli_encode_verify_decode(tmp_path):
    from fileconvert_ray.sources.tokseq import synth_rows

    shard_dir = tmp_path / "toks"
    shard_dir.mkdir()
    pq.write_table(synth_rows(0, 400), str(shard_dir / "part-0.parquet"))
    out = str(tmp_path / "enc")
    r = run_cli(
        "encode", str(shard_dir), "--out", out, "--target-partition-tokens", "30000"
    )
    assert r["ok"] and r["n_rows"] == 400
    v = run_cli("verify", str(shard_dir), "--out", out, "--mode", "hash")
    assert v["ok"] and v["n_mismatch"] == 0
    dec_dir = str(tmp_path / "dec")
    d = run_cli("decode", out, "--to", dec_dir)
    assert d["ok"]
    t = pq.read_table(dec_dir)
    assert t.num_rows == 400
