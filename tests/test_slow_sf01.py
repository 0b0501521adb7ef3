"""sf0.1-scale regression pins (round-4 verdict #6): the driver's
correctness gate runs at sf0.01, so a scale-dependent regression (like
round 3's partition-layout-dependent labelprop digest, which only
showed as a 2.3x minhash wall-time blowup at sf0.1) would otherwise be
caught by bench archaeology instead of the tree.  Run explicitly:

    python -m pytest -m slow tests/test_slow_sf01.py -q      (~2 min)

Bounds are calibrated at the test session's 4 cpus with 2x headroom —
the round-3 regression was a 2.3x blowup and would trip either pin.
"""

import shutil
import time

import pytest

SF01 = "/root/testdata/sf0.1"

MINHASH_WALL_BOUND = 2 * 6.0   # measured r5 @4cpus: ~3 s over sf0.1 docs
ENCODE_WALL_BOUND = 2 * 45.0   # measured r5 @4cpus: ~22 s for 300M tokens
DECODE_WALL_BOUND = 2 * 10.0   # measured r5 @4cpus: 10.0 s full-decode 309M tokens


@pytest.mark.slow
def test_minhash_dedup_sf01_wall_and_shape(ray_session):
    from fileconvert_ray.functions.queries import q_minhash_dedup_docs

    t0 = time.perf_counter()
    surv = q_minhash_dedup_docs(SF01).count()
    wall = time.perf_counter() - t0
    assert surv > 0
    assert wall <= MINHASH_WALL_BOUND, f"minhash sf0.1 took {wall:.1f}s"


@pytest.mark.slow
def test_encode_verify_300M_tokens(ray_session, tmp_path):
    """Encode + hash-verify a 500k-doc (~309M token) synthetic corpus —
    the bench corpus at 1/4 scale, still ~1000x the sf0.001 gate."""
    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode
    from fileconvert_ray.pipelines.verify_job import run_verify
    from fileconvert_ray.sources.tokseq import synth_dataset

    out = str(tmp_path / "enc01")
    factory = lambda: synth_dataset(500_000, num_blocks=64)
    t0 = time.perf_counter()
    m = run_encode(
        factory, EncodeConfig(out_dir=out, staged_dir="/dev/shm/slow_staged")
    ).to_pandas()
    wall = time.perf_counter() - t0
    assert wall <= ENCODE_WALL_BOUND, f"encode 300M tokens took {wall:.1f}s"
    assert int(m["n_tokens"].sum()) > 250_000_000
    v = run_verify(factory, out, mode="hash").to_pandas()
    assert bool(v["ok"].all()) and len(v) > 0

    # decode pin (the training-loader read path): full token decode of
    # the same output, counted in-cluster, exact total
    import pyarrow as pa
    import pyarrow.compute as pc

    from fileconvert_ray.stages.decoder import decode_dataset

    def count_tokens(batch: pa.Table) -> pa.Table:
        col = batch.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {"n": pa.array([int(pc.sum(pc.list_value_length(col)).as_py() or 0)], pa.int64())}
        )

    t0 = time.perf_counter()
    n_dec = int(
        decode_dataset(out, columns=["tokens"])
        .map_batches(count_tokens, batch_format="pyarrow", zero_copy_batch=True)
        .sum("n")
    )
    wall = time.perf_counter() - t0
    assert n_dec == int(m["n_tokens"].sum())
    assert wall <= DECODE_WALL_BOUND, f"decode 300M tokens took {wall:.1f}s"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree("/dev/shm/slow_staged", ignore_errors=True)


CONTAINER_WALL_BOUND = 2 * 5.0  # measured r5 @4cpus (contended window): 3.4 s write


@pytest.mark.slow
def test_table_container_sf01_roundtrip_wall(ray_session, tmp_path):
    """Any-table container at driver scale: encode sf0.1 lineitem
    (600k rows, all 11 columns incl. four ALP doubles), decode, and
    reconcile an exact aggregate — pinned at 2x the measured wall."""
    import ray.data as rd

    from fileconvert_ray.sources.tablecontainer import (
        read_container_table,
        write_container_table,
    )

    out = str(tmp_path / "tc_sf01")
    t0 = time.perf_counter()
    man = write_container_table(
        rd.read_parquet(f"{SF01}/lineitem.parquet"), out, batch_rows=200_000
    ).to_pandas()
    wall = time.perf_counter() - t0
    assert wall <= CONTAINER_WALL_BOUND, f"container write took {wall:.1f}s"
    assert int(man.encoded_bytes.sum()) < 0.25 * int(man.plain_bytes.sum())

    got = int(read_container_table(out, columns=["l_orderkey"]).sum("l_orderkey"))
    import pyarrow.parquet as pq

    want = int(
        pq.read_table(f"{SF01}/lineitem.parquet", columns=["l_orderkey"])
        .column("l_orderkey")
        .combine_chunks()
        .sum()
        .as_py()
    )
    assert got == want


INCR_VERIFY_FRACTION = 0.5  # measured: gens=[1] ~0.1x the full wall


@pytest.mark.slow
def test_incremental_verify_cost_scales_with_append(ray_session, tmp_path):
    """The incremental-verify contract at scale: after appending a ~5%
    generation to a ~120M-token corpus, run_verify(gens=[1]) re-reads
    only the appended shard — pinned at <=0.5x the full-verify wall
    (measured ~0.1x; a scoping regression that silently re-verifies
    everything trips this immediately)."""
    import os

    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files
    from fileconvert_ray.pipelines.verify_job import run_verify

    base = str(tmp_path / "shards")
    d0, d1 = f"{base}/g0", f"{base}/g1"
    # disjoint doc ranges: rows [0, 190k) as gen 0, [190k, 200k) as gen 1
    import pyarrow.parquet as pq

    from fileconvert_ray.sources.tokseq import synth_rows

    os.makedirs(d0), os.makedirs(d1)

    for k, (a, b) in enumerate([(0, 95_000), (95_000, 190_000)]):
        pq.write_table(synth_rows(a, b), f"{d0}/s{k}.parquet")
    pq.write_table(synth_rows(190_000, 200_000), f"{d1}/s0.parquet")

    out = str(tmp_path / "enc")
    cfg = EncodeConfig(out_dir=out, staged_dir="/dev/shm/slow_incr_staged")
    run_encode_files([f"{d0}/s0.parquet", f"{d0}/s1.parquet"], cfg).materialize()
    m1 = run_encode_files(
        [f"{d0}/s0.parquet", f"{d0}/s1.parquet", f"{d1}/s0.parquet"], cfg
    ).to_pandas()
    appended_rows = int(m1["n_rows"].sum())
    assert appended_rows == 10_000

    t0 = time.perf_counter()
    vs = run_verify(None, out, mode="hash", gens=[1]).to_pandas()
    scoped_wall = time.perf_counter() - t0
    assert bool(vs["ok"].all()) and int(vs["n_rows"].sum()) == appended_rows

    t0 = time.perf_counter()
    vf = run_verify(None, out, mode="hash").to_pandas()
    full_wall = time.perf_counter() - t0
    assert bool(vf["ok"].all()) and int(vf["n_rows"].sum()) == 200_000

    assert scoped_wall <= INCR_VERIFY_FRACTION * full_wall, (
        f"scoped verify {scoped_wall:.1f}s vs full {full_wall:.1f}s"
    )
    shutil.rmtree("/dev/shm/slow_incr_staged", ignore_errors=True)


@pytest.mark.slow
def test_merge_cost_is_metadata_only_at_scale(ray_session, tmp_path):
    """The merge contract at scale: unioning two ~60M-token stores
    (100k docs each) costs O(partitions) metadata + hardlinks — pinned
    at <= 5 s wall regardless of corpus bytes (a re-encode or byte
    copy would be 10-40x that), with the merged store fully readable
    and its token totals exact."""
    import os

    import pyarrow.parquet as pq

    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files
    from fileconvert_ray.pipelines.merge_job import run_merge
    from fileconvert_ray.sources.tokseq import synth_rows
    from fileconvert_ray.state.manifest import read_manifest_entries

    base = str(tmp_path / "sh")
    os.makedirs(base)
    pq.write_table(synth_rows(0, 100_000), f"{base}/a.parquet")
    pq.write_table(synth_rows(100_000, 200_000), f"{base}/b.parquet")
    A, B = str(tmp_path / "A"), str(tmp_path / "B")
    cfgA = EncodeConfig(out_dir=A, staged_dir="/dev/shm/slow_mg_a")
    cfgB = EncodeConfig(out_dir=B, staged_dir="/dev/shm/slow_mg_b")
    run_encode_files([f"{base}/a.parquet"], cfgA).materialize()
    run_encode_files([f"{base}/b.parquet"], cfgB).materialize()
    tok_a = sum(e["n_tokens"] for e in read_manifest_entries(A).values())
    tok_b = sum(e["n_tokens"] for e in read_manifest_entries(B).values())

    t0 = time.perf_counter()
    r = run_merge(A, B)
    wall = time.perf_counter() - t0
    assert r["ok"] and r["hardlinked"] and r["n_tokens"] == tok_b
    assert wall <= 5.0, f"merge of ~120M tokens took {wall:.1f}s"
    total = sum(e["n_tokens"] for e in read_manifest_entries(A).values())
    assert total == tok_a + tok_b > 100_000_000
    for d in ("/dev/shm/slow_mg_a", "/dev/shm/slow_mg_b"):
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_merge_dedup_exact_cost_at_scale(ray_session, tmp_path):
    """Cross-store exact dedup at ~60M-token scale: merging a fully
    re-idd copy of a 50k-doc store must tombstone all 50k rows with a
    wall bounded by ~two projected decodes + a key-only join — pinned
    at <= 120 s @4cpus (measured ~35 s; a payload-shuffling or
    driver-collecting design would be several times that)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files
    from fileconvert_ray.pipelines.merge_job import run_merge
    from fileconvert_ray.sources.tokseq import synth_rows

    base = str(tmp_path / "sh")
    os.makedirs(base)
    t = synth_rows(0, 50_000)
    pq.write_table(t, f"{base}/a.parquet")
    reid = t.set_column(
        t.schema.get_field_index("doc_id"),
        "doc_id",
        pc.binary_join_element_wise(
            pa.array(["re-"] * t.num_rows),
            pc.cast(t.column("doc_id"), pa.string()).combine_chunks(),
            "",
        ),
    )
    pq.write_table(reid, f"{base}/b.parquet")
    A, B = str(tmp_path / "A"), str(tmp_path / "B")
    run_encode_files([f"{base}/a.parquet"],
                     EncodeConfig(out_dir=A, staged_dir="/dev/shm/slow_md_a")).materialize()
    run_encode_files([f"{base}/b.parquet"],
                     EncodeConfig(out_dir=B, staged_dir="/dev/shm/slow_md_b")).materialize()

    t0 = time.perf_counter()
    r = run_merge(A, B, dedup="exact")
    wall = time.perf_counter() - t0
    assert r["ok"] and r["duplicates_tombstoned"] == t.num_rows
    assert wall <= 120.0, f"exact merge-dedup of ~120M tokens took {wall:.1f}s"
    for d in ("/dev/shm/slow_md_a", "/dev/shm/slow_md_b"):
        shutil.rmtree(d, ignore_errors=True)
