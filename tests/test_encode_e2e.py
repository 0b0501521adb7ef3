"""End-to-end encode -> decode-verify over Ray (SURVEY.md §5.2.3-5)."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode
from fileconvert_ray.pipelines.verify_job import run_verify
from fileconvert_ray.sources.tokseq import synth_dataset, synth_rows, tokseq_dataset, tokseq_table
from fileconvert_ray.state.manifest import completed_partitions, read_manifest_entries


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "enc")


def test_encode_verify_roundtrip_sf0001(ray_session, sf_dir, out_dir):
    factory = lambda: tokseq_dataset(sf_dir)
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=5_000, encode_concurrency=(1, 4))
    metrics = run_encode(factory, cfg).to_pandas()
    assert metrics["n_rows"].sum() == 500
    tok_total = int(tokseq_table(sf_dir).column("n_tok").to_pandas().sum())
    assert metrics["n_tokens"].sum() == tok_total

    verify = run_verify(factory, out_dir).to_pandas()
    assert verify["ok"].all(), verify[~verify["ok"]]
    assert verify["n_rows"].sum() == 500

    # manifests: one per partition, rows add up exactly
    entries = read_manifest_entries(out_dir)
    assert sum(e["n_rows"] for e in entries.values()) == 500
    assert set(entries) == set(metrics["part_id"])


def test_size_bound_vs_reference_proxy_sf01(ray_session, out_dir):
    """North-rule bound (BASELINE.md): total encoded bytes <= pyarrow
    parquet zstd+dict on the identical table, at realistic partition
    sizes (the 0.720 B/token reference proxy, sf0.1)."""
    sf = "/root/testdata/sf0.1"
    factory = lambda: tokseq_dataset(sf)
    cfg = EncodeConfig(out_dir=out_dir, encode_concurrency=(1, 4))
    metrics = run_encode(factory, cfg).to_pandas()

    t = tokseq_table(sf)
    proxy = os.path.join(out_dir, "proxy.parquet")
    pq.write_table(t, proxy, compression="zstd", use_dictionary=True)
    encoded = int(metrics["encoded_bytes"].sum())
    assert encoded <= os.path.getsize(proxy), (encoded, os.path.getsize(proxy))
    n_tokens = int(metrics["n_tokens"].sum())
    assert encoded / n_tokens < 0.72  # beats the measured reference proxy


def test_resume_skips_completed(ray_session, sf_dir, out_dir):
    factory = lambda: tokseq_dataset(sf_dir)
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=5_000, encode_concurrency=(1, 4))
    run_encode(factory, cfg).materialize()
    entries1 = read_manifest_entries(out_dir)
    assert len(entries1) > 2

    # drop manifests (not containers) for half the partitions -> only
    # those re-encode (SURVEY §5.2.4)
    victims = sorted(entries1)[: len(entries1) // 2]
    for p in victims:
        os.remove(os.path.join(out_dir, "manifest", f"{p}.json"))
    assert completed_partitions(out_dir) == set(entries1) - set(victims)

    metrics2 = run_encode(factory, cfg).to_pandas()
    assert sorted(metrics2["part_id"]) == victims  # only victims re-ran

    verify = run_verify(factory, out_dir).to_pandas()
    assert verify["ok"].all()


def test_skew_split(ray_session, out_dir):
    """F3: hot source split into multiple bounded partitions (§5.2.5)."""
    factory = lambda: synth_dataset(4000, num_blocks=8, seed=7)
    target = 50_000
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=target, encode_concurrency=(1, 4))
    metrics = run_encode(factory, cfg).to_pandas()
    assert metrics["n_rows"].sum() == 4000

    plan = json.load(open(os.path.join(out_dir, "plan.json")))
    hot = max(plan["source_tokens"], key=plan["source_tokens"].get)
    assert plan["buckets"][hot] >= 4  # hot source actually split

    # per-partition token counts bounded: no partition > 2x target + max doc len
    per_part = metrics.set_index("part_id")["n_tokens"]
    assert per_part.max() <= 2 * target + 32_768

    verify = run_verify(factory, out_dir).to_pandas()
    assert verify["ok"].all()


def test_synth_corpus_roundtrip(ray_session, out_dir):
    """F1b corpus with bursts/skew round-trips bit-identically."""
    factory = lambda: synth_dataset(2000, num_blocks=4)
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=200_000)
    metrics = run_encode(factory, cfg).to_pandas()
    verify = run_verify(factory, out_dir).to_pandas()
    assert verify["ok"].all()
    assert metrics["n_rows"].sum() == 2000
    # compression actually happened (zipf vocab 50257 -> ~2B/token worst case)
    assert metrics["encoded_bytes"].sum() < metrics["plain_bytes"].sum()


def test_hash_verify_modes_and_corruption(ray_session, sf_dir, out_dir):
    """mode='hash' (the shuffle-free scale path): agrees with exact mode
    on good data; flags a tampered payload and a missing container as
    per-partition failures without crashing the job."""
    factory = lambda: tokseq_dataset(sf_dir)
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=5_000)
    run_encode(factory, cfg).materialize()

    v = run_verify(factory, out_dir, mode="hash").to_pandas()
    assert v["ok"].all() and len(v) > 2
    assert v["n_rows"].sum() == 500

    parts = sorted(v["part_id"])
    # tamper: flip one byte inside the first partition's payload column
    victim = os.path.join(out_dir, "parts", f"{parts[0]}.parquet")
    cont = pq.read_table(victim)
    pay = cont.column("payload").to_pylist()
    pay[0] = pay[0][:-1] + bytes([pay[0][-1] ^ 0xFF])
    cont = cont.set_column(
        cont.column_names.index("payload"), "payload", pa.array(pay, type=pa.binary())
    )
    pq.write_table(cont, victim, compression="none")
    # delete: remove another partition's container entirely
    os.remove(os.path.join(out_dir, "parts", f"{parts[1]}.parquet"))

    v2 = run_verify(factory, out_dir, mode="hash").to_pandas().set_index("part_id")
    assert not v2.loc[parts[0], "ok"]
    assert not v2.loc[parts[1], "ok"]
    assert v2.drop(index=[parts[0], parts[1]])["ok"].all()

    # manifest mode: same verdicts, zero input re-read (factory unused)
    v3 = run_verify(None, out_dir, mode="manifest").to_pandas().set_index("part_id")
    assert len(v3) == len(v2)
    assert not v3.loc[parts[0], "ok"]
    assert not v3.loc[parts[1], "ok"]
    assert v3.drop(index=[parts[0], parts[1]])["ok"].all()

    # physical truncation (invalid parquet footer — a crash mid-write
    # that somehow bypassed tmp+rename): flagged, never fatal
    victim3 = os.path.join(out_dir, "parts", f"{parts[2]}.parquet")
    with open(victim3, "r+b") as f:
        f.truncate(os.path.getsize(victim3) // 2)
    bad = {parts[0], parts[1], parts[2]}
    for mode, fac in (("hash", factory), ("manifest", None)):
        v4 = run_verify(fac, out_dir, mode=mode).to_pandas().set_index("part_id")
        assert not v4.loc[parts[2], "ok"], mode
        assert v4.drop(index=sorted(bad))["ok"].all(), mode


def test_staged_rowgroups_bounded_by_buckets(ray_session, sf_dir, out_dir):
    """Round-1 verdict fix: staged row groups must be O(blocks x buckets),
    independent of partition count — NOT O(blocks x partitions)."""
    import pyarrow.parquet as _pq

    from fileconvert_ray.pipelines.encode_job import run_encode as _run

    factory = lambda: tokseq_dataset(sf_dir)
    # tiny partitions: ~500+ partitions from 28k tokens
    cfg = EncodeConfig(
        out_dir=out_dir, target_partition_tokens=50, reduce_buckets=16, resume=False
    )
    # keep staged files around by monkey... simpler: count row groups as
    # metadata flows — run encode, then count from manifests+staged dir.
    # staged/ survives until the next run's rmtree, so inspect directly.
    metrics = _run(factory, cfg).to_pandas()
    n_parts = len(metrics)
    assert n_parts >= 200, n_parts
    staged = glob.glob(os.path.join(out_dir, "staged", "*.parquet"))
    assert staged, "staged files should still exist after the run"
    n_blocks = len(staged)
    total_rgs = sum(_pq.ParquetFile(p).metadata.num_row_groups for p in staged)
    assert total_rgs <= n_blocks * 16, (total_rgs, n_blocks, n_parts)
    assert total_rgs < n_blocks * n_parts / 4
    v = run_verify(factory, out_dir, mode="hash").to_pandas()
    assert v["ok"].all()
    assert len(v) == n_parts


def test_bucket_restage_path_roundtrip(ray_session, sf_dir, out_dir):
    """Oversized buckets re-stage locally to per-partition row groups;
    the result must be bit-identical to the in-memory path."""
    factory = lambda: tokseq_dataset(sf_dir)
    cfg = EncodeConfig(
        out_dir=out_dir,
        target_partition_tokens=5_000,
        bucket_restage_bytes=1,  # force the restage branch for every bucket
    )
    metrics = run_encode(factory, cfg).to_pandas()
    assert metrics["n_rows"].sum() == 500
    v = run_verify(factory, out_dir).to_pandas()
    assert v["ok"].all(), v[~v["ok"]]


def test_side_columns_roundtrip(ray_session, out_dir):
    """Float/timestamp/binary side columns beyond the core tokseq schema
    ride the container end-to-end, bit-identical (round-1 verdict gap)."""
    import numpy as np
    import ray.data as rd

    from fileconvert_ray.stages.decoder import decode_dataset

    t = synth_rows(0, 300)
    rng = np.random.default_rng(7)
    t = t.append_column("score", pa.array(rng.random(300), type=pa.float64()))
    t = t.append_column(
        "crawled_at", pa.array(np.arange(0, 300, dtype=np.int64).view("datetime64[ms]"))
    )
    t = t.append_column(
        "blob", pa.array([bytes([i % 256, 255 - i % 256]) for i in range(300)], type=pa.binary())
    )
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=30_000)
    m = run_encode(lambda: rd.from_arrow(t), cfg).to_pandas()
    assert m["n_rows"].sum() == 300
    dec = (
        decode_dataset(out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    orig = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(dec.columns) == list(orig.columns)
    assert (dec["score"] == orig["score"]).all()
    assert (dec["crawled_at"] == orig["crawled_at"]).all()
    assert (dec["blob"] == orig["blob"]).all()
    assert dec["tokens"].map(list).equals(orig["tokens"].map(list))


def test_list_side_column_roundtrip(ray_session, tmp_path):
    """Round-2 verdict gap #1: a list<float32> side column (embedding)
    rides the container bit-identically — flat values encoded ONCE as
    <name>@values plus a <name>@lens column, offsets re-derived on
    decode (nulls and empty lists included)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode
    from fileconvert_ray.sources.tokseq import synth_rows
    from fileconvert_ray.stages.decoder import decode_dataset
    from fileconvert_ray.pipelines.verify_job import run_verify

    base = synth_rows(0, 300)
    rng = np.random.default_rng(3)
    embs = [rng.standard_normal(rng.integers(1, 9)).astype(np.float32) for _ in range(298)]
    embs = [None, np.zeros(0, np.float32)] + embs  # null row + empty list
    emb = pa.array(
        [e if e is None else e.tolist() for e in embs], type=pa.list_(pa.float32())
    )
    t = base.append_column("embedding", emb)
    grams = pa.array(
        [rng.integers(0, 2**40, rng.integers(0, 6)).tolist() for _ in range(300)],
        type=pa.list_(pa.int64()),
    )
    t = t.append_column("ngrams", grams)
    out = str(tmp_path / "sidecol")
    factory = lambda: rd.from_arrow(t)
    m = run_encode(factory, EncodeConfig(out_dir=out, target_partition_tokens=4_000)).to_pandas()
    assert m["n_rows"].sum() == 300
    decoded = (
        pa.concat_tables(
            decode_dataset(out).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        .combine_chunks()
        .sort_by("doc_id")
    )
    orig = t.sort_by("doc_id")
    assert decoded.num_rows == 300
    for col in ("embedding", "ngrams"):
        got = decoded.column(col).combine_chunks()
        exp = orig.column(col).combine_chunks()
        assert got.type == exp.type
        assert got.equals(exp), f"{col} list column not bit-identical"
    # core-column verify still green with the side column present
    v = run_verify(factory, out, mode="hash").to_pandas()
    assert v["ok"].all()


def test_partition_decode_streams_row_groups(tmp_path, monkeypatch):
    """Round-2 verdict #10: containers are written one row group per
    chunk and iter_partition_chunks streams them — consuming the first
    decoded chunk must not read later row groups (and therefore never
    materializes every payload at once)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    from fileconvert_ray.sources.tokseq import synth_rows
    from fileconvert_ray.stages.decoder import iter_partition_chunks, read_partition
    from fileconvert_ray.stages.encoder import PartitionWriter

    rows = synth_rows(0, 2_000)
    writer = PartitionWriter(str(tmp_path / "out"), compact_chunk_tokens=20_000)
    writer.finalize_raw(rows, "p0", "s0")
    path = writer.dirs.container_path("p0")
    n_rg = pq.ParquetFile(path).metadata.num_row_groups
    assert n_rg >= 4, f"expected multi-chunk container, got {n_rg} row groups"

    reads: list[int] = []
    orig = pq.ParquetFile.read_row_group

    def spy(self, rg, *a, **kw):
        reads.append(rg)
        return orig(self, rg, *a, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", spy)
    it = iter_partition_chunks(path)
    first = next(it)
    assert first.num_rows > 0
    # first chunk needs at most the first two row groups (the carryover
    # rule holds back the last uid of each group until the next is seen)
    assert len(reads) <= 2, f"read {reads} row groups for the first chunk"
    rest = list(it)
    assert sorted(reads) == list(range(n_rg))
    # stream output equals the whole-table read
    whole = read_partition(path).sort_by("doc_id")
    streamed = pa.concat_tables([first] + rest).combine_chunks().sort_by("doc_id")
    assert streamed.equals(whole)
    assert whole.num_rows == 2_000


def test_encode_empty_input(ray_session, out_dir):
    """A zero-row input is a no-op, not a crash: 0 partitions, 0
    manifest entries, and verify over the empty output is trivially
    complete (no silent ok=False rows)."""
    import ray.data as rd

    from fileconvert_ray.sources.tokseq import INPUT_SCHEMA

    empty = pa.Table.from_pydict({f.name: [] for f in INPUT_SCHEMA}, schema=INPUT_SCHEMA)
    m = run_encode(lambda: rd.from_arrow(empty), EncodeConfig(out_dir=out_dir)).to_pandas()
    assert len(m) == 0
    assert completed_partitions(out_dir) == set()
    v = run_verify(lambda: rd.from_arrow(empty), out_dir).to_pandas()
    assert len(v) == 0


def test_zone_map_pruning_and_filtered_decode(ray_session, sf_dir, out_dir):
    """Manifest zone maps: every completed partition records its source
    and n_tok min/max; prune_partitions skips non-matching partitions;
    decode_dataset with a predicate equals decode-everything-then-filter."""
    import numpy as np

    from fileconvert_ray.stages.decoder import decode_dataset, prune_partitions

    run_encode(
        lambda: tokseq_dataset(sf_dir), EncodeConfig(out_dir=out_dir, target_partition_tokens=2000)
    ).materialize()
    entries = read_manifest_entries(out_dir)
    assert entries and all("zones" in r and "n_tok" in r["zones"] for r in entries.values())

    kept, total = prune_partitions(out_dir, sources=["src0"], min_n_tok=60)
    assert 0 < len(kept) < total  # pruning actually skips partitions
    assert all(entries[p]["source"] == "src0" for p in kept)
    assert all(entries[p]["zones"]["n_tok"][1] >= 60 for p in kept)

    got = (
        decode_dataset(out_dir, sources=["src0"], min_n_tok=60)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ref = decode_dataset(out_dir).to_pandas()
    ref = ref[(ref["source"] == "src0") & (ref["n_tok"] >= 60)]
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["n_tok"].tolist() == ref["n_tok"].tolist()
    for a, b in zip(got["tokens"], ref["tokens"]):
        assert np.array_equal(a, b)


def test_compaction_preserves_rows_and_reduces_partitions(ray_session, sf_dir, out_dir):
    """Compacting many small partitions into target-size containers
    keeps every row bit-identical (hash verify vs the ORIGINAL input
    still green), reduces the partition count, and is idempotent."""
    from fileconvert_ray.pipelines.compact_job import plan_compaction, run_compact

    factory = lambda: tokseq_dataset(sf_dir)
    run_encode(factory, EncodeConfig(out_dir=out_dir, target_partition_tokens=1500)).materialize()
    before = completed_partitions(out_dir)
    assert len(before) > 10  # plenty of small partitions

    m = run_compact(out_dir, target_tokens=8000).to_pandas()
    after = completed_partitions(out_dir)
    assert len(after) < len(before)
    assert len(m) > 0 and set(m["part_id"]) <= after
    # zones + digest ride along on compacted partitions
    recs = read_manifest_entries(out_dir)
    for pid in m["part_id"]:
        assert "zones" in recs[pid] and "digest" in recs[pid]

    # partition-granularity hash verify is invalidated by design
    # (boundaries moved); source granularity is repartition-invariant
    v = run_verify(factory, out_dir, mode="hash", by="source").to_pandas()
    assert bool(v.ok.all()) and len(v) > 0
    vm = run_verify(None, out_dir, mode="manifest").to_pandas()
    assert bool(vm.ok.all())

    again = run_compact(out_dir, target_tokens=8000).to_pandas()
    assert len(again) == 0  # idempotent: nothing left to rewrite


def test_compaction_crash_recovery(ray_session, sf_dir, out_dir):
    """Intent-record replay: a 'crash' after the new manifest lands is
    finished forward (olds removed); a crash before it rolls back (new
    container removed, olds untouched); verify stays green both times."""
    import json

    from fileconvert_ray.pipelines.compact_job import (
        compact_group,
        plan_compaction,
        recover_compaction,
    )
    from fileconvert_ray.state.manifest import JobDirs, _atomic_write_bytes
    from fileconvert_ray.stages.decoder import read_partition
    from fileconvert_ray.stages.encoder import PartitionWriter

    factory = lambda: tokseq_dataset(sf_dir)
    run_encode(factory, EncodeConfig(out_dir=out_dir, target_partition_tokens=1500)).materialize()
    groups = plan_compaction(out_dir, 8000)
    assert len(groups) >= 2
    dirs = JobDirs(out_dir)
    idir = os.path.join(out_dir, "compact")
    os.makedirs(idir, exist_ok=True)

    # crash AFTER step 2: intent + new manifest exist, olds not deleted
    g1 = groups[0]
    _atomic_write_bytes(os.path.join(idir, f"{g1['gid']}.json"),
                        json.dumps({"olds": g1["olds"]}).encode())
    decoded = pa.concat_tables(
        [read_partition(dirs.container_path(p)) for p in g1["olds"]]
    ).combine_chunks()
    PartitionWriter(out_dir).finalize_raw(decoded, g1["gid"], g1["source"])

    # crash BEFORE the new manifest: intent + orphan container only
    g2 = groups[1]
    _atomic_write_bytes(os.path.join(idir, f"{g2['gid']}.json"),
                        json.dumps({"olds": g2["olds"]}).encode())
    with open(dirs.container_path(g2["gid"]), "wb") as f:
        f.write(b"garbage half-written container")

    r = recover_compaction(out_dir)
    assert r == {"finished": 1, "rolled_back": 1}
    done = completed_partitions(out_dir)
    assert g1["gid"] in done and not (set(g1["olds"]) & done)
    assert g2["gid"] not in done and set(g2["olds"]) <= done
    assert not os.path.exists(dirs.container_path(g2["gid"]))
    v = run_verify(factory, out_dir, mode="hash", by="source").to_pandas()
    assert bool(v.ok.all())


def test_resume_refuses_changed_input(ray_session, sf_dir, out_dir, tmp_path):
    """Resuming against a GROWN corpus must fail loudly, not silently
    skip new docs that hash into already-completed part_ids."""
    import shutil

    import pytest

    small = str(tmp_path / "small")
    os.makedirs(small)
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    pq.write_table(t.slice(0, 400), f"{small}/documents.parquet")
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=5_000, encode_concurrency=(1, 4))
    run_encode(lambda: tokseq_dataset(small), cfg).materialize()
    assert len(read_manifest_entries(out_dir)) > 0

    grown = str(tmp_path / "grown")
    os.makedirs(grown)
    pq.write_table(t, f"{grown}/documents.parquet")  # 100 more docs
    with pytest.raises(RuntimeError, match="resume refused"):
        run_encode(lambda: tokseq_dataset(grown), cfg).materialize()

    # same input again -> resume remains a clean no-op
    m = run_encode(lambda: tokseq_dataset(small), cfg).to_pandas()
    assert len(m) == 0

    # --no-resume rebuilds the out dir for the grown input
    shutil.rmtree(out_dir)
    cfg2 = EncodeConfig(
        out_dir=out_dir, target_partition_tokens=5_000, encode_concurrency=(1, 4), resume=False
    )
    run_encode(lambda: tokseq_dataset(grown), cfg2).materialize()
    v = run_verify(lambda: tokseq_dataset(grown), out_dir).to_pandas()
    assert v["ok"].all() and len(v) > 0


def test_no_resume_rebuild_clears_stale_partitions(ray_session, sf_dir, out_dir, tmp_path):
    """resume=False must REBUILD: containers/manifests from a previous
    (different) plan may not survive, or decode would read stale ids."""
    big = str(tmp_path / "big")
    small = str(tmp_path / "small2")
    os.makedirs(big); os.makedirs(small)
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    pq.write_table(t, f"{big}/documents.parquet")
    pq.write_table(t.slice(0, 120), f"{small}/documents.parquet")

    # tiny target -> many buckets per source, so the rebuild (bigger
    # target, fewer docs) has strictly fewer part_ids to leave stale
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=500, encode_concurrency=(1, 4))
    run_encode(lambda: tokseq_dataset(big), cfg).materialize()
    ids_big = set(read_manifest_entries(out_dir))

    cfg2 = EncodeConfig(
        out_dir=out_dir, target_partition_tokens=50_000, encode_concurrency=(1, 4), resume=False
    )
    run_encode(lambda: tokseq_dataset(small), cfg2).materialize()
    ids_small = set(read_manifest_entries(out_dir))
    assert ids_small
    assert ids_big - ids_small  # the big run HAD extra partitions to clear
    # nothing from the big run lingers in parts/ or manifest/
    on_disk = {f[:-8] for f in os.listdir(os.path.join(out_dir, "parts")) if f.endswith(".parquet")}
    assert on_disk == ids_small
    v = run_verify(lambda: tokseq_dataset(small), out_dir).to_pandas()
    assert v["ok"].all() and len(v) == len(ids_small)


def test_staged_dir_override_roundtrip(ray_session, sf_dir, out_dir, tmp_path):
    """Custom shuffle-scratch location (tmpfs/NVMe deployment shape):
    encode with staged_dir outside out_dir must round-trip verify-clean
    and leave out_dir/staged unused."""
    import os

    scratch = str(tmp_path / "scratch")
    factory = lambda: tokseq_dataset(sf_dir)
    cfg = EncodeConfig(
        out_dir=out_dir, target_partition_tokens=5_000, staged_dir=scratch
    )
    run_encode(factory, cfg).materialize()
    assert not os.listdir(os.path.join(out_dir, "staged"))
    v = run_verify(factory, out_dir).to_pandas()
    assert v["ok"].all()


def test_projected_decode(ray_session, sf_dir, out_dir):
    """decode_dataset(columns=...) equals the full decode's projection;
    the tokens payload is genuinely skipped (decode_array never sees
    the tokens column), and predicate columns decode for the filter
    then drop."""
    from unittest import mock

    from fileconvert_ray.stages import decoder as dec
    from fileconvert_ray.stages.decoder import decode_dataset, iter_partition_chunks
    from fileconvert_ray.state.manifest import JobDirs, completed_partitions

    run_encode(
        lambda: tokseq_dataset(sf_dir), EncodeConfig(out_dir=out_dir, target_partition_tokens=2000)
    ).materialize()

    full = decode_dataset(out_dir).to_pandas().sort_values("doc_id", ignore_index=True)

    proj = (
        decode_dataset(out_dir, columns=["doc_id", "n_tok", "source"])
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert list(proj.columns) == ["doc_id", "n_tok", "source"]
    assert proj.equals(full[["doc_id", "n_tok", "source"]])

    # predicate + projection: filter column decodes, then drops
    sub = (
        decode_dataset(out_dir, sources=["src0"], columns=["doc_id"])
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    want = full[full.source == "src0"]["doc_id"].sort_values(ignore_index=True)
    assert sub["doc_id"].tolist() == want.tolist()

    # the pruned path never decodes the tokens payload
    path = JobDirs(out_dir).container_path(sorted(completed_partitions(out_dir))[0])
    seen = []
    real = dec.decode_array

    def spy(enc):
        seen.append(enc.column)
        return real(enc)

    with mock.patch.object(dec, "decode_array", side_effect=spy):
        t = next(iter_partition_chunks(path, ["doc_id", "n_tok"]))
    assert set(t.column_names) == {"doc_id", "n_tok"}
    assert "tokens" not in seen


def test_chunk_zone_map_skips_decode(ray_session, sf_dir, out_dir):
    """Chunk-granular zone maps: a selective n_tok range decodes FEWER
    chunks than a full scan (the skip happens before any payload is
    touched) while decode_dataset's filtered result stays exact."""
    from fileconvert_ray.stages.decoder import decode_dataset, iter_partition_chunks
    from fileconvert_ray.state.manifest import JobDirs, completed_partitions

    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out_dir, target_partition_tokens=20000, compact_chunk_tokens=500),
    ).materialize()

    dirs = JobDirs(out_dir)
    paths = [dirs.container_path(p) for p in sorted(completed_partitions(out_dir))]
    n_all = sum(1 for p in paths for _ in iter_partition_chunks(p))
    hi_cut = 90
    n_rng = sum(1 for p in paths for _ in iter_partition_chunks(p, n_tok_range=(hi_cut, None)))
    assert 0 < n_rng < n_all  # chunks actually skipped

    got = (
        decode_dataset(out_dir, min_n_tok=hi_cut)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    ref = decode_dataset(out_dir).to_pandas()
    ref = ref[ref.n_tok >= hi_cut].sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["n_tok"].tolist() == ref["n_tok"].tolist()


def test_lookup_docs_point_access(ray_session, sf_dir, out_dir):
    """Index-free point lookup: requested doc_ids come back bit-equal
    to the source rows, a missing id returns nothing, and the candidate
    set is partitions-per-source, never the whole corpus."""
    import numpy as np

    from fileconvert_ray.stages.decoder import lookup_docs
    from fileconvert_ray.state.manifest import completed_partitions

    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out_dir, target_partition_tokens=2000),
    ).materialize()
    src_table = tokseq_table(sf_dir)
    ids = [src_table.column("doc_id")[i].as_py() for i in (0, 7, 311)]

    got = lookup_docs(out_dir, ids + ["no-such-doc"]).to_pandas()
    assert sorted(got["doc_id"]) == sorted(ids)
    ref = src_table.to_pandas().set_index("doc_id")
    for _, row in got.iterrows():
        want = ref.loc[row["doc_id"]]
        assert row["n_tok"] == want["n_tok"] and row["source"] == want["source"]
        assert np.array_equal(row["tokens"], want["tokens"])

    # with the source known, fanout is one partition per requested id
    one = lookup_docs(out_dir, [ids[0]], sources=[got["source"].iloc[0]])
    assert one.num_rows == 1
    assert len(completed_partitions(out_dir)) > 3  # lookup had real pruning to do


def test_lookup_docs_planned_empty_bucket(ray_session, out_dir):
    """Round-4 advice regression (decoder.lookup_docs): the bucket
    modulus must come from plan.json, not from the count of
    MATERIALIZED partitions.  Build a corpus whose plan allocates more
    buckets than get any docs; with the old len(pids) modulus the
    lookup hashed ids into an existing-but-wrong partition and silently
    returned nothing."""
    import numpy as np
    import ray.data as rd

    from fileconvert_ray.sources.tokseq import INPUT_SCHEMA
    from fileconvert_ray.stages.decoder import lookup_docs
    from fileconvert_ray.state.manifest import completed_partitions, read_plan
    from fileconvert_ray.util.hashing import hash_strings_u64

    # find two doc ids that share a bucket under k=4 so >=2 planned
    # buckets stay empty (deterministic: hash_strings_u64 is seedless)
    ids = None
    for i in range(1000):
        cand = [f"doc-{i}", f"doc-{i + 1000}"]
        h = hash_strings_u64(pa.array(cand)) % np.uint64(4)
        if h[0] == h[1]:
            ids = cand
            break
    assert ids is not None

    tokens = [list(range(2000)), list(range(2000, 4000))]
    t = pa.Table.from_arrays(
        [
            pa.array(ids, type=pa.string()),
            pa.array(tokens, type=pa.list_(pa.int32())),
            pa.array([2000, 2000], type=pa.int32()),
            pa.array(["web", "web"], type=pa.string()),
        ],
        schema=INPUT_SCHEMA,
    )
    run_encode(
        lambda: rd.from_arrow(t),
        EncodeConfig(out_dir=out_dir, target_partition_tokens=1000),
    ).materialize()

    # premise: the plan allocated more buckets than got containers
    assert read_plan(out_dir)["buckets"]["web"] == 4
    assert len(completed_partitions(out_dir)) < 4

    got = lookup_docs(out_dir, ids).to_pandas().sort_values("doc_id", ignore_index=True)
    assert sorted(got["doc_id"]) == sorted(ids)
    assert got["n_tok"].tolist() == [2000, 2000]


# -------------------------- incremental (append-aware) encode


def _write_shards(tmp_path, slices):
    """synth_rows slices -> parquet shard paths."""
    paths = []
    for i, (a, b) in enumerate(slices):
        p = str(tmp_path / f"shard{i}.parquet")
        pq.write_table(synth_rows(a, b, n_sources=4), p)
        paths.append(p)
    return paths


def test_incremental_encode_touches_only_new_shards(ray_session, tmp_path, out_dir):
    """Round-4 verdict item 1: an appended corpus costs O(new data).
    Encode two shards, append a third, re-run — completed partitions
    and their manifests are BYTE-UNTOUCHED (mtime+size), new rows land
    in -g01- partitions, and decode/verify see one coherent corpus."""
    import ray.data as rd

    from fileconvert_ray.pipelines.encode_job import run_encode_files
    from fileconvert_ray.stages.decoder import decode_dataset
    from fileconvert_ray.state.manifest import read_plan

    shards = _write_shards(tmp_path, [(0, 300), (300, 600), (600, 900)])
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=500_000)

    m1 = run_encode_files(shards[:2], cfg).to_pandas()
    assert int(m1["n_rows"].sum()) == 600
    entries1 = read_manifest_entries(out_dir)
    assert all("-g" not in pid for pid in entries1)  # gen 0 = classic labels
    stamp = {
        pid: os.stat(os.path.join(out_dir, "manifest", f"{pid}.json"))
        for pid in entries1
    }
    stamp = {pid: (st.st_mtime_ns, st.st_size) for pid, st in stamp.items()}

    m2 = run_encode_files(shards, cfg).to_pandas()
    assert int(m2["n_rows"].sum()) == 300
    assert all("-g01-" in pid for pid in m2["part_id"])  # only new partitions
    for pid, (mt, sz) in stamp.items():  # old manifests byte-untouched
        st = os.stat(os.path.join(out_dir, "manifest", f"{pid}.json"))
        assert (st.st_mtime_ns, st.st_size) == (mt, sz), pid

    plan = read_plan(out_dir)
    assert [g["gen"] for g in plan["generations"]] == [0, 1]
    assert all(g["sealed"] for g in plan["generations"])

    # the union decodes as one corpus and verifies against the shards
    dec = decode_dataset(out_dir)
    assert dec.count() == 900
    v = run_verify(None, out_dir, mode="hash").to_pandas()
    assert bool(v["ok"].all()) and int(v["n_rows"].sum()) == 900
    ve = run_verify(None, out_dir, mode="exact").to_pandas()
    assert bool(ve["ok"].all()) and int(ve["n_rows"].sum()) == 900

    # idempotent: nothing new -> no pass runs, no metrics
    m3 = run_encode_files(shards, cfg).to_pandas()
    assert len(m3) == 0


def test_incremental_refuses_rewrite(ray_session, tmp_path, out_dir):
    """A changed or removed shard is a rewrite, not an append."""
    from fileconvert_ray.pipelines.encode_job import run_encode_files

    shards = _write_shards(tmp_path, [(0, 200), (200, 400)])
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=500_000)
    run_encode_files(shards, cfg).materialize()

    pq.write_table(synth_rows(0, 250, n_sources=4), shards[0])  # grown shard
    with pytest.raises(RuntimeError, match="not an append"):
        run_encode_files(shards, cfg)
    pq.write_table(synth_rows(0, 200, n_sources=4), shards[0])  # restore
    with pytest.raises(RuntimeError, match="not an append"):
        run_encode_files(shards[1:], cfg)  # shard0 disappeared

    # a run_encode (non-generational) output refuses incremental resume
    out2 = str(tmp_path / "plain")
    run_encode(
        lambda: synth_dataset(100, num_blocks=2),
        EncodeConfig(out_dir=out2, target_partition_tokens=500_000),
    ).materialize()
    with pytest.raises(RuntimeError, match="no file lineage"):
        run_encode_files(shards, EncodeConfig(out_dir=out2, target_partition_tokens=500_000))


def test_incremental_crash_resume_is_partition_granular(ray_session, tmp_path, out_dir):
    """A run interrupted mid-generation (unsealed in plan.json, some
    partitions missing manifests) resumes by re-encoding ONLY the
    missing partitions of that generation, then seals it."""
    from fileconvert_ray.pipelines.encode_job import run_encode_files
    from fileconvert_ray.state.manifest import read_plan, write_plan

    shards = _write_shards(tmp_path, [(0, 300), (300, 900)])
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=50_000)
    run_encode_files(shards[:1], cfg).materialize()
    run_encode_files(shards, cfg).materialize()

    g1_parts = sorted(p for p in read_manifest_entries(out_dir) if "-g01-" in p)
    assert len(g1_parts) >= 2
    victim = g1_parts[0]
    os.remove(os.path.join(out_dir, "manifest", f"{victim}.json"))
    plan = read_plan(out_dir)
    plan["generations"][1]["sealed"] = False  # simulate the crash window
    write_plan(out_dir, plan)

    m = run_encode_files(shards, cfg).to_pandas()
    assert sorted(m["part_id"]) == [victim]  # only the victim re-ran
    assert all(g["sealed"] for g in read_plan(out_dir)["generations"])
    v = run_verify(None, out_dir, mode="hash").to_pandas()
    assert bool(v["ok"].all()) and int(v["n_rows"].sum()) == 900


def test_compaction_over_generational_corpus(ray_session, tmp_path, out_dir):
    """Default compaction over a generational corpus packs small
    partitions WITHIN each generation (both gens compact, no group
    mixes them — snapshot reads survive); rows survive bit-identically
    (source-granular hash verify green) and lookup still finds docs in
    compacted partitions via the source fallback.  Cross-generation
    packing is the explicit opt-in (preserve_generations=False), after
    which snapshots refuse."""
    from fileconvert_ray.pipelines.compact_job import plan_compaction, run_compact
    from fileconvert_ray.pipelines.encode_job import run_encode_files
    from fileconvert_ray.stages.decoder import (
        label_generations,
        lookup_docs,
        partitions_for_generations,
    )

    shards = _write_shards(tmp_path, [(0, 300), (300, 600)])
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=50_000)
    run_encode_files(shards[:1], cfg).materialize()
    run_encode_files(shards, cfg).materialize()
    before = read_manifest_entries(out_dir)
    gen_before = label_generations(out_dir)
    snap0_rows = sum(
        before[p]["n_rows"] for p in partitions_for_generations(out_dir, 0)
    )

    # no planned group mixes generations
    for g in plan_compaction(out_dir, 10_000_000):
        assert len({gen_before[p] for p in g["olds"]}) == 1
    m = run_compact(out_dir, target_tokens=10_000_000).to_pandas()
    assert len(m) > 0
    # both generations had compactable groups (src0 is skewed in each)
    after = read_manifest_entries(out_dir)
    gone = set(before) - set(after)
    assert any("-g01-" in p for p in gone) and any("-g01-" not in p for p in gone)

    # snapshot boundary intact: gen-0 row count unchanged, -c labels attributed
    assert sum(
        after[p]["n_rows"] for p in partitions_for_generations(out_dir, 0)
    ) == snap0_rows

    v = run_verify(None, out_dir, mode="hash", by="source").to_pandas()
    assert bool(v["ok"].all()) and int(v["n_rows"].sum()) == 600
    # point lookup across a compacted generational corpus
    got = lookup_docs(out_dir, ["d000000123", "d000000456"]).to_pandas()
    assert sorted(got["doc_id"]) == ["d000000123", "d000000456"]

    # opt-in cross-gen packing merges the two survivors -> snapshot refuses
    mx = run_compact(
        out_dir, target_tokens=10_000_000, preserve_generations=False
    ).to_pandas()
    assert len(mx) > 0
    with pytest.raises(RuntimeError, match="snapshot"):
        partitions_for_generations(out_dir, 0)
    v2 = run_verify(None, out_dir, mode="hash", by="source").to_pandas()
    assert bool(v2["ok"].all()) and int(v2["n_rows"].sum()) == 600


def test_curate_hygiene_chain_encodes_and_verifies(ray_session, sf_dir, tmp_path):
    """Full pre-training hygiene chain through run_curate: exact dedup
    -> MinHash near-dedup -> eval-set decontamination -> quality filter
    -> split -> encode -> hash-verify, one call.  Pins that the two
    optional stages compose with the encode tail (not just --no-encode,
    which the CLI test covers) and that verify stays green on the
    filtered corpus."""
    import pyarrow.parquet as pq

    from fileconvert_ray.pipelines.curate_job import run_curate

    # eval set = a couple of corpus docs verbatim -> decontam must drop
    # them; everything else flows through to a verified encode
    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    eval_pq = str(tmp_path / "eval.parquet")
    pq.write_table(pa.table({"text": base.column("text").to_pylist()[:2]}), eval_pq)

    out = str(tmp_path / "cur")
    r = run_curate(
        f"{sf_dir}/documents.parquet", out,
        target_partition_tokens=5000,
        near_dedup=True, decontam_path=eval_pq,
    )
    assert r["near_dedup"] and r["decontaminated"]
    assert 0 < r["n_curated"] < r["n_input"]
    if r["splits"]["train"] > 0:
        assert r["verify_ok"] and r["n_tokens"] > 0
        assert r["total_partitions"] > 0
    # dropped eval docs never reach the curated output
    import pyarrow.dataset as pds

    ids = set(
        pds.dataset(f"{out}/curated", partitioning="hive")
        .to_table(columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    assert not ({base.column("doc_id")[0].as_py(), base.column("doc_id")[1].as_py()} & ids)


def test_generation_scoped_verify(ray_session, tmp_path, out_dir):
    """gens= verifies ONLY the listed ingest generations — the
    incremental-verify path: corrupt a gen-0 container, gens=[1] stays
    green in every mode while the unscoped run (and gens=[0]) fails;
    manifest-mode scoping survives generation-preserving compaction."""
    from fileconvert_ray.pipelines.compact_job import run_compact
    from fileconvert_ray.pipelines.encode_job import run_encode_files

    shards = _write_shards(tmp_path, [(0, 300), (300, 600)])
    cfg = EncodeConfig(out_dir=out_dir, target_partition_tokens=50_000)
    run_encode_files(shards[:1], cfg).materialize()
    run_encode_files(shards, cfg).materialize()

    for mode in ("exact", "hash", "manifest"):
        v1 = run_verify(None, out_dir, mode=mode, gens=[1]).to_pandas()
        assert bool(v1["ok"].all()) and len(v1) > 0
        assert all("-g01-" in p for p in v1["part_id"])
        assert int(v1["n_rows"].sum()) == 300

    # guardrails: unknown generation, by='source' with gens
    with pytest.raises(ValueError, match="unknown ingest generation"):
        run_verify(None, out_dir, mode="hash", gens=[7])
    with pytest.raises(ValueError, match="source"):
        run_verify(None, out_dir, mode="hash", by="source", gens=[1])

    # corrupt one gen-0 container: scoped-to-gen-1 stays green,
    # gen-0 scope and the unscoped run both catch it
    victim = sorted(
        p for p in read_manifest_entries(out_dir) if "-g" not in p
    )[0]
    path = os.path.join(out_dir, "parts", f"{victim}.parquet")
    raw = bytearray(open(path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(path, "wb").write(bytes(raw))

    ok1 = run_verify(None, out_dir, mode="hash", gens=[1]).to_pandas()
    assert bool(ok1["ok"].all())
    bad0 = run_verify(None, out_dir, mode="hash", gens=[0]).to_pandas()
    assert not bool(bad0["ok"].all())
    bad = run_verify(None, out_dir, mode="hash").to_pandas()
    assert not bool(bad["ok"].all())

    # repair by re-encoding gen 0's missing partition from its lineage:
    # simplest honest repair here is a fresh decode-side check after
    # restoring the original bytes
    raw[len(raw) // 2] ^= 0xFF
    open(path, "wb").write(bytes(raw))

    # generation-preserving compaction keeps manifest-mode scoping
    # (hash by="partition" is plan-label-granular, so post-compaction
    # audits go through manifest or by="source" — unchanged contract)
    run_compact(out_dir, target_tokens=10_000_000).materialize()
    vm = run_verify(None, out_dir, mode="manifest", gens=[1]).to_pandas()
    assert bool(vm["ok"].all()) and int(vm["n_rows"].sum()) == 300
    assert all("-g01-" in p for p in vm["part_id"])
