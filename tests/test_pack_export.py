"""Packed training-shard export (pipelines/pack_job.py): the encoded
corpus streams straight into fixed-length packed rows."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode, run_encode_files
from fileconvert_ray.pipelines.pack_job import packed_dataset, run_export_packed
from fileconvert_ray.sources.tokseq import synth_dataset, tokseq_dataset, tokseq_table


def _flat(t: pa.Table) -> np.ndarray:
    toks = t.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return pc.list_flatten(toks).to_numpy(zero_copy_only=False)


def test_packed_export_int_order_bit_exact(ray_session, sf_dir, tmp_path):
    """order='int': the concatenated packed stream equals the original
    corpus concatenated by ascending integer doc_id, bit for bit."""
    out = str(tmp_path / "enc")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()

    L = 128
    packed = packed_dataset(out, L, order="int", n_buckets=4).to_arrow_refs()
    import ray

    t = pa.concat_tables([ray.get(r) for r in packed]).sort_by("chunk_id")
    n = t.num_rows
    lens = pc.list_value_length(t.column("tokens")).to_numpy(zero_copy_only=False)
    assert (lens[:-1] == L).all() and lens[-1] <= L
    assert sorted(t.column("chunk_id").to_pylist()) == list(range(n))

    orig = tokseq_table(sf_dir)
    order = np.argsort(
        pc.cast(orig.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False),
        kind="stable",
    )
    expect = _flat(orig.take(pa.array(order)))
    got = _flat(t)
    assert len(got) == len(expect)
    assert (got == expect).all()


def test_packed_export_hash_order_and_shards(ray_session, tmp_path):
    """order='hash' (default): token mass conserved, chunks uniform,
    deterministic across runs; run_export_packed lands readable
    parquet shards with matching totals."""
    out = str(tmp_path / "enc")
    run_encode(
        lambda: synth_dataset(800, num_blocks=4),
        EncodeConfig(out_dir=out, target_partition_tokens=100_000),
    ).materialize()

    L = 256
    d1 = packed_dataset(out, L, n_buckets=8).to_pandas()
    d2 = packed_dataset(out, L, n_buckets=8).to_pandas()
    assert int(d1.n_tok.sum()) == int(d2.n_tok.sum())
    h1 = d1.sort_values("chunk_id").tokens.apply(lambda v: tuple(v)).tolist()
    h2 = d2.sort_values("chunk_id").tokens.apply(lambda v: tuple(v)).tolist()
    assert h1 == h2  # deterministic hash order

    # a different seed is a different (but token-conserving) epoch order
    d3 = packed_dataset(out, L, seed=7, n_buckets=8).to_pandas()
    assert int(d3.n_tok.sum()) == int(d1.n_tok.sum())
    h3 = d3.sort_values("chunk_id").tokens.apply(lambda v: tuple(v)).tolist()
    assert h3 != h1

    to = str(tmp_path / "shards")
    res = run_export_packed(out, to, L, n_buckets=8)
    assert res["tokens"] == int(d1.n_tok.sum())
    assert res["chunks"] == len(d1)
    back = pq.read_table(to)
    assert back.num_rows == res["chunks"]
    blens = pc.list_value_length(back.column("tokens")).to_numpy(zero_copy_only=False)
    assert (np.sort(blens)[1:] == L).all() if len(blens) > 1 else True


def test_packed_export_snapshot_scope(ray_session, sf_dir, tmp_path):
    """max_gen= composes: a gen-0 snapshot export packs exactly the
    gen-0 token mass."""
    t = tokseq_table(sf_dir)
    h = t.num_rows // 2
    base = tmp_path / "shards_in"
    base.mkdir()
    s0, s1 = str(base / "s0.parquet"), str(base / "s1.parquet")
    pq.write_table(t.slice(0, h), s0)
    pq.write_table(t.slice(h), s1)
    out = str(tmp_path / "enc")
    cfg = EncodeConfig(out_dir=out, target_partition_tokens=5_000)
    run_encode_files([s0], cfg).materialize()
    run_encode_files([s0, s1], cfg).materialize()

    gen0_tokens = int(pc.sum(t.slice(0, h).column("n_tok")).as_py())
    d0 = packed_dataset(out, 128, max_gen=0, n_buckets=4).to_pandas()
    assert int(d0.n_tok.sum()) == gen0_tokens
    dall = packed_dataset(out, 128, n_buckets=4).to_pandas()
    assert int(dall.n_tok.sum()) == int(pc.sum(t.column("n_tok")).as_py())

    with pytest.raises(ValueError, match="order"):
        packed_dataset(out, 128, order="bogus")


def test_packed_export_edge_shapes(ray_session, tmp_path):
    """Adversarial shapes: empty token rows vanish into the stream, a
    single doc much longer than seq_len fans out across chunks, and
    the reconstruction is still bit-exact in int order."""
    import ray.data as rd

    from fileconvert_ray.sources.tokseq import INPUT_SCHEMA

    rows = {
        "doc_id": ["1", "2", "3", "4"],
        "tokens": pa.array(
            [[], list(range(1000)), [], [7, 8, 9]], type=pa.list_(pa.int32())
        ),
        "n_tok": pa.array([0, 1000, 0, 3], type=pa.int32()),
        "source": ["s0", "s0", "s1", "s1"],
    }
    t = pa.Table.from_pydict(rows, schema=INPUT_SCHEMA)
    out = str(tmp_path / "enc")
    run_encode(
        lambda: rd.from_arrow(t),
        EncodeConfig(out_dir=out, target_partition_tokens=200_000),
    ).materialize()

    L = 128
    packed = packed_dataset(out, L, order="int", n_buckets=4).to_pandas()
    got = np.concatenate(
        [np.asarray(v) for _, v in sorted(zip(packed.chunk_id, packed.tokens))]
    )
    expect = np.concatenate([np.arange(1000), [7, 8, 9]])
    assert (got == expect).all()
    lens = sorted(packed.n_tok.tolist(), reverse=True)
    assert all(l == L for l in lens[:-1]) and lens[-1] <= L


def test_packed_export_doc_boundaries(ray_session, tmp_path):
    """boundaries=True: doc_starts holds the exact ascending
    within-chunk offsets of every non-empty doc start — checked
    against a pure-Python reference over random lengths (including
    zero-length docs, which contribute no boundary)."""
    import ray.data as rd

    rng = np.random.default_rng(0)
    n_docs = 400
    lens = rng.integers(0, 60, n_docs)
    lens[rng.random(n_docs) < 0.1] = 0
    toks = [list(rng.integers(0, 1000, l).astype(np.int32)) for l in lens]
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(np.arange(n_docs) * 7 + 3, type=pa.int64()),
            "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int64)),
        }
    )
    from fileconvert_ray.functions.packing import pack_sequences

    L = 64
    packed = (
        pack_sequences(rd.from_arrow(t), seq_len=L, n_buckets=7, boundaries=True)
        .to_pandas()
        .sort_values("chunk_id")
    )
    starts_all = np.concatenate(([0], np.cumsum(lens)))[:-1][lens > 0]
    n_seen = 0
    for _, row in packed.iterrows():
        lo = int(row.chunk_id) * L
        exp = (starts_all[(starts_all >= lo) & (starts_all < lo + len(row.tokens))] - lo).tolist()
        assert row.doc_starts.tolist() == exp  # exact AND ascending
        n_seen += len(exp)
    assert n_seen == len(starts_all)

    # default path: schema unchanged (no doc_starts column)
    plain = pack_sequences(rd.from_arrow(t), seq_len=L, n_buckets=7)
    assert plain.schema().names == ["chunk_id", "tokens", "n_tok"]


def test_packed_export_ann_filter_and_mixture_fnv(ray_session, sf_dir, tmp_path):
    """ann_filter keeps exactly the docs whose annotation value
    clears the bound (verified doc-by-doc against a direct decode);
    weights with the fnv scale-default hash are deterministic,
    leakage-free (a doc's fate is independent of partitioning) and
    land near the requested rates."""
    import ray

    from fileconvert_ray.pipelines.annotate_job import run_annotate
    from fileconvert_ray.stages.decoder import decode_dataset

    out = str(tmp_path / "enc_f")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()
    run_annotate(out, "token_stats")

    # reference: which docs SHOULD survive n_distinct >= 24
    full = pa.concat_tables(
        [ray.get(r) for r in decode_dataset(out, columns=["doc_id", "tokens"]).to_arrow_refs()]
    )
    nd = [
        len(set(row)) for row in full.column("tokens").to_pylist()
    ]
    want_tokens = sum(
        len(row)
        for row, d in zip(full.column("tokens").to_pylist(), nd)
        if d >= 24
    )

    packed = packed_dataset(
        out, 128, order="int", n_buckets=4,
        ann_filter=("token_stats", "n_distinct", 24, None),
    )
    t = pa.concat_tables([ray.get(r) for r in packed.to_arrow_refs()])
    got_tokens = int(
        pc.sum(pc.list_value_length(t.column("tokens"))).as_py() or 0
    )
    assert got_tokens == want_tokens and got_tokens > 0
    assert got_tokens < int(pc.sum(pc.list_value_length(full.column("tokens"))).as_py())

    # mixture: fnv path, two runs identical, rates in the ballpark
    def run_once():
        p = packed_dataset(
            out, 128, order="int", n_buckets=4,
            weights={"src0": 0.5, "src1": 0.0},
        )
        tt = pa.concat_tables([ray.get(r) for r in p.to_arrow_refs()]).sort_by("chunk_id")
        return pc.list_flatten(tt.column("tokens")).to_numpy(zero_copy_only=False)

    a, b = run_once(), run_once()
    assert np.array_equal(a, b)
    # src1 fully dropped, src0 halved: total strictly between the
    # no-mixture total minus both sources and minus src1 only
    full_ds = decode_dataset(out, columns=["source", "n_tok"])
    per_src = {}
    for r in full_ds.to_arrow_refs():
        tt = ray.get(r)
        for s, n in zip(tt.column("source").to_pylist(), tt.column("n_tok").to_pylist()):
            per_src[s] = per_src.get(s, 0) + int(n)
    total = sum(per_src.values())
    hi = total - per_src["src1"]          # src0 kept whole
    lo = total - per_src["src1"] - per_src["src0"]  # src0 fully dropped
    assert lo < len(a) < hi

    # unknown annotation column fails loudly
    with pytest.raises(Exception, match="no column"):
        packed_dataset(
            out, 128, order="int", n_buckets=4,
            ann_filter=("token_stats", "nope", 1, None),
        ).materialize()


def test_packed_export_cli_filters(ray_session, sf_dir, tmp_path):
    """CLI --ann-filter / --weights parse and land shards."""
    import json as _json
    import subprocess
    import sys

    out = str(tmp_path / "enc_cli")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()
    from fileconvert_ray.pipelines.annotate_job import run_annotate

    run_annotate(out, "token_stats")
    to = str(tmp_path / "shards")
    r = subprocess.run(
        [sys.executable, "-m", "fileconvert_ray", "export-packed", out,
         "--to", to, "--seq-len", "128", "--order", "int",
         "--ann-filter", "token_stats:n_distinct:24:",
         "--weights", "src0=0.5,src1=0.0", "--weight-hash", "md5"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = _json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ok"] and res["chunks"] > 0 and res["tokens"] > 0


def test_packed_export_narrow_uint16(ray_session, sf_dir, tmp_path):
    """narrow=True halves token bytes (list<uint16>), values identical;
    out-of-range ids fail loudly instead of wrapping."""
    import ray

    out = str(tmp_path / "enc_n")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()
    wide, narrow = str(tmp_path / "w"), str(tmp_path / "n")
    rw = run_export_packed(out, wide, 128, order="int")
    rn = run_export_packed(out, narrow, 128, order="int", narrow=True)
    assert rw == rn
    tw = pq.read_table(wide).sort_by("chunk_id")
    tn = pq.read_table(narrow).sort_by("chunk_id")
    assert tn.schema.field("tokens").type == pa.list_(pa.uint16())
    fw = pc.list_flatten(tw.column("tokens")).to_numpy(zero_copy_only=False)
    fn = pc.list_flatten(tn.column("tokens")).to_numpy(zero_copy_only=False)
    assert np.array_equal(fw.astype(np.int64), fn.astype(np.int64))

    # out-of-range ids refuse: synthesize a store with a big vocab id
    out2 = str(tmp_path / "enc_big")
    shard = str(tmp_path / "big.parquet")
    t = pa.table({
        "doc_id": pa.array(["1", "2"]),
        "tokens": pa.array([[70000, 1, 2], [3, 4]], pa.list_(pa.int32())),
        "n_tok": pa.array([3, 2], pa.int32()),
        "source": pa.array(["s", "s"]),
    })
    pq.write_table(t, shard)
    run_encode_files([shard], EncodeConfig(out_dir=out2, target_partition_tokens=100)).materialize()
    with pytest.raises(Exception, match="uint16"):
        run_export_packed(out2, str(tmp_path / "n2"), 8, order="int", narrow=True)


def test_content_hash_annotator(ray_session, tmp_path):
    """content_hash annotation == token_content_hashes of the decoded
    corpus; identical token sequences under different ids collide,
    different sequences don't; composes with export ann_filter."""
    import ray
    import ray.data as rd

    from fileconvert_ray.functions.dedup import token_content_hashes
    from fileconvert_ray.pipelines.annotate_job import run_annotate
    from fileconvert_ray.stages.decoder import decode_dataset

    t = pa.table({
        "doc_id": pa.array([str(i) for i in range(60)]),
        "tokens": pa.array(
            [[1, 2, 3] if i % 2 else [int(i), 5] for i in range(60)],
            pa.list_(pa.int32()),
        ),
        "n_tok": pa.array([3 if i % 2 else 2 for i in range(60)], pa.int32()),
        "source": pa.array(["s"] * 60),
    })
    sh = str(tmp_path / "in.parquet")
    pq.write_table(t, sh)
    out = str(tmp_path / "enc")
    run_encode_files([sh], EncodeConfig(out_dir=out, target_partition_tokens=50)).materialize()
    run_annotate(out, "content_hash")

    got = pa.concat_tables([
        ray.get(r)
        for r in decode_dataset(
            out, columns=["doc_id", "tokens", "n_tok"],
            with_annotations=["content_hash"],
        ).to_arrow_refs()
    ]).sort_by("doc_id")
    want = token_content_hashes(got.select(["doc_id", "tokens", "n_tok"])).view(np.int64)
    assert np.array_equal(got.column("content_hash").to_numpy(zero_copy_only=False), want)
    h = got.column("content_hash").to_numpy(zero_copy_only=False)
    odd = np.array([int(d) % 2 == 1 for d in got.column("doc_id").to_pylist()])
    assert len(set(h[odd])) == 1          # all [1,2,3] docs collide
    assert len(set(h[~odd])) == len(h[~odd])  # distinct contents differ


def test_packed_export_curriculum_order(ray_session, sf_dir, tmp_path):
    """order='ann': the packed stream equals the corpus concatenated by
    (annotation score asc, doc_id asc), bit for bit; score/id domain
    violations refuse loudly; CLI --order ann:NAME:COL parses."""
    import json as _json
    import subprocess
    import sys

    import ray

    from fileconvert_ray.pipelines.annotate_job import run_annotate

    out = str(tmp_path / "enc")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()
    run_annotate(out, "token_stats")

    L = 128
    packed = packed_dataset(
        out, L, order="ann", ann_order=("token_stats", "n_distinct"),
        n_buckets=4,
    ).to_arrow_refs()
    blocks = [ray.get(r) for r in packed]
    t = pa.concat_tables([b for b in blocks if b.num_rows]).sort_by("chunk_id")

    # ground truth: per-doc distinct-token count over the raw corpus
    orig = tokseq_table(sf_dir)
    ids = pc.cast(orig.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
    toks = orig.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    ndist = np.array([len(set(x)) for x in toks.to_pylist()], dtype=np.int64)
    order = np.lexsort((ids, ndist))
    expect = _flat(orig.take(pa.array(order.astype(np.int64))))
    got = _flat(t)
    assert len(got) == len(expect)
    assert (got == expect).all()

    # a missing curriculum column refuses loudly at execution
    with pytest.raises(Exception, match="nope"):
        packed_dataset(
            out, L, order="ann", ann_order=("token_stats", "nope"),
            n_buckets=4,
        ).materialize()

    with pytest.raises(ValueError, match="requires ann_order"):
        packed_dataset(out, L, order="ann")
    with pytest.raises(ValueError, match="requires ann_order"):
        packed_dataset(out, L, ann_order=("token_stats", "n_distinct"))

    to = str(tmp_path / "shards_cur")
    r = subprocess.run(
        [sys.executable, "-m", "fileconvert_ray", "export-packed", out,
         "--to", to, "--seq-len", "128",
         "--order", "ann:token_stats:n_distinct"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = _json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ok"] and res["tokens"] == len(expect)


def test_packed_export_curriculum_desc_and_atomicity(ray_session, sf_dir, tmp_path):
    """ann_order=(name, col, 'desc'): hard-first stream, ties still
    ascending doc_id.  Export completion contract: marker lands last,
    a completed dest refuses, a partial (marker-less) dest rebuilds."""
    import json as _json

    import ray

    from fileconvert_ray.pipelines.annotate_job import run_annotate

    out = str(tmp_path / "enc")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()
    run_annotate(out, "token_stats")

    L = 128
    blocks = [
        ray.get(r)
        for r in packed_dataset(
            out, L, order="ann",
            ann_order=("token_stats", "n_distinct", "desc"), n_buckets=4,
        ).to_arrow_refs()
    ]
    t = pa.concat_tables([b for b in blocks if b.num_rows]).sort_by("chunk_id")

    orig = tokseq_table(sf_dir)
    ids = pc.cast(orig.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
    toks = orig.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    ndist = np.array([len(set(x)) for x in toks.to_pylist()], dtype=np.int64)
    order = np.lexsort((ids, -ndist))  # ndist desc, doc_id asc
    expect = _flat(orig.take(pa.array(order.astype(np.int64))))
    got = _flat(t)
    assert len(got) == len(expect)
    assert (got == expect).all()

    with pytest.raises(ValueError, match="'asc' or 'desc'"):
        packed_dataset(
            out, L, order="ann",
            ann_order=("token_stats", "n_distinct", "down"),
        )

    # atomic export: marker written last; completed dest refused
    to = str(tmp_path / "shards")
    res = run_export_packed(
        out, to, L, order="ann",
        ann_order=("token_stats", "n_distinct", "desc"), n_buckets=4,
    )
    marker = os.path.join(to, "_packed_manifest.json")
    assert os.path.exists(marker)
    man = _json.load(open(marker))
    assert man["tokens"] == res["tokens"] == len(expect)
    assert man["ann_order"] == ["token_stats", "n_distinct", "desc"]
    with pytest.raises(ValueError, match="completed packed export"):
        run_export_packed(out, to, L, order="int")

    # a marker-less (crashed partial) dest is wiped and rebuilt
    os.remove(marker)
    junk = os.path.join(to, "leftover_from_crash.parquet")
    open(junk, "wb").write(b"not parquet")
    res2 = run_export_packed(out, to, L, order="int")
    assert os.path.exists(marker)
    assert res2["tokens"] == len(expect)
    assert not os.path.exists(junk)

    # the loader reads shards by extension: marker never parses as data
    from fileconvert_ray.functions.loader import packed_shards_dataset

    assert packed_shards_dataset(to).count() == res2["chunks"]
