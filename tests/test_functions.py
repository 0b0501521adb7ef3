"""Functional tests for training-data ops: dedup finds injected
duplicates, knn matches brute force, multimodal plumbing works."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_with_dups():
    """20 base docs + exact dups + near dups (one word changed)."""
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(20)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": f"d{i:04d}", "text": t})
    # exact duplicates of docs 0..4
    for i in range(5):
        rows.append({"doc_id": f"e{i:04d}", "text": base[i]})
    # near duplicates of docs 5..9 (change one word)
    for i in range(5, 10):
        words = base[i].split()
        words[3] = "CHANGED"
        rows.append({"doc_id": f"n{i:04d}", "text": " ".join(words)})
    return pa.Table.from_pylist(rows)


def test_exact_dedup(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.dedup import exact_dedup

    t = _docs_with_dups()
    out = exact_dedup(rd.from_arrow(t)).to_pandas()
    # 25 distinct texts (20 base + 5 near-dups); exact dups e* dropped
    assert len(out) == 25
    assert not out["doc_id"].str.startswith("e").any()


def test_minhash_dedup_catches_near_dups(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.dedup import minhash_dedup

    t = _docs_with_dups()
    surv, pairs_ds = minhash_dedup(rd.from_arrow(t), threshold=0.5)
    out = surv.to_pandas()
    pairs = pairs_ds.to_pandas()
    # every exact dup pair must be found; near dups (1 word / 40) too
    found = set(map(tuple, pairs[["a", "b"]].itertuples(index=False, name=None)))
    for i in range(5):
        assert (f"d{i:04d}", f"e{i:04d}") in found
    for i in range(5, 10):
        assert (f"d{i:04d}", f"n{i:04d}") in found
    assert len(out) == 20  # one survivor per cluster
    assert set(out["doc_id"]) == {f"d{i:04d}" for i in range(20)}


def test_simhash_dedup_exact(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.dedup import simhash_dedup

    t = _docs_with_dups()
    surv, pairs_ds = simhash_dedup(rd.from_arrow(t), h_max=2)
    pairs = pairs_ds.to_pandas()
    found = set(map(tuple, pairs[["a", "b"]].itertuples(index=False, name=None)))
    for i in range(5):
        assert (f"d{i:04d}", f"e{i:04d}") in found  # hamming 0
    out = surv.to_pandas()
    assert len(out) <= 25


def test_ngram_jaccard():
    from fileconvert_ray.functions.dedup import ngram_jaccard

    j = ngram_jaccard(["a b c d e"], ["a b c d e"])[0]
    assert j == 1.0
    j2 = ngram_jaccard(["a b c d e"], ["x y z w v"])[0]
    assert j2 == 0.0


def test_knn_matches_bruteforce(ray_session):
    import ray
    import ray.data as rd

    from fileconvert_ray.functions.similarity import knn_search

    rng = np.random.default_rng(11)
    n, dim, k = 200, 16, 5
    m = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.Table.from_pydict(
        {"vec_id": pa.array(np.arange(n)), "embedding": pa.array(list(m), type=pa.list_(pa.float32()))}
    )
    qids = [0, 7]
    ref = ray.put((qids, m[qids].astype(np.float64)))
    got = knn_search(rd.from_arrow(t), ref, k=k).to_pandas()

    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    s = np.round(mn @ mn.T, 6)
    for q in qids:
        scores = s[q].copy()
        order = sorted(range(n), key=lambda i: (-scores[i], i))
        expect = [i for i in order if i != q][:k]
        sub = got[got.qid == q].sort_values(["score", "nid"], ascending=[False, True])
        assert sub["nid"].tolist() == expect


def test_lsh_dup_pairs_subset_of_exact(ray_session):
    import ray
    import ray.data as rd

    from fileconvert_ray.functions.similarity import embedding_dup_pairs, lsh_dup_pairs

    rng = np.random.default_rng(13)
    n, dim = 300, 8
    m = rng.standard_normal((n, dim)).astype(np.float32)
    m[50] = m[10] + 0.01  # planted near-dup
    t = pa.Table.from_pydict(
        {"vec_id": pa.array(np.arange(n)), "embedding": pa.array(list(m), type=pa.list_(pa.float32()))}
    )
    ids = np.arange(n)
    exact = embedding_dup_pairs(
        rd.from_arrow(t), threshold=0.99, matrix_ref=ray.put((ids, m.astype(np.float64)))
    ).to_pandas()
    approx = lsh_dup_pairs(rd.from_arrow(t), dim=dim, threshold=0.99, planes=6).to_pandas()
    exact_set = set(map(tuple, exact[["a", "b"]].itertuples(index=False, name=None)))
    approx_set = set(map(tuple, approx[["a", "b"]].itertuples(index=False, name=None)))
    assert (10, 50) in exact_set
    assert approx_set <= exact_set  # LSH never invents pairs
    assert (10, 50) in approx_set  # near-identical vectors share all buckets


def test_multimodal_fake_image(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.multimodal import ImageDecodeStage, make_fake_image

    blobs = pa.Table.from_pydict(
        {
            "blob_id": ["a", "b"],
            "payload": pa.array([make_fake_image(4, 3, 1), make_fake_image(8, 2, 2)], type=pa.binary()),
            "media_type": ["image/fake", "image/fake"],
        }
    )
    out = (
        rd.from_arrow(blobs)
        .map_batches(ImageDecodeStage, fn_constructor_kwargs={"fake": True},
                     batch_format="pyarrow", concurrency=1, batch_size=1)
        .to_pandas()
        .sort_values("blob_id")
    )
    assert out["width"].tolist() == [4, 8]
    assert out["height"].tolist() == [3, 2]


def test_multimodal_runtime_detection():
    """Round-3 verdict #7: the production (fake=False) path lights up
    when the media library exists and raises an honest stub otherwise —
    gate behavior must MATCH library availability in both environments."""
    from fileconvert_ray.functions.multimodal import (
        HAVE_AV,
        HAVE_PIL,
        HAVE_SOUNDFILE,
        AudioFrameStage,
        ImageDecodeStage,
        ImageResizeStage,
        VideoFrameSampleStage,
    )

    for cls, have, kwargs in [
        (ImageDecodeStage, HAVE_PIL, {}),
        (ImageResizeStage, HAVE_PIL, {"target_w": 2, "target_h": 2}),
        (AudioFrameStage, HAVE_SOUNDFILE, {}),
        (VideoFrameSampleStage, HAVE_AV, {}),
    ]:
        if have:
            cls(fake=False, **kwargs)  # must construct without raising
        else:
            with pytest.raises(NotImplementedError):
                cls(fake=False, **kwargs)

    if HAVE_PIL:  # real decode path, exercised only where PIL exists
        import io

        import numpy as np
        import PIL.Image as Image

        img = Image.fromarray(np.full((3, 4), 7, dtype=np.uint8), mode="L")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        t = pa.Table.from_pydict(
            {"blob_id": ["p"], "payload": pa.array([buf.getvalue()], type=pa.binary()),
             "media_type": ["image/png"]}
        )
        out = ImageDecodeStage(fake=False)(t)
        assert out.column("width").to_pylist() == [4]
        assert out.column("height").to_pylist() == [3]
        assert abs(out.column("mean_pixel").to_pylist()[0] - 7.0) < 1e-9


def test_multimodal_resize_chain(ray_session):
    """resize -> decode chain: the resized FIMG payloads parse and carry
    the target dimensions (decode stage consumes resize stage output)."""
    import ray.data as rd

    from fileconvert_ray.functions.multimodal import (
        ImageDecodeStage,
        ImageResizeStage,
        make_fake_image,
    )

    blobs = pa.Table.from_pydict(
        {
            "blob_id": ["a", "b"],
            "payload": pa.array(
                [make_fake_image(16, 12, 1), make_fake_image(6, 9, 2)], type=pa.binary()
            ),
            "media_type": ["image/fimg", "image/fimg"],
        }
    )
    out = (
        rd.from_arrow(blobs)
        .map_batches(ImageResizeStage, fn_constructor_kwargs={"target_w": 4, "target_h": 4},
                     batch_format="pyarrow", concurrency=1, batch_size=1)
        .map_batches(ImageDecodeStage, fn_constructor_kwargs={"fake": True},
                     batch_format="pyarrow", concurrency=1, batch_size=1)
        .to_pandas()
        .sort_values("blob_id")
    )
    assert out["width"].tolist() == [4, 4]
    assert out["height"].tolist() == [4, 4]
    # nearest-neighbor on a constant-seed image is deterministic
    assert out["mean_pixel"].notna().all()


def test_quality_empty_word_edge():
    from fileconvert_ray.functions.textstats import quality_batch

    t = pa.Table.from_pydict({"doc_id": [1, 2], "text": ["a b c", "hello"]})
    out = quality_batch(t).to_pandas()
    assert out["n_words"].tolist() == [3, 1]
    assert out["stop_ratio"].tolist()[0] == pytest.approx(1 / 3)


def test_minhash_signature_batch_composition_invariance():
    """Regression (ADVICE r1): a doc's signature must not depend on
    whether the batch ends with shorter-than-k docs."""
    import pyarrow as pa

    from fileconvert_ray.functions.dedup import MinHasher

    h = MinHasher(num_perm=16, bands=4, shingle_k=3, seed=7)
    doc = "the quick brown fox jumps over the lazy dog again and again"
    alone = h.signatures(pa.array([doc]))
    trailing_short = h.signatures(pa.array([doc, "too short", ""]))
    leading_short = h.signatures(pa.array(["x y", doc]))
    np.testing.assert_array_equal(alone[0], trailing_short[0])
    np.testing.assert_array_equal(alone[0], leading_short[1])


def test_simhash_batch_composition_invariance():
    import pyarrow as pa

    from fileconvert_ray.functions.dedup import SimHasher

    s = SimHasher(chunks=4, seed=3)
    doc = "alpha beta gamma delta epsilon zeta eta theta"
    alone = s.simhash(pa.array([doc]))
    mixed = s.simhash(pa.array([doc, "", "solo"]))
    assert alone[0] == mixed[0]


def test_exact_dedup_shuffle_excludes_payload():
    """Round-1 verdict fix: the corpus-wide dedup shuffle moves only
    (content_hash, id) pairs — the payload column must not be there."""
    import pyarrow as pa

    from fileconvert_ray.functions.dedup import PAIR_SCHEMA, content_hash_pairs

    batch = pa.table(
        {"doc_id": ["a", "b"], "text": ["x " * 1000, "y " * 1000], "other": [1, 2]}
    )
    pairs = content_hash_pairs(batch)
    assert pairs.schema.equals(PAIR_SCHEMA)
    assert "text" not in pairs.column_names and "other" not in pairs.column_names
    # pair rows are ~24 B regardless of payload size
    assert pairs.nbytes < 100


def test_exact_dedup_collision_recheck_keeps_min_id(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.dedup import exact_dedup

    rows = (
        [{"doc_id": f"d{i:03d}", "text": f"unique text {i}"} for i in range(20)]
        + [{"doc_id": "z900", "text": "unique text 3"}]   # dup of d003
        + [{"doc_id": "a000", "text": "unique text 7"}]   # dup of d007, smaller id wins
    )
    ds = rd.from_items(rows, override_num_blocks=4)
    out = exact_dedup(ds).to_pandas()
    ids = set(out.doc_id)
    assert "z900" not in ids
    assert "a000" in ids and "d007" not in ids
    assert len(out) == 20


def test_labelprop_matches_union_find(ray_session):
    import pyarrow as pa

    from fileconvert_ray.functions.dedup import (
        labelprop_dropped,
        union_find_survivors,
    )

    # chain, triangle, isolated pair, plus a long path (tests iteration)
    pairs = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("x", "z"),
             ("p1", "p2"), ("q1", "q2"), ("q2", "q3"), ("q3", "q4"), ("q4", "q5")]
    t = pa.table({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})
    want, _ = union_find_survivors(pairs)
    got = labelprop_dropped(t)
    assert got == want


def test_connected_components_single_task_matches_labelprop(ray_session):
    """The latency path (one-Ray-task union-find) and the scale path
    (iterative labelprop) must produce identical (node, root) tables —
    root = lexicographic component min in both."""
    import pyarrow as pa

    from fileconvert_ray.functions.dedup import connected_components

    pairs = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("x", "z"),
             ("p1", "p2"), ("q1", "q2"), ("q2", "q3"), ("q3", "q4"), ("q4", "q5"),
             ("a", "b")]  # duplicate edge must be harmless
    t = pa.table({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})
    single = connected_components(t, strategy="single_task").to_pandas()
    lp = connected_components(t, strategy="labelprop").to_pandas()
    s = sorted(map(tuple, single.itertuples(index=False, name=None)))
    l = sorted(map(tuple, lp.itertuples(index=False, name=None)))
    assert s == l
    # auto at this size routes to single_task and must agree too
    auto = connected_components(t, strategy="auto").to_pandas()
    assert sorted(map(tuple, auto.itertuples(index=False, name=None))) == s


def test_apply_dropped_join_matches_broadcast(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.dedup import _apply_dropped

    corpus = pa.table({"doc_id": [f"d{i}" for i in range(50)],
                       "text": [f"t{i}" for i in range(50)]})
    dropped = rd.from_arrow(pa.table({"_id": ["d3", "d17", "d40", "nope"]}))
    a = sorted(_apply_dropped(rd.from_arrow(corpus), dropped, apply="join").to_pandas().doc_id)
    b = sorted(_apply_dropped(rd.from_arrow(corpus), dropped, apply="broadcast").to_pandas().doc_id)
    c = sorted(_apply_dropped(rd.from_arrow(corpus), dropped, apply="auto").to_pandas().doc_id)
    assert a == b == c and len(a) == 47 and "d3" not in a


def test_minhash_labelprop_same_survivors(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.dedup import minhash_dedup

    t = _docs_with_dups()
    a, _ = minhash_dedup(rd.from_arrow(t), components="unionfind")
    b, _ = minhash_dedup(rd.from_arrow(t), components="labelprop")
    assert sorted(a.to_pandas().doc_id) == sorted(b.to_pandas().doc_id)


def test_ivf_partitioned_prunes_and_matches_exact(ray_session, tmp_path):
    """Round-1 verdict #8: the IVF layout must let a probe read ONLY its
    buckets; exhaustive probing must match brute force exactly."""
    import ray
    import ray.data as rd

    from fileconvert_ray.functions.similarity import (
        build_ivf_probes,
        ivf_knn_partitioned,
        ivf_partition,
        knn_search,
    )

    rng = np.random.default_rng(11)
    n, dim, nlist = 400, 16, 8
    m = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
    })
    cents = m[:nlist]
    idx_dir = str(tmp_path / "ivf")
    ivf_partition(rd.from_arrow(t), cents, idx_dir)

    qm = m[:3]
    qids = [0, 1, 2]
    # exhaustive: nprobe = nlist -> exact match with brute force
    probes = build_ivf_probes(qm, cents, nprobe=nlist)
    res, nread = ivf_knn_partitioned(idx_dir, (qids, qm, cents, probes), k=5)
    assert nread == nlist
    exact = knn_search(rd.from_arrow(t), (qids, qm), k=5).to_pandas()
    got = res.to_pandas().sort_values(["qid", "nid"]).reset_index(drop=True)
    want = exact.sort_values(["qid", "nid"]).reset_index(drop=True)
    assert got.equals(want)

    # pruned: nprobe=2 -> only the probed lists' directories are read
    probes2 = build_ivf_probes(qm, cents, nprobe=2)
    needed = {int(x) for p in probes2 for x in p}
    res2, nread2 = ivf_knn_partitioned(idx_dir, (qids, qm, cents, probes2), k=5)
    assert nread2 == len(needed) < nlist
    df2 = res2.to_pandas()
    assert len(df2) > 0


def test_video_frame_sample_chain(ray_session):
    """FVID -> frame sample -> image decode chain over actor pools."""
    import ray.data as rd

    from fileconvert_ray.functions.multimodal import (
        ImageDecodeStage,
        VideoFrameSampleStage,
        make_fake_video,
    )

    rows = [
        {"blob_id": f"v{i}", "payload": make_fake_video(8, 6, 25, seed=i),
         "media_type": "video/fvid"}
        for i in range(4)
    ]
    ds = rd.from_items(rows, override_num_blocks=2)
    frames = ds.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs=dict(stride=10),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 2), batch_size=2,
    )
    decoded = frames.map_batches(
        ImageDecodeStage, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 2)
    ).to_pandas()
    # 25 frames, stride 10 -> frames 0, 10, 20 per video
    assert len(decoded) == 4 * 3
    assert (decoded.width == 8).all() and (decoded.height == 6).all()


def test_asof_join_matches_manual(ray_session):
    """Backward as-of semantics on a hand-built fixture."""
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.joins import asof_join

    left = pa.table({"id": [1, 2, 3, 4], "t": [5, 10, 3, 7], "k": ["a", "a", "b", "c"]})
    right = pa.table({"t": [4, 9, 3], "k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    out = (
        asof_join(rd.from_arrow(left), rd.from_arrow(right), by="k", on="t", right_cols=["t", "v"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id1: t=5,k=a -> right t=4 v=1; id2: t=10 -> t=9 v=2; id3: t=3,k=b -> t=3 v=3
    # id4: k=c -> no match (inner)
    assert out.id.tolist() == [1, 2, 3]
    assert out.r_v.tolist() == [1.0, 2.0, 3.0]
    assert out.r_t.tolist() == [4, 9, 3]


def test_interval_join_buckets_and_overlaps(ray_session):
    """Intervals spanning bucket boundaries still match exactly once."""
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.joins import interval_join

    left = pa.table({"id": [1, 2, 3, 4], "t": [5, 15, 25, 99], "k": [1, 1, 1, 2]})
    right = pa.table({"k": [1, 1, 2], "s": [4, 14, 90], "e": [26, 16, 100], "w": ["A", "B", "C"]})
    out = (
        interval_join(
            rd.from_arrow(left), rd.from_arrow(right), by="k", on="t",
            start="s", end="e", right_cols=["s", "e", "w"], bucket_width=10,
        )
        .to_pandas()
        .sort_values(["id", "r_w"])
        .reset_index(drop=True)
    )
    pairs = list(zip(out.id, out.r_w))
    # t=5 in A[4,26); t=15 in A and B[14,16); t=25 in A; t=99 in C[90,100)
    assert pairs == [(1, "A"), (2, "A"), (2, "B"), (3, "A"), (4, "C")]


def test_hll_accuracy_and_merge(ray_session):
    """HLL estimate within ~2% at p=14; identical no matter how rows
    are split into batches (merge correctness)."""
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.sketches import hll_distinct_by

    rng = np.random.default_rng(1)
    n = 200_000
    true_card = {"a": 50_000, "b": 1_000, "c": 3}
    rows_g, rows_v = [], []
    for g, card in true_card.items():
        vals = rng.integers(0, card, n // len(true_card)) + (hash(g) % 1000) * 10**9
        rows_g.extend([g] * len(vals))
        rows_v.extend(vals.tolist())
    t = pa.table({"g": rows_g, "v": rows_v})
    for blocks in (1, 16):
        out = (
            hll_distinct_by(rd.from_arrow(t).repartition(blocks), "g", "v", p=14)
            .to_pandas()
            .set_index("g")["approx_distinct"]
        )
        for g, card in true_card.items():
            # true distinct is <= card (collisions in the draw); compare
            # against the exact distinct of the generated values
            exact = len(set(v for gg, v in zip(rows_g, rows_v) if gg == g))
            err = abs(out[g] - exact) / max(1, exact)
            assert err < 0.03, (g, out[g], exact, err)


def test_exact_dedup_integer_ids_native_order(ray_session):
    """ADVICE round 3: 'smallest id survives' must use the id's NATIVE
    ordering — integer 9 beats 10 even though '10' < '9' as strings."""
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.dedup import exact_dedup

    rows = [{"doc_id": i, "text": f"t {i}"} for i in range(9)]
    rows += [
        {"doc_id": 9, "text": "same content"},
        {"doc_id": 10, "text": "same content"},
    ]
    ds = rd.from_items(rows, override_num_blocks=3)
    out = exact_dedup(ds).to_pandas()
    ids = set(out.doc_id)
    assert 9 in ids and 10 not in ids
    assert len(out) == 10


def test_ivf_index_dir_stable_across_processes(sf_dir):
    """The IVF index cache key must be process-independent (hash() is
    PYTHONHASHSEED-salted; round-3 ADVICE) and change when the
    embeddings file changes."""
    import subprocess
    import sys

    snippet = (
        "from fileconvert_ray.functions.queries import _ivf_index_dir;"
        f"print(_ivf_index_dir({str(sf_dir)!r}, 123))"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", snippet],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1, f"cache dir differs across processes: {outs}"

    from fileconvert_ray.functions.queries import _ivf_index_dir

    assert _ivf_index_dir(str(sf_dir), 123) == outs.pop()
    assert _ivf_index_dir(str(sf_dir), 124) != _ivf_index_dir(str(sf_dir), 123)


def test_hash_strings_golden():
    """Pin hash_strings_u64 bit-compatibility across refactors: these
    values feed part_id assignment (resume stability) and every dedup
    family — silently changing them would orphan existing manifests."""
    import pyarrow as pa

    from fileconvert_ray.util.hashing import hash_strings_u64

    vals = ["", "a", "abc", "hello world", "x" * 100, "\x00\xff bin-ish", "αβγ utf8", "abc"]
    assert [int(h) for h in hash_strings_u64(pa.array(vals))] == [
        14087677454934409008, 6857225946766476583, 3018304574923447344,
        15374300607300864099, 17184556657596402539, 9884009453573640368,
        5641752124438818063, 3018304574923447344,
    ]
    assert [int(h) for h in hash_strings_u64(pa.array(vals), seed=42)] == [
        16989316241837898229, 1976498609966166241, 4604969816143388534,
        5385733229032502752, 12211056485272131938, 15058776709469670375,
        14447092118569800923, 4604969816143388534,
    ]


def test_hash_strings_matches_scalar_fnv():
    """Vectorized + tail paths both equal the textbook per-byte chain."""
    import numpy as np
    import pyarrow as pa

    from fileconvert_ray.util.hashing import hash_strings_u64

    prime, mask = 0x100000001B3, (1 << 64) - 1

    def ref_one(s: str, seed: int = 0) -> int:
        h = 0xCBF29CE484222325 ^ seed
        for b in s.encode():
            h = ((h ^ b) * prime) & mask
        z = (h + 0x9E3779B97F4A7C15) & mask
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    rng = np.random.default_rng(7)
    strs = ["".join(rng.choice(list("qwerty"), rng.integers(0, 400))) for _ in range(60)]
    got = [int(x) for x in hash_strings_u64(pa.array(strs), seed=3)]
    assert got == [ref_one(s, seed=3) for s in strs]


def test_hash_strings_long_doc_bounded_memory():
    """Round-2 verdict #2 'done' criterion: a 1 MB document among 4k
    short docs must hash in O(total_bytes) memory — the old padded
    (n, max_len) matrix allocated ~4 GB here.  Subprocess so peak RSS
    is this workload's, not the test session's."""
    import subprocess
    import sys

    code = """
import resource
import pyarrow as pa
from fileconvert_ray.util.hashing import hash_strings_u64
docs = ["short doc %d" % i for i in range(4095)] + ["z" * 1_000_000]
arr = pa.array(docs)
base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
h = hash_strings_u64(arr)
assert len(h) == 4096 and len(set(h.tolist())) == 4096
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
# measure the WORKLOAD delta, not import/allocator baseline (which
# swings with host load): the old padded matrix added ~4 GB here
grew_kb = peak_kb - base_kb
assert grew_kb < 200_000, f"hash grew RSS {grew_kb} KB - padded-matrix regression?"
print("base_kb", base_kb, "grew_kb", grew_kb)
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0, r.stderr


def test_interval_join_hot_group_is_not_quadratic(ray_session):
    """Round-2 verdict #1 'done' criterion: a hot (key, bucket) group —
    one user with 10k events and 2k candidate windows — must complete
    via the sorted/searchsorted matcher, not a dense L x R matrix.
    Result checked exactly against a brute-force reference."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.joins import interval_join

    rng = np.random.default_rng(5)
    n_l, n_r = 10_000, 2_000
    W = 10**9  # one bucket: everything collides on (user, bucket)
    t_vals = rng.integers(0, 100_000, n_l)
    left = pa.table({"id": np.arange(n_l), "t": t_vals, "u": ["hot"] * n_l})
    s_vals = rng.integers(0, 100_000, n_r)
    e_vals = s_vals + rng.integers(1, 500, n_r)
    right = pa.table({"u": ["hot"] * n_r, "s": s_vals, "e": e_vals,
                      "w": np.arange(n_r)})
    t0 = time.time()
    out = interval_join(
        rd.from_arrow(left), rd.from_arrow(right), by="u", on="t",
        start="s", end="e", right_cols=["s", "e", "w"], bucket_width=W,
    ).to_pandas()
    wall = time.time() - t0
    # brute-force expected pair count
    exp = int(((s_vals[None, :] <= t_vals[:, None]) & (t_vals[:, None] < e_vals[None, :])).sum())
    assert len(out) == exp
    # the dense L x R Python matcher this guards against takes minutes;
    # 90 s leaves headroom for full-suite contention on the shared
    # 4-cpu Ray session without weakening the not-quadratic claim
    assert wall < 90, f"hot-group interval join took {wall:.1f}s"


def test_minhash_hot_bucket_mass_duplicate(ray_session):
    """Round-2 verdict #3 'done' criterion: 1k copies of one document
    (whole cluster lands in ONE band bucket with identical signatures)
    must dedup via the vectorized star path, not an O(n^2) Python loop,
    and keep exactly one survivor plus the distinct docs."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.dedup import minhash_dedup

    doc = "the quick brown fox jumps over the lazy dog again and again"
    rows = [{"doc_id": f"dup{i:04d}", "text": doc} for i in range(1000)]
    rows += [{"doc_id": f"uniq{i:03d}", "text": f"totally different text number {i} " * 3}
             for i in range(20)]
    t0 = time.time()
    survivors, pairs_ds = minhash_dedup(rd.from_items(rows, override_num_blocks=4))
    out = survivors.to_pandas()
    pairs = pairs_ds.to_pandas()
    wall = time.time() - t0
    assert len(out) == 21  # dup0000 + the 20 unique docs
    assert "dup0000" in set(out.doc_id)
    assert not any(d.startswith("dup") and d != "dup0000" for d in out.doc_id)
    # star collapse: the 1k-clique contributes 999 edges, not ~500k
    assert len(pairs) < 5_000
    assert wall < 60, f"hot-bucket minhash took {wall:.1f}s"


def test_hash_join_matches_pandas_merge(ray_session):
    """hash_join (large x large co-partitioned equi-join) == pandas inner
    merge: duplicate keys on both sides (cross product within key),
    string keys, null keys dropped."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.joins import hash_join

    rng = np.random.default_rng(11)
    lk = [f"k{int(x):03d}" for x in rng.integers(0, 150, 4_000)]
    lk[5] = None
    left = pa.table({"lkey": pa.array(lk, type=pa.string()),
                     "lval": np.arange(4_000)})
    rk = [f"k{int(x):03d}" for x in rng.integers(0, 150, 1_200)]
    rk[7] = None
    right = pa.table({"rkey": pa.array(rk, type=pa.string()),
                      "rval": np.arange(1_200) * 10})
    out = hash_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="lkey", right_on="rkey", right_cols=["rval"], n_buckets=8,
    ).to_pandas()
    exp = (
        left.to_pandas().dropna(subset=["lkey"])
        .merge(right.to_pandas().dropna(subset=["rkey"]),
               left_on="lkey", right_on="rkey")
        .rename(columns={"rval": "r_rval"})[["lkey", "lval", "r_rval"]]
    )
    got = out.sort_values(["lkey", "lval", "r_rval"], ignore_index=True)
    exp = exp.sort_values(["lkey", "lval", "r_rval"], ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hash_join_semi_anti_left_modes(ray_session):
    """Semi/anti/left modes vs pandas ground truth.  Null-key left rows
    appear in left/anti output (SQL LEFT JOIN / NOT EXISTS parity) and
    never in semi; semi emits each left row at most once despite
    duplicate right keys."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.joins import hash_join

    rng = np.random.default_rng(13)
    lk = [int(x) for x in rng.integers(0, 60, 500)]
    left = pa.table({
        "lkey": pa.array(lk + [None, None], type=pa.int64()),
        "lval": np.arange(502),
    })
    rk = [int(x) for x in rng.integers(0, 40, 300)]  # keys 40-59 unmatched
    right = pa.table({
        "rkey": pa.array(rk + [None], type=pa.int64()),
        "rval": np.arange(301) * 10,
    })
    lpd, rpd = left.to_pandas(), right.to_pandas()
    matched_keys = set(rpd.rkey.dropna())

    def run(mode):
        return hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="lkey", right_on="rkey", right_cols=["rval"],
            n_buckets=4, mode=mode,
        ).to_pandas()

    semi = run("semi")
    exp_semi = lpd[lpd.lkey.isin(matched_keys)]
    assert sorted(semi.lval) == sorted(exp_semi.lval)
    assert semi.lval.is_unique

    anti = run("anti")
    exp_anti = lpd[~lpd.lkey.isin(matched_keys)]  # includes null-key rows
    assert sorted(anti.lval) == sorted(exp_anti.lval)
    assert anti.lkey.isna().sum() == 2

    lo = run("left")
    exp_lo = lpd.merge(rpd.dropna(subset=["rkey"]), left_on="lkey",
                       right_on="rkey", how="left").rename(columns={"rval": "r_rval"})
    got = lo.sort_values(["lval", "r_rval"], ignore_index=True)[["lkey", "lval", "r_rval"]]
    exp = exp_lo.sort_values(["lval", "r_rval"], ignore_index=True)[["lkey", "lval", "r_rval"]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_token_bigrams_boundary_masking(ray_session):
    """Bigram partials must not pair tokens across row boundaries, and
    empty rows (including leading ones, which put 0 into the cumsum
    ends) must not clobber valid pairs."""
    from fileconvert_ray.functions.queries import bigram_partial

    batch = pa.table(
        {
            "tokens": pa.array(
                [[], [1, 2, 3], [], [3, 1], [7], []], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([0, 3, 0, 2, 1, 0], type=pa.int32()),
        }
    )
    t = bigram_partial(batch)
    got = {
        (a, b): c
        for a, b, c in zip(
            t.column("t1").to_pylist(), t.column("t2").to_pylist(), t.column("cnt").to_pylist()
        )
    }
    # expected: (1,2), (2,3) from row 1; (3,1) from row 3; [7] makes none
    assert got == {(1, 2): 1, (2, 3): 1, (3, 1): 1}

    # single-row and empty-batch degenerate shapes
    assert bigram_partial(batch.slice(0, 1)).num_rows == 0
    assert bigram_partial(batch.slice(4, 1)).num_rows == 0


def test_doc_len_quantiles_rank_rule(ray_session, sf_dir):
    """percentile_disc parity: sorted[ceil(q*n)-1] per source."""
    import duckdb

    import pandas as pd

    from fileconvert_ray.functions.queries import QUERIES

    t = QUERIES["doc_len_quantiles"](sf_dir)
    got = t.to_pandas().sort_values("source", ignore_index=True)
    con = duckdb.connect()
    exp = con.execute(
        f"""select source,
            percentile_disc(0.25) within group (order by n_chars) as p25,
            percentile_disc(0.50) within group (order by n_chars) as p50,
            percentile_disc(0.75) within group (order by n_chars) as p75,
            percentile_disc(0.90) within group (order by n_chars) as p90,
            percentile_disc(0.99) within group (order by n_chars) as p99
            from read_parquet('{sf_dir}/documents.parquet')
            group by source order by source"""
    ).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_mg_heavy_hitters_guarantees(ray_session):
    """Misra-Gries invariants under a skewed stream split into many
    batches: every true count lies in [lb, lb + dec_total] == [lb, ub],
    every item with true count > (ub - lb) is present in the sketch,
    and the result is invariant to batch composition."""
    import ray.data as rd

    from fileconvert_ray.functions.sketches import mg_heavy_hitters

    rng = np.random.default_rng(7)
    vals = (rng.zipf(1.5, size=200_000) % 997).astype(np.int64)
    true = {int(i): int(c) for i, c in zip(*np.unique(vals, return_counts=True))}

    k = 16
    for nblocks in (1, 7):
        ds = rd.from_arrow(pa.table({"token": vals})).repartition(nblocks)
        t = mg_heavy_hitters(ds, "token", k=k).to_pandas()
        assert len(t) <= k
        err = int(t.ub.iloc[0] - t.lb.iloc[0]) if len(t) else 0
        for _, row in t.iterrows():
            tc = true[int(row.token)]
            assert row.lb <= tc <= row.ub, (row.token, row.lb, tc, row.ub)
        present = set(t.token.astype(int))
        for item, tc in true.items():
            if tc > err:
                assert item in present, (item, tc, err)


def test_mg_rejects_negative_items(ray_session):
    import ray.data as rd

    from fileconvert_ray.functions.sketches import mg_heavy_hitters

    ds = rd.from_arrow(pa.table({"token": np.array([1, -5, 2], dtype=np.int64)}))
    with pytest.raises(Exception):
        mg_heavy_hitters(ds, "token", k=4)


def test_pack_sequences_invariants(ray_session):
    """Packing = concat in order-key order, re-chunk at L: every chunk
    but the last is exactly L tokens, and the chunk_id-ordered
    concatenation is bit-identical to the doc_id-ordered input stream.
    Includes a doc far larger than L (spans many chunks) and ids that
    land ties-free in skewed range buckets."""
    import ray.data as rd

    from fileconvert_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(5)
    ids = np.array([3, 900, 17, 450, 2, 901, 88], dtype=np.int64)
    lens = [7, 1000, 13, 1, 250, 64, 129]  # one giant doc
    toks = [rng.integers(0, 5000, n).astype(np.int32) for n in lens]
    t = pa.table({
        "doc_id": ids,
        "tokens": pa.array([list(map(int, x)) for x in toks], type=pa.list_(pa.int32())),
        "n_tok": pa.array(lens, type=pa.int32()),
    })
    L = 100
    packed = pack_sequences(
        rd.from_arrow(t).repartition(3), seq_len=L, n_buckets=4
    ).to_pandas().sort_values("chunk_id", ignore_index=True)

    order = np.argsort(ids, kind="stable")
    expect = np.concatenate([toks[i] for i in order])
    got = np.concatenate([np.asarray(x, dtype=np.int32) for x in packed.tokens])
    assert np.array_equal(got, expect)
    assert list(packed.chunk_id) == list(range(len(packed)))
    n = packed.n_tok.to_numpy()
    assert (n[:-1] == L).all() and 0 < n[-1] <= L


def test_exact_dedup_join_strategy_matches_broadcast(ray_session):
    """strategy="join" (semi/anti hash_join tail, nothing on the
    driver) keeps exactly the same survivors as the broadcast path:
    min-id per content, hash-collision-safe, high duplicate fraction."""
    import ray.data as rd

    from fileconvert_ray.functions.dedup import exact_dedup

    texts = [f"doc {i % 7} body" for i in range(60)] + ["unique tail"]
    ids = list(range(61))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(5)
    b = exact_dedup(ds, key="text", id_col="doc_id").to_pandas()
    j = exact_dedup(ds, key="text", id_col="doc_id", strategy="join").to_pandas()
    assert sorted(b.doc_id) == sorted(j.doc_id) == list(range(7)) + [60]


def _rank_err(sorted_vals, est, q):
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left")
    hi = np.searchsorted(sorted_vals, est, side="right")
    t = q * n
    return 0.0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t)) / n


def test_kll_sketch_rank_error_property():
    """Compactor-stack quantile sketch: relative rank error stays under
    2% (k=256; measured worst 0.43%) across distributions and sizes,
    and total weight is conserved exactly through compactions."""
    from fileconvert_ray.functions.sketches import KllSketch

    for dist in ("uniform", "zipfy", "normal"):
        for n in (10_000, 300_000):
            rng = np.random.default_rng(3)
            v = {"uniform": lambda: rng.random(n),
                 "normal": lambda: rng.standard_normal(n),
                 "zipfy": lambda: rng.zipf(1.5, n).astype(float)}[dist]()
            sk = KllSketch(k=256, seed=5)
            for chunk in np.array_split(v, max(1, n // 8192)):
                sk.update_many(chunk)
            assert sk.n() == n
            sv = np.sort(v)
            for q in (0.01, 0.25, 0.5, 0.75, 0.99):
                assert _rank_err(sv, sk.quantile(q), q) <= 0.02, (dist, n, q)


def test_kll_quantiles_distributed_merge(ray_session):
    """The Ray-shuffled merge (per-batch sketch rows -> bucket merge ->
    driver fold) keeps the same rank-error envelope for any block
    split, and n is exact."""
    import ray.data as rd

    from fileconvert_ray.functions.sketches import kll_quantiles

    rng = np.random.default_rng(17)
    n = 120_000
    v = rng.standard_normal(n) * 40 + 7
    sv = np.sort(v)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    for nblocks in (1, 13):
        ds = rd.from_arrow(pa.table({"value": v})).repartition(nblocks)
        out = kll_quantiles(ds, "value", qs, k=256).to_pandas()
        assert (out.n == n).all()
        for q, est in zip(out.q, out.est):
            assert _rank_err(sv, est, q) <= 0.02, (nblocks, q)


def test_hash_join_full_mode(ray_session):
    """FULL outer join vs a hand-built expectation: inner matches plus
    left pads plus right pads; null keys on either side are emitted
    unmatched and never match each other (SQL semantics, unlike
    pandas' NaN==NaN merge)."""
    import pandas as pd
    import ray.data as rd

    from fileconvert_ray.functions.joins import hash_join

    rng = np.random.default_rng(23)
    lk = [int(x) for x in rng.integers(0, 30, 200)]      # keys 0..29
    left = pa.table({
        "lkey": pa.array(lk + [None], type=pa.int64()),
        "lval": np.arange(201),
    })
    rk = [int(x) for x in rng.integers(15, 45, 150)]     # keys 15..44
    right = pa.table({
        "rkey": pa.array(rk + [None, None], type=pa.int64()),
        "rval": np.arange(152) * 10,
    })
    got = hash_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="lkey", right_on="rkey", right_cols=["rval"],
        n_buckets=4, mode="full",
    ).to_pandas()

    lpd, rpd = left.to_pandas(), right.to_pandas()
    lv, rv = lpd.dropna(subset=["lkey"]), rpd.dropna(subset=["rkey"])
    inner = lv.merge(rv, left_on="lkey", right_on="rkey")
    lpad = lpd[~lpd.lkey.isin(set(rv.rkey))]
    rpad = rpd[~rpd.rkey.isin(set(lv.lkey))]
    exp_rows = len(inner) + len(lpad) + len(rpad)
    assert len(got) == exp_rows
    # every inner match present with both key columns equal
    m = got.dropna(subset=["lkey", "r_rkey"])
    assert (m.lkey == m.r_rkey).all() and len(m) == len(inner)
    # pads carry exactly one side (select on value columns: pad KEYS
    # are legitimately null for the null-key rows)
    gl = got[got.lval.notna() & got.r_rval.isna()]
    assert sorted(gl.lval) == sorted(lpad.lval)
    gr = got[got.lval.isna()]
    assert sorted(gr.r_rval) == sorted(rpad.rval)


def test_bloom_filter_properties(ray_session):
    """Bloom filter: ZERO false negatives by construction (all inserted
    keys probe positive through the distributed OR-merge), and the
    false-positive rate on definite non-members stays under 2x the
    analytic (1-e^{-kn/m})^k bound at adversarial sizing."""
    import ray.data as rd

    from fileconvert_ray.functions.sketches import bloom_build, bloom_contains

    rng = np.random.default_rng(29)
    members = np.unique(rng.integers(0, 1 << 40, 20_000))
    ds = rd.from_arrow(pa.table({"key": members})).repartition(7)
    m_bits, k = 1 << 18, 4  # deliberately tight: kn/m ~ 0.3
    bm = bloom_build(ds, "key", m_bits=m_bits, k=k)

    assert bloom_contains(bm, pa.array(members), k=k).all()  # no false negatives

    non = np.setdiff1d(rng.integers(0, 1 << 40, 50_000), members)
    fpr = bloom_contains(bm, pa.array(non), k=k).mean()
    bound = (1 - np.exp(-k * len(members) / m_bits)) ** k
    assert fpr <= 2 * bound, (fpr, bound)

    # string keys route through hash_strings_u64
    sds = rd.from_arrow(pa.table({"key": [f"k{i}" for i in range(1000)]}))
    sbm = bloom_build(sds, "key", m_bits=1 << 16, k=4)
    assert bloom_contains(sbm, pa.array([f"k{i}" for i in range(1000)]), k=4).all()


def test_user_funnel_partial_stages(ray_session, tmp_path):
    """Funnel stage logic on crafted users: never-viewed (0), view-only
    (1), clicked before viewing (still 1 — strict order), view->click
    (2), full path (3)."""
    import pyarrow.parquet as pq_

    from fileconvert_ray.functions.queries import q_user_funnel

    def ev(uid, t, typ):
        return {"event_id": t, "ts": t * 1_000_000, "user_id": uid,
                "event_type": typ, "value": 1.0, "props": ""}

    rows = [
        ev(1, 10, "error"),                                   # stage 0
        ev(2, 10, "view"),                                    # stage 1
        ev(3, 5, "click"), ev(3, 10, "view"),                 # stage 1 (click too early)
        ev(4, 10, "view"), ev(4, 20, "click"),                # stage 2
        ev(4, 5, "purchase"),                                 # too early, ignored
        ev(5, 1, "view"), ev(5, 2, "click"), ev(5, 3, "purchase"),  # stage 3
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(t.column_names.index("ts"),
                     "ts", t.column("ts").cast(pa.timestamp("us")))
    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(t, str(d / "events.parquet"))
    out = q_user_funnel(str(d)).to_pandas().sort_values("user_id")
    assert out.stage.tolist() == [0, 1, 1, 2, 3]


def test_hourly_approx_users_matches_exact(ray_session, sf_dir):
    """hourly_approx_users (HLL p=14) vs exact per-hour distinct: at
    sf0.001 every hour's cardinality is far inside the linear-counting
    regime, so estimates should be within 2% (usually exact)."""
    import duckdb

    from fileconvert_ray.functions.queries import q_hourly_approx_users

    est = q_hourly_approx_users(sf_dir).to_pandas().set_index("hour")["approx_distinct"]
    exact = duckdb.sql(
        f"""select cast(floor(epoch(ts) / 3600) as bigint) as hour,
                   count(distinct user_id) as n
            from read_parquet('{sf_dir}/events.parquet') group by 1"""
    ).df().set_index("hour")["n"]
    assert len(est) == len(exact)
    for h, n in exact.items():
        err = abs(int(est[h]) - int(n)) / max(1, int(n))
        assert err < 0.02, (h, int(est[h]), int(n))


def test_price_quantiles_edges(ray_session, tmp_path):
    """Histogram-refinement exact quantiles: constant column (zero
    range -> width fallback) and a duplicate-heavy skewed column must
    both return actual elements at the percentile_disc ranks."""
    import pyarrow.parquet as pq_

    from fileconvert_ray.functions.queries import PRICE_QUANTILES, q_price_quantiles

    d1 = tmp_path / "const"; d1.mkdir()
    pq_.write_table(pa.table({"l_extendedprice": [7.5] * 100}), str(d1 / "lineitem.parquet"))
    out = q_price_quantiles(str(d1)).to_pandas()
    assert (out["value"] == 7.5).all() and len(out) == len(PRICE_QUANTILES)

    rng = np.random.default_rng(3)
    vals = np.concatenate([np.full(5000, 10.0), rng.uniform(0, 1000, 5000)])
    d2 = tmp_path / "skew"; d2.mkdir()
    pq_.write_table(pa.table({"l_extendedprice": vals}), str(d2 / "lineitem.parquet"))
    out = q_price_quantiles(str(d2)).to_pandas().set_index("q")["value"]
    sv = np.sort(vals)
    for q in PRICE_QUANTILES:
        assert out[q] == sv[max(int(np.ceil(q * len(sv))), 1) - 1], q


def test_bigram_lm_score_tiny_corpus(ray_session, tmp_path):
    """Add-one bigram LM: hand-checked scores on a 3-doc corpus; a
    single-word doc has no pairs and must be dropped, not scored."""
    import math

    import pyarrow.parquet as pq_

    from fileconvert_ray.functions.queries import q_bigram_lm_score

    d = tmp_path / "lm"; d.mkdir()
    pq_.write_table(
        pa.table({
            "doc_id": [0, 1, 2],
            "text": ["a b a b", "a b", "a"],
            "source": ["s", "s", "s"],
        }),
        str(d / "documents.parquet"),
    )
    out = q_bigram_lm_score(str(d)).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1]  # doc 2 has one token -> no pairs
    # corpus bigrams: (a,b) x3, (b,a) x1; ctx(a)=3, ctx(b)=1; V=2
    p_ab = math.log((3 + 1) / (3 + 2.0))
    p_ba = math.log((1 + 1) / (1 + 2.0))
    r6 = lambda x: math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6
    mn = lambda x: int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))
    exp0 = r6((mn(p_ab) * 2 + mn(p_ba)) / 3 / 1e6)
    exp1 = r6(mn(p_ab) / 1 / 1e6)
    assert out.loc[0, "n_pairs"] == 3 and out.loc[0, "lm_score"] == exp0
    assert out.loc[1, "n_pairs"] == 1 and out.loc[1, "lm_score"] == exp1


def test_dup_trigram_fraction_planted(ray_session, tmp_path):
    """Cross-doc duplicate-trigram fraction: a trigram shared by two
    docs counts for both; a trigram repeated only WITHIN one doc does
    not; docs shorter than 3 tokens are dropped."""
    import pyarrow.parquet as pq_

    from fileconvert_ray.functions.queries import q_dup_trigram_fraction

    d = tmp_path / "tri"; d.mkdir()
    pq_.write_table(
        pa.table({
            "doc_id": [0, 1, 2, 3],
            # doc0/doc1 share "x y z"; doc2 repeats "p q r" twice but
            # only within itself; doc3 is too short
            "text": ["x y z a b", "c x y z", "p q r p q r", "a b"],
            "source": ["s"] * 4,
        }),
        str(d / "documents.parquet"),
    )
    out = q_dup_trigram_fraction(str(d)).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1, 2]
    # doc0: trigrams xyz,yza,zab -> 1 dup of 3
    assert out.loc[0, "n_tri"] == 3 and out.loc[0, "n_dup"] == 1
    assert out.loc[0, "dup_frac"] == round(1 / 3, 6)
    # doc1: cxy,xyz -> 1 of 2
    assert out.loc[1, "n_tri"] == 2 and out.loc[1, "n_dup"] == 1
    # doc2: within-doc repetition only -> df == 1 everywhere
    assert out.loc[2, "n_dup"] == 0


def test_kmeans_recovers_planted_clusters(ray_session):
    """Well-separated planted clusters are recovered exactly, and every
    point's label equals its nearest final centroid (Lloyd invariant)."""
    import ray.data as rd

    from fileconvert_ray.functions.similarity import kmeans_clusters

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    pts = np.concatenate(
        [c + 0.1 * rng.standard_normal((50, 3)) for c in centers]
    ).astype(np.float32)
    # put one point of each planted cluster at ids 0..2 so init hits all
    order = np.concatenate([[0, 50, 100], np.delete(np.arange(150), [0, 50, 100])])
    pts = pts[order]
    t = pa.table({
        "vec_id": np.arange(150, dtype=np.int64),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float32())),
    })
    out = (
        kmeans_clusters(rd.from_arrow(t), k=3, iters=3)
        .to_pandas().sort_values("vec_id")
    )
    lab = out["cluster"].to_numpy()
    # planted membership: ids 0,3..51 from cluster A, etc.
    true = np.empty(150, dtype=np.int64)
    inv = np.argsort(order)
    for g in range(3):
        true[inv[g * 50:(g + 1) * 50]] = g
    # labels are cluster ids (=init vec_ids 0,1,2); planted groups map 1:1
    for g in range(3):
        assert len(set(lab[true == g])) == 1
    assert len(set(lab)) == 3


def test_kmeans_drops_empty_cluster(ray_session):
    """Two coincident init centroids: the higher id never wins a point
    (ties break low), loses all members, and drops out of the model."""
    import ray.data as rd

    from fileconvert_ray.functions.similarity import kmeans_clusters

    pts = np.array([[0.0, 0.0], [5.0, 5.0], [0.1, 0.0], [5.1, 5.0]], dtype=np.float32)
    t = pa.table({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float32())),
    })
    out = kmeans_clusters(rd.from_arrow(t), k=2, iters=3).to_pandas()
    assert set(out["cluster"]) == {0, 1}  # both survive here
    # coincident-init case: ids 0 and 1 identical -> cluster 1 empty
    pts2 = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]], dtype=np.float32)
    t2 = pa.table({
        "vec_id": np.arange(3, dtype=np.int64),
        "embedding": pa.array(list(pts2), type=pa.list_(pa.float32())),
    })
    out2 = kmeans_clusters(rd.from_arrow(t2), k=2, iters=3).to_pandas()
    assert set(out2["cluster"]) == {0}


def test_ntile_tile_size_law(ray_session, tmp_path):
    """NTILE(k): first n%k tiles are one element larger; exactly k tiles."""
    import pyarrow.parquet as pq_

    from fileconvert_ray.functions.queries import q_doc_len_ntile

    d = tmp_path / "nt"; d.mkdir()
    n = 10  # 10 = 4*2 + 2 -> tile sizes 3,3,2,2
    pq_.write_table(
        pa.table({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": ["s"] * n,
            "n_chars": np.arange(n, dtype=np.int64) * 7 % 13,
        }),
        str(d / "documents.parquet"),
    )
    out = q_doc_len_ntile(str(d)).to_pandas()
    sizes = out.groupby("tile").size()
    assert sizes.tolist() == [3, 3, 2, 2]


def test_corr_exact_on_linear_data(ray_session, tmp_path):
    """Pearson r from integer moments: perfectly linear -> 1.0 (and
    -1.0 for a negative slope)."""
    import pyarrow.parquet as pq_

    from fileconvert_ray.functions.queries import q_len_tok_corr

    d = tmp_path / "corr"; d.mkdir()
    words_up = [" ".join(["w"] * (3 * i + 2)) for i in range(1, 9)]
    words_dn = [" ".join(["w"] * (40 - 2 * i)) for i in range(1, 9)]
    pq_.write_table(
        pa.table({
            "doc_id": np.arange(16, dtype=np.int64),
            "source": ["up"] * 8 + ["dn"] * 8,
            "text": words_up + words_dn,
            # n_chars linear in word count with positive slope
            "n_chars": np.array([3 * i + 2 for i in range(1, 9)]
                                + [2 * i for i in range(1, 9)], dtype=np.int64),
        }),
        str(d / "documents.parquet"),
    )
    out = q_len_tok_corr(str(d)).to_pandas().set_index("source")["corr_len_tok"]
    assert out["up"] == 1.0 and out["dn"] == -1.0


def test_cms_guarantee_and_split_invariance(ray_session):
    """Count-min with a deliberately small width (collisions certain):
    estimates are never below the true count and respect the eps*N
    upper bound; the merged sketch is identical however rows are split
    into batches (mergeability)."""
    import ray.data as rd

    from fileconvert_ray.functions.sketches import cms_estimate, cms_merge_build

    rng = np.random.default_rng(17)
    vals = (rng.pareto(1.1, 20_000) * 3).astype(np.int64) % 500
    t = pa.table({"token": vals})
    sk1 = cms_merge_build(rd.from_arrow(t), "token", depth=4, width=64)
    # different block split -> same sketch (content-deterministic)
    parts = [pa.table({"token": vals[i::3]}) for i in range(3)]
    sk2 = cms_merge_build(
        rd.from_arrow(pa.concat_tables(parts)), "token", depth=4, width=64
    )
    assert np.array_equal(sk1, sk2)

    items, true = np.unique(vals, return_counts=True)
    est = cms_estimate(sk1, items)
    assert (est >= true).all()  # one-sided error, always
    eps_n = np.e / 64 * len(vals)
    frac_bad = float(np.mean(est - true > eps_n))
    assert frac_bad < 0.02  # P(err > eps*N) <= e^-depth per item


def test_dup_span_coverage_union_semantics(ray_session, tmp_path):
    """Coverage must be the UNION of covered token positions, not the
    occurrence count: two docs sharing overlapping trigrams ("x y z a"
    shares both "x y z" and "y z a") cover 4 positions, not 6."""
    import pyarrow.parquet as pq

    from fileconvert_ray.functions.queries import q_dup_span_coverage

    texts = [
        "x y z a b",  # shares "x y z" and "y z a" with doc 1 -> covers 0..3
        "x y z a c",  # same two shared trigrams -> covers 0..3
        "p q r s t",  # unique -> coverage 0
    ]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_dup_span_coverage(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_cov"] == 4 and out.loc[1, "n_cov"] == 4
    assert out.loc[2, "n_cov"] == 0 and out.loc[2, "cov_frac"] == 0.0
    assert abs(out.loc[0, "cov_frac"] - 0.8) < 1e-9


def test_chunk_batch_windows_and_sums():
    """Hand-checked sliding windows: L=32/S=24 over 50 tokens gives
    chunks [0:32], [24:50], [48:50]; empty docs yield no chunks; sums
    come off the prefix-sum path exactly."""
    from fileconvert_ray.functions.queries import CHUNK_L, CHUNK_S, chunk_batch

    assert (CHUNK_L, CHUNK_S) == (32, 24)
    toks = list(range(50))
    batch = pa.table(
        {
            "doc_id": pa.array(["7", "8", "9"]),
            "tokens": pa.array([toks, [], [5, 6]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([50, 0, 2], type=pa.int32()),
        }
    )
    t = chunk_batch(batch).to_pandas()
    d7 = t[t.doc_id == 7].sort_values("chunk_idx")
    assert list(d7.start) == [0, 24, 48]
    assert list(d7.n_chunk_tok) == [32, 26, 2]
    assert list(d7.tok_sum) == [sum(toks[0:32]), sum(toks[24:50]), sum(toks[48:50])]
    assert (t.doc_id == 8).sum() == 0  # empty doc -> no chunks
    d9 = t[t.doc_id == 9]
    assert len(d9) == 1 and int(d9.n_chunk_tok.iloc[0]) == 2 and int(d9.tok_sum.iloc[0]) == 11


def test_chunk_batch_property_coverage():
    """Property (hypothesis): for any doc lengths/tokens, the emitted
    windows tile each doc exactly — starts are 0,S,2S,..., every window
    is non-empty and within bounds, consecutive windows overlap by
    L - S (until the tail), and per-chunk sums reconcile with a direct
    recomputation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fileconvert_ray.functions.queries import CHUNK_L, CHUNK_S, chunk_batch

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=0, max_value=2**20), min_size=0, max_size=150),
            min_size=1,
            max_size=8,
        )
    )
    def check(docs):
        batch = pa.table(
            {
                "doc_id": pa.array([str(i) for i in range(len(docs))]),
                "tokens": pa.array(docs, type=pa.list_(pa.int32())),
                "n_tok": pa.array([len(d) for d in docs], type=pa.int32()),
            }
        )
        t = chunk_batch(batch).to_pandas()
        for i, d in enumerate(docs):
            rows = t[t.doc_id == i].sort_values("chunk_idx")
            if not d:
                assert len(rows) == 0
                continue
            exp_starts = list(range(0, len(d), CHUNK_S))
            assert list(rows.start) == exp_starts
            for _, r in rows.iterrows():
                seg = d[r.start : r.start + CHUNK_L]
                assert r.n_chunk_tok == len(seg) > 0
                assert r.tok_sum == sum(seg)
            # tail coverage: the last window must reach the doc end
            last = rows.iloc[-1]
            assert last.start + last.n_chunk_tok == len(d)

    check()


def test_source_overlap_beyond_63_sources(ray_session, tmp_path):
    """Round-3 missing #3: the bitmask fold must shard past 63 sources.
    70 sources with a known chained-trigram overlap structure; the
    sharded pipeline must match a brute-force set computation."""
    import pyarrow.parquet as pq

    from fileconvert_ray.functions.dedup import _word_kgram_hashes
    from fileconvert_ray.functions.queries import q_source_overlap

    n_src = 70
    rows = []
    for i in range(n_src):
        # source i: words w{i}..w{i+4} -> 3 trigrams; overlaps neighbors
        text = " ".join(f"w{j}" for j in range(i, i + 5))
        rows.append({"doc_id": f"doc{i:03d}", "text": text, "source": f"s{i:02d}"})
    t = pa.Table.from_pylist(rows)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    # brute force with the same gram hashes (seed=9 matches the query)
    gram_sets = {}
    for r in rows:
        gh, _ = _word_kgram_hashes(pa.array([r["text"]]), 3, seed=9)
        gram_sets.setdefault(r["source"], set()).update(gh.tolist())
    want = {}
    srcs = sorted(gram_sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            c = len(gram_sets[a] & gram_sets[b])
            if c:
                want[(a, b)] = c

    out = q_source_overlap(str(d)).to_pandas()
    got = {(r.s1, r.s2): int(r.shared) for r in out.itertuples()}
    assert got == want
    # the overlap structure must cross the 63-bit shard boundary
    assert ("s62", "s63") in got and got[("s62", "s63")] == 2


def test_interleave_sources_skew_bounded_groups(ray_session, tmp_path):
    """Round-3 verdict #2: one source holding 80% of rows must not land
    in a single rank task.  Positions must equal the brute-force
    per-source md5 rank interleave."""
    import hashlib

    import pyarrow.parquet as pq

    from fileconvert_ray.functions.queries import q_interleave_sources

    rows = []
    for i in range(800):  # hot source: 80% of rows
        rows.append({"doc_id": f"hot{i:04d}", "text": "x", "source": "hot"})
    for s in range(4):
        for i in range(50):
            rows.append({"doc_id": f"c{s}{i:03d}", "text": "x", "source": f"cold{s}"})
    t = pa.Table.from_pylist(rows)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    srcs = sorted({r["source"] for r in rows})
    sidx = {s: i for i, s in enumerate(srcs)}
    want = {}
    for s in srcs:
        ids = sorted(
            (r["doc_id"] for r in rows if r["source"] == s),
            key=lambda x: hashlib.md5(x.encode()).hexdigest(),
        )
        for rank, did in enumerate(ids):
            want[did] = rank * len(srcs) + sidx[s]

    out = q_interleave_sources(str(d), hash="md5").to_pandas()
    got = dict(zip(out.doc_id, out.pos))
    assert got == want
    # round-robin property: positions are a permutation of 0..n-1... not
    # exactly (sources differ in size), but no two docs share a position
    assert len(set(got.values())) == len(got)

    # fnv scale default: same shape, brute-force rank by (u64 hash, id)
    from fileconvert_ray.util.hashing import hash_strings_u64

    want_f = {}
    for s in srcs:
        ids = [r["doc_id"] for r in rows if r["source"] == s]
        hv = hash_strings_u64(pa.array(ids, type=pa.string()))
        for rank, j in enumerate(sorted(range(len(ids)), key=lambda j: (int(hv[j]), ids[j]))):
            want_f[ids[j]] = rank * len(srcs) + sidx[s]
    outf = q_interleave_sources(str(d)).to_pandas()
    assert dict(zip(outf.doc_id, outf.pos)) == want_f


def test_minhash_dedup_driver_free_hot_cluster(ray_session, monkeypatch):
    """Round-3 verdict #1 'done' criterion: a mass-duplicated corpus
    (10k copies of one doc) must dedup WITHOUT the driver ever holding
    the pair stream or the dropped-id set.  Instead of a flaky RSS
    bound, assert the invariant directly: Dataset.to_pandas is poisoned
    for the duration of the pipeline build + execution, so ANY driver
    materialization of a Dataset fails the test.  (The final
    survivors read happens after the monkeypatch is lifted.)"""
    import pyarrow as pa
    import ray.data as rd

    from fileconvert_ray.functions.dedup import minhash_dedup

    doc = "the quick brown fox jumps over the lazy dog again and again"
    rows = [{"doc_id": f"dup{i:05d}", "text": doc} for i in range(10_000)]
    rows += [{"doc_id": f"uniq{i:03d}", "text": f"totally different text number {i} " * 3}
             for i in range(20)]
    ds = rd.from_items(rows, override_num_blocks=8)

    def poisoned(self, *a, **k):
        raise AssertionError("driver materialized a Dataset via to_pandas")

    with monkeypatch.context() as m:
        m.setattr(rd.Dataset, "to_pandas", poisoned)
        survivors, _pairs = minhash_dedup(ds)
        # force full execution while to_pandas is poisoned
        mat = survivors.materialize()
    out = mat.to_pandas()
    assert len(out) == 21
    assert "dup00000" in set(out.doc_id)
    assert not any(d.startswith("dup") and d != "dup00000" for d in out.doc_id)


def test_bpe_apply_merge_greedy_runs(ray_session):
    """Greedy leftmost non-overlap: x,x,x,x,x -> X,X,x and doc
    boundaries never merge across."""
    import pyarrow as pa

    from fileconvert_ray.functions.bpe import apply_merge_batch

    t = pa.table({
        "doc_id": ["a", "b"],
        "tokens": pa.array([[7, 7, 7, 7, 7], [1, 7]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([5, 2], type=pa.int32()),
    })
    out = apply_merge_batch(t, left=7, right=7, new_id=99)
    assert out.column("tokens").to_pylist() == [[99, 99, 7], [1, 7]]
    assert out.column("n_tok").to_pylist() == [3, 2]
    # cross-doc pair (7 | 1) must not merge
    out2 = apply_merge_batch(t, left=7, right=1, new_id=98)
    assert out2.column("tokens").to_pylist() == [[7, 7, 7, 7, 7], [1, 7]]


def test_bpe_merge_rounds_matches_reference(ray_session):
    """The distributed merge trainer must equal the pure-Python
    greedy reference on the real sf0.001 corpus, merge for merge."""
    from fileconvert_ray.functions.bpe import bpe_merge_rounds, bpe_reference
    from fileconvert_ray.sources.tokseq import tokseq_dataset, tokseq_table

    sf = "/root/testdata/sf0.001"
    got = bpe_merge_rounds(tokseq_dataset(sf), rounds=5).to_pandas()
    toks = tokseq_table(sf).column("tokens").to_pylist()
    vocab_base = max(max(t) for t in toks if t) + 1
    want = bpe_reference(toks, rounds=5, vocab_base=vocab_base)
    assert list(map(tuple, got.itertuples(index=False, name=None))) == want


def test_pq_assign_matches_reference(ray_session):
    """Vectorized code assignment == nested-loop reference (rounded-L2
    argmin, lowest code wins ties)."""
    import numpy as np

    from fileconvert_ray.functions.similarity import pq_assign

    rng = np.random.default_rng(11)
    mat3 = rng.normal(size=(40, 4, 8))
    cb = rng.normal(size=(4, 16, 8))
    got = pq_assign(mat3, cb)
    for i in range(40):
        for s in range(4):
            d = np.floor(((mat3[i, s] - cb[s]) ** 2).sum(axis=-1) * 1e6 + 0.5) / 1e6
            assert got[i, s] == int(np.argmin(d))


def test_pq_codes_deterministic_and_bounded(ray_session):
    from fileconvert_ray.functions.queries import q_pq_codes

    sf = "/root/testdata/sf0.001"
    a = q_pq_codes(sf).to_pandas().sort_values("vec_id", ignore_index=True)
    b = q_pq_codes(sf).to_pandas().sort_values("vec_id", ignore_index=True)
    assert a.equals(b)
    assert len(a) == 500
    for codes in a["codes"].head(50):
        assert len(codes) == 32 and all(0 <= c < 32 for c in codes)


def test_pq_knn_recall_vs_exact(ray_session):
    """ADC top-5 must overlap exact L2 top-5 well on the clustered
    embeddings (PQ's contract is high recall on structured data, not
    exactness)."""
    import numpy as np

    from fileconvert_ray.functions.queries import KNN_K, KNN_QIDS, _load_embeddings, q_pq_knn_search

    import ray
    import ray.data as rd

    from fileconvert_ray.functions.similarity import pq_knn, pq_train

    sf = "/root/testdata/sf0.001"
    got = q_pq_knn_search(sf).to_pandas()
    assert set(got.groupby("qid").size()) == {KNN_K}
    ids, m = _load_embeddings(sf)

    def exact_top(qid, n):
        qv = m[ids == qid][0]
        d = ((m - qv) ** 2).sum(axis=1)
        d[ids == qid] = np.inf
        return set(ids[np.argsort(d)[:n]].tolist())

    # direct recall@5 (measured 0.67 at m=32/k=32 on this corpus;
    # near-gaussian embeddings are PQ's worst case)
    recalls = [
        len(exact_top(qid, KNN_K) & set(got[got.qid == qid].nid)) / KNN_K
        for qid in KNN_QIDS
    ]
    assert np.mean(recalls) >= 0.5, recalls
    # the production contract: ADC top-20 shortlist contains the exact
    # top-5 for reranking (measured 0.93)
    ds_f = lambda: rd.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cb = pq_train(ds_f(), m=32, k=32, iters=2)
    qsel = np.isin(ids, KNN_QIDS)
    short = pq_knn(
        ds_f(), ray.put(cb), ray.put((list(np.asarray(ids)[qsel]), m[qsel])), k=20
    ).to_pandas()
    contain = [
        len(exact_top(qid, KNN_K) & set(short[short.qid == qid].nid)) / KNN_K
        for qid in KNN_QIDS
    ]
    assert np.mean(contain) >= 0.8, contain


def test_image_dedup_chain_drops_identical_images(ray_session, tmp_path):
    """Identical texts render to identical FIMG blobs; the multimodal
    dedup chain must keep the smallest doc_id per image and parse the
    survivors' true dimensions."""
    import os

    import pyarrow.parquet as _pq

    d = tmp_path / "sf"
    os.makedirs(d)
    texts = ["same words here", "same words here", "other text", "x" * 33]
    t = pa.table({
        "doc_id": [3, 1, 2, 4],
        "text": texts,
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": [len(x) for x in texts],
    })
    _pq.write_table(t, str(d / "documents.parquet"))
    from fileconvert_ray.functions.queries import q_image_dedup_docs

    out = q_image_dedup_docs(str(d)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out.doc_id.tolist() == [1, 2, 4]  # 3 lost to 1 (same image)
    assert out.width.tolist() == [16, 16, 16]
    assert out.height.tolist() == [1, 1, 3]  # ceil(15/16), ceil(10/16), ceil(33/16)


def test_connected_components_auto_threshold_switch(ray_session):
    """auto with a tiny single_task_max must route to labelprop and
    still produce identical components."""
    from fileconvert_ray.functions.dedup import connected_components

    t = pa.table({"a": ["a", "b", "p"], "b": ["b", "c", "q"]})
    small = connected_components(t, strategy="single_task").to_pandas()
    big = connected_components(t, strategy="auto", single_task_max=1).to_pandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False, name=None)))
    assert key(small) == key(big)


def test_user_window_ops_hot_user_skew(ray_session, tmp_path):
    """user_cumulative_value / user_first_last_event on a corpus where
    one user owns 80% of events: the bucket shape must still produce
    the exact pandas window answer (the hot user's history is the
    irreducible partition grain, like any SQL window partition)."""
    import os

    import numpy as np
    import pyarrow.parquet as _pq

    rng = np.random.default_rng(7)
    n = 5000
    uid = np.where(rng.random(n) < 0.8, 1, rng.integers(2, 50, n)).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype("datetime64[us]")
    val = np.round(rng.random(n) * 100, 2)
    et = rng.choice(["view", "cart", "purchase"], n)
    t = pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts, "user_id": uid, "event_type": et,
        "value": val, "props": ["{}"] * n,
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    _pq.write_table(t, str(d / "events.parquet"))

    from fileconvert_ray.functions.queries import (
        q_user_cumulative_value,
        q_user_first_last_event,
    )

    df = t.to_pandas()
    df["cents"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    df["cum"] = df.groupby("user_id")["cents"].cumsum()

    got = (
        q_user_cumulative_value(str(d))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    want = df.sort_values("event_id", ignore_index=True)
    assert (got["cum_value_c"].to_numpy() == want["cum"].to_numpy()).all()

    fl = q_user_first_last_event(str(d)).to_pandas().sort_values("user_id", ignore_index=True)
    first = df.groupby("user_id").first()
    last = df.groupby("user_id").last()
    assert (fl.set_index("user_id")["first_type"] == first["event_type"]).all()
    assert (fl.set_index("user_id")["last_type"] == last["event_type"]).all()
    assert int(fl.loc[fl.user_id == 1, "n_events"].iloc[0]) == int((uid == 1).sum())

    from fileconvert_ray.functions.queries import q_user_event_gaps

    gaps = q_user_event_gaps(str(d)).to_pandas().set_index("user_id").sort_index()
    df["us"] = df["ts"].astype("int64")
    want_gap = df.groupby("user_id")["us"].agg(
        n_gaps="count", sum_gap_us=lambda s: int(s.max() - s.min()),
        max_gap_us=lambda s: int(s.diff().max()),
    )
    want_gap["n_gaps"] -= 1
    want_gap = want_gap[want_gap["n_gaps"] > 0]
    assert (gaps["n_gaps"] == want_gap["n_gaps"]).all()
    # per-user sorted ts: sum of diffs telescopes to max-min
    assert (gaps["sum_gap_us"] == want_gap["sum_gap_us"]).all()
    assert (gaps["max_gap_us"] == want_gap["max_gap_us"]).all()


def test_top_orders_per_cust_dense_rank_ties(ray_session, tmp_path):
    """dense_rank keeps ALL rows tied at ranks 1 and 2: a customer with
    three orders at the same top price emits three rnk=1 rows plus the
    rnk=2 tier."""
    import os

    import numpy as np
    import pyarrow.parquet as _pq

    t = pa.table({
        "o_orderkey": np.arange(6, dtype=np.int64),
        "o_custkey": np.array([7, 7, 7, 7, 7, 8], dtype=np.int64),
        "o_orderstatus": ["O"] * 6,
        "o_totalprice": [50.0, 50.0, 50.0, 20.0, 10.0, 5.0],
        "o_orderdate": np.zeros(6, dtype="datetime64[us]"),
        "o_orderpriority": ["1-URGENT"] * 6,
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    _pq.write_table(t, str(d / "orders.parquet"))

    from fileconvert_ray.functions.queries import q_top_orders_per_cust

    got = q_top_orders_per_cust(str(d)).to_pandas().sort_values(
        ["o_custkey", "rnk", "o_orderkey"], ignore_index=True
    )
    # cust 7: three price-5000c orders all rnk 1, the 2000c order rnk 2
    # (the 1000c order is rank 3 -> dropped); cust 8: single order rnk 1
    assert got[got.o_custkey == 7].o_orderkey.tolist() == [0, 1, 2, 3]
    assert got[got.o_custkey == 7].rnk.tolist() == [1, 1, 1, 2]
    assert got[got.o_custkey == 8].rnk.tolist() == [1]


def test_json_int_field_fast_path_and_fallback():
    """The regex fast path must never mis-parse: adversarial payloads
    (quoted '\"k\":5' text inside a string value, nested objects,
    floats, reordered keys, duplicate keys) all agree with json.loads
    semantics; nulls and missing keys come back null."""
    import json

    import pyarrow as pa

    from fileconvert_ray.functions.jsonextract import json_int_field

    rows = [
        '{"k": 87}',
        '{"k":0}',
        '{ "k" : -12 }',
        '{"a": 1, "k": 7, "b": 2}',          # fast path, key mid-object
        '{"s": ",\\"k\\":5,", "k": 7}',       # adversarial: 5 inside a string
        '{"k": 1, "k": 2}',                   # duplicate key -> loads takes last
        '{"k": {"k": 3}}',                    # nested -> k is not an int
        '{"k": 2.5}',                         # float -> not an int
        '{"k": true}',                        # bool is not an int
        '{"a": 9}',                           # key absent
        "not json at all",
        None,
        '{"k": 99999999999}',
    ]
    got = json_int_field(pa.array(rows, type=pa.string()), "k").to_pylist()

    def truth(s):
        if s is None:
            return None
        try:
            v = json.loads(s).get("k")
        except (ValueError, AttributeError):
            return None
        return v if isinstance(v, int) and not isinstance(v, bool) else None

    assert got == [truth(s) for s in rows]


def test_window_bucket_count_invariance(ray_session, monkeypatch):
    """Window-op results must not depend on the bucket count (buckets
    hold whole user partitions; only task granularity changes)."""
    from fileconvert_ray.functions import queries as qmod

    sf = "/root/testdata/sf0.001"
    base = qmod.q_user_event_gaps(sf).to_pandas().sort_values("user_id", ignore_index=True)
    monkeypatch.setattr(qmod, "CUM_USER_BUCKETS", 3)
    small = qmod.q_user_event_gaps(sf).to_pandas().sort_values("user_id", ignore_index=True)
    assert base.equals(small)


def test_profile_parquet_nulls_and_lists(ray_session, tmp_path):
    """Profiler: exact distinct / null counts on a table with nulls,
    a float column with near-identical values (string-cast injectivity),
    and a list column (rows/nulls only, no distinct or ordering)."""
    import os

    import numpy as np
    import pyarrow.parquet as _pq

    t = pa.table({
        "i": pa.array([1, 2, 2, None, 5], type=pa.int64()),
        "f": pa.array([0.1, 0.1 + 2**-55, 0.1, None, -3.5], type=pa.float64()),
        "s": pa.array(["b", None, "a", "a", "zz"], type=pa.string()),
        "ts": pa.array(
            np.array([0, 1, 1, 2, 3], dtype="datetime64[us]"), type=pa.timestamp("us")
        ),
        "lst": pa.array([[1, 2], None, [], [3], [4]], type=pa.list_(pa.int32())),
    })
    p = str(tmp_path / "t.parquet")
    _pq.write_table(t, p)

    from fileconvert_ray.functions.profile import profile_parquet

    prof = {r["column"]: r for r in profile_parquet(p).to_pylist()}
    assert prof["i"] == {"column": "i", "n_rows": 5, "n_nulls": 1, "n_distinct": 3,
                         "min_num": 1.0, "max_num": 5.0, "min_str": None, "max_str": None}
    assert prof["f"]["n_distinct"] == 3  # 0.1 and 0.1+2^-55 are distinct doubles
    assert prof["f"]["min_num"] == -3.5
    assert prof["s"] == {"column": "s", "n_rows": 5, "n_nulls": 1, "n_distinct": 3,
                         "min_num": None, "max_num": None, "min_str": "a", "max_str": "zz"}
    assert prof["ts"]["n_distinct"] == 4 and prof["ts"]["max_num"] == 3.0
    assert prof["lst"]["n_rows"] == 5 and prof["lst"]["n_nulls"] == 1
    assert prof["lst"]["n_distinct"] == 0 and prof["lst"]["min_num"] is None


def test_range_partition_parquet(ray_session, tmp_path):
    """Range export: buckets are DISJOINT and ordered by construction
    (max of bucket i <= boundary i <= min of bucket i+1), counts are
    complete, sizes are roughly balanced (KLL epsilon), and the
    manifest matches the layout."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as _pq

    from fileconvert_ray.functions.export import range_partition_parquet

    out = str(tmp_path / "ranges")
    man = range_partition_parquet(
        "/root/testdata/sf0.001/orders.parquet", out, "o_totalprice", n_partitions=8
    )
    disk = _json.load(open(f"{out}/_range_manifest.json"))
    assert disk == man
    total = _pq.read_table("/root/testdata/sf0.001/orders.parquet").num_rows
    assert man["n_rows"] == total

    bounds = man["boundaries"]
    prev_max = -float("inf")
    for bid in sorted(int(b) for b in man["buckets"]):
        vals = []
        for fn in _glob.glob(f"{out}/range_bucket={bid}/*.parquet"):
            vals.extend(_pq.read_table(fn, columns=["o_totalprice"])
                        .column("o_totalprice").to_pylist())
        assert len(vals) == man["buckets"][str(bid)]
        assert min(vals) > prev_max or prev_max == -float("inf")
        # side="right" assignment: bucket i holds bounds[i-1] <= v < bounds[i]
        if bid > 0:
            assert min(vals) >= bounds[bid - 1]
        if bid < len(bounds):
            assert max(vals) < bounds[bid]
        prev_max = max(vals)
        # balance: no bucket more than 3x its fair share
        assert man["buckets"][str(bid)] <= 3 * total / len(man["buckets"]) + 8


def test_read_range_prunes_buckets(ray_session, tmp_path):
    """read_range touches only the manifest-selected bucket dirs and
    returns exactly the rows a full-scan filter would."""
    import pyarrow.parquet as _pq

    from fileconvert_ray.functions.export import range_partition_parquet, read_range

    out = str(tmp_path / "ranges")
    man = range_partition_parquet(
        "/root/testdata/sf0.001/orders.parquet", out, "o_totalprice", n_partitions=8
    )
    lo, hi = man["boundaries"][2], man["boundaries"][5]
    got = read_range(out, lo, hi).to_pandas()
    full = _pq.read_table(
        "/root/testdata/sf0.001/orders.parquet"
    ).to_pandas()
    want = full[(full.o_totalprice >= lo) & (full.o_totalprice < hi)]
    assert len(got) == len(want)
    assert sorted(got.o_orderkey) == sorted(want.o_orderkey)
    # unbounded read returns everything
    assert read_range(out).count() == len(full)
    # empty interval
    assert read_range(out, 1.0, 1.0).count() == 0


def test_json_int_field_property():
    """Property: for randomly generated flat JSON objects (string values
    may contain quotes/braces/'\"k\":' decoys), json_int_field == the
    json.loads truth."""
    import json

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fileconvert_ray.functions.jsonextract import json_int_field

    scalar = st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False),
        st.booleans(),
        st.none(),
        st.text(max_size=20),
    )
    obj = st.dictionaries(st.text(min_size=1, max_size=8), scalar, max_size=5)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(obj, min_size=1, max_size=20))
    def check(objs):
        rows = [json.dumps(o) for o in objs]
        got = json_int_field(pa.array(rows, type=pa.string()), "k").to_pylist()
        want = [
            o.get("k") if isinstance(o.get("k"), int) and not isinstance(o.get("k"), bool)
            else None
            for o in objs
        ]
        assert got == want

    check()


def test_export_and_profile_column_params(ray_session, tmp_path):
    """Parameter paths: read_range(columns=) projects (plus the key for
    the trim), and profile_parquet(columns=) restricts the report."""
    from fileconvert_ray.functions.export import range_partition_parquet, read_range
    from fileconvert_ray.functions.profile import profile_parquet

    out = str(tmp_path / "r")
    man = range_partition_parquet(
        "/root/testdata/sf0.001/orders.parquet", out, "o_totalprice",
        n_partitions=4, columns=["o_orderkey", "o_totalprice"],
    )
    lo = man["boundaries"][1]
    got = read_range(out, lo, None, columns=["o_orderkey", "o_totalprice"]).to_pandas()
    assert sorted(got.columns) == ["o_orderkey", "o_totalprice"]
    assert (got["o_totalprice"] >= lo).all() and len(got) > 0

    prof = profile_parquet(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    ).to_pylist()
    assert sorted(p["column"] for p in prof) == ["o_custkey", "o_orderstatus"]
    assert all(p["n_rows"] == 1500 for p in prof)


def test_json_int_field_exact_beyond_2_53():
    """Round-4 advice regression: values above 2^53 must never round-trip
    through float64 — fast path, fallback path, and int64 extremes."""
    import pyarrow as pa

    from fileconvert_ray.functions.jsonextract import json_int_field

    vals = [
        9007199254740993,          # 2^53 + 1: float64 would give ...992
        -9007199254740993,
        (1 << 62) + 1,             # 19 digits -> demoted to exact parser
        (1 << 63) - 1,
        -(1 << 63),
    ]
    rows = ['{"k": %d}' % v for v in vals]
    rows.append('{"k": %d}' % (1 << 70))  # unrepresentable in int64 -> null
    got = json_int_field(pa.array(rows, type=pa.string()), "k").to_pylist()
    assert got == vals + [None]


def test_read_range_projection_excludes_key(ray_session, tmp_path):
    """Round-4 advice regression: read_range with a projection that
    excludes the range key plus lo/hi must still trim (the key is read
    internally and dropped), not raise at execution time."""
    from fileconvert_ray.functions.export import range_partition_parquet, read_range

    out = str(tmp_path / "r")
    man = range_partition_parquet(
        "/root/testdata/sf0.001/orders.parquet", out, "o_totalprice",
        n_partitions=4, columns=["o_orderkey", "o_totalprice"],
    )
    lo, hi = man["boundaries"][0], man["boundaries"][2]
    got = read_range(out, lo, hi, columns=["o_orderkey"]).to_pandas()
    assert list(got.columns) == ["o_orderkey"]

    import pyarrow.parquet as pq

    full = pq.read_table(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    want = full[(full.o_totalprice >= lo) & (full.o_totalprice < hi)]
    assert sorted(got["o_orderkey"]) == sorted(want["o_orderkey"])


def test_profile_distinct_exact_beyond_2_53(ray_session, tmp_path):
    """Round-4 advice regression: the profiler's EXACT-distinct pass
    must not collapse int64 values that collide in float64."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fileconvert_ray.functions.profile import profile_parquet

    base = 1 << 60
    vals = [base, base + 1, base + 2, base + 3]  # all equal as float64
    p = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({"k": pa.array(vals * 2, type=pa.int64())}), p)
    prof = {r["column"]: r for r in profile_parquet(p).to_pylist()}
    assert prof["k"]["n_distinct"] == 4


def test_user_paths_bucket_invariance_and_cap(ray_session, monkeypatch, tmp_path):
    """user_paths on the hash-bucket + lexsort + binary_join pattern
    (round-4 verdict #3): results are bucket-count-invariant, and the
    capped variant bounds a pathological hot user's path at 8 steps
    while reporting the true n_events (verdict #8)."""
    import pyarrow.parquet as _pq

    from fileconvert_ray.functions import queries as qmod

    sf = "/root/testdata/sf0.001"
    base = qmod.q_user_paths(sf).to_pandas().sort_values("user_id", ignore_index=True)
    monkeypatch.setattr(qmod, "CUM_USER_BUCKETS", 3)
    small = qmod.q_user_paths(sf).to_pandas().sort_values("user_id", ignore_index=True)
    assert base.equals(small)

    # synthetic hot user: 5000 events for user 7, 3 for user 8
    n = 5000
    t = pa.table({
        "event_id": pa.array(list(range(n + 3)), type=pa.int64()),
        "user_id": pa.array([7] * n + [8] * 3, type=pa.int64()),
        "ts": pa.array(list(range(n + 3)), type=pa.int64()),
        "event_type": pa.array(["e%d" % (i % 5) for i in range(n)] + ["a", "b", "c"]),
    })
    d = tmp_path / "hot"
    d.mkdir()
    _pq.write_table(t, str(d / "events.parquet"))
    got = qmod.q_user_paths_capped(str(d)).to_pandas().set_index("user_id")
    assert int(got.loc[7, "n_events"]) == n  # true count survives the cap
    assert got.loc[7, "path"].count("->") == 7  # 8 steps
    assert got.loc[7, "path"] == "e0->e1->e2->e3->e4->e0->e1->e2"
    assert got.loc[8, "path"] == "a->b->c"  # short users unaffected


def test_fnv_sampling_family_properties(ray_session, tmp_path):
    """Round-4 verdict #4: the vectorized-FNV scale default of the
    sampling/split family matches the md5 oracle mode's PROPERTIES —
    keep-rate within tolerance, determinism across runs and across
    input partitionings (leakage-freedom: assignment is a pure
    function of the id), per-stratum targets hit."""
    import pyarrow.parquet as _pq

    from fileconvert_ray.functions import queries as qmod

    n = 4000
    rows = pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "source": pa.array(["s%d" % (i % 3) for i in range(n)]),
        "n_chars": pa.array([100] * n, type=pa.int64()),
        "text": pa.array(["t%d" % i for i in range(n)]),
    })
    d1, d8 = tmp_path / "one", tmp_path / "eight"
    d1.mkdir(); d8.mkdir()
    _pq.write_table(rows, str(d1 / "documents.parquet"))
    for k in range(8):  # same corpus, different sharding
        _pq.write_table(rows.slice(k * n // 8, n // 8), str(d8 / f"p{k}.parquet"))
    # read the 8-shard variant through the same single-dir API
    import shutil as _sh
    (d8 / "documents.parquet").mkdir()
    for k in range(8):
        _sh.move(str(d8 / f"p{k}.parquet"), str(d8 / "documents.parquet" / f"p{k}.parquet"))

    # seeded_sample: rate ~ 0x1a/256, identical set on both shardings
    s1 = qmod.q_seeded_sample(str(d1)).to_pandas().sort_values("doc_id", ignore_index=True)
    s8 = qmod.q_seeded_sample(str(d8)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert s1.equals(s8)
    rate = len(s1) / n
    want = int("1a", 16) / 256
    assert abs(rate - want) < 0.02, (rate, want)

    # train_test_split: 5/5/90 within tolerance, partitioning-invariant
    t1 = qmod.q_train_test_split(str(d1)).to_pandas().sort_values("doc_id", ignore_index=True)
    t8 = qmod.q_train_test_split(str(d8)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert t1.equals(t8) and len(t1) == n
    frac = t1["split"].value_counts(normalize=True)
    assert abs(frac.get("test", 0) - 0.05) < 0.02
    assert abs(frac.get("val", 0) - 0.05) < 0.02

    # stratified_sample: each stratum ~STRATA_TARGET docs
    st = qmod.q_stratified_sample(str(d1)).to_pandas()
    per = st.groupby("source").size()
    assert set(per.index) == {"s0", "s1", "s2"}
    assert ((per - qmod.STRATA_TARGET).abs() <= 0.35 * qmod.STRATA_TARGET).all(), per

    # seeded_shuffle: a permutation (pos unique per shard, all docs), stable
    sh1 = qmod.q_seeded_shuffle(str(d1)).to_pandas()
    sh8 = qmod.q_seeded_shuffle(str(d8)).to_pandas()
    assert len(sh1) == n
    assert sh1.groupby("shard")["pos"].apply(lambda p: sorted(p) == list(range(len(p)))).all()
    a = sh1.sort_values("doc_id", ignore_index=True)
    b = sh8.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)

    # doc_fingerprint: deterministic 16-hex digests, distinct texts distinct
    fp = qmod.q_doc_fingerprint(str(d1)).to_pandas()
    assert fp["fingerprint"].str.fullmatch("[0-9a-f]{16}").all()
    assert fp["fingerprint"].nunique() == n


def test_in_sorted_matches_isin():
    """Property (hypothesis): _in_sorted over an ascending key array is
    exactly np.isin, including empty sides and out-of-range probes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fileconvert_ray.functions.queries import _in_sorted

    ints = st.integers(min_value=-(2**62), max_value=2**62)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ints, max_size=50), st.lists(ints, max_size=50))
    def check(keys, vals):
        sk = np.unique(np.asarray(keys, dtype=np.int64))
        v = np.asarray(vals, dtype=np.int64)
        got = _in_sorted(sk, v)
        want = np.isin(v, sk)
        assert (got == want).all()

    check()


def test_integer_threshold_equivalence():
    """Property (hypothesis): the streaming-filter form v > (M*T)//n is
    exactly the SQL form v*n > M*T for positive n — the identity
    q_important_parts (and the Q22 balance cut) rely on to keep the
    Ray filter and the DuckDB oracle bit-identical without floats."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pos = st.integers(min_value=0, max_value=2**40)

    @settings(max_examples=500, deadline=None)
    @given(pos, st.integers(min_value=1, max_value=2**20), pos,
           st.integers(min_value=1, max_value=8))
    def check(v, n, total, mult):
        assert (v * n > mult * total) == (v > (mult * total) // n)

    check()


def test_ivf_pq_prunes_and_matches_pq_knn(ray_session, tmp_path):
    """IVF-PQ index: exhaustive probing must be bit-identical to the
    plain ADC scan (pq_knn); partial probing must read fewer lists and
    only emit candidates from the probed lists."""
    import ray
    import ray.data as rd

    from fileconvert_ray.functions.similarity import (
        build_ivf_probes,
        ivf_pq_build,
        ivf_pq_knn,
        pq_knn,
        pq_train,
    )

    rng = np.random.default_rng(17)
    n, dim, nlist, m_sub = 400, 16, 8, 4
    m = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
    })
    cb = pq_train(rd.from_arrow(t), m=m_sub, k=16, iters=2)
    cents = m[:nlist]
    idx_dir = str(tmp_path / "ivfpq")
    ivf_pq_build(rd.from_arrow(t), cents, ray.put(cb), idx_dir)

    # index carries codes + lid only — never the raw embedding
    import pyarrow.parquet as pq
    import glob
    one = glob.glob(f"{idx_dir}/list_id=*/*.parquet")[0]
    assert set(pq.read_schema(one).names) == {"vec_id", "codes", "lid"}

    qm = m[:3]
    qids = [0, 1, 2]
    k = 5

    # exhaustive: nprobe = nlist -> identical to the plain ADC scan
    probes = build_ivf_probes(qm, cents, nprobe=nlist)
    got, nread = ivf_pq_knn(idx_dir, cb, (qids, qm), probes, k=k)
    assert nread == nlist
    got = got.to_pandas().sort_values(["qid", "nid"], ignore_index=True)
    ref = (
        pq_knn(rd.from_arrow(t), ray.put(cb), ray.put((qids, qm)), k=k)
        .to_pandas().sort_values(["qid", "nid"], ignore_index=True)
    )
    assert got.equals(ref), (got, ref)

    # partial probing: fewer lists read, candidates confined to probes
    probes2 = build_ivf_probes(qm, cents, nprobe=2)
    got2, nread2 = ivf_pq_knn(idx_dir, cb, (qids, qm), probes2, k=k)
    assert nread2 < nlist
    df2 = got2.to_pandas()
    assert len(df2) > 0
    from fileconvert_ray.functions.similarity import _normalize as _nz
    lid_all = np.argmax(_nz(m) @ _nz(cents).T, axis=1)
    lid_of = dict(zip(ids.tolist(), lid_all.tolist()))
    pset = {q: set(int(x) for x in p) for q, p in zip(qids, probes2)}
    for q, nid in zip(df2.qid, df2.nid):
        assert lid_of[int(nid)] in pset[int(q)]


def test_ivf_pq_query_entry(ray_session):
    from fileconvert_ray.functions.queries import KNN_K, KNN_QIDS, q_ivf_pq_knn_search

    df = q_ivf_pq_knn_search("/root/testdata/sf0.001").to_pandas()
    assert set(df.groupby("qid").size()) == {KNN_K}
    assert set(df.qid.unique()) == set(KNN_QIDS)
