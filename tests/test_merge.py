"""Corpus merge (pipelines/merge_job.py): union two encoded stores
without re-encoding — src partitions land as new ingest generations,
containers hardlinked, digests preserved, tombstones carried over."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.pipelines.encode_job import (
    EncodeConfig,
    run_encode,
    run_encode_files,
)
from fileconvert_ray.pipelines.merge_job import run_merge
from fileconvert_ray.pipelines.verify_job import run_verify
from fileconvert_ray.sources.tokseq import tokseq_table
from fileconvert_ray.stages.decoder import decode_dataset, lookup_docs
from fileconvert_ray.state.manifest import read_manifest_entries, read_plan


def _split_shards(t: pa.Table, base, names):
    """Write |names| contiguous slices of t as shards; returns paths."""
    os.makedirs(base, exist_ok=True)
    n = t.num_rows // len(names)
    paths = []
    for i, name in enumerate(names):
        lo = i * n
        hi = t.num_rows if i == len(names) - 1 else (i + 1) * n
        p = os.path.join(base, name)
        pq.write_table(t.slice(lo, hi - lo), p)
        paths.append(p)
    return paths


@pytest.fixture
def two_stores(ray_session, sf_dir, tmp_path):
    """The sf0.001 corpus split doc-wise into two independently
    encoded generational stores (A: shards 0-1, B: shards 2-3)."""
    t = tokseq_table(sf_dir)
    shards = _split_shards(t, str(tmp_path / "sh"), [f"s{i}.parquet" for i in range(4)])
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    run_encode_files(shards[:2], EncodeConfig(out_dir=a, target_partition_tokens=2_000)).materialize()
    # B gets TWO generations of its own (tests gen renumbering)
    run_encode_files(shards[2:3], EncodeConfig(out_dir=b, target_partition_tokens=2_000)).materialize()
    run_encode_files(shards[2:4], EncodeConfig(out_dir=b, target_partition_tokens=2_000)).materialize()
    return a, b, t, shards


def _decoded_ids(out_dir, **kw):
    ds = decode_dataset(out_dir, columns=["doc_id"], **kw)
    return sorted(r["doc_id"] for r in ds.take_all())


def test_merge_union_is_complete(two_stores):
    a, b, t, _ = two_stores
    before = set(_decoded_ids(a))
    r = run_merge(a, b)
    assert r["ok"] and r["merged_partitions"] > 0 and r["skipped_partitions"] == 0
    assert r["generations_added"] == 2 and r["first_new_generation"] == 1
    assert r["hardlinked"] and not r["opaque_lineage"]
    got = _decoded_ids(a)
    want = sorted(str(d) for d in t.column("doc_id").to_pylist())
    assert got == want
    # dest rows untouched, src dir unchanged
    assert before < set(got)
    assert set(_decoded_ids(b)) == set(got) - before

    # manifest verify green immediately (digests carried with the bits)
    v = run_verify(None, a, mode="manifest").to_pandas()
    assert bool(v["ok"].all()) and len(v) == len(read_manifest_entries(a))
    # hash verify green too: B's file lineage rode along
    v2 = run_verify(None, a, mode="hash").to_pandas()
    assert bool(v2["ok"].all())

    # point lookup routes through the merged generations
    some = want[::97][:5]
    hit = lookup_docs(a, some)
    assert sorted(hit.column("doc_id").to_pylist()) == sorted(some)

    # snapshot semantics: the merged-in corpus is generations >= 1
    assert set(_decoded_ids(a, max_gen=0)) == before


def test_merge_rerun_is_idempotent(two_stores):
    a, b, _, _ = two_stores
    r1 = run_merge(a, b)
    n = len(read_manifest_entries(a))
    r2 = run_merge(a, b)
    assert r2["merged_partitions"] == 0
    assert r2["skipped_partitions"] == r1["merged_partitions"]
    assert len(read_manifest_entries(a)) == n
    # plan records the src generations exactly once per (gen, source-set)
    plan = read_plan(a)
    assert [g["gen"] for g in plan["generations"]] == list(range(len(plan["generations"])))


def test_merge_carries_tombstones(two_stores):
    a, b, t, _ = two_stores
    from fileconvert_ray.pipelines.delete_job import run_delete

    b_ids = _decoded_ids(b)
    victims = b_ids[:7]
    run_delete(b, victims)
    assert set(_decoded_ids(b)) == set(b_ids) - set(victims)
    run_merge(a, b)
    got = set(_decoded_ids(a))
    assert not (got & set(victims))
    assert set(b_ids) - set(victims) <= got


def test_merge_legacy_src_is_opaque(two_stores, tmp_path):
    a, _, t, shards = two_stores
    import ray.data as rd

    legacy = str(tmp_path / "L")
    run_encode(
        lambda: rd.read_parquet(shards[2:4]),
        EncodeConfig(out_dir=legacy, target_partition_tokens=2_000),
    ).materialize()
    r = run_merge(a, legacy)
    assert r["ok"] and r["opaque_lineage"]
    want = sorted(str(d) for d in t.column("doc_id").to_pylist())
    assert _decoded_ids(a) == want
    # manifest verify fine; hash verify refuses loudly (no lineage)
    v = run_verify(None, a, mode="manifest").to_pandas()
    assert bool(v["ok"].all())
    with pytest.raises(ValueError, match="opaque"):
        run_verify(None, a, mode="hash")
    # incremental encode refuses to extend an opaque store
    with pytest.raises(RuntimeError, match="OPAQUE"):
        run_encode_files(shards, EncodeConfig(out_dir=a, target_partition_tokens=2_000))


def test_merge_refuses_self_and_conflict(two_stores, tmp_path):
    a, b, t, shards = two_stores
    with pytest.raises(ValueError, match="same directory"):
        run_merge(a, a)
    # digest conflict: land the merge, then tamper with one imported
    # manifest digest and re-merge — the conflicting label must refuse
    run_merge(a, b)
    ents = read_manifest_entries(a)
    pid = sorted(p for p in ents if ents[p].get("merged_from"))[0]
    rec = ents[pid]
    rec["digest"] = {"hsum": 1, "n_rows": rec["digest"]["n_rows"]}
    mpath = os.path.join(a, "manifest", f"{pid}.json")
    with open(mpath, "w") as f:
        json.dump(rec, f)
    with pytest.raises(RuntimeError, match="different digest"):
        run_merge(a, b)


def test_merge_resumes_after_partial_crash(two_stores):
    """Simulated crash: first merge attempt landed some partitions but
    died before plan.json — the re-run lands the rest and converges."""
    a, b, t, _ = two_stores
    plan_before = read_plan(a)
    r = run_merge(a, b)
    # roll back plan.json to pre-merge (as if the crash hit right
    # before the final write), drop half the landed manifests+parts
    from fileconvert_ray.state.manifest import write_plan

    write_plan(a, plan_before)
    ents = read_manifest_entries(a)
    imported = sorted(p for p in ents if ents[p].get("merged_from"))
    assert len(imported) == r["merged_partitions"]
    for pid in imported[: len(imported) // 2]:
        os.remove(os.path.join(a, "manifest", f"{pid}.json"))
        os.remove(os.path.join(a, "parts", f"{pid}.parquet"))
    r2 = run_merge(a, b)
    assert r2["merged_partitions"] == len(imported) // 2
    assert r2["skipped_partitions"] == len(imported) - len(imported) // 2
    want = sorted(str(d) for d in t.column("doc_id").to_pylist())
    assert _decoded_ids(a) == want
    v = run_verify(None, a, mode="hash").to_pandas()
    assert bool(v["ok"].all())


def test_merge_refuses_vocab_mismatch(ray_session, sf_dir, tmp_path):
    """Two ingested stores with different vocabularies carry
    incompatible token id spaces — merge must refuse, and equal
    vocabularies must pass."""
    from fileconvert_ray.pipelines.ingest_job import run_ingest

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    h = docs.num_rows // 2
    s1, s2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
    pq.write_table(docs.slice(0, h), s1)
    pq.write_table(docs.slice(h), s2)
    A, B = str(tmp_path / "A"), str(tmp_path / "B")
    run_ingest([s1], A, target_partition_tokens=3_000)
    run_ingest([s2], B, target_partition_tokens=3_000)
    # same corpus words at both halves? force a mismatch to be sure
    vb = json.load(open(os.path.join(B, "vocab.json")))
    json.dump(vb + ["zzz-extra"], open(os.path.join(B, "vocab.json"), "w"))
    with pytest.raises(RuntimeError, match="incompatible"):
        run_merge(A, B)
    # restore equality -> merge proceeds and the union decodes fully
    json.dump(json.load(open(os.path.join(A, "vocab.json"))),
              open(os.path.join(B, "vocab.json"), "w"))
    r = run_merge(A, B)
    assert r["ok"] and r["merged_partitions"] > 0
    assert len(_decoded_ids(A)) == docs.num_rows
    # ingested-into-plain is refused too
    t = tokseq_table(sf_dir)
    sh = str(tmp_path / "plain.parquet")
    pq.write_table(t, sh)
    P = str(tmp_path / "P")
    run_encode_files([sh], EncodeConfig(out_dir=P, target_partition_tokens=3_000)).materialize()
    with pytest.raises(RuntimeError, match="incompatible"):
        run_merge(P, A)


# ---------------------------------------------------------- merge dedup


def test_token_content_hashes_identity():
    """Identity is the token sequence alone: doc_id/source-independent,
    position-sensitive, empty rows mutually equal."""
    import numpy as np

    from fileconvert_ray.functions.dedup import token_content_hashes

    def tab(rows, ids=None):
        n = [len(r) for r in rows]
        return pa.table({
            "doc_id": ids or [f"d{i}" for i in range(len(rows))],
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
            "n_tok": pa.array(n, type=pa.int32()),
            "source": [f"s{i}" for i in range(len(rows))],
        })

    h = token_content_hashes(tab([[1, 2, 3], [1, 2, 3], [3, 2, 1], [], []]))
    assert h[0] == h[1]          # same content, different id+source
    assert h[0] != h[2]          # reorder changes the hash
    assert h[3] == h[4]          # empty == empty
    assert h[0] != h[3]


def test_merge_dedup_exact_end_to_end(two_stores, tmp_path):
    """dedup='exact' tombstones exactly the imported rows whose token
    sequence pre-exists in dest: a re-idd exact copy is dropped, a
    one-token-modified copy survives; re-running is idempotent and
    purge physically reclaims the duplicates."""
    import numpy as np

    a, _, t, shards = two_stores
    pre_ids = set(_decoded_ids(a))

    # build a src store from A's OWN half: every row duplicated under a
    # fresh id (dup-*) plus a modified copy (nv-*, one token appended)
    half = pq.read_table(shards[0])
    toks = half.column("tokens").combine_chunks()
    vals = toks.values.to_numpy(zero_copy_only=False)
    lens = half.column("n_tok").to_numpy(zero_copy_only=False).astype("int64")
    new_vals = np.zeros(len(vals) + half.num_rows, dtype=np.int32)
    new_vals[np.arange(len(vals)) + np.repeat(np.arange(half.num_rows), lens)] = vals
    novel = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(lens + 1))), type=pa.int32()),
        pa.array(new_vals, type=pa.int32()),
    )
    ids = pc.cast(half.column("doc_id"), pa.string()).combine_chunks()
    src_tab = pa.concat_tables([
        pa.Table.from_arrays(
            [pc.binary_join_element_wise(pa.array(["dup-"] * half.num_rows), ids, ""),
             toks, half.column("n_tok").combine_chunks(),
             half.column("source").combine_chunks()],
            names=["doc_id", "tokens", "n_tok", "source"]),
        pa.Table.from_arrays(
            [pc.binary_join_element_wise(pa.array(["nv-"] * half.num_rows), ids, ""),
             novel, pa.array((lens + 1).astype(np.int32)),
             half.column("source").combine_chunks()],
            names=["doc_id", "tokens", "n_tok", "source"]),
    ])
    sh = str(tmp_path / "dupsrc.parquet")
    pq.write_table(src_tab, sh)
    S = str(tmp_path / "S")
    run_encode_files([sh], EncodeConfig(out_dir=S, target_partition_tokens=2_000)).materialize()

    r = run_merge(a, S, dedup="exact")
    assert r["ok"] and r["duplicates_tombstoned"] == half.num_rows
    got = set(_decoded_ids(a))
    assert got == pre_ids | {f"nv-{i}" for i in ids.to_pylist()}

    # idempotent: same tombstones, nothing double-counted
    r2 = run_merge(a, S, dedup="exact")
    assert r2["skipped_partitions"] == r["merged_partitions"]
    assert set(_decoded_ids(a)) == got

    # purge physically drops the tombstoned rows; decode unchanged
    from fileconvert_ray.pipelines.delete_job import run_purge

    run_purge(a)
    assert set(_decoded_ids(a)) == got


def test_merge_dedup_ignores_tombstoned_dest_rows(two_stores, tmp_path):
    """A dest doc that was DELETED must not block re-ingest of the
    same content — the takedown removed it, the new copy is new data."""
    from fileconvert_ray.pipelines.delete_job import run_delete

    a, _, t, shards = two_stores
    half = pq.read_table(shards[0])
    victim = str(half.column("doc_id")[0].as_py())
    run_delete(a, [victim])
    assert victim not in set(_decoded_ids(a))

    one = half.slice(0, 1)
    src_tab = pa.Table.from_arrays(
        [pa.array([f"re-{victim}"]),
         one.column("tokens").combine_chunks(),
         one.column("n_tok").combine_chunks(),
         one.column("source").combine_chunks()],
        names=["doc_id", "tokens", "n_tok", "source"])
    sh = str(tmp_path / "re.parquet")
    pq.write_table(src_tab, sh)
    S = str(tmp_path / "S2")
    run_encode_files([sh], EncodeConfig(out_dir=S, target_partition_tokens=2_000)).materialize()
    r = run_merge(a, S, dedup="exact")
    assert r["duplicates_tombstoned"] == 0
    assert f"re-{victim}" in set(_decoded_ids(a))


def test_merge_dedup_minhash_near_copies(two_stores, tmp_path):
    """dedup='minhash' drops imported near-copies (one token changed
    mid-doc, shingle Jaccard >= ~0.85) and keeps content-disjoint rows
    (all token ids shifted out of the dest id range); short docs
    (< shingle_k tokens) are never near-dropped."""
    import numpy as np

    a, _, t, shards = two_stores
    pre_ids = set(_decoded_ids(a))

    half = pq.read_table(shards[0])
    keep = half.column("n_tok").to_numpy(zero_copy_only=False) >= 40
    big = half.filter(pa.array(keep))
    assert big.num_rows >= 20, "fixture needs enough long docs"

    toks = big.column("tokens").combine_chunks()
    vals = toks.values.to_numpy(zero_copy_only=False).copy()
    lens = big.column("n_tok").to_numpy(zero_copy_only=False).astype("int64")
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    vals[starts + lens // 2] += 1  # one token changed per doc
    near = pa.ListArray.from_arrays(toks.offsets, pa.array(vals, type=pa.int32()))
    far = pa.ListArray.from_arrays(
        toks.offsets,
        pa.array(
            toks.values.to_numpy(zero_copy_only=False) + 1_000_000, type=pa.int32()
        ),
    )
    # plus one sub-shingle doc (2 tokens): must never be near-dropped
    tiny = pa.table({
        "doc_id": ["tiny-1"],
        "tokens": pa.array([[1, 2]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([2], type=pa.int32()),
        "source": [str(big.column("source")[0].as_py())],
    })

    ids = pc.cast(big.column("doc_id"), pa.string()).combine_chunks()

    def tagged(prefix, tokens):
        return pa.Table.from_arrays(
            [pc.binary_join_element_wise(pa.array([prefix] * big.num_rows), ids, ""),
             tokens, big.column("n_tok").combine_chunks(),
             big.column("source").combine_chunks()],
            names=["doc_id", "tokens", "n_tok", "source"])

    sh = str(tmp_path / "nearsrc.parquet")
    pq.write_table(
        pa.concat_tables([tagged("nd-", near), tagged("fz-", far), tiny]), sh
    )
    S = str(tmp_path / "NS")
    run_encode_files([sh], EncodeConfig(out_dir=S, target_partition_tokens=2_000)).materialize()

    r = run_merge(a, S, dedup="minhash")
    assert r["ok"] and r["duplicates_tombstoned"] == big.num_rows
    got = set(_decoded_ids(a))
    id_list = ids.to_pylist()
    assert got == pre_ids | {f"fz-{i}" for i in id_list} | {"tiny-1"}


# ------------------------------------------------------ drop-generation


def test_drop_generation_is_merge_inverse(two_stores):
    """merge A<-B then drop the merged generations: decode returns to
    exactly A's pre-merge rows, hash verify stays green on the
    survivors, and a re-merge of B lands cleanly afterwards."""
    from fileconvert_ray.pipelines.merge_job import run_drop_generation

    a, b, t, shards = two_stores
    pre = set(_decoded_ids(a))
    r = run_merge(a, b)
    assert r["ok"] and r["generations_added"] == 2
    base = r["first_new_generation"]

    for g in (base, base + 1):
        d = run_drop_generation(a, g)
        assert d["ok"] and d["dropped_partitions"] > 0
    assert set(_decoded_ids(a)) == pre

    v = run_verify(
        None, a, mode="hash", by="partition",
    ).to_pandas()
    assert len(v) > 0 and bool(v["ok"].all())

    r2 = run_merge(a, b)  # dropped lineage left the plan: fresh re-merge
    assert r2["ok"] and r2["merged_partitions"] > 0
    assert len(_decoded_ids(a)) == t.num_rows


def test_drop_generation_refusals(two_stores, tmp_path):
    from fileconvert_ray.pipelines.merge_job import run_drop_generation

    import ray.data as rd

    a, b, t, shards = two_stores
    with pytest.raises(ValueError, match="unknown generation"):
        run_drop_generation(a, 99)
    # B has exactly 2 gens; drop one, then the last is refused
    run_drop_generation(b, 1)
    with pytest.raises(RuntimeError, match="last generation"):
        run_drop_generation(b, 0)
    # non-generational store refused
    sh = str(tmp_path / "p.parquet")
    pq.write_table(t, sh)
    P = str(tmp_path / "Pd")
    run_encode(lambda: rd.read_parquet(sh),
               EncodeConfig(out_dir=P, target_partition_tokens=3_000)).materialize()
    with pytest.raises(RuntimeError, match="no generational plan"):
        run_drop_generation(P, 0)


def test_drop_generation_sweeps_orphan_sidecars(two_stores):
    """Crash window: a pid whose manifest was unlinked but whose
    tombstone survived is invisible to the per-pid loop — the label-
    pattern sweep must still remove it, and fsck must be clean after."""
    from fileconvert_ray.pipelines.merge_job import run_drop_generation
    from fileconvert_ray.state.fsck import fsck
    from fileconvert_ray.state.manifest import (
        JobDirs,
        read_manifest_entries,
        tombstone_path,
        write_tombstones,
    )
    from fileconvert_ray.stages.decoder import label_generations

    a, b, t, shards = two_stores
    r = run_merge(a, b)
    base = r["first_new_generation"]
    gen_of = label_generations(a)
    victims = sorted(p for p, g in gen_of.items() if g == base)
    crashed = victims[0]
    # simulate the interrupted drop: manifest gone, tombstone left
    write_tombstones(a, crashed, ["ghost-id"])
    os.unlink(JobDirs(a).manifest_path(crashed))

    d = run_drop_generation(a, base)
    assert d["ok"] and d["dropped_partitions"] == len(victims) - 1
    assert not os.path.exists(tombstone_path(a, crashed))
    run_drop_generation(a, base + 1)
    rep = fsck(a, reclaim=True)  # reclaims the crashed pid's container
    assert rep["ok"], rep["errors"]
    assert crashed not in read_manifest_entries(a)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_dedup_exact_randomized(ray_session, tmp_path, seed):
    """Randomized oracle: B docs copy a random A doc's token sequence
    with p=0.4 (fresh ids, random source); merge dedup must drop
    exactly the B docs whose sequence exists in A — including empty
    docs (empty == empty) and B-internal duplicates of non-A content
    (which must all survive)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def rand_doc():
        n = int(rng.integers(0, 12))
        return list(rng.integers(0, 50, n).astype("int32"))

    a_docs = [rand_doc() for _ in range(40)]
    b_docs = []
    for _ in range(40):
        if rng.random() < 0.4:
            b_docs.append(list(a_docs[int(rng.integers(0, 40))]))
        else:
            b_docs.append(rand_doc())

    def tab(docs, prefix):
        return pa.table({
            "doc_id": [f"{prefix}{i}" for i in range(len(docs))],
            "tokens": pa.array(docs, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(d) for d in docs], type=pa.int32()),
            "source": [f"s{int(rng.integers(0, 3))}" for _ in docs],
        })

    sh_a, sh_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(tab(a_docs, "a"), sh_a)
    pq.write_table(tab(b_docs, "b"), sh_b)
    A, B = str(tmp_path / "A"), str(tmp_path / "B")
    run_encode_files([sh_a], EncodeConfig(out_dir=A, target_partition_tokens=100)).materialize()
    run_encode_files([sh_b], EncodeConfig(out_dir=B, target_partition_tokens=100)).materialize()

    r = run_merge(A, B, dedup="exact")
    a_set = {tuple(d) for d in a_docs}
    expected_dropped = {f"b{i}" for i, d in enumerate(b_docs) if tuple(d) in a_set}
    assert r["duplicates_tombstoned"] == len(expected_dropped)
    got = set(_decoded_ids(A))
    want = {f"a{i}" for i in range(40)} | (
        {f"b{i}" for i in range(40)} - expected_dropped
    )
    assert got == want


def test_merge_dedup_rerun_after_full_dup(two_stores, tmp_path):
    """A src that is ENTIRELY duplicate content gets fully tombstoned;
    re-running the dedup merge then sees zero live imported rows and
    must converge cleanly (schema-less-dataset regression), for both
    the exact and the minhash variant."""
    a, _, t, shards = two_stores
    pre = set(_decoded_ids(a))
    half = pq.read_table(shards[0])
    src_tab = half.set_column(
        half.schema.get_field_index("doc_id"), "doc_id",
        pc.binary_join_element_wise(
            pa.array(["cp-"] * half.num_rows),
            pc.cast(half.column("doc_id"), pa.string()).combine_chunks(), ""),
    )
    sh = str(tmp_path / "alldup.parquet")
    pq.write_table(src_tab, sh)
    S = str(tmp_path / "AD")
    run_encode_files([sh], EncodeConfig(out_dir=S, target_partition_tokens=2_000)).materialize()

    r1 = run_merge(a, S, dedup="exact")
    assert r1["duplicates_tombstoned"] == half.num_rows
    assert set(_decoded_ids(a)) == pre
    r2 = run_merge(a, S, dedup="exact")   # all imported rows tombstoned
    assert r2["ok"] and r2["duplicates_tombstoned"] == 0
    r3 = run_merge(a, S, dedup="minhash")  # near variant over zero live rows
    assert r3["ok"] and r3["duplicates_tombstoned"] == 0
    assert set(_decoded_ids(a)) == pre
