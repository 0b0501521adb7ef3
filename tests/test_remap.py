"""Vocab remap (pipelines/remap_job.py): re-express a store's token
ids in a target vocabulary — the recovery path for merge's
vocab-incompatibility refusal — via one int32 LUT gather per token."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.pipelines.ingest_job import load_vocab, run_ingest
from fileconvert_ray.pipelines.merge_job import run_merge
from fileconvert_ray.pipelines.remap_job import (
    build_remap_lut,
    remap_tokens_batch,
    remap_verify_reader,
    run_remap,
)
from fileconvert_ray.stages.decoder import decode_dataset


def test_build_remap_lut_unit():
    src = ["b", "a", "zzz"]          # zzz absent from target
    dst = ["a", "b", "c"]
    lut = build_remap_lut(src, dst)
    assert lut.dtype == np.int32 and len(lut) == 4
    assert lut[0] == 1 and lut[1] == 0      # word -> target id
    assert lut[2] == 3                      # missing word -> target OOV
    assert lut[3] == 3                      # src OOV slot -> target OOV


def test_remap_tokens_batch_rejects_foreign_ids():
    lut = build_remap_lut(["a"], ["a"])
    bad = pa.table({
        "doc_id": ["d"],
        "tokens": pa.array([[0, 7]], type=pa.list_(pa.int32())),
    })
    with pytest.raises(ValueError, match="out of range"):
        remap_tokens_batch(bad, lut=lut)


def _halves(sf_dir, tmp_path):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    h = docs.num_rows // 2
    s1, s2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
    pq.write_table(docs.slice(0, h), s1)
    pq.write_table(docs.slice(h), s2)
    return docs, s1, s2


def test_remap_makes_mismatched_stores_mergeable(ray_session, sf_dir, tmp_path):
    """Two independently-ingested halves (own vocabularies, forced to
    differ) refuse to merge; remapping B into A's id space produces a
    store whose merge succeeds, whose decoded ids complete the union,
    and whose tokens are BIT-IDENTICAL to tokenizing B's documents
    directly against A's vocab in frozen mode (B's own vocab is total,
    so remap loses nothing beyond the frozen-mode OOV rule)."""
    from fileconvert_ray.sources.tokseq import tokenize_batch

    docs, s1, s2 = _halves(sf_dir, tmp_path)
    A, B = str(tmp_path / "A"), str(tmp_path / "B")
    run_ingest([s1], A, target_partition_tokens=3_000)
    run_ingest([s2], B, target_partition_tokens=3_000)
    # force a vocab mismatch even if the halves share every word
    vb = load_vocab(B)
    json.dump(vb + ["zzz-not-in-A"], open(os.path.join(B, "vocab.json"), "w"))
    with pytest.raises(RuntimeError, match="remap-vocab"):
        run_merge(A, B)
    json.dump(vb, open(os.path.join(B, "vocab.json"), "w"))

    B2 = str(tmp_path / "B2")
    r = run_remap(B, B2, vocab=A, target_partition_tokens=3_000)
    assert r["ok"] and r["n_rows"] == docs.num_rows - docs.num_rows // 2
    assert load_vocab(B2) == load_vocab(A)

    # equivalence: remapped tokens == direct frozen-vocab tokenization
    va = load_vocab(A)
    direct = tokenize_batch(
        pq.read_table(s2), {w: i for i, w in enumerate(va)}, oov_id=len(va)
    )
    want = {
        d: t
        for d, t in zip(direct["doc_id"].to_pylist(), direct["tokens"].to_pylist())
    }
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in decode_dataset(B2, columns=["doc_id", "tokens"]).take_all()
    }
    assert got == want

    m = run_merge(A, B2)
    assert m["ok"]
    ids = sorted(
        r["doc_id"] for r in decode_dataset(A, columns=["doc_id"]).take_all()
    )
    assert ids == sorted(str(d) for d in docs["doc_id"].to_pylist())


def test_remap_refuses_vocabless_store(ray_session, sf_dir, tmp_path):
    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files
    from fileconvert_ray.sources.tokseq import tokseq_table

    sh = str(tmp_path / "plain.parquet")
    pq.write_table(tokseq_table(sf_dir), sh)
    P = str(tmp_path / "P")
    run_encode_files([sh], EncodeConfig(out_dir=P, target_partition_tokens=3_000)).materialize()
    with pytest.raises(RuntimeError, match="no vocab.json"):
        run_remap(P, str(tmp_path / "P2"), vocab=["a"])


def test_remap_verify_reader_round_trips_and_detects_drift(
    ray_session, sf_dir, tmp_path
):
    """Exact/hash verify on a remapped store reconstructs its input by
    decoding the recorded src and remapping again; a drifted src vocab
    is refused (the verify would compare against different bits)."""
    from fileconvert_ray.pipelines.verify_job import run_verify

    _, s1, _ = _halves(sf_dir, tmp_path)
    A = str(tmp_path / "A")
    run_ingest([s1], A, target_partition_tokens=3_000)
    va = load_vocab(A)
    A2 = str(tmp_path / "A2")
    run_remap(A, A2, vocab=list(reversed(va)), target_partition_tokens=3_000)

    factory = remap_verify_reader(A2)
    assert factory is not None
    assert remap_verify_reader(A) is None  # ingested, not remapped
    v = run_verify(factory, A2, mode="hash").to_pandas()
    assert len(v) > 0 and bool(v["ok"].all())

    json.dump(va + ["drifted"], open(os.path.join(A, "vocab.json"), "w"))
    with pytest.raises(RuntimeError, match="digest mismatch"):
        remap_verify_reader(A2)
