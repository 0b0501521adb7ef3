"""Vocab-aware annotators (pipelines/annotate_job.py text_quality /
langid): id-level recomputation of the text-level signals, refusal
matrix, and curation-loop composition (delete --where-ann over a
language score)."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ingested(ray_session, tmp_path_factory):
    """One full-corpus ingest store shared by the module (total vocab:
    token ids are word ids, annotator output must be bit-identical to
    the text-level reference)."""
    from fileconvert_ray.pipelines.ingest_job import run_ingest

    base = str(tmp_path_factory.mktemp("annstore"))
    enc = os.path.join(base, "enc")
    run_ingest([f"{SF}/documents.parquet"], enc, target_partition_tokens=100_000)
    return enc


def _attached(enc, name, cols):
    from fileconvert_ray.stages.decoder import decode_dataset

    df = (
        decode_dataset(enc, columns=["doc_id"], with_annotations=[name])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype(str)
    return df[["doc_id"] + cols]


def test_text_quality_matches_text_level_reference(ingested):
    """The five signals computed from token ids equal quality_batch
    over the original text bit-for-bit (space-split tokenize + single
    space join make word properties a function of the vocab alone)."""
    from fileconvert_ray.functions.textstats import quality_batch
    from fileconvert_ray.pipelines.annotate_job import run_annotate

    run_annotate(ingested, "text_quality")
    cols = ["n_chars", "n_words", "stop_ratio", "punct_ratio", "mean_word_len"]
    got = _attached(ingested, "text_quality", cols)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ref = quality_batch(docs).to_pandas()
    ref["doc_id"] = ref["doc_id"].astype(str)
    ref = ref.sort_values("doc_id").reset_index(drop=True)

    assert len(got) == len(ref) == docs.num_rows
    for c in cols:
        assert np.array_equal(got[c].values, ref[c].values), c  # exact, incl. floats


def test_langid_matches_text_level_reference(ingested):
    """pred_lang and the integer per-language scores from token ids
    equal LangId over the original text (spaces score zero in every
    profile, so the join separator drops out of the sum)."""
    from fileconvert_ray.functions.textstats import LangId
    from fileconvert_ray.pipelines.annotate_job import run_annotate

    run_annotate(ingested, "langid")
    model = LangId()
    score_cols = [f"s_{l}" for l in model.langs]
    got = _attached(ingested, "langid", ["pred_lang"] + score_cols)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ref = model(docs).to_pandas()
    ref["doc_id"] = ref["doc_id"].astype(str)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert (got["pred_lang"].values == ref["pred_lang"].values).all()

    # scores: recompute the text-level integer sums directly
    from fileconvert_ray.util.hashing import _string_parts

    texts = docs.column("text").combine_chunks()
    off, buf = _string_parts(texts)
    per_byte = model.W[buf[off[0]:off[-1]]]
    starts, lens = off[:-1] - off[0], np.diff(off)
    scores = np.zeros((len(lens), len(model.langs)), dtype=np.int64)
    ne = lens > 0
    scores[ne] = np.add.reduceat(per_byte, starts[ne], axis=0)
    order = np.argsort(docs.column("doc_id").to_pandas().astype(str).values, kind="stable")
    for j, c in enumerate(score_cols):
        assert np.array_equal(got[c].values, scores[order][:, j]), c


def test_vocab_annotators_refuse_plain_and_bpe_stores(ray_session, tmp_path, ingested):
    """No vocab.json (run_encode store) and BPE-re-encoded stores must
    refuse loudly — token ids are not word ids there."""
    import glob

    from fileconvert_ray.pipelines.annotate_job import run_annotate
    from fileconvert_ray.pipelines.bpe_job import run_bpe_reencode
    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files
    from fileconvert_ray.sources.tokseq import tokseq_dataset

    shards = str(tmp_path / "sh")
    tokseq_dataset(SF).write_parquet(shards)
    plain = str(tmp_path / "plain")
    run_encode_files(
        sorted(glob.glob(f"{shards}/*.parquet")),
        EncodeConfig(out_dir=plain, target_partition_tokens=100_000),
    ).materialize()
    with pytest.raises(ValueError, match="vocab.json"):
        run_annotate(plain, "text_quality")

    bpe = str(tmp_path / "bpe")
    run_bpe_reencode(ingested, bpe, rounds=2, target_partition_tokens=100_000)
    with pytest.raises(ValueError, match="BPE"):
        run_annotate(bpe, "langid")


def test_quality_gated_delete_composition(ray_session, tmp_path):
    """The curation loop end to end with NO raw-corpus access after
    ingest: annotate text_quality, delete --where-ann on stop_ratio,
    and the surviving decode equals the text-level ground truth."""
    from fileconvert_ray.functions.textstats import quality_batch
    from fileconvert_ray.pipelines.annotate_job import run_annotate
    from fileconvert_ray.pipelines.delete_job import run_delete_where
    from fileconvert_ray.pipelines.ingest_job import run_ingest
    from fileconvert_ray.stages.decoder import decode_dataset

    enc = str(tmp_path / "enc")
    run_ingest([f"{SF}/documents.parquet"], enc, target_partition_tokens=100_000)
    run_annotate(enc, "text_quality")

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    q = quality_batch(docs).to_pandas()
    cut = float(np.median(q["stop_ratio"].values))

    res = run_delete_where(enc, "text_quality", "stop_ratio", lo=cut, hi=None)
    assert res["found"] == int((q["stop_ratio"].values >= cut).sum())

    kept = decode_dataset(enc, columns=["doc_id"]).to_pandas()["doc_id"].astype(str)
    want = set(q.loc[q["stop_ratio"] < cut, "doc_id"].astype(str))
    assert set(kept) == want
