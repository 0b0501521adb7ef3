"""BPE corpus re-encoding (pipelines/bpe_job.py): train merges,
rewrite the corpus, exact invertibility, verify lineage."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.functions.bpe import (
    apply_rules_batch,
    bpe_reference,
    expand_rules_batch,
)
from fileconvert_ray.pipelines.bpe_job import (
    bpe_verify_reader,
    read_rules,
    run_bpe_reencode,
)
from fileconvert_ray.stages.decoder import decode_dataset


def _tab(docs):
    return pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(d) for d in docs], type=pa.int32()),
        "source": ["s0"] * len(docs),
    })


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_expand_inverts_apply(seed):
    """expand_rules_batch is the exact inverse of apply_rules_batch for
    rules trained by the reference (greedy-leftmost), including runs
    (x,x,x), empty docs, and rules referencing earlier new_ids."""
    rng = np.random.default_rng(seed)
    docs = [list(rng.integers(0, 6, int(rng.integers(0, 15))).astype(int))
            for _ in range(60)]
    rules = [(left, right, new_id)
             for _, left, right, _, new_id in bpe_reference(docs, rounds=6, vocab_base=100)]
    t = _tab(docs)
    applied = apply_rules_batch(t, rules=rules)
    if rules:
        assert sum(applied["n_tok"].to_pylist()) < sum(t["n_tok"].to_pylist())
    back = expand_rules_batch(applied, rules=rules)
    assert back["tokens"].to_pylist() == t["tokens"].to_pylist()
    assert back["n_tok"].to_pylist() == t["n_tok"].to_pylist()


def test_bpe_reencode_shrinks_and_verifies(ray_session, sf_dir, tmp_path):
    """End to end on a plain tokseq store: the re-encoded store holds
    fewer tokens, decodes+expands back to the exact original rows, and
    hash-verifies through the recorded lineage."""
    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode_files
    from fileconvert_ray.pipelines.verify_job import run_verify
    from fileconvert_ray.sources.tokseq import tokseq_table
    from fileconvert_ray.state.manifest import read_manifest_entries

    t = tokseq_table(sf_dir)
    sh = str(tmp_path / "in.parquet")
    pq.write_table(t, sh)
    src = str(tmp_path / "S")
    run_encode_files([sh], EncodeConfig(out_dir=src, target_partition_tokens=3_000)).materialize()
    src_tokens = sum(e["n_tokens"] for e in read_manifest_entries(src).values())

    out = str(tmp_path / "B")
    r = run_bpe_reencode(src, out, rounds=8)
    assert r["ok"] and r["merges_trained"] == 8
    assert r["n_rows"] == t.num_rows and r["n_tokens"] < src_tokens

    rules = read_rules(out)
    assert len(rules) == 8 and read_rules(src) is None

    # decode + expand == original rows
    got = {}
    for b in decode_dataset(out).iter_batches(batch_size=None, batch_format="pyarrow"):
        e = expand_rules_batch(b, rules=rules)
        got.update(zip(e["doc_id"].to_pylist(), e["tokens"].to_pylist()))
    want = dict(zip(
        (str(d) for d in t["doc_id"].to_pylist()), t["tokens"].to_pylist()
    ))
    assert got == want

    v = run_verify(bpe_verify_reader(out), out, mode="hash").to_pandas()
    assert len(v) > 0 and bool(v["ok"].all())
    assert bpe_verify_reader(src) is None


def test_bpe_detokenize_and_drift_refusal(ray_session, sf_dir, tmp_path):
    """On an ingested (vocab-bearing) store: detokenize of the BPE
    store reproduces the original text transparently; a drifted src
    vocab refuses verify."""
    from fileconvert_ray.pipelines.ingest_job import load_vocab, run_ingest
    from fileconvert_ray.pipelines.tokenize_job import run_detokenize

    store = str(tmp_path / "S")
    run_ingest([f"{sf_dir}/documents.parquet"], store, target_partition_tokens=3_000)
    out = str(tmp_path / "B")
    r = run_bpe_reencode(store, out, rounds=4)
    assert r["ok"]
    back = str(tmp_path / "back")
    run_detokenize(out, back)
    got = pq.read_table(back)
    orig = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = dict(zip((str(d) for d in orig["doc_id"].to_pylist()),
                    orig["text"].to_pylist()))
    assert dict(zip(got["doc_id"].to_pylist(), got["text"].to_pylist())) == want

    va = load_vocab(store)
    json.dump(va + ["drifted"], open(os.path.join(store, "vocab.json"), "w"))
    with pytest.raises(RuntimeError, match="digest mismatch"):
        bpe_verify_reader(out)
