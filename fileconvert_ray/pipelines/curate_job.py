"""End-to-end curation pipeline: exact dedup -> rule-based quality
filter -> deterministic train/val/test split -> (optionally) tokenize,
encode and hash-verify the train split.

One composition of the engine's own stages, exposed as the ``curate``
CLI subcommand (SURVEY.md §3.2).  Everything streams: the dedup id set
is the only driver-held state (see functions/dedup.py for the join
strategy when even that is too big), the filter and split are
shuffle-free per-batch maps, and the single write is hive-partitioned
by split so downstream jobs read only their slice.  The split column
depends only on the doc id, so re-running curation with more data
never migrates an old doc across splits (leakage-free growth).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _rules():
    # canonical rule constants live next to their oracle SQL
    from ..functions.queries import (
        C4_MAX_WORDS,
        C4_MIN_STOP,
        C4_MIN_WORDS,
        SPLIT_TEST_CUT,
        SPLIT_VAL_CUT,
    )

    return C4_MIN_WORDS, C4_MAX_WORDS, C4_MIN_STOP, SPLIT_TEST_CUT, SPLIT_VAL_CUT


def curate_batch(batch: pa.Table) -> pa.Table:
    """Quality-filter FULL document rows and append the split column —
    one fused pass, no extra read of text."""
    from ..functions.textstats import quality_batch

    min_w, max_w, min_stop, test_cut, val_cut = _rules()
    q = quality_batch(batch)
    nw = q.column("n_words").to_numpy(zero_copy_only=False)
    sr = q.column("stop_ratio").to_numpy(zero_copy_only=False)
    keep = (nw >= min_w) & (nw <= max_w) & (sr >= min_stop)
    kept = batch.filter(pa.array(keep))
    ids = pc.cast(kept.column("doc_id"), pa.string()).to_pylist()
    h = [hashlib.md5(s.encode()).hexdigest()[:6] for s in ids]
    split = ["test" if x < test_cut else ("val" if x < val_cut else "train") for x in h]
    return kept.append_column("split", pa.array(split, type=pa.string()))


def _decontam_filter(surv, decontam_path: str, *, k: int = 3, seed: int = 9):
    """Drop docs sharing ANY word k-gram with the eval set at
    ``decontam_path`` (parquet with a ``text`` column) — the same
    broadcast-membership shape as queries.q_decontaminate: the eval
    gram hashes are the small side (``ray.put`` once, np.isin per
    batch), so the corpus pass stays shuffle-free."""
    import ray

    from ..functions.dedup import _word_kgram_hashes

    bt = pq.read_table(decontam_path, columns=["text"])
    bh, _ = _word_kgram_hashes(bt.column("text").combine_chunks(), k, seed=seed)
    eval_ref = ray.put(np.unique(bh))

    def drop_contaminated(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h, n_sh = _word_kgram_hashes(texts, k, seed=seed)
        hit = np.isin(h.view(np.uint64), ray.get(eval_ref))
        rows = np.repeat(np.arange(len(n_sh), dtype=np.int64), n_sh)
        bad = np.bincount(rows[hit], minlength=len(n_sh)) > 0
        return batch.filter(pa.array(~bad))

    return surv.map_batches(drop_contaminated, batch_format="pyarrow", zero_copy_batch=True)


def run_curate(
    input_path: str,
    out_dir: str,
    *,
    encode: bool = True,
    target_partition_tokens: int = 4_000_000,
    near_dedup: bool = False,
    decontam_path: str | None = None,
) -> dict:
    """Returns a JSON-able summary of every stage's row/token counts.

    ``near_dedup=True`` adds a MinHash-LSH near-duplicate pass after
    exact dedup (driver-free, functions/dedup.py defaults);
    ``decontam_path`` drops docs sharing any word 3-gram with the eval
    parquet at that path BEFORE the quality filter — the standard
    pre-training hygiene chain (exact dedup -> near dedup ->
    decontaminate -> quality filter -> split -> encode)."""
    import ray.data as rd

    from ..functions.dedup import exact_dedup

    ds = rd.read_parquet(input_path)
    n_in = ds.count()
    surv = exact_dedup(ds, key="text", id_col="doc_id")
    if near_dedup:
        from ..functions.dedup import minhash_dedup

        surv, _ = minhash_dedup(surv)
    if decontam_path:
        surv = _decontam_filter(surv, decontam_path)
    curated = surv.map_batches(curate_batch, batch_format="pyarrow", zero_copy_batch=True)
    curated_dir = f"{out_dir}/curated"
    # a re-run must not APPEND a second copy of every curated file; the
    # curated set is cheap to rebuild, so wipe and rewrite it — the
    # expensive encode stage below keeps partition-level resume
    import shutil

    shutil.rmtree(curated_dir, ignore_errors=True)
    curated.write_parquet(curated_dir, partition_cols=["split"])

    import pyarrow.dataset as pds

    splits = {}
    for s in ("train", "val", "test"):
        try:
            splits[s] = int(pds.dataset(f"{curated_dir}/split={s}").count_rows())
        except FileNotFoundError:
            splits[s] = 0
    out = {
        "ok": True,
        "n_input": int(n_in),
        "n_curated": int(sum(splits.values())),
        "splits": splits,
        "near_dedup": bool(near_dedup),
        "decontaminated": bool(decontam_path),
        "out": out_dir,
    }
    if not encode or splits["train"] == 0:
        return out

    # tokenize + encode + hash-verify the train split
    from ..sources.tokseq import tokenize_batch
    from .encode_job import EncodeConfig, run_encode
    from .verify_job import run_verify

    train_dir = f"{curated_dir}/split=train"
    # distributed vocab build: per-batch distinct words, one unique()
    # exchange of O(distinct-per-block) rows — the driver only ever
    # holds the O(vocab) result, never scans the corpus itself
    words_ds = rd.read_parquet(train_dir, columns=["text"]).map_batches(
        lambda b: pa.table(
            {"w": pc.unique(pc.list_flatten(pc.split_pattern(b.column("text"), " ")))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    vmap = {w: i for i, w in enumerate(sorted(words_ds.unique("w")))}

    def factory():
        return rd.read_parquet(train_dir, columns=["doc_id", "text", "source"]).map_batches(
            tokenize_batch, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"vocab": vmap},
        )

    enc_dir = f"{out_dir}/encoded"
    m = run_encode(
        factory, EncodeConfig(out_dir=enc_dir, target_partition_tokens=target_partition_tokens)
    ).to_pandas()
    v = run_verify(factory, enc_dir, mode="hash").to_pandas()
    # on a fully-resumed re-run the metrics table is empty (every
    # partition was skipped) — totals then come from the manifest,
    # which is authoritative either way
    from ..state.manifest import read_manifest_entries

    ents = read_manifest_entries(enc_dir)
    out.update(
        {
            "encoded_partitions": int(len(m)),
            "total_partitions": int(len(ents)),
            "n_tokens": int(sum(e["n_tokens"] for e in ents.values())),
            "encoded_bytes": int(sum(e["container_bytes"] for e in ents.values())),
            "verify_ok": bool(v["ok"].all()) and len(v) > 0,
        }
    )
    out["ok"] = out["verify_ok"]
    return out
