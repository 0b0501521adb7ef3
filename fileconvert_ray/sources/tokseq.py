"""tokseq sources — the input-hint table (FIXTURES.md F1a / F1b).

Schema (BASELINE.json input_hint, SURVEY.md §1.2):
    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

F1a derives tokseq deterministically from the driver's
``documents.parquet`` via a global sorted vocabulary of
whitespace-split words, so every downstream query has an exact DuckDB
oracle (``string_split`` + vocab rank).  F1b is a parametric zipfian
corpus generated counter-based (splitmix64 of (seed, row, position)),
so the result is bit-identical regardless of how rows are split into
blocks — generation parallelizes over Ray without seeding hazards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..util.hashing import splitmix64, u01

INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def normalize_tokseq(ds):
    """Cast loosely-typed tokseq shards (e.g. int64 doc_id, list<int64>
    tokens from a third-party tokenizer dump) to INPUT_SCHEMA.  Blocks
    already in canonical layout pass through zero-copy; the CLI only
    inserts this stage when the parquet footer says dtypes drifted."""

    def cast(batch: pa.Table) -> pa.Table:
        if batch.schema.equals(INPUT_SCHEMA):
            return batch
        cols = [pc.cast(batch.column(f.name), f.type) for f in INPUT_SCHEMA]
        return pa.Table.from_arrays(cols, schema=INPUT_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


def build_vocab(sf_dir: str) -> list[str]:
    """Global sorted vocabulary of whitespace-split words (31 at every sf).

    Driver-side single-column read; at real scale this becomes a
    flat_map -> unique aggregate, but the vocab is O(distinct words)
    and the oracle (DuckDB dense rank over distinct words) needs the
    identical sort, so we keep it exact and tiny.
    """
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    words: set[str] = set()
    for chunk in t.column("text").chunks:
        flat = pc.list_flatten(pc.split_pattern(chunk, " "))
        words.update(flat.to_pylist())
    return sorted(words)


def tokenize_batch(
    batch: pa.Table, vocab: dict[str, int], oov_id: int | None = None
) -> pa.Table:
    """documents batch -> tokseq batch.  Vectorized: split via Arrow
    kernel, word->id via dictionary_encode + small mapping gather.

    ``oov_id=None`` (the default) treats the vocab as total — an
    unseen word is a KeyError (the F1a/curate path, where the vocab
    was built from this very corpus).  With ``oov_id`` set, unseen
    words map there instead — the frozen-vocab mode run_tokenize uses
    when re-tokenizing NEW shards against a persisted vocabulary (ids
    must stay stable across incremental ingests)."""
    text = batch.column("text").combine_chunks()
    words = pc.split_pattern(text, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    if oov_id is None:
        mapping = np.array([vocab[w] for w in denc.dictionary.to_pylist()], dtype=np.int32)
    else:
        mapping = np.array(
            [vocab.get(w, oov_id) for w in denc.dictionary.to_pylist()], dtype=np.int32
        )
    ids = mapping[denc.indices.to_numpy(zero_copy_only=False)]
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(ids, type=pa.int32())
    )
    n_tok = pa.array(lens, type=pa.int32())
    doc_id = pc.cast(batch.column("doc_id"), pa.string())
    source = pc.cast(batch.column("source"), pa.string())
    return pa.Table.from_arrays([doc_id, tokens, n_tok, source], schema=INPUT_SCHEMA)


def tokseq_dataset(sf_dir: str, vocab: list[str] | None = None):
    """F1a as a Ray Dataset: read_parquet(documents) -> tokenize map_batches."""
    import ray.data as rd

    if vocab is None:
        vocab = build_vocab(sf_dir)
    vmap = {w: i for i, w in enumerate(vocab)}
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return ds.map_batches(
        tokenize_batch, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"vocab": vmap}
    )


def tokseq_table(sf_dir: str, vocab: list[str] | None = None) -> pa.Table:
    """F1a fully in-process (tests / oracle parity; small sf only)."""
    if vocab is None:
        vocab = build_vocab(sf_dir)
    vmap = {w: i for i, w in enumerate(vocab)}
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    return tokenize_batch(t, vmap)


# --------------------------------------------------------------- F1b


def _norm_from(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    u1 = np.clip(u01(h1), 1e-12, 1.0)
    u2 = u01(h2)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def synth_rows(start: int, stop: int, *, vocab_size: int = 50_257, zipf_a: float = 1.3,
               seed: int = 42, n_sources: int = 20) -> pa.Table:
    """Rows [start, stop) of the F1b corpus — pure function of (seed, row)."""
    i = np.arange(start, stop, dtype=np.uint64)
    mask = (1 << 64) - 1
    base = np.uint64((seed * 0x9E6C63D0876A3F6B) & mask)

    def h(tag: int, x: np.ndarray) -> np.ndarray:
        return splitmix64(x + base + np.uint64((tag * 0xD1B54A32D192ED03) & mask))
    # source: pareto(1.2) floor, capped — skewed toward src0
    src_id = np.minimum((u01(h(1, i)) ** (-1.0 / 1.2) - 1.0).astype(np.int64), n_sources - 1)
    # doc length: lognormal, long docs concentrated in low-numbered sources
    mu = 5.0 + 1.2 / (1.0 + src_id)
    z = _norm_from(h(2, i), h(3, i))
    n_tok = np.clip(np.exp(mu + 1.0 * z), 1, 32_768).astype(np.int64)
    total = int(n_tok.sum())
    # flat token stream: zipf via inverse pareto tail, mod vocab
    starts = np.concatenate(([0], np.cumsum(n_tok)))
    row_of = np.repeat(i, n_tok)
    pos = np.arange(total, dtype=np.uint64) - np.repeat(starts[:-1].astype(np.uint64), n_tok)
    with np.errstate(over="ignore"):
        th = splitmix64(row_of * np.uint64(0x9E3779B97F4A7C15) + pos + base)
    u = np.clip(u01(th), 1e-12, 1.0)
    zipfv = np.minimum(u ** (-1.0 / (zipf_a - 1.0)), 2.0**62)
    toks = (zipfv.astype(np.uint64) % np.uint64(vocab_size)).astype(np.int32)
    # run bursts: prob 0.3 per doc, one token repeated 16..256 times
    burst = u01(h(4, i)) < 0.3
    blen = np.minimum(16 + (u01(h(5, i)) * 240).astype(np.int64), n_tok)
    bstart = (u01(h(6, i)) * np.maximum(n_tok - blen, 1)).astype(np.int64)
    btok = (h(7, i) % np.uint64(vocab_size)).astype(np.int32)
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], n_tok)
    b_mask = (
        np.repeat(burst, n_tok)
        & (pos_in_doc >= np.repeat(bstart, n_tok))
        & (pos_in_doc < np.repeat(bstart + blen, n_tok))
    )
    toks[b_mask] = np.repeat(btok, n_tok)[b_mask]

    doc_id = pa.array([f"d{j:09d}" for j in range(start, stop)], type=pa.string())
    source = pa.array([f"src{s}" for s in src_id], type=pa.string())
    tokens = pa.ListArray.from_arrays(
        pa.array(starts, type=pa.int32()), pa.array(toks, type=pa.int32())
    )
    return pa.Table.from_arrays(
        [doc_id, tokens, pc.cast(pa.array(n_tok), pa.int32()), source], schema=INPUT_SCHEMA
    )


def synth_dataset(n_rows: int, *, num_blocks: int = 64, **kw):
    """F1b as a Ray Dataset — parallel, deterministic, block-independent."""
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        if len(ids) == 0:
            return synth_rows(0, 0, **kw)
        # range blocks are contiguous; generate exactly these rows
        return synth_rows(int(ids[0]), int(ids[-1]) + 1, **kw)

    return ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


def write_synth_corpus(out_dir: str, n_rows: int, *, shards: int = 32, **kw) -> list[str]:
    """Materialize an F1b corpus as sharded parquet (bench input)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, n_rows, shards + 1).astype(np.int64)
    import ray

    @ray.remote
    def _write(lo: int, hi: int, path: str):
        t = synth_rows(int(lo), int(hi), **kw)
        pq.write_table(t, path, compression="zstd")
        return path

    futs = []
    for s in range(shards):
        path = os.path.join(out_dir, f"part-{s:05d}.parquet")
        if bounds[s] == bounds[s + 1]:
            continue
        futs.append(_write.remote(bounds[s], bounds[s + 1], path))
        paths.append(path)
    ray.get(futs)
    return paths
