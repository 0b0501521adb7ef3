"""Packed training-shard export — the trainer-facing end of the
lifecycle: the encoded corpus decodes (streaming, column-pruned,
snapshot/source-scoped) straight into fixed-length packed rows
(functions/packing.py) and lands as partitioned parquet shards a
training loader can read directly.  No reference analogue
(FileConvert converts files; this materializes the training view) —
SURVEY.md §2 extension, same family as pack_sequences.

Scale shape: decode streams one container chunk at a time; packing is
the documented prefix-sum exchange (every token crosses once); the
sink writes one parquet file per output block, so a failed export
re-runs per shard.  Driver memory stays O(n_buckets).

Order contract: packing needs a unique integer order key.
``order="int"`` casts doc_id (exact, for integer-id corpora — and the
oracle-parity mode: SQL can reproduce ascending-id order).
``order="hash"`` (the default, any doc_id type) orders by the 63-bit
FNV hash of doc_id — deterministic, uniform across buckets (no key-
space skew), but not SQL-reproducible; a hash tie between distinct
ids (~n^2/2^63) would merge their order slot, so the digest tests pin
the int mode and property tests cover hash mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def packed_dataset(
    out_dir: str,
    seq_len: int,
    *,
    order: str = "hash",
    seed: int = 0,
    sources: list[str] | None = None,
    max_gen: int | None = None,
    n_buckets: int = 64,
    boundaries: bool = False,
):
    """Streaming Dataset of PACKED_SCHEMA rows (chunk_id, tokens,
    n_tok) from an encoded corpus.  ``max_gen`` composes with snapshot
    reads: export "the corpus as of ingest N" without materializing
    anything else.  ``seed`` reseeds the hash order — a per-epoch
    deterministic global reshuffle for free (ignored by order="int").
    ``boundaries=True`` adds ``doc_starts: list<int32>`` — the
    within-chunk attention-reset offsets (functions/packing.py)."""
    from ..functions.packing import pack_sequences
    from ..stages.decoder import decode_dataset
    from ..util.hashing import hash_strings_u64

    if order not in ("hash", "int"):
        raise ValueError(f"order must be 'hash' or 'int', got {order!r}")

    ds = decode_dataset(
        out_dir,
        sources=sources,
        max_gen=max_gen,
        columns=["doc_id", "tokens", "n_tok"],
    )

    def key_int(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("doc_id")
        return batch.set_column(i, "doc_id", pc.cast(batch.column("doc_id"), pa.int64()))

    def key_hash(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # 63-bit: keeps (max - min + 1) inside int64 for the bucketer
        h = (
            hash_strings_u64(pc.cast(ids, pa.string()), seed=seed) >> np.uint64(1)
        ).astype(np.int64)
        i = batch.column_names.index("doc_id")
        return batch.set_column(i, "doc_id", pa.array(h))

    keyed = ds.map_batches(
        key_int if order == "int" else key_hash,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pack_sequences(
        keyed, seq_len=seq_len, n_buckets=n_buckets, boundaries=boundaries
    )


def run_export_packed(
    out_dir: str,
    to_dir: str,
    seq_len: int,
    *,
    order: str = "hash",
    seed: int = 0,
    sources: list[str] | None = None,
    max_gen: int | None = None,
    n_buckets: int = 64,
    boundaries: bool = False,
) -> dict:
    """Export packed training shards to ``to_dir`` (parquet, one file
    per block).  Returns {"chunks": N, "tokens": T} from the written
    data — cheap streaming aggregates, no driver materialization."""
    ds = packed_dataset(
        out_dir,
        seq_len,
        order=order,
        seed=seed,
        sources=sources,
        max_gen=max_gen,
        n_buckets=n_buckets,
        boundaries=boundaries,
    )
    ds.write_parquet(to_dir)
    import ray.data as rd

    written = rd.read_parquet(to_dir, columns=["n_tok"])
    stats = written.aggregate(
        rd.aggregate.Count(), rd.aggregate.Sum("n_tok")
    )
    return {
        "chunks": int(stats["count()"]),
        "tokens": int(stats["sum(n_tok)"] or 0),
    }
