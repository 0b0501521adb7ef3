"""Trainer-facing batch loader: packed shards -> dense (B, L) token
matrices.

The last mile of the lifecycle (SURVEY.md §2 extension, same family as
pipelines/pack_job.py): a training loop wants fixed-shape integer
matrices, not Arrow lists.  ``iter_token_matrices`` streams either an
exported shard directory (pack_job ``run_export_packed``) or an
encoded corpus directly (via ``packed_dataset`` — no intermediate
materialization) and yields contiguous numpy arrays of shape
``(batch_rows, seq_len)``.

Scale shape: rides Ray Data's ``iter_batches`` — blocks stream to the
consumer with the executor's backpressure, and ``prefetch_batches``
overlaps decode/pack compute with the training step.  The reshape is
one ``np.frombuffer``-style copy per batch (tokens arrive as a flat
Arrow values buffer; full rows are zero-pad-free by construction, so
the fast path is a single ``reshape``).  Only the final partial chunk
of the corpus pads (with ``pad_id``) or drops (``drop_last=True``).

The iterator runs ON THE DRIVER by design — it feeds the training
process that called it.  Everything upstream (decode, filter, pack)
stays distributed.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def packed_shards_dataset(shard_dir: str, start_chunk: int = 0):
    """Dataset over a ``run_export_packed`` output directory.  Reads
    by extension so the ``_packed_manifest.json`` completion marker
    (pipelines/pack_job) never parses as a shard.

    ``start_chunk`` resumes mid-epoch: the predicate pushes into the
    parquet scan, so shard files (one row group per block) whose
    chunk_id range ends below the cursor are PRUNED by row-group
    statistics, not read and dropped — resuming at 90% of a 100-TB
    epoch reads ~10% of the shards."""
    import ray.data as rd

    return rd.read_parquet(
        shard_dir,
        columns=["chunk_id", "tokens", "n_tok"],
        file_extensions=["parquet"],
        filter=(pc.field("chunk_id") >= start_chunk) if start_chunk else None,
    )


def iter_token_matrices(
    source,
    seq_len: int,
    batch_rows: int = 64,
    *,
    pad_id: int = 0,
    drop_last: bool = False,
    dtype=np.int32,
    prefetch_batches: int = 2,
    start_chunk: int = 0,
) -> Iterator[np.ndarray]:
    """Yield ``(<=batch_rows, seq_len)`` token matrices.

    ``source`` is a packed Dataset (``pack_job.packed_dataset`` /
    ``packed_shards_dataset``) or a shard-directory path.  Rows stream
    in whatever chunk order the source provides (exported shards:
    file order; for a seeded epoch order, export with ``--seed`` or
    pass a freshly built ``packed_dataset(seed=epoch)``).

    Short rows (the corpus's single trailing partial chunk — or every
    row, if the source was packed at a different seq_len) right-pad
    with ``pad_id``; ``drop_last=True`` drops short rows instead.
    Rows LONGER than ``seq_len`` refuse loudly — that's a wrong
    ``seq_len``, not something to truncate silently.

    ``start_chunk`` resumes a crashed training run mid-epoch: chunks
    below the cursor never reach the trainer.  A shard-directory
    source prunes them at the parquet scan (row-group statistics — see
    ``packed_shards_dataset``); a Dataset source filters vectorized
    per batch (the upstream decode/pack still runs — pass an exported
    shard dir when resume speed matters).  The trainer's cursor is
    just its consumed-row count: chunk_ids are consecutive from 0."""
    if isinstance(source, str):
        if not os.path.isdir(source):
            raise ValueError(f"{source} is not a shard directory")
        source = packed_shards_dataset(source, start_chunk=start_chunk)
    elif start_chunk:
        lo = int(start_chunk)

        def from_cursor(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.greater_equal(batch.column("chunk_id"), lo))

        source = source.map_batches(
            from_cursor, batch_format="pyarrow", zero_copy_batch=True
        )

    carry: list[np.ndarray] = []
    carry_rows = 0

    def matrices(tok_col) -> Iterator[np.ndarray]:
        """One Arrow tokens column -> full (batch_rows, L) matrices,
        buffering the remainder across batches."""
        nonlocal carry, carry_rows
        if isinstance(tok_col, pa.ChunkedArray):
            tok_col = tok_col.combine_chunks()
        lens = pc.list_value_length(tok_col).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return
        if (lens > seq_len).any():
            raise ValueError(
                f"row holds {int(lens.max())} tokens > seq_len={seq_len}; "
                "the source was packed at a larger seq_len"
            )
        flat = tok_col.flatten().to_numpy(zero_copy_only=False)
        full = lens == seq_len
        if full.all():
            mat = np.ascontiguousarray(flat, dtype=dtype).reshape(-1, seq_len)
        else:
            short = np.flatnonzero(~full)
            if drop_last:
                keep = np.flatnonzero(full)
                offs = np.concatenate(([0], np.cumsum(lens)))
                mat = np.empty((len(keep), seq_len), dtype=dtype)
                for j, i in enumerate(keep):
                    mat[j] = flat[offs[i] : offs[i + 1]]
            else:
                offs = np.concatenate(([0], np.cumsum(lens)))
                mat = np.full((len(lens), seq_len), pad_id, dtype=dtype)
                for i in short:
                    mat[i, : lens[i]] = flat[offs[i] : offs[i + 1]]
                if full.any():
                    fi = np.flatnonzero(full)
                    rows = flat[
                        np.repeat(offs[fi], seq_len)
                        + np.tile(np.arange(seq_len), len(fi))
                    ].reshape(-1, seq_len)
                    mat[fi] = rows
        carry.append(mat)
        carry_rows += len(mat)
        while carry_rows >= batch_rows:
            stacked = carry[0] if len(carry) == 1 else np.concatenate(carry)
            yield stacked[:batch_rows]
            rest = stacked[batch_rows:]
            carry = [rest] if len(rest) else []
            carry_rows = len(rest)

    for b in source.iter_batches(
        batch_size=None, batch_format="pyarrow", prefetch_batches=prefetch_batches
    ):
        yield from matrices(b.column("tokens"))
    if carry_rows:
        yield carry[0] if len(carry) == 1 else np.concatenate(carry)
