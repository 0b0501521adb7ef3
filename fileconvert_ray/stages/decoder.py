"""Partition decoder — stateless inverse of the encoder (SURVEY.md §2.2 E9).

A container holds many independently-encoded chunks (map-side combine
output); decode each chunk to a tokseq sub-table and concatenate.
Bit-identity discipline (SURVEY §7 hard part b): tokens offsets are
re-derived from each chunk's decoded ``n_tok`` (never trusted from any
sliced Arrow offset buffer); values CRC-checked by the codec wrapper.
Row order across chunks is not defined — verify aligns on doc_id.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import EncodedColumn, decode_array
from ..sources.tokseq import INPUT_SCHEMA


def _decode_chunk(rows: dict[str, list]) -> pa.Table:
    cols: dict[str, pa.Array] = {}
    for i in range(len(rows["column"])):
        enc = EncodedColumn(
            column=rows["column"][i],
            codec=rows["codec"][i],
            params=json.loads(rows["params"][i]),
            payload=rows["payload"][i],
            n_values=rows["n_values"][i],
            plain_bytes=rows["plain_bytes"][i],
            crc32=rows["crc32"][i],
        )
        cols[enc.column] = decode_array(enc)
    n_tok = cols["n_tok"]
    lens = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), cols["tokens"])
    out = pa.Table.from_arrays(
        [cols["doc_id"], tokens, n_tok, cols["source"]], schema=INPUT_SCHEMA
    )
    for name, arr in cols.items():  # side columns, in container row order
        if name not in INPUT_SCHEMA.names:
            out = out.append_column(name, arr)
    return out


def iter_container_chunks(cont: pa.Table):
    """Yield one decoded tokseq sub-table per encoded chunk.

    Streaming granularity = chunk size (bounded at encode time), so a
    consumer's transient allocations stay small no matter how large the
    partition is — large short-lived buffers are returned to the kernel
    by glibc and re-faulting them across 32 concurrent workers is the
    dominant decode cost, not the codec math."""
    cont = cont.combine_chunks()
    uids = cont.column("chunk_uid").to_pylist()
    data = {
        name: cont.column(name).to_pylist()
        for name in ("column", "codec", "params", "payload", "n_values", "crc32", "plain_bytes")
    }
    by_chunk: dict[str, dict[str, list]] = {}
    for i, uid in enumerate(uids):
        rows = by_chunk.setdefault(uid, {k: [] for k in data})
        for k in data:
            rows[k].append(data[k][i])
    for rows in by_chunk.values():
        yield _decode_chunk(rows)


def decode_container_table(cont: pa.Table) -> pa.Table:
    """Container chunk rows -> the original tokseq rows (order: by chunk)."""
    parts = list(iter_container_chunks(cont))
    if not parts:
        return pa.Table.from_pydict({k: [] for k in INPUT_SCHEMA.names}, schema=INPUT_SCHEMA)
    return pa.concat_tables(parts).combine_chunks()


def read_partition(container_path: str) -> pa.Table:
    return decode_container_table(pq.read_table(container_path))


def decode_dataset(out_dir: str):
    """All completed partitions as a streaming decoded Dataset (E9)."""
    import ray.data as rd

    from ..state.manifest import JobDirs, completed_partitions

    dirs = JobDirs(out_dir)
    paths = [dirs.container_path(p) for p in sorted(completed_partitions(out_dir))]

    def decode(batch: pa.Table) -> pa.Table:
        # one task per container file: a chunk's column rows never split
        out = [read_partition(p) for p in batch.column("path").to_pylist()]
        return pa.concat_tables(out) if out else pa.Table.from_pydict(
            {k: [] for k in INPUT_SCHEMA.names}, schema=INPUT_SCHEMA
        )

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )
