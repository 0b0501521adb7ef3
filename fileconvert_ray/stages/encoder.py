"""Partition encoder — the stateful actor-pool stage (SURVEY.md §2.2 E5/E6/E8).

``EncoderActor`` is a callable class handed to
``groupby("part_id").map_groups(EncoderActor, batch_format="pyarrow",
concurrency=N)``: construction happens once per actor (codec choice +
FSST symbol-table caches keyed by (source, column) survive across the
many partitions one actor encodes); ``__call__`` encodes one partition
group, writes its container atomically, emits the manifest line LAST,
and returns one metrics row (counters are data, never actor globals,
so task retries cannot double-count — SURVEY §3.2).

The tokens list column is encoded from its flat int32 values buffer
(zero-copy via ``ListArray.flatten()``); offsets ride for free on the
already-present ``n_tok`` column (SURVEY §1.2).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import EncodedColumn, encode_array
from ..codecs.base import b64d
from ..codecs.fsst import SymbolTable
from ..state.manifest import JobDirs, write_manifest_entry

CONTAINER_SCHEMA = pa.schema(
    [
        ("part_id", pa.string()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("params", pa.string()),
        ("payload", pa.binary()),
        ("n_values", pa.int64()),
        ("plain_bytes", pa.int64()),
        ("crc32", pa.int64()),
    ]
)


def flat_tokens(batch: pa.Table) -> pa.Array:
    """tokens list<int32> -> contiguous int32 values array (zero-copy)."""
    col = batch.column("tokens")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.flatten()
    if len(flat) != int(n_tok.sum()):
        raise ValueError("n_tok does not match tokens lengths")
    return flat


def encode_partition_table(
    group: pa.Table,
    *,
    codec_overrides: dict[str, str] | None = None,
    zstd: bool = True,
    fsst_cache: dict | None = None,
    choice_cache: dict | None = None,
    source_key: str = "",
) -> tuple[list[EncodedColumn], dict]:
    """Encode one partition's columns; returns encoded rows + per-column info."""
    overrides = codec_overrides or {}
    encoded: list[EncodedColumn] = []
    info: dict[str, dict] = {}

    def enc(name: str, arr) -> None:
        codec = overrides.get(name, "auto")
        key = (source_key, name)
        if codec == "auto" and choice_cache is not None and key in choice_cache:
            codec = choice_cache[key]
        table = fsst_cache.get(key) if fsst_cache is not None else None
        e = encode_array(arr, name, codec=codec, zstd=zstd, fsst_table=table)
        if choice_cache is not None and key not in choice_cache and overrides.get(name, "auto") == "auto":
            choice_cache[key] = e.codec
        if fsst_cache is not None and e.codec == "fsst" and key not in fsst_cache:
            t = e.params.get("c", {}).get("t")
            if t:
                fsst_cache[key] = SymbolTable.deserialize(b64d(t))
        encoded.append(e)
        info[name] = {"codec": e.codec, "bytes": len(e.payload), "plain": e.plain_bytes}

    enc("doc_id", group.column("doc_id"))
    enc("source", group.column("source"))
    enc("n_tok", group.column("n_tok"))
    enc("tokens", flat_tokens(group))
    return encoded, info


def container_table(part_id: str, encoded: list[EncodedColumn]) -> pa.Table:
    rows = {
        "part_id": [part_id] * len(encoded),
        "column": [e.column for e in encoded],
        "codec": [e.codec for e in encoded],
        "params": [json.dumps(e.params) for e in encoded],
        "payload": [e.payload for e in encoded],
        "n_values": [e.n_values for e in encoded],
        "plain_bytes": [e.plain_bytes for e in encoded],
        "crc32": [e.crc32 for e in encoded],
    }
    return pa.Table.from_pydict(rows, schema=CONTAINER_SCHEMA)


class EncoderActor:
    """Callable class for the map_groups actor pool (one call = one partition)."""

    METRICS_SCHEMA = pa.schema(
        [
            ("part_id", pa.string()),
            ("source", pa.string()),
            ("n_rows", pa.int64()),
            ("n_tokens", pa.int64()),
            ("plain_bytes", pa.int64()),
            ("encoded_bytes", pa.int64()),
            ("codecs", pa.string()),
            ("wall_s", pa.float64()),
        ]
    )

    def __init__(self, out_dir: str, codec_overrides: dict[str, str] | None = None, zstd: bool = True):
        self.dirs = JobDirs(out_dir).create()
        self.codec_overrides = codec_overrides or {}
        self.zstd = zstd
        self.fsst_cache: dict = {}  # (source, column) -> SymbolTable
        self.choice_cache: dict = {}  # (source, column) -> codec name

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        if group.num_rows == 0:
            return pa.Table.from_pydict({k: [] for k in self.METRICS_SCHEMA.names}, schema=self.METRICS_SCHEMA)
        part_id = group.column("part_id")[0].as_py()
        source = group.column("source")[0].as_py()
        body = group.drop_columns(["part_id"])
        encoded, info = encode_partition_table(
            body,
            codec_overrides=self.codec_overrides,
            zstd=self.zstd,
            fsst_cache=self.fsst_cache,
            choice_cache=self.choice_cache,
            source_key=source,
        )
        cont = container_table(part_id, encoded)
        tmp = os.path.join(self.dirs.tmp, f"{part_id}-{uuid.uuid4().hex}.parquet")
        # container payloads are already codec-compressed; store uncompressed
        pq.write_table(cont, tmp, compression="none")
        os.replace(tmp, self.dirs.container_path(part_id))
        enc_bytes = int(os.path.getsize(self.dirs.container_path(part_id)))
        n_tokens = int(sum(e.n_values for e in encoded if e.column == "tokens"))
        record = {
            "part_id": part_id,
            "source": source,
            "n_rows": group.num_rows,
            "n_tokens": n_tokens,
            "columns": info,
            "container_bytes": enc_bytes,
            "wall_s": round(time.perf_counter() - t0, 6),
        }
        write_manifest_entry(self.dirs, part_id, record)  # LAST: marks completion
        payload_bytes = int(sum(len(e.payload) + len(json.dumps(e.params)) for e in encoded))
        return pa.Table.from_pydict(
            {
                "part_id": [part_id],
                "source": [source],
                "n_rows": [group.num_rows],
                "n_tokens": [n_tokens],
                "plain_bytes": [int(sum(e.plain_bytes for e in encoded))],
                "encoded_bytes": [payload_bytes],
                "codecs": [json.dumps({k: v["codec"] for k, v in info.items()})],
                "wall_s": [record["wall_s"]],
            },
            schema=self.METRICS_SCHEMA,
        )
