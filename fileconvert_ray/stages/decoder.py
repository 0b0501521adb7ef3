"""Partition decoder — stateless inverse of the encoder (SURVEY.md §2.2 E9).

Bit-identity discipline (SURVEY §7 hard part b): tokens offsets are
re-derived from the decoded ``n_tok`` column (never trusted from any
sliced Arrow offset buffer), values/validity CRC-checked by the codec
wrapper.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import EncodedColumn, decode_array
from ..sources.tokseq import INPUT_SCHEMA


def decode_container_table(cont: pa.Table) -> pa.Table:
    """One partition's container rows -> the original tokseq table."""
    cols: dict[str, pa.Array] = {}
    for i in range(cont.num_rows):
        enc = EncodedColumn(
            column=cont.column("column")[i].as_py(),
            codec=cont.column("codec")[i].as_py(),
            params=json.loads(cont.column("params")[i].as_py()),
            payload=cont.column("payload")[i].as_py(),
            n_values=cont.column("n_values")[i].as_py(),
            plain_bytes=cont.column("plain_bytes")[i].as_py(),
            crc32=cont.column("crc32")[i].as_py(),
        )
        cols[enc.column] = decode_array(enc)
    n_tok = cols["n_tok"]
    lens = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), cols["tokens"]
    )
    return pa.Table.from_arrays(
        [cols["doc_id"], tokens, n_tok, cols["source"]], schema=INPUT_SCHEMA
    )


def read_partition(container_path: str) -> pa.Table:
    return decode_container_table(pq.read_table(container_path))
