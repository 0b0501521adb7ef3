"""ORC source — the reference's read-side ORC support (SURVEY.md §2.1
R4), rebuilt Ray-Data-first.

Ray Data ships no ORC reader, so this builds one from the Dataset
primitives: a metadata pass lists (file, stripe) pairs, then a
stateless ``map_batches`` task decodes each stripe via
``pyarrow.orc.ORCFile.read_stripe`` — stripe-granular parallelism with
streaming downstream, the same shape as ``read_parquet``'s row-group
splitting.  Write side (``write_orc``) exists for fixtures/round-trip
tests; like the pyarrow-era reference, ORC is primarily a source.
"""

from __future__ import annotations

import pyarrow as pa

from .csvio import CsvOptions, _projection, sanitize_columns


def _orc():
    from pyarrow import orc  # gated: optional in minimal pyarrow builds

    return orc


def orc_stripes(paths) -> list[dict]:
    """Metadata pass: one work item per (file, stripe)."""
    o = _orc()
    if isinstance(paths, str):
        paths = [paths]
    items = []
    for p in paths:
        f = o.ORCFile(p)
        for s in range(f.nstripes):
            items.append({"path": p, "stripe": s})
    return items


def read_orc_dataset(paths, opts: CsvOptions | None = None, columns: list[str] | None = None):
    """R4 as a Ray Dataset: per-stripe decode tasks."""
    import ray.data as rd

    opts = opts or CsvOptions()
    items = orc_stripes(paths)
    if not items:
        return rd.from_items([])

    def decode(batch: pa.Table) -> pa.Table:
        o = _orc()
        out = []
        for row in batch.to_pylist():
            t = o.ORCFile(row["path"]).read_stripe(row["stripe"], columns=columns)
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            keep = _projection(t.column_names, opts)
            if keep != t.column_names:
                t = t.select(keep)
            new_names = sanitize_columns(t.column_names, opts.renames, opts.sanitize)
            if new_names != t.column_names:
                t = t.rename_columns(new_names)
            out.append(t)
        return pa.concat_tables(out)

    return rd.from_items(items, override_num_blocks=len(items)).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


def orc_to_parquet(paths, out_dir: str, opts: CsvOptions | None = None,
                   compression: str = "zstd") -> None:
    """R4+R11: ORC -> Parquet conversion, streaming."""
    read_orc_dataset(paths, opts).write_parquet(out_dir, compression=compression)


def write_orc(table: pa.Table, path: str) -> None:
    """Fixture/round-trip helper (the reference era had no ORC writer;
    modern pyarrow does — used only to generate test inputs)."""
    _orc().write_table(table, path)
