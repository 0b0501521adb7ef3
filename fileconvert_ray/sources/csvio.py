"""CSV <-> Parquet conversion surface — the reference's R1-R12 operators
(SURVEY.md §2.1), rebuilt Ray-Data-first.

- R1/R2: ``ray.data.read_csv`` with pyarrow ParseOptions/ConvertOptions
  (delimiter, quoting, skip rows, null sentinels '', NULL, NA, \\N)
- R5: sample-based schema inference with candidate-type narrowing
  bool ⊂ int64 ⊂ double ⊂ timestamp ⊂ string, nullable if sentinel seen
- R6/R7: explicit per-column type overrides; vectorized cast
- R8/R9: include/exclude projection; renames + sanitize + dedup
- R10/R11/R12: streaming chunked conversion via the Dataset executor;
  Parquet sink (codec, row-group size) and CSV sink

Round-trip contract (R13): csv -> parquet -> csv -> parquet produces
bit-identical tables (tests/test_csv_roundtrip.py, FIXTURES.md F4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

from ..stages.partition import sanitize_id

NULL_SENTINELS = ("", "NULL", "NA", "\\N", "N/A", "null")

_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "timestamp": pa.timestamp("us"),
    "date": pa.date32(),
}


@dataclass
class CsvOptions:
    delimiter: str = ","
    quote_char: str = '"'
    header: bool = True
    skip_rows: int = 0
    null_values: tuple = NULL_SENTINELS
    include: list | None = None  # R8
    exclude: list | None = None
    renames: dict = field(default_factory=dict)  # R9 (applied before sanitize)
    types: dict = field(default_factory=dict)  # R6: col -> type name, "?" suffix = nullable
    sanitize: bool = True
    sample_rows: int = 1024


def sanitize_columns(names: list[str], renames: dict | None = None, sanitize: bool = True) -> list[str]:
    """Rename -> sanitize to [a-z0-9_] -> dedup with _N suffix (R9)."""
    renames = renames or {}
    out, seen = [], set()
    for name in names:
        n = renames.get(name, name)
        if sanitize:
            n = sanitize_id(n)
        cand, i = n, 1
        while cand in seen:
            cand, i = f"{n}_{i}", i + 1
        seen.add(cand)
        out.append(cand)
    return out


def _try_cast(arr: pa.Array, typ: pa.DataType):
    try:
        return pc.cast(arr, typ)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None


def infer_schema(path: str, opts: CsvOptions | None = None) -> pa.Schema:
    """R5: read a sample as all-string, narrow each column through the
    candidate chain bool ⊂ int64 ⊂ double ⊂ timestamp[us] ⊂ string."""
    opts = opts or CsvOptions()
    read_opts = pacsv.ReadOptions(skip_rows=opts.skip_rows, block_size=1 << 20)
    parse_opts = pacsv.ParseOptions(delimiter=opts.delimiter, quote_char=opts.quote_char)
    conv = pacsv.ConvertOptions(
        column_types=None, null_values=list(opts.null_values), strings_can_be_null=True
    )
    # read only the sample block; we don't need the whole file for
    # inference.  input_stream(compression="detect") transparently
    # decompresses .gz/.zst by extension (R1: compressed CSV sources).
    with pacsv.open_csv(pa.input_stream(path, compression="detect"), read_options=read_opts, parse_options=parse_opts, convert_options=pacsv.ConvertOptions(null_values=list(opts.null_values), strings_can_be_null=True, column_types={})) as reader:
        batch = reader.read_next_batch()
    sample = pa.Table.from_batches([batch]).slice(0, opts.sample_rows)

    fields = []
    for name in sample.column_names:
        col = sample.column(name).combine_chunks()
        if not pa.types.is_string(col.type):
            # pyarrow already narrowed it during parse; honor that
            fields.append(pa.field(name, col.type, nullable=col.null_count > 0))
            continue
        chosen: pa.DataType = pa.string()
        for typ in (pa.bool_(), pa.int64(), pa.float64(), pa.timestamp("us")):
            if _try_cast(col, typ) is not None:
                chosen = typ
                break
        fields.append(pa.field(name, chosen, nullable=col.null_count > 0))
    return pa.schema(fields)


def resolve_schema(path: str, opts: CsvOptions) -> pa.Schema:
    """Explicit per-column overrides (R6) layered over inference (R5)."""
    inferred = infer_schema(path, opts)
    fields = []
    for f in inferred:
        spec = opts.types.get(f.name)
        if spec:
            nullable = spec.endswith("?")
            typ = _TYPES[spec.rstrip("?")]
            fields.append(pa.field(f.name, typ, nullable=nullable or f.nullable))
        else:
            fields.append(f)
    return pa.schema(fields)


def _projection(names: list[str], opts: CsvOptions) -> list[str]:
    cols = list(names)
    if opts.include is not None:
        cols = [c for c in cols if c in set(opts.include)]
    if opts.exclude:
        cols = [c for c in cols if c not in set(opts.exclude)]
    return cols


def read_csv_dataset(paths, opts: CsvOptions | None = None, schema: pa.Schema | None = None):
    """R1/R2 as a Ray Dataset: streaming csv read with typed conversion."""
    import ray.data as rd

    opts = opts or CsvOptions()
    plist = list(paths) if isinstance(paths, (list, tuple)) else [paths]
    first = plist[0]
    if schema is None:
        schema = resolve_schema(first, opts)
    keep = _projection(schema.names, opts)
    gz = [str(p).endswith(".gz") for p in plist]
    if any(gz) and not all(gz):
        raise ValueError("mix of gzip and plain CSV paths in one read")
    extra = {"arrow_open_stream_args": {"compression": "gzip"}} if all(gz) else {}
    ds = rd.read_csv(
        paths,
        read_options=pacsv.ReadOptions(skip_rows=opts.skip_rows),
        parse_options=pacsv.ParseOptions(delimiter=opts.delimiter, quote_char=opts.quote_char),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema},
            null_values=list(opts.null_values),
            strings_can_be_null=True,
            include_columns=keep,
        ),
        **extra,
    )
    new_names = sanitize_columns(keep, opts.renames, opts.sanitize)
    if new_names != keep:
        ds = ds.map_batches(
            lambda t: t.rename_columns(new_names), batch_format="pyarrow", zero_copy_batch=True
        )
    return ds


def csv_to_parquet(paths, out_dir: str, opts: CsvOptions | None = None,
                   compression: str = "zstd", row_group_size: int = 128 * 1024,
                   schema: pa.Schema | None = None) -> None:
    """R10+R11: chunked streaming conversion, Parquet sink."""
    ds = read_csv_dataset(paths, opts, schema)
    ds.write_parquet(
        out_dir,
        compression=compression,
        row_group_size=row_group_size,
    )


def parquet_to_csv(paths, out_dir: str, opts: CsvOptions | None = None) -> None:
    """R12: Parquet -> CSV sink (typed -> string rendering by arrow)."""
    import ray.data as rd

    opts = opts or CsvOptions()
    ds = rd.read_parquet(paths)
    if opts.include is not None or opts.exclude:
        schema_names = ds.schema().names
        ds = ds.select_columns(_projection(schema_names, opts))
    ds.write_csv(
        out_dir,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(delimiter=opts.delimiter, include_header=opts.header)
        },
    )


def write_fixture_csv(path: str, n: int = 1000, seed: int = 42) -> None:
    """Deterministic F4 conformance fixture (FIXTURES.md): quotes, commas,
    embedded newlines, null sentinels, timestamps, bools, doubles."""
    import csv

    import numpy as np

    rng = np.random.default_rng(seed)
    with open(path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(["id", "Name Field", "score", "flag", "ts", "note"])
        for i in range(n):
            name = f'name,"with" quotes\nand newline {i}' if i % 7 == 0 else f"name {i}"
            score = round(float(rng.normal(50, 10)), 6)
            flag = "true" if i % 2 else "false"
            ts = f"2024-01-{(i % 28) + 1:02d}T{(i % 24):02d}:{(i % 60):02d}:{(i * 7) % 60:02d}"
            note = ["", "NULL", "NA", f"note-{i}"][i % 4]
            w.writerow([i, name, score, flag, ts, note])
