"""FileConvert-semantics conformance (FIXTURES.md F4, SURVEY.md §2.1 R13):
CSV -> Parquet -> CSV -> Parquet; the two Parquet tables are bit-identical."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.sources.csvio import (
    CsvOptions,
    infer_schema,
    read_csv_dataset,
    resolve_schema,
    sanitize_columns,
    write_fixture_csv,
)


@pytest.fixture
def fixture_csv(tmp_path):
    p = str(tmp_path / "fixture.csv")
    write_fixture_csv(p)
    return p


def test_infer_schema(fixture_csv):
    s = infer_schema(fixture_csv)
    by = {f.name: f for f in s}
    assert by["id"].type == pa.int64()
    assert pa.types.is_floating(by["score"].type)
    assert by["flag"].type == pa.bool_()
    assert pa.types.is_timestamp(by["ts"].type)
    assert by["note"].type == pa.string()
    assert by["note"].nullable  # sentinels present


def test_type_override(fixture_csv):
    s = resolve_schema(fixture_csv, CsvOptions(types={"id": "int32", "score": "double"}))
    by = {f.name: f.type for f in s}
    assert by["id"] == pa.int32()
    assert by["score"] == pa.float64()


def test_sanitize_columns():
    out = sanitize_columns(["Name Field", "name-field", "ID", "id"])
    assert out == ["name_field", "name_field_1", "id", "id_1"]
    out2 = sanitize_columns(["a", "b"], renames={"a": "X Y"})
    assert out2 == ["x_y", "b"]


def test_csv_roundtrip_bit_identical(ray_session, fixture_csv, tmp_path):
    from fileconvert_ray.sources.csvio import csv_to_parquet, parquet_to_csv

    pq1 = str(tmp_path / "pq1")
    csv2 = str(tmp_path / "csv2")
    pq2 = str(tmp_path / "pq2")
    csv_to_parquet(fixture_csv, pq1)
    parquet_to_csv(sorted(glob.glob(pq1 + "/*.parquet")), csv2)
    # second conversion must NOT re-infer differently: pin the schema
    t1 = pa.concat_tables([pq.read_table(p) for p in sorted(glob.glob(pq1 + "/*.parquet"))])
    csv_to_parquet(sorted(glob.glob(csv2 + "/*.csv")), pq2, schema=t1.schema,
                   opts=CsvOptions(sanitize=False))
    t2 = pa.concat_tables([pq.read_table(p) for p in sorted(glob.glob(pq2 + "/*.parquet"))])
    a = t1.sort_by("id").combine_chunks()
    b = t2.sort_by("id").combine_chunks()
    assert a.schema.equals(b.schema), (a.schema, b.schema)
    for col in a.column_names:
        assert a.column(col).equals(b.column(col)), f"column {col} differs"


def test_projection_include_exclude(ray_session, fixture_csv):
    ds = read_csv_dataset(fixture_csv, CsvOptions(include=["id", "score"]))
    assert set(ds.schema().names) == {"id", "score"}
    ds2 = read_csv_dataset(fixture_csv, CsvOptions(exclude=["note", "ts"]))
    assert "note" not in ds2.schema().names and "ts" not in ds2.schema().names


def test_null_sentinels(ray_session, fixture_csv):
    df = read_csv_dataset(fixture_csv).to_pandas()
    # i%4 in (0,1,2) -> null note ('' / NULL / NA)
    assert df["note"].isna().sum() == 750


def test_gzip_csv_source(ray_session, fixture_csv, tmp_path):
    """R1 conformance for compressed sources: a .csv.gz reads to the
    SAME typed table as the plain file (inference included), and mixed
    gz/plain path lists are rejected."""
    import gzip
    import shutil as _shutil

    import pytest as _pytest

    gz = str(tmp_path / "fixture.csv.gz")
    with open(fixture_csv, "rb") as src, gzip.open(gz, "wb") as dst:
        _shutil.copyfileobj(src, dst)

    assert infer_schema(gz) == infer_schema(fixture_csv)

    plain = read_csv_dataset(fixture_csv).to_pandas()
    comp = read_csv_dataset(gz).to_pandas()
    assert plain.equals(comp)

    with _pytest.raises(ValueError, match="mix of gzip"):
        read_csv_dataset([fixture_csv, gz])
