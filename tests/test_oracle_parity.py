"""Mimic the driver's correctness gate locally (SURVEY.md §5.2.6):
run every queries() entry at sf0.001 and compare row count, schema and
order-insensitive values against oracle_sql() via DuckDB."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    return c


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0), (
                f"{name}.{col}: float values differ"
            )
        else:
            assert (av == bv).all(), f"{name}.{col}: values differ"


def test_all_oracle_queries(ray_session, sf_dir, con):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"
    failures = []
    for name, sql in sorted(oracles.items()):
        ray_df = _to_pandas(qs[name](sf_dir))
        sql_df = con.execute(sql).fetchdf()
        try:
            _compare(ray_df, sql_df, name)
        except AssertionError as e:
            failures.append(str(e))
    assert not failures, "\n".join(failures)


def test_rows_only_queries(ray_session, sf_dir):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = _to_pandas(qs[name](sf_dir))
        assert df is not None and len(df) >= 0, name
        if name == "encode_roundtrip":
            assert df["ok"].all()


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    result = _to_pandas(entrymod.entry())
    assert len(result) >= 1
    assert result["ok"].all()


@pytest.mark.slow
def test_all_oracle_queries_sf001_scale(ray_session):
    """The sf0.01 (driver-scale) parity sweep, slow-marked (~5 min at
    4 cpus).  Catches scale-dependent drift the sf0.001 gate misses —
    e.g. a threshold query that degenerates to zero rows as table
    cardinalities grow (important_parts' original fixed-fraction cut
    did exactly that: green at sf0.001, empty at sf0.01).  Run:

        python -m pytest -m slow tests/test_oracle_parity.py -q
    """
    import __ray_entry__ as entrymod
    import duckdb

    sf01 = "/root/testdata/sf0.01"
    con01 = duckdb.connect()
    for t in TABLES:
        con01.execute(
            f"create view {t} as select * from read_parquet('{sf01}/{t}.parquet')"
        )
    qs = entrymod.queries()
    failures = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        try:
            ray_df = _to_pandas(qs[name](sf01))
            sql_df = con01.execute(sql).fetchdf()
            _compare(ray_df, sql_df, name)
            if len(ray_df) == 0:
                failures.append(f"{name}: degenerate (0 rows) at sf0.01")
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:
            failures.append(f"{name}: ERR {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
