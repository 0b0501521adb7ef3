"""Generic any-table columnar container (sources/tablecontainer.py):
write/read round-trips for every testdata shape — strings, timestamps,
decimal-like doubles, int keys, list<float> embeddings — plus projected
reads, unknown-column errors, null-list refusal and the empty edge."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fileconvert_ray.sources.tablecontainer import (
    read_container_table,
    write_container_table,
)


def _to_table(ds) -> pa.Table:
    """Dataset -> one combined Arrow table (skips pandas: nested
    struct/list columns don't survive a pandas round-trip exactly)."""
    import ray

    tabs = [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs).combine_chunks()


def _roundtrip(tmpdir: str, table: str, sf_dir: str) -> tuple[pa.Table, pa.Table]:
    import ray.data as rd

    out = os.path.join(tmpdir, f"tc_{table}")
    shutil.rmtree(out, ignore_errors=True)
    man = write_container_table(rd.read_parquet(f"{sf_dir}/{table}.parquet"), out).to_pandas()
    orig = pq.read_table(f"{sf_dir}/{table}.parquet").combine_chunks()
    assert int(man["n_rows"].sum()) == orig.num_rows
    back = pa.Table.from_pandas(
        read_container_table(out).to_pandas(), preserve_index=False
    ).select(orig.column_names).cast(orig.schema).combine_chunks()
    return orig, back


def _sorted_equal(a: pa.Table, b: pa.Table, keys: list[str]) -> bool:
    sk = [(k, "ascending") for k in keys]
    a, b = a.sort_by(sk).combine_chunks(), b.sort_by(sk).combine_chunks()
    return a.schema.equals(b.schema) and all(
        a.column(c).equals(b.column(c)) for c in a.column_names
    )


@pytest.mark.parametrize(
    "table,key",
    [("orders", "o_orderkey"), ("documents", "doc_id"), ("embeddings", "vec_id")],
)
def test_container_roundtrip_unique_key_tables(ray_session, sf_dir, tmp_path, table, key):
    orig, back = _roundtrip(str(tmp_path), table, sf_dir)
    assert _sorted_equal(orig, back, [key])


def test_container_roundtrip_lineitem_multiset(ray_session, sf_dir, tmp_path):
    """lineitem has no unique key in the synthetic data — compare as a
    row multiset (bidirectional EXCEPT ALL) via DuckDB."""
    import duckdb

    orig, back = _roundtrip(str(tmp_path), "lineitem", sf_dir)
    con = duckdb.connect()
    a, b = orig.to_pandas(), back.to_pandas()
    con.register("a", a)
    con.register("b", b)
    assert con.execute("select count(*) from (select * from a except all select * from b)").fetchone()[0] == 0
    assert con.execute("select count(*) from (select * from b except all select * from a)").fetchone()[0] == 0


def test_container_projected_read(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_proj")
    write_container_table(rd.read_parquet(f"{sf_dir}/documents.parquet"), out).materialize()
    got = read_container_table(out, columns=["doc_id", "source"]).to_pandas()
    orig = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)[["doc_id", "source"]]
    orig = orig.sort_values("doc_id", ignore_index=True)
    assert got.equals(orig)
    with pytest.raises(ValueError, match="unknown container columns"):
        read_container_table(out, columns=["nope"])


def test_container_list_projection_and_embedding_bits(ray_session, sf_dir, tmp_path):
    """Projecting just the list column decodes #len+#val and rebuilds
    the list bit-exactly (float32 payload via ALP-RD or plain)."""
    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_emb")
    write_container_table(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), out).materialize()
    got = read_container_table(out, columns=["vec_id", "embedding"]).to_pandas()
    orig = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    got = got.sort_values("vec_id", ignore_index=True)
    orig = orig.sort_values("vec_id", ignore_index=True)
    gv = np.concatenate(got["embedding"].to_numpy()).astype(np.float32)
    ov = np.concatenate(orig["embedding"].to_numpy()).astype(np.float32)
    assert np.array_equal(gv.view(np.int32), ov.view(np.int32))


def test_container_null_list_roundtrip(ray_session, tmp_path):
    """Null list slots ride a #null validity stream (they used to be
    refused) and come back as nulls, not empty lists."""
    import ray.data as rd

    t = pa.table(
        {
            "id": [1, 2, 3],
            "xs": pa.array([[1, 2], None, []], type=pa.list_(pa.int64())),
        }
    )
    out = os.path.join(str(tmp_path), "tc_null")
    write_container_table(rd.from_arrow(t), out).materialize()
    got = _to_table(read_container_table(out)).sort_by("id")
    assert got.equals(t)


def test_container_struct_and_nested_list_roundtrip(ray_session, tmp_path):
    """Struct shredding (name.child), nested lists (name#val#len /
    name#val#val) and struct/list nulls at every level round-trip
    bit-identically; a projected read returns just the struct."""
    import ray.data as rd

    n = 200
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array(
                [
                    {"x": i, "y": f"v{i % 7}", "inner": [i, i + 1]}
                    if i % 5
                    else None
                    for i in range(n)
                ],
                type=pa.struct(
                    [
                        ("x", pa.int64()),
                        ("y", pa.string()),
                        ("inner", pa.list_(pa.int32())),
                    ]
                ),
            ),
            "nl": pa.array(
                [
                    [[i], [i, i + 1]] if i % 3 else ([[i]] if i % 2 else None)
                    for i in range(n)
                ],
                type=pa.list_(pa.list_(pa.int64())),
            ),
            "opt": pa.array([None if i % 4 == 0 else float(i) for i in range(n)]),
        }
    )
    out = os.path.join(str(tmp_path), "tc_struct")
    write_container_table(rd.from_arrow(t), out).materialize()
    got = _to_table(read_container_table(out)).sort_by("k")
    assert got.equals(t)
    proj = _to_table(read_container_table(out, columns=["k", "s"])).sort_by("k")
    assert proj.equals(t.select(["k", "s"]))
    # struct predicates are rejected loudly, not silently wrong
    with pytest.raises(ValueError, match="ranges need scalars"):
        read_container_table(out, predicate=("s", 0, 1))


def test_container_stream_name_collision_refused(ray_session, tmp_path):
    """A top-level column named like a struct child stream would be
    ambiguous in the container layout — refused at write."""
    import ray.data as rd

    t = pa.table(
        {
            "a": pa.array(
                [{"b": 1}, {"b": 2}], type=pa.struct([("b", pa.int64())])
            ),
            "a.b": pa.array([1, 2], pa.int64()),
        }
    )
    out = os.path.join(str(tmp_path), "tc_clash")
    with pytest.raises(Exception, match="collision"):
        write_container_table(rd.from_arrow(t), out).materialize()


def test_container_empty_dir_read(ray_session, tmp_path):
    """A schema file with zero containers (e.g. all-empty input) reads
    back as an empty, correctly-typed Dataset."""
    import base64
    import json

    out = os.path.join(str(tmp_path), "tc_empty")
    os.makedirs(out)
    schema = pa.schema([("x", pa.int64())])
    with open(os.path.join(out, "_schema.json"), "w") as f:
        json.dump({"schema_b64": base64.b64encode(schema.serialize().to_pybytes()).decode()}, f)
    ds = read_container_table(out)
    assert ds.count() == 0
    assert ds.schema().names == ["x"]


def test_container_beats_plain_bytes(ray_session, sf_dir, tmp_path):
    """The registry must compress: total encoded bytes well under the
    canonical plain bytes on every testdata table."""
    import ray.data as rd

    for table in ("orders", "lineitem", "documents"):
        out = os.path.join(str(tmp_path), f"tc_sz_{table}")
        # batch_rows pins the container layout: under full-suite load
        # Ray may split these small reads into many tiny blocks, and
        # one container per tiny block repeats fixed codec overheads
        # (dict/freq tables, footers) — the very fragmentation the
        # writer's coalescing knob exists for.  This test asserts the
        # CODEC size property, so make the layout deterministic.
        man = write_container_table(
            rd.read_parquet(f"{sf_dir}/{table}.parquet"), out, batch_rows=1 << 20
        ).to_pandas()
        assert int(man["encoded_bytes"].sum()) < 0.6 * int(man["plain_bytes"].sum()), table


def test_container_zone_map_pruning(ray_session, sf_dir, tmp_path):
    """Sorted-by-key containers have disjoint zone maps: a narrow
    predicate must PRUNE most files footer-only, and the predicate
    read must return exactly the brute-force filtered rows with the
    key column dropped when it isn't projected."""
    import ray.data as rd

    from fileconvert_ray.sources.tablecontainer import file_pruned

    out = os.path.join(str(tmp_path), "tc_zm")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet").sort("o_totalprice").repartition(8)
    write_container_table(ds, out).materialize()
    files = [os.path.join(out, f) for f in sorted(os.listdir(out)) if f.startswith("part-")]
    assert len(files) == 8
    lo, hi = 50_000.0, 80_000.0
    pruned = [f for f in files if file_pruned(f, "o_totalprice", lo, hi)]
    assert len(pruned) >= 4, f"only {len(pruned)}/8 pruned"

    got = read_container_table(
        out, columns=["o_orderkey"], predicate=("o_totalprice", lo, hi)
    ).to_pandas()
    orig = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    want = orig[(orig.o_totalprice >= lo) & (orig.o_totalprice <= hi)]["o_orderkey"]
    assert list(got.columns) == ["o_orderkey"]
    assert sorted(got.o_orderkey) == sorted(want)


def test_container_timestamp_predicate(ray_session, sf_dir, tmp_path):
    import datetime

    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_ts")
    write_container_table(rd.read_parquet(f"{sf_dir}/orders.parquet"), out).materialize()
    cut = datetime.datetime(1996, 1, 1)
    got = read_container_table(
        out, predicate=("o_orderdate", None, cut)
    ).to_pandas()
    orig = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    want = orig[orig.o_orderdate <= cut]
    assert len(got) == len(want)
    assert sorted(got.o_orderkey) == sorted(want.o_orderkey)


def test_container_batch_rows_coalesce(ray_session, sf_dir, tmp_path):
    """batch_rows coalesces fragmented input blocks into one container,
    amortizing per-chunk codec and footer overheads."""
    import ray.data as rd

    frag = os.path.join(str(tmp_path), "tc_frag")
    one = os.path.join(str(tmp_path), "tc_one")
    ds = lambda: rd.read_parquet(f"{sf_dir}/orders.parquet")
    man_frag = write_container_table(ds(), frag).to_pandas()
    man_one = write_container_table(ds(), one, batch_rows=1_000_000).to_pandas()
    assert len(man_one) == 1 and len(man_frag) > 1
    assert int(man_one["encoded_bytes"].sum()) < int(man_frag["encoded_bytes"].sum())
    a = read_container_table(frag).to_pandas().sort_values("o_orderkey", ignore_index=True)
    b = read_container_table(one).to_pandas().sort_values("o_orderkey", ignore_index=True)
    assert a.equals(b)


def test_container_append_mode(ray_session, sf_dir, tmp_path):
    """Re-running into a non-empty dir must refuse (uuid names would
    silently duplicate rows); mode="append" adds a generation after a
    schema check; a different schema is rejected."""
    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_app")
    ds = lambda: rd.read_parquet(f"{sf_dir}/nation.parquet")
    write_container_table(ds(), out).materialize()
    with pytest.raises(ValueError, match="already holds"):
        write_container_table(ds(), out).materialize()
    write_container_table(ds(), out, mode="append").materialize()
    n = read_container_table(out).count()
    assert n == 2 * pq.read_table(f"{sf_dir}/nation.parquet").num_rows
    other = rd.read_parquet(f"{sf_dir}/region.parquet")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_container_table(other, out, mode="append").materialize()


def test_container_inspect_rollup(ray_session, sf_dir, tmp_path):
    """table-inspect reads metadata rows only (payload never projected)
    and its per-column enc/plain totals reconcile with the manifest."""
    import ray.data as rd

    from fileconvert_ray.sources.tablecontainer import inspect_container_table

    out = os.path.join(str(tmp_path), "tc_ins")
    man = write_container_table(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet"), out, batch_rows=100_000
    ).to_pandas()
    t = inspect_container_table(out).to_pandas()
    assert set(t.column) == set(
        pq.read_schema(f"{sf_dir}/lineitem.parquet").names
    )
    assert int(t.enc_bytes.sum()) == int(man.encoded_bytes.sum())
    assert int(t.plain_bytes.sum()) == int(man.plain_bytes.sum())
    assert (t.n_values == int(man.n_rows.sum())).all()
    assert (t.ratio < 1.0).all()


def test_container_corruption_detected(ray_session, sf_dir, tmp_path):
    """A flipped payload byte must surface as a CRC CodecError on
    decode, never as silently wrong values (flagship verify parity)."""
    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_corrupt")
    write_container_table(
        rd.read_parquet(f"{sf_dir}/nation.parquet"), out, batch_rows=100_000
    ).materialize()
    path = next(
        os.path.join(out, f) for f in os.listdir(out) if f.startswith("part-")
    )
    t = pq.read_table(path)
    pays = t.column("payload").to_pylist()
    idx = max(range(len(pays)), key=lambda i: len(pays[i]))
    corrupted = bytearray(pays[idx])
    corrupted[len(corrupted) // 2] ^= 0xFF
    pays[idx] = bytes(corrupted)
    t = t.set_column(
        t.schema.get_field_index("payload"), "payload", pa.array(pays, pa.large_binary())
    )
    meta = pq.read_schema(path).metadata
    pq.write_table(
        t.replace_schema_metadata(meta), path, row_group_size=1, compression="none"
    )
    with pytest.raises(Exception, match="crc mismatch|CodecError|decod"):
        read_container_table(out).materialize()


def _col_equal(a: pa.ChunkedArray | pa.Array, b, t: pa.DataType) -> bool:
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
    if pa.types.is_floating(t):
        if not a.is_valid().equals(b.is_valid()):
            return False
        dt = {2: np.int16, 4: np.int32, 8: np.int64}[t.byte_width]
        av = np.ascontiguousarray(a.fill_null(0.0).to_numpy(zero_copy_only=False))
        bv = np.ascontiguousarray(b.fill_null(0.0).to_numpy(zero_copy_only=False))
        return np.array_equal(av.view(dt), bv.view(dt))
    if pa.types.is_list(t):
        if not np.array_equal(np.asarray(a.is_null()), np.asarray(b.is_null())):
            return False
        la = np.asarray(pa.compute.list_value_length(a).fill_null(-1))
        lb = np.asarray(pa.compute.list_value_length(b).fill_null(-1))
        return np.array_equal(la, lb) and _col_equal(a.flatten(), b.flatten(), t.value_type)
    if pa.types.is_struct(t):
        # struct kinds in this sweep hold exact types only (no NaN), so
        # logical equality is the right check
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return a.equals(b)
    return a.to_pylist() == b.to_pylist()


def test_container_random_tables_property(ray_session, tmp_path):
    """Hypothesis-style sweep: random schemas x random values (nulls,
    NaN, unicode, empty strings, timestamps, lists) round-trip through
    the container bit-exactly in original row order (single block)."""
    import ray.data as rd

    rng = np.random.default_rng(20260819)

    def make_col(n: int, kind: int):
        null_mask = rng.random(n) < 0.15
        if kind == 0:
            v = rng.integers(-(2**40), 2**40, n)
            return pa.array([None if m else int(x) for m, x in zip(null_mask, v)], pa.int64())
        if kind == 1:
            return pa.array(rng.integers(0, 1000, n), pa.int32())
        if kind == 2:  # decimal-like doubles (ALP territory)
            return pa.array(rng.integers(-(10**7), 10**7, n) / 100.0, pa.float64())
        if kind == 3:  # continuous with NaN/inf (plane/alp_rd + exceptions)
            v = rng.normal(size=n)
            v[rng.random(n) < 0.05] = np.nan
            v[rng.random(n) < 0.02] = np.inf
            return pa.array(v, pa.float64())
        if kind == 4:
            return pa.array(rng.normal(size=n).astype(np.float32), pa.float32())
        if kind == 5:
            pool = ["", "héllo wörld", "日本語", "x" * 50, "a\x00b", "🎉"]
            return pa.array(
                [None if m else pool[i % len(pool)] for i, m in enumerate(null_mask)],
                pa.string(),
            )
        if kind == 6:
            return pa.array(
                [None if m else bool(x) for m, x in zip(null_mask, rng.integers(0, 2, n))],
                pa.bool_(),
            )
        if kind == 7:
            base = np.datetime64("2020-01-01T00:00:00", "us")
            return pa.array(base + rng.integers(0, 10**12, n).astype("timedelta64[us]"))
        if kind == 8:  # list<int64>, jagged incl. empties
            lens = rng.integers(0, 5, n)
            flat = rng.integers(0, 100, int(lens.sum()))
            off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            return pa.ListArray.from_arrays(pa.array(off), pa.array(flat, pa.int64()))
        if kind == 9:  # list<float32>
            lens = rng.integers(0, 4, n)
            flat = rng.normal(size=int(lens.sum())).astype(np.float32)
            off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            return pa.ListArray.from_arrays(pa.array(off), pa.array(flat, pa.float32()))
        if kind == 10:  # list<string>
            lens = rng.integers(0, 3, n)
            pool = ["", "tok", "日本語", "\x00byte"]
            flat = pa.array([pool[i % len(pool)] for i in range(int(lens.sum()))], pa.string())
            off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            return pa.ListArray.from_arrays(pa.array(off), flat)
        if kind == 11:  # struct (int child w/ nulls, string child), struct-level nulls
            return pa.array(
                [
                    None
                    if m
                    else {
                        "x": None if i % 7 == 0 else int(v),
                        "y": f"s{int(v) % 13}",
                    }
                    for i, (m, v) in enumerate(
                        zip(null_mask, rng.integers(0, 10**6, n))
                    )
                ],
                type=pa.struct([("x", pa.int64()), ("y", pa.string())]),
            )
        # kind 12: nullable list<list<int64>> with empties at both levels
        outer = rng.integers(0, 3, n)
        vals = [
            None
            if m
            else [
                [int(x) for x in rng.integers(0, 50, int(rng.integers(0, 3)))]
                for _ in range(int(k))
            ]
            for m, k in zip(null_mask, outer)
        ]
        return pa.array(vals, type=pa.list_(pa.list_(pa.int64())))

    for trial in range(12):
        n = int(rng.integers(1, 1500))
        kinds = rng.choice(13, size=int(rng.integers(1, 5)), replace=False)
        cols = {f"c{k}": make_col(n, int(k)) for k in kinds}
        t = pa.table(cols)
        out = os.path.join(str(tmp_path), f"tc_rand{trial}")
        write_container_table(rd.from_arrow(t), out, batch_rows=10**6).materialize()
        import ray

        back = read_container_table(out)
        bt = pa.concat_tables(
            [x for x in ray.get(back.to_arrow_refs()) if x.num_rows]
        ).select(t.column_names)
        for name in t.column_names:
            f = t.schema.field(name)
            got = bt.column(name)
            if got.type != f.type:
                got = got.combine_chunks().cast(f.type) if isinstance(got, pa.ChunkedArray) else got.cast(f.type)
            assert _col_equal(t.column(name), got, f.type), (trial, name, f.type)


def test_container_schemaless_input_refused(ray_session, tmp_path):
    import ray.data as rd

    with pytest.raises(ValueError, match="schemaless"):
        write_container_table(
            rd.from_items([]), os.path.join(str(tmp_path), "tc_none")
        )


def test_container_multi_predicate_and(ray_session, sf_dir, tmp_path):
    """A list of predicates combines with AND across value and time
    dimensions; pruning applies if ANY range misses a file."""
    import datetime

    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_multi")
    write_container_table(rd.read_parquet(f"{sf_dir}/orders.parquet"), out).materialize()
    lo, hi = 50_000.0, 200_000.0
    cut = datetime.datetime(1996, 6, 1)
    got = read_container_table(
        out,
        columns=["o_orderkey"],
        predicate=[("o_totalprice", lo, hi), ("o_orderdate", cut, None)],
    ).to_pandas()
    orig = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    want = orig[
        (orig.o_totalprice >= lo) & (orig.o_totalprice <= hi) & (orig.o_orderdate >= cut)
    ]
    assert list(got.columns) == ["o_orderkey"]
    assert sorted(got.o_orderkey) == sorted(want.o_orderkey)


def test_container_predicate_col_in_projection_kept(ray_session, sf_dir, tmp_path):
    """When the predicate key IS projected it must stay in the result
    (the drop applies only to trim-helper columns)."""
    import ray.data as rd

    out = os.path.join(str(tmp_path), "tc_keep")
    write_container_table(rd.read_parquet(f"{sf_dir}/orders.parquet"), out).materialize()
    got = read_container_table(
        out,
        columns=["o_orderkey", "o_totalprice"],
        predicate=("o_totalprice", 100_000.0, None),
    ).to_pandas()
    assert sorted(got.columns) == ["o_orderkey", "o_totalprice"]
    assert (got.o_totalprice >= 100_000.0).all()
    orig = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    assert len(got) == int((orig.o_totalprice >= 100_000.0).sum())
