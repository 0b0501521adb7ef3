"""Non-default shuffle/transport variants stay correct (SURVEY.md §8).

The default encode path is the staged-raw external shuffle; these pin
the two retained variants: the object-store payload shuffle
(`staged_shuffle=False`) and transport-encoded staging
(`ChunkEncoder(staged_dir=...)` feeding `PartitionWriter`).
"""

import pyarrow as pa

from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode
from fileconvert_ray.pipelines.verify_job import run_verify
from fileconvert_ray.sources.tokseq import synth_rows, tokseq_dataset
from fileconvert_ray.stages.encoder import ChunkEncoder, PartitionWriter
from fileconvert_ray.stages.decoder import read_partition


def test_object_store_shuffle_roundtrip(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "objstore")
    factory = lambda: tokseq_dataset(sf_dir)
    cfg = EncodeConfig(
        out_dir=out, target_partition_tokens=5_000, staged_shuffle=False,
        encode_concurrency=(1, 2), write_concurrency=(1, 2),
    )
    metrics = run_encode(factory, cfg).to_pandas()
    assert metrics["n_rows"].sum() == 500
    v = run_verify(factory, out, mode="hash").to_pandas()
    assert v["ok"].all()


def test_transport_staged_chunks_roundtrip(tmp_path):
    """ChunkEncoder staging (transport-encoded row groups) decodes
    bit-identically through PartitionWriter's payload branch."""
    out = str(tmp_path / "transport")
    batch = synth_rows(0, 400)
    batch = batch.append_column("part_id", pa.array(["p0"] * 400))
    enc = ChunkEncoder(
        codec_overrides={"doc_id": "plain", "source": "dict", "n_tok": "plain", "tokens": "plain"},
        staged_dir=str(tmp_path / "transport-staged"),
    )
    meta = enc(batch)
    assert set(meta.column_names) == {"part_id", "source", "staged_path", "row_group"}
    writer = PartitionWriter(out, compact_chunk_tokens=50_000)
    m = writer(meta)
    assert m.column("n_rows")[0].as_py() == 400
    decoded = read_partition(writer.dirs.container_path("p0")).sort_by("doc_id")
    orig = batch.drop_columns(["part_id"]).sort_by("doc_id")
    assert decoded.num_rows == 400
    for col in orig.column_names:
        assert decoded.column(col).combine_chunks().equals(
            orig.column(col).combine_chunks()
        ), col


def test_stage_raw_row_group_indices_survive_pyarrow_split(tmp_path):
    """A staged slice over pyarrow's default 1,048,576-row row-group cap
    must not desync the recorded (bucket, row_group) indices — every
    recorded row group, read back, must contain only its bucket's rows
    and the union must cover the input exactly (round-3 ADVICE, high)."""
    import numpy as np
    import pyarrow.parquet as pq

    from fileconvert_ray.stages.encoder import bucket_of_part_ids, stage_raw_task

    n_big, n_small = 1_200_000, 3_000
    part_id = pa.array(["hot"] * n_big + ["p1"] * n_small + ["p2"] * n_small)
    batch = pa.table(
        {
            "part_id": part_id,
            "val": pa.array(np.arange(n_big + 2 * n_small, dtype=np.int32)),
        }
    )
    n_buckets = 4
    meta = stage_raw_task(batch, str(tmp_path / "staged"), n_buckets)
    # expected bucket per part_id from the same hash the stage uses
    exp_bucket = {
        p: int(bucket_of_part_ids(pa.array([p]), n_buckets)[0])
        for p in ("hot", "p1", "p2")
    }
    seen_vals = []
    for row in meta.to_pylist():
        pf = pq.ParquetFile(row["staged_path"])
        rg = pf.read_row_group(row["row_group"])
        pids = set(rg.column("part_id").to_pylist())
        assert {exp_bucket[p] for p in pids} == {row["bucket"]}, (
            f"row group {row['row_group']} holds part_ids {pids} "
            f"but was recorded under bucket {row['bucket']}"
        )
        seen_vals.append(rg.column("val").to_numpy(zero_copy_only=False))
    got = np.sort(np.concatenate(seen_vals))
    assert len(got) == batch.num_rows
    assert np.array_equal(got, np.arange(batch.num_rows, dtype=np.int32))
