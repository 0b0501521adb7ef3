"""Trainer batch loader (functions/loader.py): packed shards ->
dense (B, L) matrices."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from fileconvert_ray.functions.loader import iter_token_matrices, packed_shards_dataset
from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode
from fileconvert_ray.pipelines.pack_job import packed_dataset, run_export_packed
from fileconvert_ray.sources.tokseq import tokseq_dataset, tokseq_table


@pytest.fixture(scope="module")
def store(ray_session, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("loader") / "enc")
    run_encode(
        lambda: tokseq_dataset(sf_dir),
        EncodeConfig(out_dir=out, target_partition_tokens=5_000),
    ).materialize()
    return out


def test_loader_conserves_tokens_and_shapes(store, sf_dir, tmp_path):
    L, B = 128, 7
    shards = str(tmp_path / "sh")
    res = run_export_packed(store, shards, L, order="int")
    total = res["tokens"]

    mats = list(iter_token_matrices(shards, L, B, pad_id=-1))
    assert all(m.shape[1] == L for m in mats)
    assert all(m.shape[0] == B for m in mats[:-1]) and mats[-1].shape[0] <= B
    got = np.concatenate([m.ravel() for m in mats])
    assert (got != -1).sum() == total  # pads only fill the one partial chunk
    # pad positions only ever trail real tokens within a row
    for m in mats:
        padded = m == -1
        assert not (padded[:, :-1] & ~padded[:, 1:]).any()


def test_loader_values_bit_exact_int_order(store, sf_dir, tmp_path):
    """order='int' + sorted chunk stream == original corpus stream."""
    import ray

    L = 64
    packed = packed_dataset(store, L, order="int", n_buckets=4)
    t = pa.concat_tables([ray.get(r) for r in packed.to_arrow_refs()]).sort_by("chunk_id")
    import ray.data as rd

    mats = list(iter_token_matrices(rd.from_arrow(t), L, 16, pad_id=-1))
    got = np.concatenate([m.ravel() for m in mats])
    got = got[got != -1]

    orig = tokseq_table(sf_dir)
    order = np.argsort(
        pc.cast(orig.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False),
        kind="stable",
    )
    toks = orig.take(pa.array(order)).column("tokens")
    expect = pc.list_flatten(toks.combine_chunks()).to_numpy(zero_copy_only=False)
    assert np.array_equal(got.astype(np.int64), expect.astype(np.int64))


def test_loader_drop_last_and_refusal(store, tmp_path):
    L = 128
    shards = str(tmp_path / "sh2")
    res = run_export_packed(store, shards, L, order="int")
    mats = list(iter_token_matrices(shards, L, 8, drop_last=True))
    got = np.concatenate([m.ravel() for m in mats])
    # dropping the single partial chunk loses < L tokens
    assert res["tokens"] - L < len(got) <= res["tokens"]
    assert len(got) % L == 0

    with pytest.raises(ValueError, match="seq_len"):
        list(iter_token_matrices(shards, L // 2, 8))
    with pytest.raises(ValueError, match="shard directory"):
        list(iter_token_matrices(str(tmp_path / "nope"), L, 8))


def test_loader_mid_epoch_resume(store, tmp_path):
    """start_chunk=K: the resumed stream holds exactly the chunks at or
    past the cursor — pruned at the parquet scan for shard dirs,
    filtered per batch for Dataset sources (bit-exact on a sorted
    source)."""
    import ray

    import ray.data as rd

    L = 64
    shards = str(tmp_path / "sh3")
    res = run_export_packed(store, shards, L, order="int")
    n_chunks = res["chunks"]
    K = n_chunks // 3

    full = packed_shards_dataset(shards).to_pandas()
    want = full[full.chunk_id >= K].sort_values("chunk_id", ignore_index=True)
    got = (
        packed_shards_dataset(shards, start_chunk=K)
        .to_pandas()
        .sort_values("chunk_id", ignore_index=True)
    )
    assert len(got) == n_chunks - K
    assert got.chunk_id.tolist() == want.chunk_id.tolist()
    assert got.n_tok.tolist() == want.n_tok.tolist()

    # token count through the matrix iterator matches the suffix
    mats = list(iter_token_matrices(shards, L, 8, pad_id=-1, start_chunk=K))
    n_real = sum(int((m != -1).sum()) for m in mats)
    assert n_real == int(want.n_tok.sum())

    # Dataset source: chunk-sorted input -> resumed stream is the
    # bit-exact suffix of the full stream
    packed = packed_dataset(store, L, order="int", n_buckets=4)
    t = pa.concat_tables(
        [ray.get(r) for r in packed.to_arrow_refs()]
    ).sort_by("chunk_id")
    full_mats = list(iter_token_matrices(rd.from_arrow(t), L, 8, pad_id=-1))
    res_mats = list(
        iter_token_matrices(rd.from_arrow(t), L, 8, pad_id=-1, start_chunk=K)
    )
    full_flat = np.concatenate([m.ravel() for m in full_mats])
    res_flat = np.concatenate([m.ravel() for m in res_mats])
    assert np.array_equal(res_flat, full_flat[K * L :])

    # resuming at the end yields nothing
    assert list(iter_token_matrices(shards, L, 8, start_chunk=n_chunks)) == []
