"""Encode job — the flagship pipeline (SURVEY.md §3.2a).

    E7 resume filter -> E1 read -> E3 stats pass + bucket plan
    -> E3 assign part_id (stateless map_batches)
    -> groupby(part_id)               [the only big shuffle]
    -> E5 EncoderActor pool (map_groups) -> E8/E6 atomic container+manifest
    -> returns a small metrics Dataset (one row per partition)

Never calls ray.init(); the caller owns the session.  All heavy stages
are Arrow-zero-copy; the stats pass reads only (source, n_tok) via
parquet column pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..stages.encoder import ChunkEncoder, PartitionWriter, encode_chunks_task
from ..stages.partition import bucket_plan, make_assigner, make_resume_filter, source_stats
from ..state.manifest import JobDirs, completed_partitions, write_plan


@dataclass
class EncodeConfig:
    out_dir: str
    target_partition_tokens: int = 4_000_000  # ~16 MiB of int32 token values
    codec_overrides: dict = field(default_factory=dict)
    zstd: bool = True
    resume: bool = True
    # None = derive from cluster CPUs at run time.  The map-side encode
    # runs as STATELESS TASKS when every map codec is fixed (the
    # default): tasks start instantly and scale with the cluster, where
    # an autoscaling actor pool spends seconds ramping up.  An actor
    # pool is used only when map-side codecs are 'auto' (FSST/dict
    # caches then pay off across batches).
    encode_concurrency: tuple | int | None = None
    encode_num_cpus: float = 1.0
    chunk_rows: int = 4096  # map-side encode batch size (rows)
    # Map-side codecs are a cheap transport compression (shrink the
    # shuffle ~3-4x at near-memcpy cost); the reduce side re-encodes
    # each partition once with the full auto-selector (compaction), so
    # final quality is partition-granular, not batch-granular.
    map_codec_overrides: dict = field(
        default_factory=lambda: {"doc_id": "plain", "source": "dict", "n_tok": "plain", "tokens": "plain"}
    )
    compact_tokens: int | None = None  # None = always compact on reduce
    compact_chunk_tokens: int = 4_000_000  # decode-friendly chunk size bound
    # None = fixed pool sized to min(partitions, 3/4 of cluster CPUs).
    # Fixed (not autoscaling) because the reduce phase is short and an
    # autoscaling pool never reaches full width before the job ends.
    write_concurrency: tuple | int | None = None


def run_encode(ds_factory, cfg: EncodeConfig, stats_factory=None):
    """ds_factory() -> tokseq Dataset (called twice: stats pass + encode;
    Ray datasets are consumed by execution, and re-reading beats
    materializing the whole input).  ``stats_factory`` optionally
    provides a column-pruned (source, n_tok) dataset for the stats pass
    — for parquet inputs that read is ~10x cheaper than the full scan.
    Returns the metrics Dataset."""
    JobDirs(cfg.out_dir).create()

    stats = source_stats((stats_factory or ds_factory)())
    plan = bucket_plan(stats, cfg.target_partition_tokens)
    write_plan(
        cfg.out_dir,
        {
            "buckets": plan,
            "target_partition_tokens": cfg.target_partition_tokens,
            "source_tokens": {k: int(v) for k, v in stats.items()},
        },
    )

    done = frozenset(completed_partitions(cfg.out_dir)) if cfg.resume else frozenset()

    import ray

    n_parts = int(sum(plan.values()))
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    write_conc = cfg.write_concurrency
    if write_conc is None:
        # autoscaling (1, ncpu-2): a FIXED pool reserves its CPUs for the
        # whole job and starves the map phase before the shuffle barrier
        # (measured 1.5x slower); min=1 keeps one slot warm, the pool
        # fills only once sorted groups start arriving
        write_conc = (1, max(2, min(n_parts, ncpu - 2)))

    ds = ds_factory().map_batches(
        make_assigner(plan), batch_format="pyarrow", zero_copy_batch=True
    )
    if done:
        ds = ds.map_batches(
            make_resume_filter(done), batch_format="pyarrow", zero_copy_batch=True
        )
    # Phase 1 (map-side combine): encode chunks BEFORE the shuffle so the
    # all-to-all moves codec output, not raw tokens.
    map_codecs = {**cfg.map_codec_overrides, **cfg.codec_overrides}
    map_is_stateless = all(
        map_codecs.get(c, "auto") != "auto" for c in ("doc_id", "source", "n_tok", "tokens")
    )
    enc_kwargs = {"codec_overrides": map_codecs, "zstd": cfg.zstd}
    if map_is_stateless and cfg.encode_concurrency is None:
        chunks = ds.map_batches(
            encode_chunks_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.chunk_rows,
            fn_kwargs=enc_kwargs,
            num_cpus=cfg.encode_num_cpus,
        )
    else:
        chunks = ds.map_batches(
            ChunkEncoder,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.chunk_rows,
            fn_constructor_kwargs=enc_kwargs,
            concurrency=cfg.encode_concurrency or (1, max(2, ncpu - 4)),
            num_cpus=cfg.encode_num_cpus,
        )
    # Phase 2: co-locate chunk rows per partition, write containers.
    # num_partitions ~ writer width: more reduce partitions than writers
    # only adds shuffle tasks and transfers; fewer starves the pool.
    n_reduce = max(2, min(n_parts, write_conc if isinstance(write_conc, int) else write_conc[-1]))
    metrics = chunks.groupby("part_id", num_partitions=n_reduce).map_groups(
        PartitionWriter,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "out_dir": cfg.out_dir,
            "codec_overrides": cfg.codec_overrides,
            "zstd": cfg.zstd,
            "compact_tokens": cfg.compact_tokens,
            "compact_chunk_tokens": cfg.compact_chunk_tokens,
        },
        concurrency=write_conc,
        num_cpus=1.0,
    )
    return metrics
