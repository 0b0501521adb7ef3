"""Encode job — the flagship pipeline (SURVEY.md §3.2a, revised §8/§9).

    E3 stats pass + bucket plan -> E7 resume filter
    -> E1 read -> E3 assign part_id (stateless map_batches)
    -> STAGED EXTERNAL SHUFFLE: map tasks spill raw rows sorted by
       (reduce bucket, part_id) to staged/ parquet (one row group per
       BUCKET, tokens BYTE_STREAM_SPLIT); only (bucket, path,
       row_group) metadata moves — O(blocks x buckets), independent of
       the partition count
    -> one reduce task per bucket (largest-first): split rows back into
       partitions (vectorized boundary scan; local restage if the
       bucket outgrows memory), run the codec auto-selector + the
       same-chunk codec trial (job-global lead election) + encode ONCE,
       E8/E6 atomic container+manifest (+ content digest) per partition
    -> returns a small metrics Dataset (one row per partition)

The object-store payload shuffle (groupby + writer actor pool) is the
`staged_shuffle=False` variant.  Never calls ray.init(); the caller
owns the session.  All heavy stages are Arrow-zero-copy; the stats
pass reads only (source, n_tok) via parquet column pruning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..stages.encoder import (
    ChunkEncoder,
    PartitionWriter,
    encode_chunks_task,
    stage_raw_task,
    write_bucket_task,
)
from ..stages.partition import (
    bucket_plan,
    gen_tag,
    make_assigner,
    make_resume_filter,
    sanitized_names,
    source_stats,
)
from ..state.manifest import JobDirs, completed_partitions, write_plan


@dataclass
class EncodeConfig:
    out_dir: str
    target_partition_tokens: int = 4_000_000  # ~16 MiB of int32 token values
    codec_overrides: dict = field(default_factory=dict)
    zstd: bool = True
    resume: bool = True
    # None = derive from cluster CPUs at run time.  Only consulted on
    # the object-store shuffle path (staged_shuffle=False): the staged
    # path's map side is stateless raw staging and always runs as plain
    # tasks.  On the object-store path, stateless tasks are used when
    # every map codec is fixed (instant start, cluster-elastic); an
    # actor pool only when map-side codecs are 'auto' (FSST/dict caches
    # then pay off across batches).
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
    # Staged external shuffle (default): map tasks write encoded chunk
    # payloads to out_dir/staged (one row group per partition per file)
    # and only (part_id, path, row_group) metadata crosses the groupby.
    # Ray's sort shuffle moves ~35 MB/s on payload-bearing rows; the
    # staged path moves kilobytes and lets the reduce side read each
    # payload exactly once.  On a multi-node cluster staged/ lives on
    # shared storage (the classic map-output-file shuffle).  False =
    # payloads ride the object-store shuffle (no shared FS required).
    staged_shuffle: bool = True
    # Object-store shuffle path only.  None = autoscaling (1, ncpu-2):
    # a fixed pool would reserve its CPUs for the whole job and starve
    # the map phase ahead of the shuffle barrier.
    write_concurrency: tuple | int | None = None
    # Staged path: number of reduce buckets.  None = min(n_partitions,
    # max(64, 4 x cluster CPUs)).  Staged row groups + exchanged
    # metadata are O(blocks x buckets), independent of partition count.
    reduce_buckets: int | None = None
    # A bucket whose staged bytes exceed this is re-staged locally to
    # per-partition row groups before finalizing (memory then bounded by
    # the largest partition, not the bucket).
    bucket_restage_bytes: int = 256 << 20
    # Override where the staged shuffle scratch lives.  None = out_dir/
    # staged.  The scratch is semantically shuffle traffic (Ray's own
    # shuffle would put it in the /dev/shm object store); pointing it
    # at tmpfs / node-local NVMe keeps a slow out_dir filesystem from
    # bottlenecking the exchange — final containers still go to out_dir.
    staged_dir: str | None = None


def _make_choice_registry(cfg: EncodeConfig):
    """Job-global codec A/B trial state (one trial per (source, column)
    across ALL workers — see stages/choices.py).  Only needed when some
    final codec is 'auto'; a fully-overridden job skips the actor."""
    final_auto = any(
        cfg.codec_overrides.get(c, "auto") == "auto"
        for c in ("doc_id", "source", "n_tok", "tokens")
    )
    if not final_auto:
        return None
    from ..stages.choices import CodecChoiceRegistry

    return CodecChoiceRegistry.remote()


def run_encode(ds_factory, cfg: EncodeConfig, stats_factory=None):
    """ds_factory() -> tokseq Dataset (called twice: stats pass + encode;
    Ray datasets are consumed by execution, and re-reading beats
    materializing the whole input).  ``stats_factory`` optionally
    provides a column-pruned (source, n_tok) dataset for the stats pass
    — for parquet inputs that read is ~10x cheaper than the full scan.
    Returns the metrics Dataset."""
    if not cfg.resume:
        # resume=False means REBUILD: clear prior containers/manifests so
        # part_ids from an older plan can't survive next to the new ones
        # (decode reads every manifest entry — stale ids would duplicate)
        import shutil

        dirs = JobDirs(cfg.out_dir)
        for d in (dirs.parts, dirs.manifest, dirs.staged, dirs.tmp):
            shutil.rmtree(d, ignore_errors=True)
    JobDirs(cfg.out_dir).create()

    stats = source_stats((stats_factory or ds_factory)())
    plan = bucket_plan(stats, cfg.target_partition_tokens)
    plan_doc = {
        "buckets": plan,
        "target_partition_tokens": cfg.target_partition_tokens,
        "source_tokens": {k: int(v) for k, v in stats.items()},
    }

    done = frozenset(completed_partitions(cfg.out_dir)) if cfg.resume else frozenset()
    if done:
        # Resume is only sound against the SAME input and config: a
        # grown/changed corpus reshuffles docs into part_ids that are
        # already marked complete, and skipping those would silently
        # drop the new rows (stale containers would still verify-fail,
        # but only if the user runs verify).  Refuse loudly instead.
        from ..state.manifest import read_plan

        try:
            prev = read_plan(cfg.out_dir)
        except FileNotFoundError:
            prev = None
        if prev is not None and prev != plan_doc:
            raise RuntimeError(
                f"resume refused: {cfg.out_dir}/plan.json no longer matches the "
                "input/config (source token counts or bucket plan changed). "
                "Encode changed inputs into a fresh --out dir, or pass "
                "resume=False (--no-resume) to rebuild this one."
            )
    write_plan(cfg.out_dir, plan_doc)
    return _encode_pass(ds_factory, cfg, plan, stats, done=done)


def _encode_pass(ds_factory, cfg: EncodeConfig, plan: dict, stats: dict,
                 *, done: frozenset = frozenset(), gen: int = 0):
    """One assign -> shuffle -> reduce-encode pass over ``ds_factory()``
    for a single ingest generation.  ``plan``/``stats`` are the
    generation's bucket plan and source token totals; ``done`` rows of
    already-completed partitions are dropped before the shuffle (E7);
    ``gen`` tags the partition labels (stages/partition.gen_tag) so
    generations never collide.  Returns the (lazy) metrics Dataset."""
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
        make_assigner(plan, gen=gen), batch_format="pyarrow", zero_copy_batch=True
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
    staged_dir = None
    if cfg.staged_shuffle:
        import shutil as _shutil

        staged_dir = cfg.staged_dir or JobDirs(cfg.out_dir).staged
        # staged files are this run's shuffle scratch; stale ones from a
        # crashed run are never referenced (metadata rows die with it)
        _shutil.rmtree(staged_dir, ignore_errors=True)
        os.makedirs(staged_dir, exist_ok=True)
    if staged_dir is not None:
        # staged external shuffle: spill raw rows bucket-then-part_id
        # sorted with parquet-zstd as transport (C++ columnar encode —
        # the Python codecs run exactly once, reduce-side, per
        # partition).  Whole-block batches -> one staged file per input
        # block with ONE ROW GROUP PER REDUCE BUCKET, so staged row
        # groups and metadata rows are O(blocks x n_buckets) with
        # n_buckets fixed — independent of the partition count (the
        # round-1 M x R verdict fix).
        # Bucket count trades reduce-task granularity against read
        # amplification: every bucket task reads one row group from
        # EVERY staged file, so total row-group reads are blocks x
        # buckets — more buckets means smaller tasks but more fixed
        # per-row-group read cost (measured: 167 buckets was ~30% slower
        # than 64 at 8 cpus on this box).  Straggler tails are handled
        # by LPT ordering below instead of by shrinking buckets.
        n_buckets = cfg.reduce_buckets or min(n_parts, max(64, 4 * ncpu))
        chunks = ds.map_batches(
            stage_raw_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            fn_kwargs={"staged_dir": staged_dir, "n_buckets": n_buckets},
            num_cpus=cfg.encode_num_cpus,
        )
    elif map_is_stateless and cfg.encode_concurrency is None:
        chunks = ds.map_batches(
            encode_chunks_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.chunk_rows,
            fn_kwargs={"codec_overrides": map_codecs, "zstd": cfg.zstd},
            num_cpus=cfg.encode_num_cpus,
        )
    else:
        chunks = ds.map_batches(
            ChunkEncoder,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.chunk_rows,
            fn_constructor_kwargs={"codec_overrides": map_codecs, "zstd": cfg.zstd},
            concurrency=cfg.encode_concurrency or (1, max(2, ncpu - 4)),
            num_cpus=cfg.encode_num_cpus,
        )
    # Phase 2: co-locate per partition, write containers.
    if staged_dir is not None:
        # Metadata rows are O(blocks x n_buckets) and tiny: concat them
        # on the driver and group by bucket with one vectorized argsort
        # (no per-row Python), then dispatch one reduce TASK per bucket —
        # no sort op, no actor pool rampup, and the scheduler
        # load-balances bucket tasks across all CPUs.  (If blocks x
        # n_buckets ever outgrows the driver, this concat+argsort drops
        # into a Ray groupby over the same tiny rows unchanged.)
        import numpy as _np
        import ray.data as rd

        metas = [b for b in chunks.iter_batches(batch_size=None, batch_format="pyarrow")]
        metas = [b for b in metas if b.num_rows]
        if not metas:
            return rd.from_items([]).map_batches(lambda b: b)
        import pyarrow as _pa

        meta = _pa.concat_tables(metas).combine_chunks()
        bk = meta.column("bucket").to_numpy(zero_copy_only=False)
        order = _np.argsort(bk, kind="stable")
        sorted_bk = bk[order]
        bounds = _np.concatenate(
            ([0], _np.flatnonzero(_np.diff(sorted_bk)) + 1, [len(sorted_bk)])
        )
        paths = meta.column("staged_path")
        rgs = meta.column("row_group")
        items = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[int(s) : int(e)]
            items.append(
                {
                    "bucket": int(sorted_bk[s]),
                    "staged_path": paths.take(_pa.array(sel)).to_pylist(),
                    "row_group": rgs.take(_pa.array(sel)).to_pylist(),
                }
            )
        # LPT scheduling: dispatch the biggest buckets FIRST so the tail
        # of the reduce stage is small tasks, not a lone fat straggler.
        # Bucket sizes are estimated from the plan (source token totals
        # spread evenly over each source's partitions, partitions hashed
        # to buckets exactly as stage_raw_task does).
        from ..stages.encoder import bucket_of_part_ids

        san = sanitized_names(plan)
        tag = gen_tag(gen)
        est = {}
        for src, k in plan.items():
            per_part = stats.get(src, 0) / max(1, k)
            pids = [f"{san[src]}{tag}-b{i:04d}" for i in range(int(k))]
            import pyarrow as _pa2

            for b in bucket_of_part_ids(_pa2.array(pids, type=_pa2.string()), n_buckets):
                est[int(b)] = est.get(int(b), 0.0) + per_part
        items.sort(key=lambda it: -est.get(it["bucket"], 0.0))
        reduce_ds = rd.from_items(items, override_num_blocks=len(items))
        metrics = reduce_ds.map_batches(
            write_bucket_task,
            batch_format="pyarrow",
            batch_size=1,
            fn_kwargs={
                "out_dir": cfg.out_dir,
                "codec_overrides": cfg.codec_overrides,
                "zstd": cfg.zstd,
                "compact_chunk_tokens": cfg.compact_chunk_tokens,
                "choice_registry": _make_choice_registry(cfg),
                "restage_bytes": cfg.bucket_restage_bytes,
            },
            num_cpus=1.0,
        )
        return metrics

    # object-store shuffle path: num_partitions ~ writer width — more
    # reduce partitions than writers only adds shuffle tasks; fewer
    # starves the pool.
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
            "choice_registry": _make_choice_registry(cfg),
        },
        concurrency=write_conc,
        num_cpus=1.0,
    )
    return metrics


# -------------------------- incremental (append-aware) encode


def _file_entry(path: str) -> dict:
    return {"path": os.path.abspath(path), "size": int(os.path.getsize(path))}


def _write_gen_plan(out_dir: str, gens: list[dict], cfg: EncodeConfig) -> None:
    """Atomic plan.json for a generational job.  Top-level buckets /
    source_tokens mirror generation 0 so pre-generation readers
    (verify exact single-gen path, older tooling) keep working."""
    doc = {
        "buckets": dict(gens[0]["buckets"]) if gens else {},
        "source_tokens": dict(gens[0]["source_tokens"]) if gens else {},
        "target_partition_tokens": cfg.target_partition_tokens,
        "generations": gens,
    }
    write_plan(cfg.out_dir, doc)


def run_encode_files(input_files, cfg: EncodeConfig, ds_from_files=None,
                     stats_from_files=None):
    """Append-aware incremental encode over parquet shard paths
    (SURVEY.md §12; round-4 verdict item 1).

    Input lineage lives at FILE granularity in plan.json: each ingest
    GENERATION records the shards it covered (path + size), its own
    bucket plan, and a ``sealed`` flag.  Re-running with a grown file
    list encodes ONLY the new shards, into fresh ``{src}-g{NN}-b{KKKK}``
    partitions — completed partitions and their manifests are never
    touched, so an appended corpus costs O(new data), not a rebuild.
    Decode / verify / lookup / queries read across generations
    transparently (manifest-driven).  A run interrupted mid-generation
    resumes at partition granularity (the unsealed generation re-runs
    behind the E7 resume filter); a shard that CHANGED or DISAPPEARED
    is refused loudly — that is a rewrite, not an append.

    ``ds_from_files(files) -> tokseq Dataset`` defaults to a plain
    ``read_parquet``; ``stats_from_files`` optionally provides the
    column-pruned (source, n_tok) read for the stats pass.  Returns
    the concatenated metrics of every pass this call ran (empty
    metrics Dataset when everything was already sealed)."""
    import ray.data as rd

    if ds_from_files is None:
        ds_from_files = lambda files: rd.read_parquet(list(files))

    files = sorted({os.path.abspath(p) for p in input_files})
    if not files:
        raise ValueError("run_encode_files: empty input file list")
    if not cfg.resume:
        import shutil

        dirs = JobDirs(cfg.out_dir)
        for d in (dirs.parts, dirs.manifest, dirs.staged, dirs.tmp):
            shutil.rmtree(d, ignore_errors=True)
        plan_path = os.path.join(cfg.out_dir, "plan.json")
        if os.path.exists(plan_path):
            os.remove(plan_path)
    JobDirs(cfg.out_dir).create()

    from ..state.manifest import read_plan

    try:
        prev = read_plan(cfg.out_dir) if cfg.resume else None
    except FileNotFoundError:
        prev = None
    if prev is not None and "generations" not in prev:
        raise RuntimeError(
            f"{cfg.out_dir} was built by run_encode (no file lineage in "
            "plan.json); incremental encode needs a generational plan. "
            "Use run_encode on it, or rebuild with run_encode_files."
        )
    gens: list[dict] = list(prev["generations"]) if prev else []
    if any(g.get("opaque") for g in gens):
        raise RuntimeError(
            f"{cfg.out_dir} contains an OPAQUE ingest generation (merged "
            "from a run_encode store with no file lineage); incremental "
            "encode cannot tell appends from re-ingests there. Merge into "
            "a store built by run_encode_files, or rebuild."
        )

    known: dict[str, int] = {}
    for g in gens:
        for fe in g["files"]:
            known[fe["path"]] = int(fe["size"])
    cur = {p: int(os.path.getsize(p)) for p in files}
    changed = sorted(p for p in files if p in known and known[p] != cur[p])
    removed = sorted(p for p in known if p not in cur)
    if changed or removed:
        raise RuntimeError(
            "incremental encode refused: input is not an append of the "
            f"recorded corpus (changed: {changed[:3]}, removed: "
            f"{removed[:3]}). Rebuild with resume=False or a fresh out dir."
        )
    new_files = [p for p in files if p not in known]

    done = frozenset(completed_partitions(cfg.out_dir))
    results = []

    # finish any unsealed generation first (crash/interrupt resume):
    # its partitions re-run behind the resume filter, completed ones
    # are dropped before the shuffle — partition-granular, like E7
    for g in gens:
        if g.get("sealed"):
            continue
        gfiles = [fe["path"] for fe in g["files"]]
        m = _encode_pass(
            lambda f=gfiles: ds_from_files(f), cfg, dict(g["buckets"]),
            {k: int(v) for k, v in g["source_tokens"].items()},
            done=done, gen=int(g["gen"]),
        ).materialize()
        results.append(m)
        g["sealed"] = True
        _write_gen_plan(cfg.out_dir, gens, cfg)

    if new_files:
        gen_no = len(gens)
        stats = source_stats((stats_from_files or ds_from_files)(new_files))
        plan = bucket_plan(stats, cfg.target_partition_tokens)
        g = {
            "gen": gen_no,
            "buckets": plan,
            "source_tokens": {k: int(v) for k, v in stats.items()},
            "target_partition_tokens": cfg.target_partition_tokens,
            "files": [_file_entry(p) for p in new_files],
            "sealed": False,
        }
        gens.append(g)
        # record the generation BEFORE encoding: a crash mid-pass leaves
        # it unsealed and the next run resumes it instead of re-planning
        _write_gen_plan(cfg.out_dir, gens, cfg)
        m = _encode_pass(
            lambda: ds_from_files(new_files), cfg, plan, stats,
            done=done, gen=gen_no,
        ).materialize()
        results.append(m)
        g["sealed"] = True
        _write_gen_plan(cfg.out_dir, gens, cfg)

    import ray.data as _rd

    if not results:
        return _rd.from_items([]).map_batches(lambda b: b)
    out = results[0]
    for m in results[1:]:
        out = out.union(m)
    return out
