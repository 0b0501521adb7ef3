"""Benchmark driver — prints ONE JSON line (SURVEY.md §6, ray_guide.md §bench).

    python bench.py                 # headline run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # fresh processes at 8 and 32 CPUs, same input

Headline: the flagship partitioned encode over a deterministic F1b
zipfian corpus (default 500k docs, ~200M tokens, generated once into
/tmp and cached), plus decode-verify and the aggregate/dedup query
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

This script OWNS its ray session (unlike __ray_entry__ / the library).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Keep glibc from returning large freed buffers to the kernel: codec
# temporaries are MiB-scale and re-faulting fresh zero pages across 32
# concurrent workers dominates decode CPU otherwise (measured 20x).
# Must be set before ray.init so worker processes inherit it.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# ~1.2B tokens: enough work per CPU that the scaling comparison measures
# the pipeline, not Ray's fixed startup/barrier overheads (~8s/run)
BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "2000000"))
CORPUS_DIR = f"/tmp/fcray_bench/corpus-{BENCH_ROWS}"
OUT_DIR = f"/tmp/fcray_bench/encode-{BENCH_ROWS}-{NUM_CPUS}"

# Staged-shuffle scratch location: the staged files are shuffle traffic
# (Ray's own shuffle would route them through the /dev/shm object
# store), so by default the scratch goes to tmpfs when present — final
# containers still land on OUT_DIR's real filesystem, same as the
# reference proxy's parquet output.  GRAFT_STAGED_SHM=0 reverts to
# out_dir/staged (measured on a slow-disk window: 69.7 s vs 45.4 s at
# 32 cpus).
STAGED_DIR = (
    "/dev/shm/fcray_bench_staged"
    if os.environ.get("GRAFT_STAGED_SHM", "1") != "0" and os.path.isdir("/dev/shm")
    else None
)



def _ensure_corpus():
    import ray

    from fileconvert_ray.sources.tokseq import write_synth_corpus

    marker = os.path.join(CORPUS_DIR, "_DONE")
    if os.path.exists(marker):
        return
    import shutil

    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    write_synth_corpus(CORPUS_DIR, BENCH_ROWS, shards=64)
    open(marker, "w").write("ok")


def _calibrate() -> dict:
    """Fixed single-thread calibration burn (round-2 verdict #7).

    Identical work every run — a DRAM-bandwidth probe (streaming
    add over a 512 MiB array) and an in-cache compute probe
    (splitmix64 over a 64 Ki array) — so the absolute wall times in
    this JSON can be audited against host state: the encode pipeline
    is bandwidth-bound, so when dram_gb_per_sec drops between runs
    (measured 2x intra-day drift on this host, BASELINE.md), encode
    wall times drift with it while compute_mops_per_sec stays flat."""
    import numpy as np

    from fileconvert_ray.util.hashing import splitmix64

    big = np.zeros(64 << 20, dtype=np.int64)  # 512 MiB
    big[:] = 1
    t0 = time.perf_counter()
    passes = 24
    for _ in range(passes):
        big += 1  # streams 512 MiB read + 512 MiB write
    dram_s = time.perf_counter() - t0
    dram_gbps = passes * (big.nbytes * 2 / 1e9) / dram_s

    small = np.arange(1 << 16, dtype=np.uint64)
    reps = 4000
    t0 = time.perf_counter()
    for _ in range(reps):
        small = splitmix64(small)
    comp_s = time.perf_counter() - t0
    mops = reps * len(small) / comp_s / 1e6
    return {
        "calib_dram_gb_per_sec": round(dram_gbps, 2),
        "calib_compute_mops_per_sec": round(mops, 1),
        "calib_sec": round(dram_s + comp_s, 2),
    }


def _calibrate_ray() -> dict:
    """Parallel Ray-pipeline probe (round 3).

    The single-thread calib above does NOT track the degraded host
    regime: measured 2026-08-17, calib_dram read 16-17 GB/s (healthy)
    while the identical encode pipeline ran 4x slow, and a 16-process
    streaming-add probe right after the slow run still aggregated
    143 GB/s.  Whatever the co-tenant contention hits, it is only
    visible to the full Ray worker-pool execution path, so the only
    honest audit signal is a fixed miniature of that path: NUM_CPUS
    map_batches tasks, each deterministically synthesizing 8M zipf-ish
    tokens (splitmix64 mod 31) and running the real esc codec
    encode+decode round trip.  Runs after ray.init; ~1 s wall in the
    fast regime, 3-5 s degraded."""
    import numpy as np
    import ray.data as rd

    tasks = max(8, NUM_CPUS)
    tok = 8_000_000

    def kern(batch):
        from fileconvert_ray.codecs.intcodecs import EscBytes
        from fileconvert_ray.util.hashing import splitmix64

        i = int(batch["id"][0])
        h = splitmix64(np.arange(i * tok, (i + 1) * tok, dtype=np.uint64))
        toks = (h % np.uint64(31)).astype(np.int32)
        codec = EscBytes()
        params, payload = codec.encode(toks)
        out = codec.decode(params, payload, len(toks))
        if out[0] != toks[0] or out[-1] != toks[-1]:
            raise AssertionError("probe codec mismatch")
        return {"n": np.array([len(toks)], dtype=np.int64)}

    def one_pass() -> tuple[int, float]:
        ds = rd.range(tasks, override_num_blocks=tasks)
        pipe = ds.map_batches(kern, batch_format="numpy", batch_size=None)
        t0 = time.perf_counter()
        n = sum(int(b["n"].sum()) for b in pipe.iter_batches(batch_format="numpy"))
        return n, time.perf_counter() - t0

    # pass 1 includes worker-pool cold start (fork + numpy import + arena
    # faults) — itself a regime signal (measured 100 s degraded vs ~5 s
    # fast); pass 2 is the steady-state number the pipeline sees
    _, cold = one_pass()
    n, dt = one_pass()
    # disk-write probe: the staged shuffle spills ~1 GB to /tmp, so a
    # degraded host disk shows up directly in encode wall time
    import numpy as np

    buf = np.ones(64 << 20, dtype=np.uint8).tobytes()  # 64 MiB
    path = "/tmp/fcray_bench/_disk_probe"
    t0 = time.perf_counter()
    with open(path, "wb") as f:
        for _ in range(4):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    disk_dt = time.perf_counter() - t0
    os.unlink(path)
    return {
        "calib_ray_mtok_per_sec": round(n / dt / 1e6, 1),
        "calib_ray_sec": round(dt, 2),
        "calib_ray_cold_sec": round(cold, 2),
        "calib_disk_write_mb_per_sec": round(256 / disk_dt, 1),
    }


def _warm_cache():
    # one untimed pass so we measure compute+shuffle, not cold reads
    for root in (CORPUS_DIR, SF_DIR):
        for f in os.listdir(root):
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import shutil

    import ray.data as rd

    from fileconvert_ray.pipelines.encode_job import EncodeConfig, run_encode
    from fileconvert_ray.pipelines.verify_job import run_verify
    from fileconvert_ray.functions.queries import (
        q_minhash_dedup_docs,
        q_per_source_stats,
        q_token_histogram,
    )

    _ensure_corpus()
    _warm_cache()
    queries: dict[str, float] = {}
    extra: dict = {"run_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"), **_calibrate(), **_calibrate_ray()}

    # ---- headline: partitioned encode of the synthetic corpus
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    factory = lambda: rd.read_parquet(CORPUS_DIR)
    stats_factory = lambda: rd.read_parquet(CORPUS_DIR, columns=["source", "n_tok"])
    # warmup on 1/8 of the shards: spins up the worker pool, imports
    # numpy in every worker, and faults in allocator arenas — the timed
    # run then measures steady-state pipeline throughput, not process
    # cold-start (cold first run costs ~2x; standard benchmark practice)
    warm_paths = sorted(
        os.path.join(CORPUS_DIR, f) for f in os.listdir(CORPUS_DIR) if f.endswith(".parquet")
    )[::8]
    wdir = OUT_DIR + "-warmup"
    shutil.rmtree(wdir, ignore_errors=True)
    run_encode(
        lambda: rd.read_parquet(warm_paths),
        EncodeConfig(out_dir=wdir, target_partition_tokens=8_000_000, staged_dir=STAGED_DIR),
        stats_factory=lambda: rd.read_parquet(warm_paths, columns=["source", "n_tok"]),
    ).to_pandas()
    shutil.rmtree(wdir, ignore_errors=True)

    # best-of-N timing (min): one number per run would let unrelated VM
    # noise (writeback, driver wakeups) swing the scaling ratio
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    t_encode = float("inf")
    for _ in range(max(1, repeats)):
        shutil.rmtree(OUT_DIR, ignore_errors=True)
        t0 = time.perf_counter()
        metrics = run_encode(
            factory,
            EncodeConfig(out_dir=OUT_DIR, target_partition_tokens=8_000_000, staged_dir=STAGED_DIR),
            stats_factory=stats_factory,
        ).to_pandas()
        t_encode = min(t_encode, time.perf_counter() - t0)
    queries["encode_synth"] = round(t_encode, 3)
    n_tokens = int(metrics["n_tokens"].sum())
    extra["encode_tokens"] = n_tokens
    extra["tokens_per_sec"] = round(n_tokens / t_encode)
    extra["bytes_per_token"] = round(float(metrics["encoded_bytes"].sum()) / n_tokens, 4)
    # Reference proxy (north rule "<= reference compressed size"): the input
    # corpus is itself parquet+zstd with dictionary encoding — FileConvert's
    # best-codec Parquet sink output on identical data (SURVEY.md §6).
    ref_bytes = sum(
        os.path.getsize(os.path.join(CORPUS_DIR, f))
        for f in os.listdir(CORPUS_DIR)
        if f.endswith(".parquet")
    )
    extra["ref_parquet_zstd_bytes_per_token"] = round(ref_bytes / n_tokens, 4)
    extra["size_vs_ref"] = round(float(metrics["encoded_bytes"].sum()) / ref_bytes, 4)

    if os.environ.get("GRAFT_ENCODE_ONLY") != "1":
        # ---- decode-verify of the same output (hash mode: shuffle-free)
        t0 = time.perf_counter()
        v = run_verify(factory, OUT_DIR, mode="hash").to_pandas()
        queries["verify_synth"] = round(time.perf_counter() - t0, 3)
        extra["verify_ok"] = bool(v["ok"].all())

        # ---- full-decode throughput of the same output (the training-
        # loader read path: every token payload decoded, counted in-
        # cluster so the driver never holds the corpus)
        import pyarrow as pa
        import pyarrow.compute as pc

        from fileconvert_ray.stages.decoder import decode_dataset

        def _count_tokens(batch: pa.Table) -> pa.Table:
            col = batch.column("tokens")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = int(pc.sum(pc.list_value_length(col)).as_py() or 0)
            return pa.table({"n": pa.array([n], pa.int64())})

        t0 = time.perf_counter()
        n_dec = int(
            decode_dataset(OUT_DIR, columns=["tokens"])
            .map_batches(_count_tokens, batch_format="pyarrow", zero_copy_batch=True)
            .sum("n")
        )
        t_dec = time.perf_counter() - t0
        queries["decode_synth"] = round(t_dec, 3)
        extra["decode_tokens_per_sec"] = round(n_dec / t_dec)
        if n_dec != n_tokens:
            extra["decode_token_mismatch"] = {"decoded": n_dec, "encoded": n_tokens}

        # ---- aggregate + dedup pipelines over the sf dir
        t0 = time.perf_counter()
        q_per_source_stats(SF_DIR)
        queries["per_source_stats"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        q_token_histogram(SF_DIR).materialize()
        queries["token_histogram"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        q_minhash_dedup_docs(SF_DIR).materialize()
        queries["minhash_dedup"] = round(time.perf_counter() - t0, 3)

        # ---- fixed-codec family e2e (ALP / ALP-RD): encode+decode every
        # lineitem price double and embedding float in-cluster with a
        # bit-identity hard assert (the query raises on any drift)
        from fileconvert_ray.functions.queries import q_float_codec_roundtrip

        t0 = time.perf_counter()
        q_float_codec_roundtrip(SF_DIR).materialize()
        queries["float_codec_roundtrip"] = round(time.perf_counter() - t0, 3)

        # size evidence for the two headline float shapes (driver-side,
        # two small column reads — not a distributed stage)
        import pyarrow.parquet as _pq

        from fileconvert_ray.codecs import encode_array, encoded_total_bytes

        fc = {}
        for tbl, col, key in (
            ("lineitem", "l_discount", "l_discount"),
            ("embeddings", "embedding", "embedding"),
        ):
            arr = _pq.read_table(f"{SF_DIR}/{tbl}.parquet", columns=[col]).column(col).combine_chunks()
            if key == "embedding":
                arr = arr.flatten()
            enc = encode_array(arr, key, codec="auto", zstd=True)
            fc[key] = {
                "codec": enc.codec,
                "ratio_vs_plain": round(encoded_total_bytes(enc) / max(1, enc.plain_bytes), 4),
            }
        extra["float_codec"] = fc

        # ---- round-5 search path over the encoded corpus: bloom
        # sidecar build (one task per container), then the same exact
        # trigram scan pruned vs unpruned — the delta is what the
        # index buys an audit/forensics query at this corpus size
        from fileconvert_ray.pipelines.search_job import run_build_index, run_search

        t0 = time.perf_counter()
        run_build_index(OUT_DIR)
        queries["index_build"] = round(time.perf_counter() - t0, 3)

        # a provably-present but selective trigram: scan the first
        # corpus shard's first rows for the window whose MOST COMMON
        # token is rarest (synth ids are zipf-mod-vocab: low ids carry
        # most of the mass, so maximizing the window min avoids them)
        tcol = _pq.read_table(warm_paths[0], columns=["tokens"]).column("tokens")
        trigram = None
        for r in range(min(64, len(tcol))):
            toks0 = tcol[r].as_py()
            if len(toks0) < 3:
                continue
            j = max(range(len(toks0) - 2), key=lambda k: min(toks0[k : k + 3]))
            cand = toks0[j : j + 3]
            if trigram is None or min(cand) > min(trigram):
                trigram = cand
        if trigram is not None:
            t0 = time.perf_counter()
            pruned = run_search(OUT_DIR, token_ids=trigram).to_pandas()
            queries["phrase_search"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            full = run_search(OUT_DIR, token_ids=trigram, use_index=False).to_pandas()
            queries["phrase_search_noindex"] = round(time.perf_counter() - t0, 3)
            extra["phrase_search_docs"] = int(len(pruned))
            if len(pruned) != len(full):  # pruning must never lose a match
                extra["phrase_search_mismatch"] = {
                    "pruned": int(len(pruned)), "full": int(len(full))
                }

    ray.shutdown()
    # leave only the cached corpus behind: 3 GB of encode output per
    # (rows, cpus) combination fills the disk over repeated runs, and a
    # 74%-full ext4 slows every write in the pipeline (measured 2x)
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    # attach the latest recorded scaling pairings (written by --scaling)
    # so the per-round BENCH json carries them (round-2 verdict #7)
    scaling_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_file):
        try:
            extra["scaling"] = json.load(open(scaling_file))
        except Exception:
            pass
    return {
        "metric": "encode throughput (tokens/sec) + pipeline wall times",
        "value": round(t_encode, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extra,
    }


def run_scaling() -> dict:
    """N vs 4N CPUs, same input, fresh processes (the sandbox stand-in
    for the N vs 4N-node criterion).

    N=1 by default (round 2): this single VM's DRAM bandwidth saturates
    earlier with the round-2 codecs (per-CPU encode throughput: ~4.2M
    tok/s at 2 cpus, 3.1 at 8, 2.0 at 16, 1.4 at 32 — measured, full
    curve in BASELINE.md), so comparing levels at or above the knee
    measures the VM's memory bus, not the engine.  On a real N vs
    4N-node cluster every node brings its own memory bus and disks,
    which is what scaling num_cpus below the knee emulates; 1 vs 4 is
    the only pairing fully below the knee on this box.  The 2-vs-8 and
    higher pairings are published in BASELINE.md for transparency.
    """

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_ENCODE_ONLY="1",
            GRAFT_BENCH_REPEATS=os.environ.get("GRAFT_BENCH_REPEATS", "2"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # both pairings by default (round-2 verdict #7): 1v4 (headline, fully
    # below this VM's DRAM knee) AND 2v8 (8 at the knee) for transparency
    levels = sorted(
        {int(x) for n in os.environ.get("GRAFT_SCALE_N", "1,2").split(",") for x in (n, str(4 * int(n)))}
    )
    results = {n: run(n) for n in levels}
    out = {
        "unit": "efficiency",
        "run_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "sf": SF_DIR,
        "pairings": {},
    }
    for n in sorted({int(x) for x in os.environ.get("GRAFT_SCALE_N", "1,2").split(",")}):
        lo, hi = n, 4 * n
        t_lo, t_hi = results[lo]["value"], results[hi]["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        out["pairings"][f"{lo}v{hi}"] = {
            "scaling_efficiency": round(eff, 3),
            f"sec_{lo}": t_lo,
            f"sec_{hi}": t_hi,
            f"tokens_per_sec_{lo}": results[lo].get("tokens_per_sec"),
            f"tokens_per_sec_{hi}": results[hi].get("tokens_per_sec"),
        }
        for k in ("calib_dram_gb_per_sec", "calib_compute_mops_per_sec", "calib_ray_mtok_per_sec"):
            out["pairings"][f"{lo}v{hi}"][f"{k}_{lo}"] = results[lo].get(k)
            out["pairings"][f"{lo}v{hi}"][f"{k}_{hi}"] = results[hi].get(k)
    head = out["pairings"][sorted(out["pairings"])[0]]
    first = sorted(out["pairings"])[0]
    out["metric"] = f"scaling efficiency (encode, {first.replace('v', ' vs ')} cpus)"
    out["value"] = head["scaling_efficiency"]
    out["scaling_efficiency"] = head["scaling_efficiency"]
    hi_all = max(results)
    out["bytes_per_token"] = results[hi_all].get("bytes_per_token")
    out["size_vs_ref"] = results[hi_all].get("size_vs_ref")
    # persist so the next plain `bench.py` run embeds the pairings in its
    # JSON (the driver records that as BENCH_r{N}.json)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json"), "w") as f:
            json.dump(out, f)
    except Exception:
        pass
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
