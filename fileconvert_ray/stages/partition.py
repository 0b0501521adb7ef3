"""Skew-aware partition assignment (SURVEY.md §2.2 E3, §4.2).

Two-step: a cheap stats pass over only (source, n_tok) — column-pruned
at the parquet read — yields per-source token totals; the bucket plan
gives each source ``k = ceil(source_token_bytes / target)`` buckets so
hot sources split into size-bounded partitions while tiny sources get
exactly one.  Assignment is a stateless vectorized map_batches:
``part_id = f"{sanitize(source)}-b{fnv(doc_id) % k}"`` — deterministic
across processes (no PYTHONHASHSEED), which is what makes resume and
verify reproduce identical partitions.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..util.hashing import hash_strings_u64

_SAN = re.compile(r"[^a-z0-9_]+")


def sanitize_id(name: str) -> str:
    """Path-safe identifier (reference's sanitize_column_name semantics,
    SURVEY §2.1 R9, applied to partition ids)."""
    s = _SAN.sub("_", name.lower()).strip("_")
    return s or "x"


def source_stats(ds) -> dict[str, int]:
    """Per-source token totals via per-batch partials, merged on the
    driver.  No groupby shuffle: the partial stream is O(tasks x
    sources) tiny rows, and a Ray sort-based groupby costs seconds of
    fixed barrier latency — pure overhead for a k<=thousands-row
    aggregate.  (At 10^12-sequence scale this driver merge is still
    O(read-tasks x sources); if sources explode, swap the tail for one
    groupby over the partials.)"""

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(["source", "n_tok"]), "source").aggregate(
            [("n_tok", "sum")]
        )
        return g.rename_columns(["source", "tok"])

    # batch_size=None: aggregate whole blocks — the default (1024-row
    # re-slicing) multiplies task/slice overhead ~6x on a pass whose
    # per-batch work is microseconds
    small = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    totals: dict[str, int] = {}
    for b in small.iter_batches(batch_size=None, batch_format="pyarrow"):
        for src, tok in zip(b.column("source").to_pylist(), b.column("tok").to_pylist()):
            totals[src] = totals.get(src, 0) + int(tok)
    return totals


def bucket_plan(
    stats: dict[str, int], target_partition_tokens: int = 4_000_000
) -> dict[str, int]:
    """source -> bucket count, proportional to token share (min 1)."""
    plan = {}
    for src, tok in sorted(stats.items()):
        plan[src] = max(1, -(-int(tok) // target_partition_tokens))
    return plan


def sanitized_names(sources) -> dict[str, str]:
    """Collision-free path-safe names (dedup suffix, like R9's rename dedup)."""
    out: dict[str, str] = {}
    seen: set[str] = set()
    for src in sorted(sources):
        base = sanitize_id(src)
        name, i = base, 1
        while name in seen:
            name, i = f"{base}_{i}", i + 1
        seen.add(name)
        out[src] = name
    return out


def gen_tag(gen: int) -> str:
    """Label infix for ingest generation ``gen`` (incremental encode):
    generation 0 keeps the classic ``{source}-b{NNNN}`` labels (every
    pre-generation output stays valid); generation g >= 1 appends
    ``-g{g:02d}`` to the sanitized source so its partitions can never
    collide with another generation's (sanitized names contain no
    dashes, which keeps the scheme parseable)."""
    return f"-g{gen:02d}" if gen else ""


def make_assigner(plan: dict[str, int], gen: int = 0):
    """Vectorized part_id assignment closure for map_batches.

    ``gen``: ingest generation — appended to the sanitized source name
    (see gen_tag) so each generation's partitions are disjoint."""
    san = {s: n + gen_tag(gen) for s, n in sanitized_names(plan).items()}

    def assign(batch: pa.Table) -> pa.Table:
        src = batch.column("source").combine_chunks()
        h = hash_strings_u64(batch.column("doc_id"))
        # per-row bucket count via a small dictionary gather
        denc = src.dictionary_encode()
        dsrcs = denc.dictionary.to_pylist()
        ks = np.array([plan.get(s, 1) for s in dsrcs], dtype=np.uint64)
        names = [san.get(s, sanitize_id(s) + gen_tag(gen)) for s in dsrcs]
        idx = denc.indices.to_numpy(zero_copy_only=False)
        bucket = (h % ks[idx]).astype(np.int64)
        # part_id strings built via dictionary gather (one python string
        # per (source, bucket) pair, not per row)
        kmax = int(ks.max()) if len(ks) else 1
        pair = idx.astype(np.int64) * kmax + bucket
        uniq, inv = np.unique(pair, return_inverse=True)
        labels = [f"{names[int(p // kmax)]}-b{int(p % kmax):04d}" for p in uniq]
        part = pa.DictionaryArray.from_arrays(
            pa.array(inv, type=pa.int32()), pa.array(labels, type=pa.string())
        ).cast(pa.string())
        return batch.append_column("part_id", part)

    return assign


def make_resume_filter(done: frozenset):
    """Drop rows of already-completed partitions (E7) before the shuffle."""

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not done:
            return batch
        mask = pc.invert(pc.is_in(batch.column("part_id"), value_set=pa.array(sorted(done))))
        return batch.filter(mask)

    return flt
