"""Mergeable sketches as Ray Data aggregates.

HyperLogLog (Flajolet et al. 2007, with the standard small/large-range
corrections) expressed the pre-aggregate way: each batch reduces to ONE
(group, registers) row (2^p bytes), the groupby merges registers with
an elementwise max, and the estimate is computed from the final
register row — the shuffle moves O(groups x 2^p) bytes regardless of
row count, which is the whole point of a sketch at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util.hashing import hash_strings_u64, splitmix64


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes -> 2^p max-rank registers."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining 64-p bits, +1
    nbits = 64
    lz = np.full(len(h), nbits, dtype=np.int64)
    v = rest.copy()
    nz = v != 0
    # count leading zeros via float trick is lossy; do it in 6 halving steps
    shift = np.uint64(32)
    cnt = np.zeros(len(h), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        su = np.uint64(s)
        mask = v < (np.uint64(1) << np.uint64(64 - s))
        cnt[mask] += s
        v[mask] = v[mask] << su
    lz = np.where(nz, cnt, nbits)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small/large-range corrections."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    elif est > (1 << 32) / 30:
        est = -(1 << 32) * np.log(1 - est / (1 << 32))
    return float(est)


def hll_distinct_by(ds, group_col: str, value_col: str, p: int = 14):
    """Approximate COUNT(DISTINCT value_col) per group_col.

    Returns a Dataset of (group_col, approx_distinct: int64)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type):
            h = hash_strings_u64(vals)
        else:
            h = splitmix64(
                pc.cast(vals, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        grp = batch.column(group_col)
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        denc = grp.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        idx = denc.indices.to_numpy(zero_copy_only=False)
        out_g, out_r = [], []
        for gi in range(len(denc.dictionary)):
            out_g.append(denc.dictionary[gi].as_py())
            out_r.append(_registers(h[idx == gi], p).tobytes())
        return pa.Table.from_pydict(
            {group_col: out_g, "_regs": pa.array(out_r, type=pa.binary())}
        )

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pydict(
                {group_col: [], "approx_distinct": []},
                schema=pa.schema([(group_col, pa.string()), ("approx_distinct", pa.int64())]),
            )
        regs = np.zeros(m, dtype=np.uint8)
        for b in group.column("_regs").to_pylist():
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
        return pa.Table.from_pydict(
            {
                group_col: [group.column(group_col)[0].as_py()],
                "approx_distinct": [int(round(hll_estimate(regs)))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
    )


# ------------------------------------------------ Misra-Gries / frequent items

_MG_DEC_SENTINEL = np.int64(-1)


def _mg_compress(items: np.ndarray, cnts: np.ndarray, k: int):
    """Reduce a counter set to <= k entries by subtracting the (k+1)-th
    largest count from every counter and dropping the non-positive ones
    (Agarwal et al., "Mergeable Summaries", PODS 2012).  Returns
    (items, cnts, subtracted) — `subtracted` adds to the sketch's
    one-sided error bound."""
    if len(items) <= k:
        return items, cnts, 0
    kth = np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1]
    keep = cnts > kth
    return items[keep], cnts[keep] - kth, int(kth)


def mg_heavy_hitters(ds, value_col: str, k: int = 64):
    """Frequent-items sketch over an int column, the mergeable way.

    Each batch exact-counts its values with one np.unique, compresses
    to <= k counters, and emits them as (item, cnt) rows plus one
    sentinel row carrying the subtracted mass.  A groupby-sum then
    moves O(k x batches) rows — never O(rows) — and a final compress
    over that small union yields the sketch.  (On a multi-node run the
    groupby-sum IS the tree merge; the final table is <= k*batches
    rows, bounded and tiny.)

    Returns a pyarrow Table (token, lb, ub) sorted by lb desc, token
    asc: true_count is guaranteed within [lb, ub], and every item with
    true_count > total_subtracted appears.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = pc.cast(vals, pa.int64()).to_numpy(zero_copy_only=False)
        if len(v) and v.min() < 0:
            raise ValueError("mg_heavy_hitters requires non-negative items "
                             "(-1 is the decrement-mass sentinel)")
        items, cnts = np.unique(v, return_counts=True)
        items, cnts, dec = _mg_compress(items, cnts.astype(np.int64), k)
        return pa.Table.from_pydict(
            {
                "item": pa.array(
                    np.concatenate((items, [_MG_DEC_SENTINEL])), type=pa.int64()
                ),
                "cnt": pa.array(
                    np.concatenate((cnts, [np.int64(dec)])), type=pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("item")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # O(k x batches) rows by construction
    )
    sent = merged["item"] == int(_MG_DEC_SENTINEL)
    dec_total = int(merged.loc[sent, "cnt"].sum())
    items = merged.loc[~sent, "item"].to_numpy(dtype=np.int64)
    cnts = merged.loc[~sent, "cnt"].to_numpy(dtype=np.int64)
    items, cnts, dec = _mg_compress(items, cnts, k)
    dec_total += dec
    order = np.lexsort((items, -cnts))
    return pa.Table.from_pydict(
        {
            "token": pa.array(items[order], type=pa.int64()),
            "lb": pa.array(cnts[order], type=pa.int64()),
            "ub": pa.array(cnts[order] + np.int64(dec_total), type=pa.int64()),
        }
    )


# ------------------------------------------------- quantile sketch

# Compactor-stack quantile sketch (Karnin-Lang-Liberty 2016 lineage;
# this is the fixed-capacity Manku-Rajagopalan-Lindsay-style variant:
# KLL's geometric capacity decay is omitted so every compaction keeps
# the same per-level budget).  Level i items carry weight 2^i; a full
# level sorts, keeps every second item (parity chosen by a
# deterministic splitmix64 coin so reruns are bit-identical), and
# promotes them one level up.  Merging = concatenating level buffers
# and re-compacting — associative and commutative up to the coin
# stream, which is all a shuffle-merged sketch needs.  Rank error is
# O(log(n/k)/k) deterministic-coin worst case; the property test pins
# an empirical envelope.


class KllSketch:
    def __init__(self, k: int = 256, seed: int = 1):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self._state = np.uint64(0x9E3779B97F4A7C15 * (seed or 1) & ((1 << 64) - 1))

    def _coin(self) -> int:
        self._state = splitmix64(np.array([self._state], dtype=np.uint64))[0]
        return int(self._state & np.uint64(1))

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate((self.levels[0], v))
        self._compress()

    def merge_rows(self, level: np.ndarray, value: np.ndarray) -> None:
        """Absorb (level, value) rows emitted by to_rows()."""
        for lv in np.unique(level):
            li = int(lv)
            while len(self.levels) <= li:
                self.levels.append(np.zeros(0, dtype=np.float64))
            self.levels[li] = np.concatenate((self.levels[li], value[level == lv]))
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) <= self.k:
                i += 1
                continue
            buf = np.sort(buf, kind="stable")
            if len(buf) & 1:
                keep, buf = buf[-1:], buf[:-1]
            else:
                keep = buf[:0]
            promoted = buf[self._coin()::2]
            self.levels[i] = keep
            if i + 1 == len(self.levels):
                self.levels.append(np.zeros(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate((self.levels[i + 1], promoted))
            i += 1

    def to_rows(self) -> tuple[np.ndarray, np.ndarray]:
        lv = np.concatenate([
            np.full(len(b), i, dtype=np.int64) for i, b in enumerate(self.levels)
        ]) if self.levels else np.zeros(0, dtype=np.int64)
        va = np.concatenate(self.levels) if self.levels else np.zeros(0, dtype=np.float64)
        return lv, va

    def n(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def quantile(self, q: float) -> float:
        lv, va = self.to_rows()
        if len(va) == 0:
            return float("nan")
        w = (np.int64(1) << lv).astype(np.float64)
        order = np.argsort(va, kind="stable")
        va, w = va[order], w[order]
        cw = np.cumsum(w)
        target = q * cw[-1]
        idx = int(np.searchsorted(cw, target, side="left"))
        return float(va[min(idx, len(va) - 1)])


def kll_quantiles(ds, value_col: str, qs: list[float], *, k: int = 256,
                  merge_buckets: int = 8):
    """Approximate quantiles of ``value_col`` via shuffle-merged KLL
    sketches: each batch reduces to O(k log) (bucket, level, value)
    rows, per-bucket map_groups merges them, and the driver folds the
    O(merge_buckets) surviving sketches — rows moved are sketch-sized
    regardless of input rows (the HLL/MG shape, applied to ranks).
    Returns one (q, est, n) row per requested quantile."""
    B = int(merge_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64()).to_numpy(zero_copy_only=False)
        # batch-content-derived seed: deterministic under any block split
        seed = int(splitmix64(np.array([len(v) + 1], dtype=np.uint64))[0]) & 0x7FFFFFFF
        sk = KllSketch(k=k, seed=seed)
        sk.update_many(v)
        lv, va = sk.to_rows()
        if len(va):
            bits = np.asarray(va[0], dtype=np.float64).view(np.uint64)
            bkt = int(splitmix64(np.array([bits ^ np.uint64(len(va))], dtype=np.uint64))[0] % np.uint64(B))
        else:
            bkt = 0
        return pa.Table.from_pydict({
            "bucket": pa.array(np.full(len(lv), bkt, dtype=np.int64)),
            "level": pa.array(lv),
            "value": pa.array(va),
        })

    def merge_bucket(group: pa.Table) -> pa.Table:
        sk = KllSketch(k=k, seed=int(group.column("bucket")[0].as_py()) + 11)
        sk.merge_rows(
            group.column("level").to_numpy(zero_copy_only=False),
            group.column("value").to_numpy(zero_copy_only=False),
        )
        lv, va = sk.to_rows()
        return pa.Table.from_pydict({"level": pa.array(lv), "value": pa.array(va)})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
        .to_pandas()  # O(merge_buckets x k x levels) rows — sketch-sized
    )
    final = KllSketch(k=k, seed=7)
    if len(merged):
        final.merge_rows(merged["level"].to_numpy(), merged["value"].to_numpy())
    n = final.n()
    return pa.table({
        "q": pa.array(np.asarray(qs, dtype=np.float64)),
        "est": pa.array(np.array([final.quantile(q) for q in qs])),
        "n": pa.array(np.full(len(qs), n, dtype=np.int64)),
    })


# ---------------------------------------------------- bloom filter

# Classic Bloom filter as a Ray Data aggregate (Bloom 1970): each
# batch reduces to ONE m/8-byte partial bitmap row, the groupby merges
# bitmaps with an elementwise OR (associative/commutative, so any merge
# tree works), and membership probes are vectorized bit tests — the
# membership companion to the HLL/MG/KLL sketches above.  k probe
# positions come from double hashing (Kirsch-Mitzenmatcher 2006):
# pos_i = (h1 + i*h2) mod m, so one 64-bit hash per value suffices.


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) probe positions from one uint64 hash per value."""
    h1 = h % np.uint64(m_bits)
    with np.errstate(over="ignore"):
        h2 = (splitmix64(h) | np.uint64(1)) % np.uint64(m_bits)  # odd-ish step
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _col_hash_u64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_strings_u64(col)
    v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    return splitmix64(v)


def bloom_build(ds, col: str, *, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Build a Bloom filter over ``col`` distributed: per-batch partial
    bitmaps (m/8 bytes each) OR-merge through one tiny groupby.  Rows
    moved are O(batches x m/8) — sketch-sized, independent of row
    count.  Returns the final bitmap (np.uint8[m/8]); NO false
    negatives by construction, false-positive rate ~ (1-e^{-kn/m})^k.
    """
    nbytes = m_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        h = _col_hash_u64(batch.column(col))
        bm = np.zeros(nbytes, dtype=np.uint8)
        if len(h):
            pos = _bloom_positions(h, m_bits, k).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.Table.from_pydict({"g": pa.array([0]), "bm": pa.array([bm.tobytes()], type=pa.binary())})

    def merge(group: pa.Table) -> pa.Table:
        bms = group.column("bm").to_pylist()
        out = np.zeros(nbytes, dtype=np.uint8)
        for b in bms:
            out |= np.frombuffer(b, dtype=np.uint8)
        return pa.Table.from_pydict({"g": pa.array([0]), "bm": pa.array([out.tobytes()], type=pa.binary())})

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()  # exactly one m/8-byte row
    )
    return np.frombuffer(rows[0]["bm"], dtype=np.uint8).copy()


def bloom_contains(bitmap: np.ndarray, col, *, k: int = 4) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set
    (maybe-present); False = definitely absent."""
    m_bits = len(bitmap) * 8
    h = _col_hash_u64(col)
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(h, m_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


# ------------------------------------------------------------- count-min

def _cms_rows(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """Double-hashed row indices, shape (depth, n): (h1 + i*h2) mod w
    (Cormode & Muthukrishnan 2005; Kirsch-Mitzenmacher double hashing)."""
    h1 = h % np.uint64(width)
    h2 = splitmix64(h ^ np.uint64(0x9E3779B97F4A7C15)) % np.uint64(width)
    h2 = h2 | np.uint64(1)  # odd -> full-period stride
    return np.stack(
        [((h1 + np.uint64(i) * h2) % np.uint64(width)).astype(np.int64)
         for i in range(depth)]
    )


def cms_merge_build(ds, value_col: str, *, depth: int = 4, width: int = 2048,
                    shards: int = 16) -> np.ndarray:
    """Count-min sketch over an int column, the mergeable way: each
    batch reduces to ONE depth x width int64 counter block (a binary
    row), a groupby(shard) elementwise-sums blocks in parallel (the
    tree merge — O(shards) rows reach the driver no matter the corpus
    size), and the driver folds the last few.  Returns the (depth,
    width) counter matrix; ``cms_estimate`` answers point queries with
    the one-sided guarantee true <= est <= true + eps*N."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        rows = _cms_rows(splitmix64(uniq.astype(np.uint64)), depth, width)
        block = np.zeros((depth, width), dtype=np.int64)
        for i in range(depth):
            np.add.at(block[i], rows[i], cnt)
        # deterministic per-batch spread: derived from content, not
        # batch order, so retries land on the same shard
        seed = np.uint64(len(v)) ^ np.bitwise_xor.reduce(
            splitmix64(v.astype(np.uint64)), initial=np.uint64(0)
        )
        shard = int(splitmix64(np.array([seed], dtype=np.uint64))[0] % shards)
        return pa.Table.from_pydict(
            {"shard": pa.array([shard], type=pa.int64()),
             "_cms": pa.array([block.tobytes()], type=pa.binary())}
        )

    def merge(group: pa.Table) -> pa.Table:
        acc = np.zeros(depth * width, dtype=np.int64)
        for b in group.column("_cms").to_pylist():
            acc += np.frombuffer(b, dtype=np.int64)
        return pa.Table.from_pydict(
            {"shard": [group.column("shard")[0].as_py()],
             "_cms": pa.array([acc.tobytes()], type=pa.binary())}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()  # <= shards rows
    )
    acc = np.zeros(depth * width, dtype=np.int64)
    for b in merged["_cms"]:
        acc += np.frombuffer(b, dtype=np.int64)
    return acc.reshape(depth, width)


def cms_estimate(sketch: np.ndarray, items: np.ndarray) -> np.ndarray:
    """Point-query estimates: min over rows of the hashed counters."""
    depth, width = sketch.shape
    rows = _cms_rows(splitmix64(items.astype(np.int64).astype(np.uint64)), depth, width)
    est = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(depth):
        est = np.minimum(est, sketch[i][rows[i]])
    return est
