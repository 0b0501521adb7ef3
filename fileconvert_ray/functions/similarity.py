"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine — the query matrix is broadcast ONCE via
``ray.put`` and every map_batches task scores its batch against it
with one numpy matmul (no shuffle, no per-batch re-ship).  Scale path:
random-hyperplane LSH bucketing -> groupby(bucket) -> within-bucket
pairwise, which bounds the pairwise work to bucket sizes.

Scores are float64 and rounded to 6 decimals BEFORE ranking so results
are reproducible against a DuckDB ``list_cosine_similarity`` oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dim = len(col[0]) if len(col) else 0
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norm == 0, 1, norm)



def _topk_group(group: pa.Table, k: int, score_col: str = "score",
                descending: bool = True) -> pa.Table:
    """Per-group top-k as one numpy lexsort + take — no pandas in the
    map_groups hot path (ties break by nid asc, same as the oracles)."""
    sc = group.column(score_col).to_numpy(zero_copy_only=False)
    nid = group.column("nid").to_numpy(zero_copy_only=False)
    order = np.lexsort((nid, -sc if descending else sc))[:k]
    return group.take(pa.array(order.astype(np.int64)))


def knn_search(ds, query_ref, k: int = 5, *, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Top-k cosine neighbors for each broadcast query vector.

    query_ref: ray.ObjectRef of (query_ids, query_matrix) — ray.put once
    on the driver — or the tuple itself for in-process use.
    Returns Dataset (qid, nid, score) with exactly k rows per query.
    """
    import ray

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        qids, qm = q
        qm = _normalize(np.asarray(qm, dtype=np.float64))
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        s = np.round(m @ qm.T, 6)  # (batch, nq)
        nq = len(qids)
        # per-batch partial top-k: only k best rows per query leave the task
        out_q, out_n, out_s = [], [], []
        for j in range(nq):
            sj = s[:, j]
            keep = np.ones(len(ids), dtype=bool)
            keep &= ids != qids[j]
            cand = np.flatnonzero(keep)
            if len(cand) > k:
                part = cand[np.argpartition(-sj[cand], k)[:k]]
            else:
                part = cand
            out_q.extend([qids[j]] * len(part))
            out_n.extend(ids[part].tolist())
            out_s.extend(sj[part].tolist())
        return pa.Table.from_pydict(
            {"qid": pa.array(out_q, type=pa.int64()), "nid": pa.array(out_n, type=pa.int64()),
             "score": pa.array(out_s, type=pa.float64())}
        )

    def topk(group: pa.Table) -> pa.Table:
        return _topk_group(group, k)

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(topk, batch_format="pyarrow")
    )


def embedding_dup_pairs(ds, threshold: float = 0.95, *, id_col: str = "vec_id",
                        emb_col: str = "embedding", matrix_ref=None):
    """Exact near-duplicate pairs (i<j, cosine>=threshold) by scoring
    each batch against the broadcast full matrix.  O(n^2) compute but
    streaming memory; oracle-able.  Use lsh_dup_pairs at scale."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        ids_all, m_all = (
            ray.get(matrix_ref) if isinstance(matrix_ref, ray.ObjectRef) else matrix_ref
        )
        m_all_n = _normalize(np.asarray(m_all, dtype=np.float64))
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        s = np.round(m @ m_all_n.T, 6)
        rows, cols = np.nonzero(s >= threshold)
        a = ids[rows]
        b = np.asarray(ids_all)[cols]
        keep = a < b  # i<j once, regardless of which batch saw it
        return pa.Table.from_pydict(
            {"a": pa.array(a[keep], type=pa.int64()), "b": pa.array(b[keep], type=pa.int64()),
             "score": pa.array(s[rows, cols][keep], type=pa.float64())}
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ivf_knn(ds, index_ref, k: int = 5, *, id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF (inverted-file) top-k cosine search — the ANN scale path.

    ``index_ref``: ray.ObjectRef (broadcast once) of
    ``(query_ids, query_matrix, centroids, probe_lists)`` where
    ``probe_lists[j]`` is the set of IVF list ids query j probes.  Each
    task assigns its batch rows to their nearest centroid (one matmul)
    and scores a row against query j only when the row's list is probed
    — with nprobe == nlist this is exhaustive and matches the exact
    brute-force oracle; smaller nprobe trades recall for a ~nlist/nprobe
    compute cut.  At 100 TB the assignment is precomputed once and the
    dataset hash-partitioned by list id so a probe touches only its
    buckets' blocks."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        qids, qm, cents, probes = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        qm = _normalize(np.asarray(qm, dtype=np.float64))
        cents = _normalize(np.asarray(cents, dtype=np.float64))
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        list_id = np.argmax(m @ cents.T, axis=1)
        s = np.round(m @ qm.T, 6)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids)):
            keep = np.isin(list_id, probes[j]) & (ids != qids[j])
            cand = np.flatnonzero(keep)
            if len(cand) > k:
                cand = cand[np.argpartition(-s[cand, j], k)[:k]]
            out_q.extend([qids[j]] * len(cand))
            out_n.extend(ids[cand].tolist())
            out_s.extend(s[cand, j].tolist())
        return pa.Table.from_pydict(
            {"qid": pa.array(out_q, type=pa.int64()), "nid": pa.array(out_n, type=pa.int64()),
             "score": pa.array(out_s, type=pa.float64())}
        )

    def topk(group: pa.Table) -> pa.Table:
        return _topk_group(group, k)

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(topk, batch_format="pyarrow")
    )


def ivf_partition(ds, centroids_ref, out_dir: str, *, emb_col: str = "embedding"):
    """Write the dataset hash-partitioned BY IVF LIST ID (hive layout,
    one directory per list) — the at-scale layout ``ivf_knn``'s
    docstring describes: centroid assignment runs once at build time,
    and a query's probes then READ only their lists' files instead of
    scanning every block.  Returns out_dir."""
    import ray

    def assign(batch: pa.Table) -> pa.Table:
        cents = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        cn = _normalize(np.asarray(cents, dtype=np.float64))
        m = _normalize(_emb_matrix(batch, emb_col))
        lid = np.argmax(m @ cn.T, axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lid))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["list_id"]
    )
    return out_dir


def ivf_knn_partitioned(index_dir: str, index_ref, k: int = 5, *, id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """Top-k cosine over an ``ivf_partition`` layout: ONLY the probed
    lists' partition directories are read — with nprobe < nlist whole
    buckets never leave storage (column/partition pruning at the read,
    the brief's 'prune at the read' rule applied to ANN).

    Returns (Dataset of (qid, nid, score), n_lists_read)."""
    import os

    import ray
    import ray.data as rd

    qids, qm, cents, probes = (
        ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
    )
    needed = sorted({int(l) for p in probes for l in np.asarray(p).tolist()})
    paths, lists_read = [], 0
    for l in needed:
        d = os.path.join(index_dir, f"list_id={l}")
        if os.path.isdir(d):
            lists_read += 1
            paths.extend(
                sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
            )
    ds = rd.read_parquet(paths)
    qn = _normalize(np.asarray(qm, dtype=np.float64))
    cn = _normalize(np.asarray(cents, dtype=np.float64))
    probe_sets = [set(int(x) for x in np.asarray(p).tolist()) for p in probes]

    def score(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # hive partitioning keeps list_id out of the data files; the
        # assignment is deterministic, so re-derive it (one tiny matmul)
        lids = np.argmax(m @ cn.T, axis=1).astype(np.int64)
        s = np.round(m @ qn.T, 6)
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids)):
            keep = np.isin(lids, list(probe_sets[j])) & (ids != qids[j])
            cand = np.flatnonzero(keep)
            if len(cand) > k:
                cand = cand[np.argpartition(-s[cand, j], k)[:k]]
            out_q.extend([qids[j]] * len(cand))
            out_n.extend(ids[cand].tolist())
            out_s.extend(s[cand, j].tolist())
        return pa.Table.from_pydict(
            {"qid": pa.array(out_q, type=pa.int64()), "nid": pa.array(out_n, type=pa.int64()),
             "score": pa.array(out_s, type=pa.float64())}
        )

    def topk(group: pa.Table) -> pa.Table:
        return _topk_group(group, k)

    out = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(topk, batch_format="pyarrow")
    )
    return out, lists_read


def build_ivf_probes(query_m: np.ndarray, centroids: np.ndarray, nprobe: int) -> list[np.ndarray]:
    """nprobe nearest centroid ids per query (driver-side, tiny)."""
    qn = _normalize(np.asarray(query_m, dtype=np.float64))
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    sims = qn @ cn.T
    order = np.argsort(-sims, axis=1)[:, :nprobe]
    return [order[j] for j in range(len(qn))]


class LshBucketer:
    """Random-hyperplane signature -> bucket key(s) (actor: planes built
    once).  With ``bands`` > 1 each vector lands in one bucket PER band
    (``planes`` bits each, band index packed into the key's high bits),
    so a pair is a candidate if ANY band agrees — the standard
    amplification that makes recall tunable to ~1 at a given cosine
    threshold: P(miss) = (1 - p^planes)^bands with p = 1 - theta/pi."""

    def __init__(self, dim: int, planes: int = 12, seed: int = 3, bands: int = 1):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bands * planes))
        self.r = planes
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, "embedding"))
        bits = (m @ self.planes) > 0  # (n, bands*r)
        n = len(m)
        keys = np.zeros((self.bands, n), dtype=np.int64)
        for b in range(self.bands):
            key = np.full(n, b << self.r, dtype=np.int64)
            for j in range(self.r):
                key |= bits[:, b * self.r + j].astype(np.int64) << j
            keys[b] = key
        if self.bands == 1:
            return batch.append_column("bucket", pa.array(keys[0]))
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), self.bands))
        out = batch.take(idx)
        return out.append_column("bucket", pa.array(keys.ravel()))


def lsh_dup_pairs(ds, dim: int, threshold: float = 0.95, planes: int = 12, seed: int = 3,
                  bands: int = 1):
    """Near-dup pairs via hyperplane LSH: same-bucket pairwise only.

    Every emitted pair carries its EXACT cosine (computed inside the
    bucket), so the output is a SUBSET of the exact all-pairs predicate
    ``cosine >= threshold``; with ``bands`` sized so the per-pair miss
    probability is negligible at the threshold, it EQUALS the exact set
    — which is what the DuckDB oracle checks (round-3: upgraded from
    rows-only).  Pairs found by several bands are deduped with a Ray
    groupby (no driver pandas)."""

    def pairwise(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.Table.from_pydict(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.float64())}
            )
        m = _normalize(_emb_matrix(group, "embedding"))
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = np.round(m @ m.T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = s[iu, ju] >= threshold
        a, b = ids[iu[mask]], ids[ju[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.Table.from_pydict(
            {"a": pa.array(lo, type=pa.int64()), "b": pa.array(hi, type=pa.int64()),
             "score": pa.array(s[iu, ju][mask], type=pa.float64())}
        )

    pairs = (
        ds.map_batches(
            LshBucketer,
            fn_constructor_kwargs=dict(dim=dim, planes=planes, seed=seed, bands=bands),
            batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
        )
        .groupby("bucket")
        .map_groups(pairwise, batch_format="pyarrow")
    )
    if bands > 1:
        from .dedup import _dedup_pair_stream

        pairs = _dedup_pair_stream(pairs)
    return pairs


def kmeans_clusters(ds, k: int = 4, iters: int = 2, *, id_col: str = "vec_id",
                    emb_col: str = "embedding"):
    """Deterministic Lloyd k-means over an embedding column — the
    corpus-clustering stage of a curation pipeline (domain balancing,
    cluster-based sampling).

    Distributed shape: centroids broadcast via ``ray.put`` each round;
    per batch one vectorized argmin assignment plus O(k x d) partial
    (cluster, dim, sum, count) rows; the groupby exchange moves
    O(batches x k x d) scalars and the embedding payload never
    shuffles.  The driver folds only the k x d centroid table.

    Determinism / oracle-parity protocol (mirrors the DuckDB SQL):
    init = the embeddings of the k smallest ids; squared-L2 distances
    rounded to 6 decimals with ties broken by lowest cluster id;
    centroid updates rounded to 6 decimals; clusters that lose all
    members drop out.  Rounding makes both sides agree despite float
    summation-order differences.
    """
    import ray
    from ray.data.aggregate import Sum

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6

    init = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b.column(id_col), k)).select([id_col, emb_col]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values(id_col)
    )
    cids = init[id_col].to_numpy().astype(np.int64)
    cent = np.stack([np.asarray(v, dtype=np.float64) for v in init[emb_col]])

    def _assign(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # same elementwise formula as the SQL: sum_j (x_j - c_j)^2
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
        d2 = np.floor(d2 * 1e6 + 0.5) / 1e6  # >= 0: half-away == half-up
        return d2.argmin(axis=1)  # first min == lowest cluster id

    for _ in range(iters - 1):
        cent_ref = ray.put((cids, cent))

        def partial(batch: pa.Table) -> pa.Table:
            cids_s, c = ray.get(cent_ref)
            m = _emb_matrix(batch, emb_col)
            a = _assign(m, c)
            rows = {"cluster": [], "dim": [], "s": [], "n": []}
            for ci in range(len(cids_s)):  # k iterations of vectorized ops
                sel = m[a == ci]
                if not len(sel):
                    continue
                s = sel.sum(axis=0)
                rows["cluster"].extend([int(cids_s[ci])] * m.shape[1])
                rows["dim"].extend(range(m.shape[1]))
                rows["s"].extend(s.tolist())
                rows["n"].extend([len(sel)] * m.shape[1])
            return pa.Table.from_pydict(
                {
                    "cluster": pa.array(rows["cluster"], type=pa.int64()),
                    "dim": pa.array(rows["dim"], type=pa.int64()),
                    "s": pa.array(rows["s"], type=pa.float64()),
                    "n": pa.array(rows["n"], type=pa.int64()),
                }
            )

        upd = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["cluster", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .to_pandas()  # O(k x d) rows
            .sort_values(["cluster", "dim"])
        )
        cids = upd["cluster"].to_numpy()[:: cent.shape[1]].astype(np.int64)
        cent = _r6(
            (upd["s"].to_numpy() / upd["n"].to_numpy()).reshape(len(cids), cent.shape[1])
        )

    cent_ref = ray.put((cids, cent))

    def label(batch: pa.Table) -> pa.Table:
        cids_s, c = ray.get(cent_ref)
        m = _emb_matrix(batch, emb_col)
        a = _assign(m, c)
        return pa.Table.from_pydict(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "cluster": pa.array(cids_s[a], type=pa.int64()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------- product quantization


def pq_train(ds, *, m: int = 8, k: int = 16, iters: int = 2,
             id_col: str = "vec_id", emb_col: str = "embedding") -> np.ndarray:
    """Deterministic PQ codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" — public algorithm,
    original vectorized implementation): the embedding is split into
    ``m`` subspaces and each gets a k-means codebook of ``k`` entries.

    Distributed shape mirrors kmeans_clusters: codebooks broadcast per
    round, each batch emits O(m x k x d/m) = O(k x d) partial
    (sub, cluster, dim, s, n) sums across ALL subspaces in one pass,
    the groupby exchange moves those scalars, and the driver folds only
    the m x k x d/m codebook tensor.  Same determinism protocol too:
    init = subvectors of the k smallest ids, squared-L2 rounded to 6
    decimals (ties to the lowest code), centroid updates rounded to 6
    decimals; a code that loses all members keeps its previous centroid
    (codes must stay index-stable, unlike kmeans cluster drop-out).
    """
    import ray
    from ray.data.aggregate import Sum

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6

    init = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b.column(id_col), k)).select([id_col, emb_col]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values(id_col)
    )
    full = np.stack([np.asarray(v, dtype=np.float64) for v in init[emb_col]])
    d = full.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    cb = full.reshape(k, m, dsub).transpose(1, 0, 2).copy()  # (m, k, dsub)

    for _ in range(max(0, iters - 1)):
        cb_ref = ray.put(cb)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cb_ref)
            mat = _emb_matrix(batch, emb_col).reshape(-1, m, dsub)
            codes = pq_assign(mat, c)
            S = np.zeros((m, k, dsub), dtype=np.float64)
            N = np.zeros((m, k), dtype=np.int64)
            for s in range(m):  # m iterations of vectorized adds
                np.add.at(S[s], codes[:, s], mat[:, s, :])
                np.add.at(N[s], codes[:, s], 1)
            sub_i, code_i, dim_i = np.meshgrid(
                np.arange(m), np.arange(k), np.arange(dsub), indexing="ij"
            )
            return pa.Table.from_pydict(
                {
                    "sub": pa.array(sub_i.ravel(), type=pa.int64()),
                    "code": pa.array(code_i.ravel(), type=pa.int64()),
                    "dim": pa.array(dim_i.ravel(), type=pa.int64()),
                    "s": pa.array(S.ravel(), type=pa.float64()),
                    "n": pa.array(np.repeat(N.ravel(), dsub), type=pa.int64()),
                }
            )

        upd = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["sub", "code", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .to_pandas()  # O(m x k x dsub) rows
            .sort_values(["sub", "code", "dim"])
        )
        S = upd["s"].to_numpy().reshape(m, k, dsub)
        N = upd["n"].to_numpy().reshape(m, k, dsub)[:, :, 0]
        nz = N > 0
        cb = cb.copy()
        cb[nz] = _r6(S[nz] / N[nz][:, None])
    return cb


def pq_assign(mat3: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, m, dsub) subvectors -> (n, m) int codes; rounded squared-L2
    argmin, first (lowest) code wins ties — the shared determinism
    contract between train, encode and the pure-python test reference."""
    d2 = ((mat3[:, :, None, :] - cb[None]) ** 2).sum(-1)  # (n, m, k)
    d2 = np.floor(d2 * 1e6 + 0.5) / 1e6
    return d2.argmin(axis=2)


def pq_codes(ds, cb_ref, *, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Dataset (vec_id, codes list<int8>) — the compressed vectors.
    64 float32 dims -> m int8 codes = 32x compression at m=8."""
    import ray

    def enc(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) else cb_ref
        m, _, dsub = cb.shape
        mat = _emb_matrix(batch, emb_col).reshape(-1, m, dsub)
        codes = pq_assign(mat, cb).astype(np.int8)
        n = len(codes)
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
            pa.array(codes.ravel()),
        )
        return pa.Table.from_pydict(
            {id_col: pc.cast(batch.column(id_col), pa.int64()), "codes": arr}
        )

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_knn(ds, cb_ref, query_ref, k: int = 5, *, id_col: str = "vec_id",
           emb_col: str = "embedding"):
    """Asymmetric-distance (ADC) top-k: each query precomputes an
    (m x k) lookup table of subspace distances to the codebooks; a
    batch's score is m table gathers summed — never a full-dimension
    dot product against the corpus.  Same partial-top-k shape as
    knn_search: only k rows per (query, block) leave the task."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) else cb_ref
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        qids, qm = q
        m, _, dsub = cb.shape
        qm3 = np.asarray(qm, dtype=np.float64).reshape(len(qids), m, dsub)
        # LUT[qi, s, code] = ||q_sub - cb[s, code]||^2, rounded like assign
        lut = ((qm3[:, :, None, :] - cb[None]) ** 2).sum(-1)
        lut = np.floor(lut * 1e6 + 0.5) / 1e6
        mat = _emb_matrix(batch, emb_col).reshape(-1, m, dsub)
        codes = pq_assign(mat, cb)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nq, n = len(qids), len(ids)
        adc = np.zeros((nq, n), dtype=np.float64)
        for s in range(m):  # m gathers, no full-dim math
            adc += lut[:, s, codes[:, s]]
        out_q, out_n, out_s = [], [], []
        for j in range(nq):
            dj = adc[j]
            cand = np.flatnonzero(ids != qids[j])
            if len(cand) > k:
                part = cand[np.argpartition(dj[cand], k)[:k]]
            else:
                part = cand
            out_q.extend([qids[j]] * len(part))
            out_n.extend(ids[part].tolist())
            out_s.extend(dj[part].tolist())
        return pa.Table.from_pydict(
            {"qid": pa.array(out_q, type=pa.int64()), "nid": pa.array(out_n, type=pa.int64()),
             "adc_dist": pa.array(np.round(out_s, 6), type=pa.float64())}
        )

    def topk(group: pa.Table) -> pa.Table:
        return _topk_group(group, k, score_col="adc_dist", descending=False)

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(topk, batch_format="pyarrow")
    )


def ivf_pq_build(ds, centroids_ref, cb_ref, out_dir: str, *,
                 id_col: str = "vec_id", emb_col: str = "embedding") -> str:
    """Codes-only IVF-PQ index (the billion-scale ANN layout: IVF gives
    list pruning, PQ gives in-list compression — Jégou et al. 2011 §IV,
    combined here as an original Ray Data pipeline): each vector lands
    in its nearest-centroid hive directory carrying ONLY
    ``(vec_id, codes list<int8>, lid)`` — the raw embedding never enters
    the index, so at m=32/dim=64-float32 the index is ~8x smaller than
    the vectors and a probe reads just its lists' files.  ``lid``
    duplicates the hive key INSIDE the data files so per-query probe
    masking needs no re-derivation at search time (the raw vector that
    ivf_knn_partitioned re-derives from is gone by design).

    Build is one stateless map_batches pass (two matmuls per batch:
    centroid assign + code assign) + a partitioned write; no shuffle."""
    import ray

    def assign(batch: pa.Table) -> pa.Table:
        cents = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        cb = ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) else cb_ref
        m_sub, _, dsub = cb.shape
        raw = _emb_matrix(batch, emb_col)
        lid = np.argmax(_normalize(raw) @ _normalize(
            np.asarray(cents, dtype=np.float64)).T, axis=1).astype(np.int64)
        codes = pq_assign(raw.reshape(-1, m_sub, dsub), cb).astype(np.int8)
        n = len(codes)
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * m_sub, m_sub, dtype=np.int32)),
            pa.array(codes.ravel()),
        )
        return pa.Table.from_pydict(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "codes": arr,
                "lid": pa.array(lid, type=pa.int64()),
                "list_id": pa.array(lid, type=pa.int64()),
            }
        )

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["list_id"]
    )
    return out_dir


def ivf_pq_knn(index_dir: str, cb_ref, query_ref, probes, k: int = 5, *,
               id_col: str = "vec_id"):
    """ADC top-k over an ``ivf_pq_build`` layout: only the probed lists'
    code files are read (partition pruning at the read), each query
    masks candidates to ITS probe set via the stored ``lid``, and
    scoring is m LUT gathers per point — never a full-dimension product,
    never a raw-vector read.  With nprobe == nlist the result is
    bit-identical to ``pq_knn`` over the raw dataset (equivalence
    property-tested); smaller nprobe trades recall for reading
    ~nprobe/nlist of the index.

    Returns (Dataset of (qid, nid, adc_dist), n_lists_read)."""
    import os

    import ray
    import ray.data as rd

    qids, qm = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
    cb = ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) else cb_ref
    m_sub, _, dsub = cb.shape
    needed = sorted({int(l) for p in probes for l in np.asarray(p).tolist()})
    paths, lists_read = [], 0
    for l in needed:
        d = os.path.join(index_dir, f"list_id={l}")
        if os.path.isdir(d):
            lists_read += 1
            paths.extend(
                sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
            )
    if not paths:
        return rd.from_items([]), 0
    ds = rd.read_parquet(paths, columns=[id_col, "codes", "lid"])

    qm3 = np.asarray(qm, dtype=np.float64).reshape(len(qids), m_sub, dsub)
    lut = ((qm3[:, :, None, :] - cb[None]) ** 2).sum(-1)
    lut = np.floor(lut * 1e6 + 0.5) / 1e6  # pq_assign's rounding contract
    probe_sets = [
        np.asarray(sorted(int(x) for x in np.asarray(p).tolist()), dtype=np.int64)
        for p in probes
    ]
    lut_ref = ray.put((lut, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        lut_, psets = ray.get(lut_ref)
        col = batch.column("codes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = (
            col.flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64).reshape(batch.num_rows, m_sub)
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lids = batch.column("lid").to_numpy(zero_copy_only=False)
        nq = len(qids)
        adc = np.zeros((nq, len(ids)), dtype=np.float64)
        for s in range(m_sub):  # same gather order as pq_knn -> identical sums
            adc += lut_[:, s, codes[:, s]]
        out_q, out_n, out_s = [], [], []
        for j in range(nq):
            in_probe = np.isin(lids, psets[j], assume_unique=False)
            cand = np.flatnonzero(in_probe & (ids != qids[j]))
            if len(cand) > k:
                cand = cand[np.argpartition(adc[j, cand], k)[:k]]
            out_q.extend([qids[j]] * len(cand))
            out_n.extend(ids[cand].tolist())
            out_s.extend(adc[j, cand].tolist())
        return pa.Table.from_pydict(
            {"qid": pa.array(out_q, type=pa.int64()), "nid": pa.array(out_n, type=pa.int64()),
             "adc_dist": pa.array(np.round(out_s, 6), type=pa.float64())}
        )

    def topk(group: pa.Table) -> pa.Table:
        return _topk_group(group, k, score_col="adc_dist", descending=False)

    out = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(topk, batch_format="pyarrow")
    )
    return out, lists_read
