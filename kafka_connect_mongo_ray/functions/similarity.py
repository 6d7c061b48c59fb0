"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — per-batch float64 matmul against
the broadcast query matrix (``ray.put`` once, fetched in actor
``__init__``), local top-k per batch, tiny global reduce of
batch-local results on the driver. Scale path: LSH hyperplane
bucketing so each query only scans matching buckets (recall < 1,
documented knob).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_connect_mongo_ray.utils import embedding_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def memory_derived_row_cap(bytes_per_row: float, *,
                           heap_fraction: float = 0.25,
                           working_set_factor: float = 6.0,
                           default: int = 100_000,
                           floor: int = 10_000,
                           ceiling: int = 2_000_000) -> int:
    """Rows one ``map_groups`` task may materialize, derived from the
    cluster's per-CPU memory share instead of a guessed constant: the
    knob NEXT.md flagged after BUCKET_PAIR_CAP landed. A group task
    gets ~(cluster memory / cluster CPUs); of that it may spend
    ``heap_fraction`` on the group, and each Arrow row expands by
    ``working_set_factor`` while scoring (float64 cast of a float32
    embedding is 2x, the normalized copy 2x more, scores + top-k
    scratch the rest). Falls back to ``default`` when Ray is not
    initialized or the estimate degenerates; clamped to
    [``floor``, ``ceiling``] so a mis-measured bytes/row can neither
    serialize the scan into thousands of sub-groups nor un-bound it."""
    import ray

    if bytes_per_row <= 0 or not ray.is_initialized():
        return default
    res = ray.cluster_resources()
    mem, cpus = res.get("memory"), res.get("CPU")
    if not mem or not cpus:
        return default
    per_task = mem / cpus * heap_fraction
    cap = int(per_task / (bytes_per_row * working_set_factor))
    return max(floor, min(cap, ceiling))


def _subsplit_oversized_groups(bucketed, bucket_col: str, id_col: str,
                               cap: int | str | None):
    """Bound the rows any ``groupby(bucket).map_groups`` task must
    materialize: a hot LSH bucket (corpus/2^planes on average, far more
    under skew) or a fat IVF cell would otherwise land WHOLE in one
    task and OOM a worker at corpus scale — the same failure mode
    ``BUCKET_PAIR_CAP`` guards in functions/dedup.py.

    Mechanics: one cheap column-pruned counting pass (each batch emits
    ≤ #distinct-buckets partial rows; only those tiny partials shuffle,
    and the driver holds one count per non-empty bucket — bounded by
    2^num_planes / num_cells, never by corpus size), then a map adds
    ``__sub = hash64(id) % ceil(n_bucket / cap)`` so the downstream
    groupby on (bucket, __sub) sees ≤ ~cap rows per task. Scoring is
    per-row, so partitioning a bucket's candidate set is semantics-free
    for top-k: every sub-group emits its local top-k and the global
    final reduce re-merges. Returns (ds, group_keys).

    ``bucketed`` is materialized first (the repo's multi-consumer
    staging rule): the counting pass and the downstream per-group scan
    both start from the same cached blocks instead of re-running the
    upstream read + bucket/cell assign."""
    if cap is None:
        return bucketed, [bucket_col]
    bucketed = bucketed.materialize()
    if cap == "auto":
        # bytes/row measured from the materialized blocks' metadata —
        # free, and reflects the ACTUAL embedding width in flight
        n = bucketed.count()
        cap = memory_derived_row_cap(
            bucketed.size_bytes() / n if n else 0.0)
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch[bucket_col], dtype=np.int64)
        u, c = np.unique(b, return_counts=True)
        return pa.table({bucket_col: pa.array(u.astype(np.int32)),
                         "n": pa.array(c, pa.int64())})

    counts = (bucketed.select_columns([bucket_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(bucket_col).aggregate(Sum("n", alias_name="n"))
              .take_all())
    splits = {int(r[bucket_col]): max(1, -(-int(r["n"]) // cap))
              for r in counts}
    if all(s == 1 for s in splits.values()):
        return bucketed, [bucket_col]

    def add_sub(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch[bucket_col], dtype=np.int64)
        nsplit = np.fromiter((splits.get(int(x), 1) for x in b),
                             dtype=np.int64, count=len(b))
        h = pd.util.hash_array(np.asarray(batch[id_col]), categorize=False)
        sub = (h % nsplit.astype(np.uint64)).astype(np.int32)
        return batch.append_column("__sub", pa.array(sub))

    return (bucketed.map_batches(add_sub, batch_format="pyarrow"),
            [bucket_col, "__sub"])


def _deterministic_sample(ds, *, id_col: str, sample_size: int,
                          total_rows: int | None = None) -> pa.Table:
    """Order-independent bounded sample: keep rows whose integer id is
    ≡ 0 (mod ⌈N / sample_size⌉), then sort by id and cut to
    ``sample_size``. Membership is a pure function of the id, so the
    sample is IDENTICAL across runs, partitionings, and executor
    scheduling — unlike ``ds.limit(n)``, whose row set can vary with
    block completion order under load (observed flipping an IVF recall
    gate under concurrent sessions). The CEILING stride makes the
    picks span the whole id range (≤ sample_size of them), so the
    final cut is a safeguard, not an id-prefix truncation.

    Pass ``total_rows`` when the caller can count cheaply (parquet
    footer metadata) — ``ds.count()`` on a mapped dataset executes the
    whole upstream pipeline. Driver holds ≤ ~sample_size rows."""
    n = total_rows if total_rows is not None else ds.count()
    stride = max(1, -(-n // sample_size)) if sample_size > 0 else max(1, n)

    def pick(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col])
        return batch.filter(pa.array(ids % stride == 0))

    tbl = pa.concat_tables(
        ds.map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    return tbl.sort_by([(id_col, "ascending")]).slice(0, sample_size)


class BruteForceTopK:
    """Per-batch scorer: emits (query_id, neighbor_id, cosine) rows for
    the batch-local top-k; the global top-k is a small final reduce."""

    def __init__(self, queries_ref, query_ids_ref, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = np.asarray(ray.get(queries_ref), dtype=np.float64)
        self.q = _normalize(q)
        self.query_ids = np.asarray(ray.get(query_ids_ref))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col])
        vecs = embedding_matrix(batch[self.vec_col])  # zero-copy flatten
        sims = self.q @ _normalize(vecs).T  # (Q, B)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in top[qi]:
                rows_q.append(int(self.query_ids[qi]))
                rows_n.append(int(ids[j]))
                rows_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "neighbor_id": pa.array(rows_n, pa.int64()),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )


def brute_force_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, k: int = 10,
                     *, id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Global exact top-k per query. The per-batch stage streams; only
    Q×k×num_batches candidate rows reach the driver.

    Elastic TASKS, not an actor pool: the per-task state (one
    broadcast `ray.get` of the query matrix + its norm precompute,
    O(Q·dim)) is trivial next to the O(Q·corpus·dim) scan, and the
    pool's 1→N ramp dominated short jobs — measured 2.0-2.1 s actor
    pool vs 0.5-1.6 s tasks on the sf0.1 gate input (the same finding
    that made apply/analyze default to tasks). The broadcast refs are
    still shared: every task reads the same plasma objects zero-copy."""
    import ray

    qref = ray.put(np.asarray(query_matrix))
    iref = ray.put(np.asarray(query_ids))

    def score(batch: pa.Table) -> pa.Table:
        return BruteForceTopK(queries_ref=qref, query_ids_ref=iref, k=k,
                              id_col=id_col, vec_col=vec_col)(batch)

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def lsh_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, *, k: int,
             dim: int, num_planes: int = 8, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probe_bits: int = 1,
             group_row_cap: int | str | None = "auto"):
    """Approximate top-k: bucket the corpus by LSH hyperplane signs,
    then each bucket group scans ONLY the queries that probe it —
    per-query work drops from O(corpus) to O(corpus · probes / 2^planes).
    Query-side multiprobe (``probe_bits=1``): each query also probes
    every bucket at hamming distance ≤ 1 from its own — recall rises
    with zero corpus duplication. Recall < 1 by construction; measured
    against :func:`brute_force_topk` in the gate query. Returns
    (query_id, rank, neighbor_id) with a global final reduce (only
    Q × k × probed-buckets candidate rows reach the driver).

    ``group_row_cap`` bounds per-task memory ("auto" derives the cap
    from the cluster's per-CPU memory share and the measured bytes/row,
    :func:`memory_derived_row_cap`): buckets larger than the cap are
    hash-split into sub-groups before the per-bucket scan
    (:func:`_subsplit_oversized_groups`) — output-identical, since each
    sub-group's local top-k feeds the same final reduce."""
    import pandas as pd

    bucketer = LshBucketer(dim=dim, num_planes=num_planes, seed=seed, vec_col=vec_col)
    q = np.asarray(query_matrix, dtype=np.float64)
    qn = _normalize(q)
    q_signs = (q @ bucketer.planes.T) > 0
    q_buckets = (q_signs.astype(np.uint32)
                 << np.arange(q_signs.shape[1], dtype=np.uint32)).sum(axis=1).astype(np.int32)
    by_bucket: dict[int, list[int]] = {}
    for qi, b in enumerate(q_buckets):
        probes = {int(b)}
        if probe_bits >= 1:
            probes |= {int(b) ^ (1 << p) for p in range(num_planes)}
        for pb in probes:
            by_bucket.setdefault(pb, []).append(qi)

    # instance (not class) → plain tasks; the plane matrix is tiny and
    # ships with the task spec
    bucketed = ds.map_batches(bucketer, batch_format="pyarrow")

    def search_bucket(g: pa.Table) -> pd.DataFrame:
        b = int(g["lsh_bucket"][0].as_py())
        qidx = by_bucket.get(b)
        if not qidx:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        vecs = _normalize(embedding_matrix(g[vec_col]))
        ids = np.asarray(g[id_col])
        sims = qn[qidx] @ vecs.T
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for row_i, qi in enumerate(qidx):
            for j in top[row_i]:
                rows.append((int(query_ids[qi]), int(ids[j]), float(sims[row_i, j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    split_ds, group_keys = _subsplit_oversized_groups(
        bucketed, "lsh_bucket", id_col, group_row_cap)
    cand = split_ds.groupby(group_keys).map_groups(
        search_bucket, batch_format="pyarrow").to_pandas()
    cand = cand.drop_duplicates(["query_id", "neighbor_id"])
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "neighbor_id"]]


def kmeans_centroids(sample: np.ndarray, k: int, *, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Seeded mini k-means (k-means++-style init) for IVF coarse
    quantization. Deterministic; runs on a driver-side sample."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    centroids = [x[rng.integers(len(x))]]
    for _ in range(1, k):
        d = 1.0 - np.max(np.stack([x @ c for c in centroids]), axis=0)
        d = np.maximum(d, 0)
        probs = d / max(d.sum(), 1e-12)
        centroids.append(x[rng.choice(len(x), p=probs)])
    c = np.stack(centroids)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = _normalize(x[m].mean(axis=0, keepdims=True))[0]
    return c


class IvfAssigner:
    """Adds ``ivf_cell`` = nearest-centroid id per row; centroids are
    broadcast once (``ray.put``) and fetched in ``__init__``."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray

        self.centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(embedding_matrix(batch[self.vec_col]))
        cell = np.argmax(vecs @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))


def ivf_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, *, k: int,
             num_cells: int = 16, nprobe: int = 2, sample_size: int = 2000,
             seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
             group_row_cap: int | str | None = "auto",
             total_rows: int | None = None):
    """IVF approximate top-k: coarse-quantize the corpus into
    ``num_cells`` k-means cells, then each query scans only its
    ``nprobe`` nearest cells. Recall grows with nprobe; nprobe =
    num_cells degrades to exact. Returns (query_id, rank, neighbor_id).

    ``group_row_cap`` hash-splits fat cells before the per-cell scan
    (:func:`_subsplit_oversized_groups`): per-task rows stay bounded
    and the output is identical because each sub-group's local top-k
    feeds the same final reduce."""
    import pandas as pd
    import ray

    # bounded driver-side sample (sample_size rows, not the corpus)
    sample_tbl = _deterministic_sample(ds, id_col=id_col,
                                       sample_size=sample_size,
                                       total_rows=total_rows)
    sample = embedding_matrix(sample_tbl[vec_col])
    centroids = kmeans_centroids(sample, num_cells, seed=seed)
    cref = ray.put(centroids)

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(q_cells):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)

    assigned = ds.map_batches(
        IvfAssigner, fn_constructor_kwargs={"centroids_ref": cref, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def search_cell(g: pa.Table) -> pd.DataFrame:
        cell = int(g["ivf_cell"][0].as_py())
        qidx = cell_to_queries.get(cell)
        if not qidx:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        vecs = _normalize(embedding_matrix(g[vec_col]))
        ids = np.asarray(g[id_col])
        sims = q[qidx] @ vecs.T
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for row_i, qi in enumerate(qidx):
            for j in top[row_i]:
                rows.append((int(query_ids[qi]), int(ids[j]), float(sims[row_i, j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    split_ds, group_keys = _subsplit_oversized_groups(
        assigned, "ivf_cell", id_col, group_row_cap)
    cand = split_ds.groupby(group_keys).map_groups(
        search_cell, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "neighbor_id"]]


class LshBucketer:
    """Random-hyperplane LSH bucket id per row (seeded, deterministic).

    Adding ``lsh_bucket`` lets a downstream groupby co-locate similar
    vectors: queries then scan only their own bucket (and optionally
    neighboring buckets by flipping low-margin bits) instead of the
    full corpus — the IVF-style scale path.
    """

    def __init__(self, dim: int, num_planes: int = 8, seed: int = 42,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_planes, dim))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = embedding_matrix(batch[self.vec_col])
        signs = (vecs @ self.planes.T) > 0
        bucket = (signs.astype(np.uint32) << np.arange(signs.shape[1], dtype=np.uint32)).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket.astype(np.int32)))


def group_centroids(ds, group_col: str, *, vec_col: str = "embedding",
                    round_to: int = 6, num_partitions: int | None = None):
    """Per-group embedding centroid (mean vector) — the vector
    AGGREGATION primitive (class prototypes, per-language embedding
    means, k-means M-step). Output is exploded to (group, dim, value)
    rows with 1-based dims so the result is directly comparable to a
    SQL unnest oracle.

    Distributed shape: each batch reduces to (groups-in-batch × dim)
    partial-sum rows — fact-sized input collapses before the one
    groupby, whose volume is groups × dim regardless of row count. The
    float mean is rounded to ``round_to`` to absorb summation-order
    differences (exact-sum parity would need integer scaling)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch[vec_col]).astype(np.float64)
        codes, uniq = pd.factorize(batch[group_col].to_pandas())
        d = m.shape[1]
        sums = np.empty((len(uniq), d), dtype=np.float64)
        for g in range(len(uniq)):
            sums[g] = m[codes == g].sum(axis=0)
        cnts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            group_col: pa.array(np.repeat(np.asarray(uniq, dtype=object), d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(cnts, d), pa.int64()),
        })

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([group_col, "dim"], **kwargs)
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        val = pc.round(pc.divide(batch["s"], pc.cast(batch["n"], pa.float64())),
                       round_to, round_mode="half_towards_infinity")
        return pa.table({group_col: batch[group_col], "dim": batch["dim"],
                         "value": val})

    return agg.map_batches(finish, batch_format="pyarrow")


def kmeans_cluster_summary(ds, *, k: int = 8, sample_size: int = 2000,
                           vec_col: str = "embedding", seed: int = 42,
                           id_col: str = "vec_id",
                           total_rows: int | None = None):
    """Distributed k-means clustering pass with a machine-checkable
    summary: centroids fit on a bounded driver-side sample
    (:func:`kmeans_centroids`, same pattern as IVF), every vector
    assigned to its nearest centroid in one broadcast ``map_batches``
    sweep, and cluster tightness reduced to one row —
    ``mean_best_cos`` (mean cosine to the best candidate direction) vs
    ``mean_global_cos`` (mean cosine to the normalized global mean,
    the k=1 baseline). The global-mean direction is itself one of the
    candidate directions (best = max over centroids ∪ {gmean}), so
    ``improved`` (best ≥ global) holds BY CONSTRUCTION for every
    vector — including out-of-sample ones the bounded fitting sample
    never saw; an oracle checks (k, n, improved).

    Scale shape: sample → driver once (bounded); centroid matrix
    broadcast via ``ray.put``; both reductions are Sum-aggregates of
    per-batch scalars."""
    import ray
    from ray.data.aggregate import Sum

    if id_col in ds.schema().names:
        sample_tbl = _deterministic_sample(ds, id_col=id_col,
                                           sample_size=sample_size,
                                           total_rows=total_rows)
    else:
        # no stable id to key the sample on: first-rows fallback (row
        # set may vary with scheduling, but `improved` holds by
        # construction for ANY sample, so the summary stays valid)
        sample_tbl = pa.concat_tables(
            ds.limit(sample_size).iter_batches(batch_size=None,
                                               batch_format="pyarrow"))
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in sample_tbl[vec_col].to_pylist()])
    centroids = kmeans_centroids(sample, k, seed=seed)

    # k=1 baseline direction: normalized mean of the sample (the
    # global mean estimated from the same bounded sample, so the
    # summary is deterministic and replayable)
    gmean = _normalize(_normalize(sample).mean(axis=0, keepdims=True))[0]
    c_ref = ray.put(centroids)
    g_ref = ray.put(gmean)

    class Scorer:
        def __init__(self):
            self.c = np.asarray(ray.get(c_ref), dtype=np.float64)
            self.g = np.asarray(ray.get(g_ref), dtype=np.float64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from kafka_connect_mongo_ray.utils import embedding_matrix

            v = _normalize(embedding_matrix(batch[vec_col]))
            glob = v @ self.g
            # gmean is a candidate direction: best >= glob structurally
            best = np.maximum(np.max(v @ self.c.T, axis=1), glob)
            return pa.table({
                "n": pa.array([v.shape[0]], pa.int64()),
                "best": pa.array([float(best.sum())], pa.float64()),
                "glob": pa.array([float(glob.sum())], pa.float64()),
            })

    agg = ds.map_batches(Scorer, batch_format="pyarrow",
                         concurrency=(1, 8)).aggregate(
        Sum("n", alias_name="n"), Sum("best", alias_name="best"),
        Sum("glob", alias_name="glob"))
    n = int(agg["n"])
    improved = bool(agg["best"] / n >= agg["glob"] / n)
    return pa.table({"k": pa.array([k], pa.int64()),
                     "n": pa.array([n], pa.int64()),
                     "improved": pa.array([improved], pa.bool_())})


def pca_power_iteration(ds, *, vec_col: str = "embedding",
                        iters: int = 6):
    """Distributed top-principal-component via power iteration over the
    (centered) covariance — the iterative-linear-algebra shape nothing
    else in the registry exercises. Each iteration is ONE pass over
    the vectors: per batch s_partial = Xᵀ(Xv) (a d-vector), reduced
    through a d-domain (i, val) exchange; the covariance action is
    Σv = s/n − μ(μᵀv), so the full matrix is never formed and nothing
    fact-sized gathers. The driver holds only d-sized vectors (d = the
    embedding width).

    The machine-checked claim (the HLL ±5% precedent): the iterate is
    SEEDED with the highest-variance coordinate axis, and the Rayleigh
    quotient of power iteration on a PSD matrix is monotonically
    non-decreasing — so rq ≥ max-axis-variance holds by construction
    (up to float-reduction jitter; checked with 1e-9 relative slack).
    Returns one row: (dim, n_vectors, rq_ge_axis).

    Scale note: iterative operators scan the input once PER ITERATION
    (iters ≈ 6 here); the input read is column-pruned to the vector
    column, and each pass's exchange is d-domain-bounded."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.utils import embedding_matrix

    def _first_pass(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch[vec_col])
        d = x.shape[1]
        idx = np.arange(d, dtype=np.int64)
        return pa.table({
            "i": pa.array(np.concatenate([idx, idx, [d]])),
            "s": pa.array(np.concatenate([x.sum(axis=0),
                                          (x * x).sum(axis=0),
                                          [float(x.shape[0])]])),
            "kind": pa.array(["sum"] * d + ["sq"] * d + ["n"]),
        })

    stats = (ds.map_batches(_first_pass, batch_format="pyarrow")
             .groupby(["kind", "i"]).aggregate(Sum("s", alias_name="s"))
             .to_pandas())
    n = float(stats.loc[stats["kind"] == "n", "s"].iloc[0])
    sums = (stats[stats["kind"] == "sum"].sort_values("i")["s"]
            .to_numpy(dtype=np.float64))
    sqs = (stats[stats["kind"] == "sq"].sort_values("i")["s"]
           .to_numpy(dtype=np.float64))
    d = sums.shape[0]
    mu = sums / n
    axis_var = sqs / n - mu * mu
    seed_axis = int(np.argmin(-axis_var))  # argmax, first on ties
    max_axis_var = float(axis_var[seed_axis])

    v = np.zeros(d, dtype=np.float64)
    v[seed_axis] = 1.0

    def _matvec_pass(v_now: np.ndarray):
        def partial(batch: pa.Table) -> pa.Table:
            x = embedding_matrix(batch[vec_col])
            xv = x @ v_now
            return pa.table({"i": pa.array(np.arange(d, dtype=np.int64)),
                             "s": pa.array(x.T @ xv)})

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("i").aggregate(Sum("s", alias_name="s"))
               .to_pandas().sort_values("i"))
        return agg["s"].to_numpy(dtype=np.float64)

    rq = max_axis_var
    for _ in range(iters):
        sigma_v = _matvec_pass(v) / n - mu * float(mu @ v)
        rq = float(v @ sigma_v)
        norm = float(np.linalg.norm(sigma_v))
        if norm == 0.0:
            break
        v = sigma_v / norm

    ok = bool(rq >= max_axis_var * (1.0 - 1e-9))
    return pa.table({"dim": pa.array([d], pa.int64()),
                     "n_vectors": pa.array([int(n)], pa.int64()),
                     "rq_ge_axis": pa.array([ok], pa.bool_()),
                     "rq": pa.array([rq], pa.float64())})
