"""Lloyd's k-means as a declarative DataFrame loop — reference-exact semantics.

This is the fidelity layer: it reproduces the *intended* semantics of the
reference MapReduce job (LucaArduini/k-means_in_MapReduce,
``kmeans/src/main/java/it/unipi/hadoop/KMeans.java``) using only built-in
Catalyst expressions and ``groupBy().agg()``:

- random-k-rows init, seeded (reference C1, ``KMeans.java:276-312`` — the
  reference's ``Random`` is unseeded; we take an explicit seed so runs are
  deterministic and testable)
- per-row nearest-centroid assignment with lowest-index tie-break
  (``Point.java:57-71``)
- per-cluster (sum, count) clustering feature -> mean
  (``ClusteringFeature.java:8-70``). Spark's HashAggregate partial mode IS
  the reference's in-mapper combiner (``KMeans.java:33-67``): partial
  (sum,count) per task, shuffle O(tasks·k·d), final merge — no hand-rolling.
- convergence when Σ_i ‖c_i_old − c_i_new‖₂ < epsilon (sum over clusters of
  L2 movement — reference C3, ``KMeans.java:206-213``)
- empty-cluster policy: discard ALL centroids and re-sample k fresh ones
  (reference C4, ``KMeans.java:167-171``)

Scale design (100 TB, 1000 executors):
- the input is cached once and re-scanned per iteration (the canonical
  Spark-vs-MapReduce win; the reference re-reads HDFS every iteration,
  ``KMeans.java:147``). On a real cluster use ``StorageLevel.MEMORY_AND_DISK``
  (default for ``DataFrame.cache``) so partitions spill instead of OOM.
- centroids travel as a k×d plan literal (broadcast with the task binary),
  and come back as exactly k rows through ``collect()`` — driver state is
  O(k·d), never O(n) (the reference's init reads the whole dataset into the
  driver, ``KMeans.java:292-298``; we use distributed ``takeSample``).
- per-iteration shuffle volume is O(shuffle_partitions · k · d) doubles,
  independent of n — same asymptotics as the reference's in-mapper combiner
  but with Tungsten codegen row processing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import nearest_centroid


@dataclass
class KMeansConfig:
    """Engine analogue of the reference's 7 positional CLI args
    (``KMeans.java:96-109``): input/output paths become DataFrames, ``dim``
    is inferred from the data, ``num_reducer`` becomes
    ``spark.sql.shuffle.partitions`` / AQE."""

    k: int
    max_iter: int = 20
    tol: float = 1e-4  # epsilon: stop when Σ‖Δc‖₂ < tol
    seed: int = 42
    features_col: str = "embedding"
    # "expr": pure Catalyst expressions (oracle-checkable fidelity layer).
    # "arrow": Arrow-batched NumPy in-mapper combiner via mapInPandas —
    # ~3.5x faster per iteration (measured at n=100k, d=64, local[8]:
    # 0.39s vs 1.34s); same protocol, same results up to fp summation order.
    method: str = "expr"


@dataclass
class KMeansModel:
    centroids: list[list[float]]  # k×d, index == cluster_id
    n_iter: int
    converged: bool
    movement_history: list[float] = field(default_factory=list)
    # k×d snapshot after every completed update step (re-init iterations
    # produce none) — k·max_iter·d doubles, driver-trivial at any data
    # scale; powers the CLI's --fidelity per-iteration output dirs
    # (reference KMeans.java:148 writes output+iter each iteration)
    centroid_history: list[list[list[float]]] = field(default_factory=list)
    reinit_count: int = 0  # empty-cluster full re-inits (reference C4)
    wall_sec: float = 0.0

    def assign(self, df: DataFrame, features_col: str = "embedding",
               output_col: str = "cluster_id") -> DataFrame:
        return assign_clusters(df, self.centroids, features_col, output_col)

    def report(self) -> dict:
        """Structured run report — the engine's C6 (the reference appends
        wall time / iterations / final error to ``outputsLog.txt``,
        ``KMeans.java:116,119-127,189-193``; we return JSON-able data
        instead of a side-effect log)."""
        return {
            "k": len(self.centroids),
            "dim": len(self.centroids[0]) if self.centroids else 0,
            "iterations": self.n_iter,
            "converged": self.converged,
            "final_movement": (
                self.movement_history[-1] if self.movement_history else None
            ),
            "movement_history": list(self.movement_history),
            "empty_cluster_reinits": self.reinit_count,
            "wall_sec": self.wall_sec,
            "sec_per_iter": (
                self.wall_sec / self.n_iter if self.n_iter else None
            ),
        }


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    features_col: str = "embedding",
    output_col: str = "cluster_id",
) -> DataFrame:
    """Nearest-centroid assignment (reference J1/T1/F1) as a narrow map —
    no shuffle, whole-stage-codegen'd."""
    return df.withColumn(output_col, nearest_centroid(features_col, centroids))


def cluster_features(
    assigned: DataFrame,
    dim: int,
    features_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-cluster ClusteringFeature -> (cluster_id, num_points, centroid).

    Plan shape (SURVEY A2's named strategy): ``posexplode`` the vector to
    (cluster, dim, v) rows, then ONE hash-aggregate pair over the
    (cluster, dim) grid — partial (sum, count) per task, exchange
    O(tasks·k·d), final merge; a second micro-aggregate reassembles the
    k·d grid into k centroid arrays (its exchange carries exactly k·d
    rows — size-independent of n, free at any scale). The mean is
    sum/count per dimension exactly as ``ClusteringFeature.computeMean``
    (``ClusteringFeature.java:60-70``). Empty clusters simply produce no
    row (no ``Double.MAX_VALUE`` sentinel — detected by the caller as a
    missing cluster_id, reference A7).

    Why not ``d`` separate ``avg(col[i])`` aggregate buffers (the previous
    form): measured 2x slower at n=100k, d=64 — 64 wide agg buffers with
    per-buffer array indexing lose to one tight (cluster, dim) hash-agg
    over exploded rows, and the wide form's generated code grows with d
    while this plan is d-independent. ``dim`` is kept in the signature for
    call-site documentation; the plan no longer depends on it.

    Data-model contract (the reference's, SURVEY §1.3): vectors are
    FIXED-ARITY and NON-NULL — no null elements, no empty arrays. Under
    that contract this plan is value-identical to per-dim ``avg``; outside
    it the semantics differ (``posexplode`` drops empty-array rows from
    num_points and the per-dim divisor counts positions, not non-nulls),
    matching the reference, which has no null handling at all
    (a malformed point kills the job, ``KMeans.java:269``).
    """
    del dim  # plan is d-independent; arity comes from the data itself
    exploded = assigned.select(
        cluster_col, F.posexplode(features_col).alias("_dim", "_v")
    )
    grid = exploded.groupBy(cluster_col, "_dim").agg(
        F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    return (
        grid.groupBy(cluster_col)
        .agg(
            F.max("_n").alias("num_points"),
            F.array_sort(
                F.collect_list(
                    F.struct("_dim", (F.col("_s") / F.col("_n")).alias("_m"))
                )
            ).alias("_pairs"),
        )
        .select(
            cluster_col,
            "num_points",
            F.col("_pairs._m").alias("centroid"),
        )
    )


def cluster_features_arrow(
    points: DataFrame,
    centroids: list[list[float]],
    features_col: str = "features",
) -> list[tuple[int, int, list[float]]]:
    """One Lloyd iteration as an Arrow-batched NumPy in-mapper combiner.

    This is the reference's mapper verbatim in dataflow shape
    (``KMeans.java:33-67``: k-slot accumulate per task, emit k partials)
    but vectorized: each Arrow batch computes the full n×k squared-distance
    matrix via the ‖x‖²−2x·Cᵀ+‖c‖² expansion (the same norm trick MLlib
    uses) and emits per-cluster (count, sum) partials — O(batches·k·d)
    shuffle-free output, merged in the driver (k·d doubles).

    Returns [(cluster_id, num_points, mean_vector)] for non-empty clusters.
    ``np.argmin`` takes the first minimum — the reference's lowest-index
    tie-break (``Point.java:65``).

    Uses ``mapInArrow`` rather than ``mapInPandas``: the Arrow list column
    flattens to the dense n×d matrix without the per-row ``tolist()``
    boxing of the pandas path (measured ~20% faster per iteration at
    n=100k, d=64).
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)

    # Self-contained closure (cloudpickle ships it by value — executor
    # Python workers don't have this package on sys.path).
    def partial_cf(batches):
        import numpy as np
        import pyarrow as pa

        cn2 = (C * C).sum(axis=1)
        k, d = C.shape
        for batch in batches:
            col = batch.column(0)
            X = (
                col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64, copy=False)
                .reshape(len(col), -1)
            )
            d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + cn2[None, :]
            cid = d2.argmin(1)
            counts = np.bincount(cid, minlength=k)
            sums = np.zeros((k, d))
            np.add.at(sums, cid, X)
            nz = np.nonzero(counts)[0]
            yield pa.RecordBatch.from_pydict(
                {
                    "cluster_id": pa.array(nz.astype(np.int32)),
                    "n": pa.array(counts[nz].astype(np.int64)),
                    "s": pa.array(sums[nz].tolist(), type=pa.list_(pa.float64())),
                }
            )

    parts = points.select(features_col).mapInArrow(
        partial_cf, "cluster_id int, n long, s array<double>"
    ).collect()

    agg: dict[int, tuple[int, "np.ndarray"]] = {}
    for r in parts:
        c, n, s = r["cluster_id"], r["n"], np.asarray(r["s"])
        if c in agg:
            agg[c] = (agg[c][0] + n, agg[c][1] + s)
        else:
            agg[c] = (n, s)
    return [(c, n, (s / n).tolist()) for c, (n, s) in sorted(agg.items())]


def sample_initial_centroids(
    df: DataFrame, k: int, seed: int, features_col: str = "embedding"
) -> list[list[float]]:
    """Seeded distributed sample of k rows as initial centroids
    (reference C1 without the O(n) driver read).

    Top-k by an iid uniform key == a uniform sample without replacement,
    and ``ORDER BY rand LIMIT k`` plans TakeOrderedAndProject: each
    partition keeps its local top-k, the driver merges #partitions·k
    candidate rows — ONE pass, no global sort, no count job
    (``rdd.takeSample`` runs a count plus a sampled collect: 2 jobs)."""
    rows = (
        df.select(features_col)
        .orderBy(F.rand(seed))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"dataset has fewer than k={k} rows")
    return [list(r[0]) for r in rows]


def _movement(old: list[list[float]], new: list[list[float]]) -> float:
    """Σ over clusters of per-centroid L2 movement (reference C3 exactly:
    sum, not max, not squared — ``KMeans.java:206-213``)."""
    total = 0.0
    for a, b in zip(old, new):
        total += sum((x - y) ** 2 for x, y in zip(a, b)) ** 0.5
    return total


def _iteration_partitions(bytes_est: int, parallelism: int) -> int:
    """Partition count for the cached iteration loop.

    The loop pays per-task cost (Python worker round-trip, task launch)
    EVERY iteration, so tiny data must not fan out to full parallelism:
    measured at d=64 on local[32], 8-16 tasks beat 32 by ~30% at BOTH
    n=2k and n=100k, and beat 1 task (no parallelism) by ~40%. Three
    regimes:

    - floor of min(8, parallelism) tasks — below that, job overhead and
      single-threaded NumPy dominate;
    - mid-range: ~4 MiB of vectors per task, capped at the cluster's
      core count (more waves than cores buys nothing for CPU-bound work);
    - upper bound: never fewer than bytes/128 MiB partitions, so a
      100 TB cache is NOT coalesced down to core count (125 GB
      partitions would not fit an executor) — at that scale this term
      dominates and the result matches the scan's own partitioning,
      making the adjustment a no-op.
    """
    import math

    mib = 1024 * 1024
    memory_bound = math.ceil(bytes_est / (128 * mib))
    cpu_target = min(parallelism, max(8, math.ceil(bytes_est / (4 * mib))))
    return max(1, memory_bound, cpu_target)


def fit(df: DataFrame, config: KMeansConfig) -> KMeansModel:
    """Iterate-until-converged driver loop (reference C2-C5).

    ``max_iter`` counts actual iterations (the reference's
    ``while (iter < MAX_ITER)`` with ``iter=1`` runs at most MAX_ITER-1
    jobs, ``KMeans.java:113,130`` — a documented off-by-one we do NOT
    reproduce).

    Concurrency note: the loop disables ``spark.sql.adaptive.enabled``
    for its duration and restores the prior value on exit (see the
    comment below for why). SQL confs are SESSION-global, so two
    concurrent ``fit()`` calls on the SAME SparkSession would race the
    toggle/restore, and unrelated queries running on that session
    meanwhile execute without AQE. Callers needing concurrent fits
    should give each its own session (``spark.newSession()`` — confs are
    per-session, the cache and cluster are shared).
    """
    if config.method not in ("expr", "arrow"):
        # fail fast: a typo'd method would otherwise silently run the
        # ~3.5x slower expression path
        raise ValueError(f"unknown method {config.method!r}: use 'expr' or 'arrow'")
    base = df.select(F.col(config.features_col).alias("features"))

    import time

    t_start = time.monotonic()
    # AQE has nothing to optimize in the iteration loop (narrow map over a
    # cache + a k·d-row collect — no exchanges to coalesce or re-plan) but
    # charges ~40 ms of adaptive planning PER JOB; over max_iter sequential
    # jobs that is a measurable fixed tax. The try/finally opens BEFORE
    # the conf change and the cache: a failure anywhere (empty dataset,
    # fewer-than-k rows in the init sample, a dying executor mid-count)
    # must still restore AQE and release storage — embedded/notebook
    # sessions outlive this call.
    sess = df.sparkSession
    prev_aqe = sess.conf.get("spark.sql.adaptive.enabled", "true")
    iter_cache = None
    history: list[float] = []
    centroid_history: list[list[list[float]]] = []
    reinits = 0
    converged = False
    n_iter = 0

    try:
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        base = base.cache()
        n = base.count()  # materialize the cache before iterating
        if n == 0:
            raise ValueError("empty dataset")

        # Init sample FIRST (against the just-materialized cache): its
        # k rows also give `dim` for the re-tile sizing below, so the
        # separate 1-row `first()` probe job this loop used to pay is
        # gone (r21 — same sample, same seed, same partitioning of
        # `base`, so the drawn centroids are unchanged).
        centroids = sample_initial_centroids(
            base, config.k, config.seed, "features"
        )
        dim = len(centroids[0])

        # Re-tile the cached points to the iteration-loop sweet spot (see
        # _iteration_partitions). Shrinking is a narrow coalesce straight
        # off the cache; growing (only reachable in the tiny-data regime —
        # a parquet scan of <8 partitions) re-caches the repartitioned
        # copy so the loop doesn't re-shuffle every iteration. The
        # tiny-data second cache coexists with `base` (megabytes by
        # construction): `base` must stay live because SAMPLING runs
        # against it — F.rand(seed) values depend on partitioning, so
        # sampling from the re-tiled view would break the documented
        # determinism contract (same df + same seed => same init,
        # reproducible externally via sample_initial_centroids).
        cur = base.rdd.getNumPartitions()
        target = _iteration_partitions(
            n * dim * 8, base.sparkSession.sparkContext.defaultParallelism
        )
        if target < cur:
            points = base.coalesce(target)
        elif target > cur:
            # no materializing count: iteration 1 fills this cache as a
            # side effect of its own pass (one fewer job; iterations 2+
            # read the cached re-tiled copy exactly as before)
            points = base.repartition(target).cache()
            iter_cache = points
        else:
            points = base

        for it in range(1, config.max_iter + 1):
            n_iter = it
            if config.method == "arrow":
                triples = cluster_features_arrow(points, centroids, "features")
                by_id = {c: {"centroid": mean} for c, _n, mean in triples}
            else:
                assigned = assign_clusters(points, centroids, "features")
                # collect the k·d (cluster, dim, mean) grid directly and
                # reshape driver-side: the loop consumes plain lists, so
                # cluster_features' second micro-aggregate (grid -> array
                # column) would only build arrays we immediately unpack —
                # skipping it removes one of the two shuffles per
                # iteration. Driver traffic is the same O(k·d) scalars.
                grid = (
                    assigned.select(
                        "cluster_id", F.posexplode("features").alias("_dim", "_v")
                    )
                    .groupBy("cluster_id", "_dim")
                    .agg(F.avg("_v").alias("_m"))
                    .collect()
                )
                by_id = {}
                for r in grid:
                    by_id.setdefault(
                        r["cluster_id"], {"centroid": [0.0] * dim}
                    )["centroid"][r["_dim"]] = r["_m"]
            if len(by_id) < config.k:
                # empty cluster -> discard all, re-sample fresh k (C4);
                # new seed per event keeps the run deterministic.
                reinits += 1
                centroids = sample_initial_centroids(
                    base, config.k, config.seed + 1000 * reinits, "features"
                )
                continue
            # centroid index integrity (reference C5, KMeans.java:252-257)
            assert sorted(by_id) == list(range(config.k)), sorted(by_id)

            new_centroids = [list(by_id[i]["centroid"]) for i in range(config.k)]
            move = _movement(centroids, new_centroids)
            history.append(move)
            centroid_history.append([list(c) for c in new_centroids])
            centroids = new_centroids
            if move < config.tol:
                converged = True
                break
    finally:
        base.unpersist()  # `points` may be a (non-cached) coalesce view
        if iter_cache is not None:
            iter_cache.unpersist()
        sess.conf.set("spark.sql.adaptive.enabled", prev_aqe)

    return KMeansModel(
        centroids=centroids,
        n_iter=n_iter,
        converged=converged,
        movement_history=history,
        centroid_history=centroid_history,
        reinit_count=reinits,
        wall_sec=time.monotonic() - t_start,
    )


def wcss(df: DataFrame, centroids: list[list[float]], features_col: str = "embedding") -> float:
    """Within-cluster sum of squared distances (the reference's 'error';
    used by the Lloyd-monotonicity invariant test, SURVEY §5.2.3a)."""
    from ..functions.vector import distance_vector

    return (
        df.select(
            F.array_min(distance_vector(features_col, centroids)).alias("d2")
        )
        .agg(F.sum("d2").alias("wcss"))
        .first()["wcss"]
    )
