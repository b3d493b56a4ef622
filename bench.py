#!/usr/bin/env python3
"""BENCH harness — runs the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: seconds per Lloyd iteration at n=100k points (the
reference's benchmark unit — BASELINE.md reports ~23 s/iter for Hadoop
MapReduce and 0.07 s/iter for sequential Python at n=100k, d=30).
`embeddings` is deterministically tiled to 100k rows (d=64) so the scale
matches the published grid. Per-query wall times for every registry entry
are reported under "queries".

Each query is forced end-to-end with the `noop` sink (full evaluation,
no driver-side collect cost).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_N = 100_000  # reference benchmark scale (BASELINE.md, Fig 3.1/3.5)
BENCH_K = 4
BENCH_ITERS = 5
BENCH_REPEATS = 3  # median-of-3 per method; see comment in bench_kmeans_iteration


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kmeans-engine-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def force(df) -> None:
    """Evaluate the full plan without shipping rows to the driver."""
    df.write.mode("overwrite").format("noop").save()


def bench_kmeans_iteration(spark) -> dict:
    """Seconds/iteration of the reference dataflow (assign -> CF agg ->
    collect k rows) on n=100k cached points — BASELINE.md's headline unit."""
    from pyspark.sql import functions as F

    from k_means_in_mapreduce_spark.operators import kmeans_df as K

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = emb.count()
    copies = max(1, (BENCH_N + n0 - 1) // n0)
    # Deterministic tiling: copy c shifts vec_id into a fresh id range and
    # jitters dim 0 by c*1e-3 so points are distinct but the distribution
    # (and thus iteration count) is stable run-to-run.
    tiled = (
        emb.crossJoin(spark.range(copies).withColumnRenamed("id", "copy"))
        .select(
            (F.col("vec_id") + F.col("copy") * n0).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + F.when(i == 0, F.col("copy") * 1e-3).otherwise(F.lit(0.0))
                ).cast("float"),
            ).alias("embedding"),
        )
        .limit(BENCH_N)
    )
    pts = tiled.repartition(CPUS).cache()
    n = pts.count()  # materialize cache before the clock starts

    # Warm the Python workers (fork + numpy/pandas import) before timing —
    # iteration cadence on a long-lived cluster runs against warm workers.
    K.cluster_features_arrow(pts, K.sample_initial_centroids(
        pts, BENCH_K, 42, "embedding"), "embedding")

    # Median of 3 fits per method: same-code spread across runs reached
    # 2.6x in round 3 (GC pauses, codegen compile landing inside the timed
    # region), which masked real round-over-round deltas.  The median is
    # robust to one bad run in either direction.
    out = {"n": n}
    for method in ("arrow", "expr"):
        walls, iters = [], 1
        for _ in range(BENCH_REPEATS):
            t0 = time.monotonic()
            model = K.fit(
                pts,
                K.KMeansConfig(
                    k=BENCH_K, max_iter=BENCH_ITERS, tol=0.0, seed=42, method=method
                ),
            )
            walls.append(time.monotonic() - t0)
            iters = max(1, model.n_iter)
        wall = statistics.median(walls)
        out[method] = {
            "iterations": iters,
            "sec_per_iter": wall / iters,
            "wall": wall,
            "spread": [round(w, 3) for w in sorted(walls)],
        }

    # Production path (MLlib KMeans, random init so iteration count is the
    # comparable unit — k-means|| init would bill extra passes to iter 1;
    # tol=0 runs exactly BENCH_ITERS Lloyd iterations like the paths above).
    from k_means_in_mapreduce_spark.operators.kmeans_mllib import fit_mllib

    walls, iters = [], 1
    for _ in range(BENCH_REPEATS):
        t0 = time.monotonic()
        res = fit_mllib(
            pts, k=BENCH_K, max_iter=BENCH_ITERS, seed=42, tol=0.0,
            init_mode="random",
        )
        walls.append(time.monotonic() - t0)
        iters = max(1, res.n_iter)
    wall = statistics.median(walls)
    out["mllib"] = {
        "iterations": iters,
        "sec_per_iter": wall / iters,
        "wall": wall,
        "spread": [round(w, 3) for w in sorted(walls)],
    }

    pts.unpersist()
    return out


def main() -> None:
    import __spark_entry__ as E

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session AND the Python workers (fork + numpy/pandas
    # import) so query 1 doesn't absorb startup cost — a long-lived
    # cluster runs against warm executors.
    force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000))
    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    warm = spark.range(CPUS * 4).repartition(CPUS)
    warm.mapInPandas(_warm, "id long").write.mode("overwrite").format(
        "noop"
    ).save()

    # min of 2 runs per query: steady-state timing (first run can absorb
    # one-off costs — shuffle file creation, codegen compile, GC pauses).
    per_query: dict[str, float] = {}
    for name, fn in sorted(E.queries().items()):
        best = None
        try:
            for _ in range(2):
                t0 = time.monotonic()
                force(fn(spark, SF_DIR))
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            per_query[name] = round(best, 3)
        except Exception as ex:  # a broken query shows up as -1, not a crash
            per_query[name] = -1.0
            print(f"# BENCH ERROR {name}: {type(ex).__name__}: {ex}", file=sys.stderr)

    km = bench_kmeans_iteration(spark)
    per_query["_kmeans_100k_per_iter_arrow"] = round(km["arrow"]["sec_per_iter"], 3)
    per_query["_kmeans_100k_per_iter_expr"] = round(km["expr"]["sec_per_iter"], 3)
    per_query["_kmeans_100k_per_iter_mllib"] = round(km["mllib"]["sec_per_iter"], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "kmeans_sec_per_iteration_n100k",
        "value": round(km["arrow"]["sec_per_iter"], 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "kmeans": {
            "n": km["n"],
            "k": BENCH_K,
            "iterations": km["arrow"]["iterations"],
            "sec_per_iter_expr": round(km["expr"]["sec_per_iter"], 3),
            "sec_per_iter_mllib": round(km["mllib"]["sec_per_iter"], 3),
            "total_wall_sec": round(
                km["arrow"]["wall"] + km["expr"]["wall"], 3
            ),
        },
        "total_query_sec": round(
            sum(v for v in per_query.values() if v > 0), 3
        ),
    }
    print(json.dumps(result))
    # Also persist the full dict: the driver's stdout capture truncates
    # long lines, which silently dropped the per-query tail in BENCH_r02.
    # .benchmarks/ is the on-disk record used for round-over-round diffs.
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmarks")
    os.makedirs(outdir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    with open(os.path.join(outdir, f"bench_{stamp}_sf{sf}.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
