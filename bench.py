#!/usr/bin/env python3
"""BENCH harness — runs the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line LAST on stdout:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "result_file": "..."}

The driver's stdout capture keeps only the last ~2000 characters, so the
printed line carries the headline numbers plus the slowest-query summary;
the FULL per-query detail (warm + cold columns for every registry entry)
is written to ``BENCH_RESULT.json`` at the repo root (fixed path, same
basename every run — this is the file to read) and archived under
``.benchmarks/``. Round 5's bench artifact recorded ``"parsed": null``
because the full 5 KB line's head fell outside that tail window.

Headline metric: seconds per Lloyd iteration at n=100k points (the
reference's benchmark unit — BASELINE.md reports ~23 s/iter for Hadoop
MapReduce and 0.07 s/iter for sequential Python at n=100k, d=30).
`embeddings` is deterministically tiled to 100k rows (d=64) so the scale
matches the published grid.

Artifact honesty: fingerprint-keyed artifacts (`.tmp/art_*`) persist
across runs, so a warm-only measurement of an artifact-backed query times
a parquet read, not the computation. By default the bench DELETES the
artifact cache first, so each ARTIFACT's first build lands in some
query's first run (for shared artifacts, the alphabetically-first
consumer's); both columns are reported (``queries`` = warm steady-state,
``queries_cold`` = first run). ``--keep-artifacts`` skips the clearing
for quick local iteration.

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
# second published grid point (Fig 3.5: Hadoop ~26 s/iter, sequential
# Python 0.24 s at n=400k) — arrow+mllib only, to bound bench wall time
BENCH_N_LARGE = 400_000
BENCH_K = 4
BENCH_ITERS = 5
# median-of-5 per method (was 3; the r8 box showed a uniform ~1.3x
# slow-phase across all 111 queries and a median-of-3 headline is one bad
# draw away from overstating it) — see comment in bench_kmeans_iteration
BENCH_REPEATS = 5


def iter_min(stats: dict) -> float:
    """Contention-robust secondary headline: min-of-reps / iterations.

    ``value`` stays the median (round-over-round comparability — VERDICT
    r15 item 3 explicitly freezes it); the min is the statistic a
    noisy-neighbor box cannot inflate, so when the two disagree wildly
    the gap itself is contention evidence. ``stats`` is one method's
    entry from bench_kmeans_iteration (sorted ``spread`` of rep walls +
    ``iterations``)."""
    return round(min(stats["spread"]) / max(1, stats["iterations"]), 3)


def read_host_load() -> dict:
    """One host-load evidence sample, recorded AT RUN TIME (ADVICE r15:
    contention annotations used to rest on post-hoc comparison against
    the fastest sibling snapshot — a rule that could mask a real
    regression). loadavg is box-wide and includes this bench's own work;
    the /proc/stat aggregate cpu jiffies split is what lets a reader
    separate that from ``steal`` — time the hypervisor ran someone else
    while this guest was runnable, the direct signature of the host
    contention adjudicated in rounds 12-15. Best-effort: returns {} on
    platforms without these interfaces rather than failing the bench."""
    out: dict = {}
    try:
        out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
        if first and first[0] == "cpu":
            names = ("user", "nice", "system", "idle", "iowait", "irq",
                     "softirq", "steal", "guest", "guest_nice")
            out["cpu_jiffies"] = {
                k: int(v) for k, v in zip(names, first[1:])
            }
    except (OSError, ValueError):
        pass
    return out


def host_load_delta(before: dict, after: dict) -> dict:
    """Evidence block for one bench phase: loadavg at both edges plus the
    /proc/stat jiffies delta with derived busy/iowait/steal fractions of
    total elapsed jiffies (all cpus). busy_frac ~1.0 is expected while
    the bench itself saturates local[32]; a nonzero steal_frac or an
    end-loadavg far above this process's own parallelism is the
    in-snapshot contention evidence the annotations were missing."""
    d: dict = {}
    if "loadavg" in before:
        d["loadavg_start"] = before["loadavg"]
    if "loadavg" in after:
        d["loadavg_end"] = after["loadavg"]
    b, a = before.get("cpu_jiffies"), after.get("cpu_jiffies")
    if b and a:
        # guest/guest_nice are already folded into user/nice by the
        # kernel; they are DROPPED from the emitted delta (not just the
        # fraction denominator) so any downstream reader that sums the
        # dict gets the true total instead of double-counting VM time
        # (ADVICE r17 — the fractions were fixed r17 but the raw dict
        # still carried the trap).
        delta = {k: a[k] - b[k] for k in a
                 if k in b and k not in ("guest", "guest_nice")}
        d["jiffies"] = delta
        total = sum(delta.values())
        if total > 0:
            idle = delta.get("idle", 0) + delta.get("iowait", 0)
            d["busy_frac"] = round(1 - idle / total, 4)
            d["iowait_frac"] = round(delta.get("iowait", 0) / total, 4)
            d["steal_frac"] = round(delta.get("steal", 0) / total, 4)
    return d


# contention_suspect thresholds (VERDICT r17 item 3: turn the evidence
# rounds 14-17 assembled by hand into a one-field verdict in the JSON
# tail, computed from fields the bench already records — no new
# measurement). Arm A: the headline median exceeding its own min-of-reps
# by >15% OF THE MIN — gap/min, i.e. value > 1.15*value_min (ADVICE r18:
# the first cut divided by the median, which silently raised the fire
# point to ~17.6% and contradicted this prose) — means a noisy neighbor
# inflated at least half the reps (the r12/r13/r15 spikes read 50-100%+
# here; the clean r16-r18 band reads 1-10%, incl. the r18 gate at 5.1%).
# Arm B: 1-min loadavg already above ~4 BEFORE the kmeans grid
# starts means the box was loaded by someone else — the bench's own
# pre-grid work (one warm job + parquet reads) contributes <~2, so 4 is
# ~2x this process's share at that instant (clean history: 0.5-3.1).
CONTENTION_GAP_FRAC = 0.15
CONTENTION_LOADAVG_START = 4.0


def contention_suspect(value, value_min, kmeans_grid_load) -> bool | None:
    """Self-serve gate verdict: should this run's headline be adjudicated
    against siblings before being read as a regression?

    True = at least one arm fired; False = evidence present, none fired;
    None = neither arm evaluable (non-Linux: no min recorded and no
    loadavg) — absence of evidence is not a clean bill. A True here is a
    SUSPICION, not a conviction: the r17 gate showed a contended box can
    sit below both thresholds (10% gap over min, loadavg_start 1.75) and still
    need a same-tree rerun to convict — the flag catches the egregious
    cases so the driver sees them without hand-assembling the evidence.
    """
    evaluable = False
    if value and value_min and value_min > 0:
        evaluable = True
        # gap measured against the MIN (value > 1.15*min fires), matching
        # the documented "median >15% above its own min-of-reps"
        if (value - value_min) / value_min > CONTENTION_GAP_FRAC:
            return True
    start = (kmeans_grid_load or {}).get("loadavg_start")
    if start:
        evaluable = True
        if start[0] > CONTENTION_LOADAVG_START:
            return True
    return False if evaluable else None


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kmeans-engine-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # no stage progress bars on stdout: they drown the final JSON line
        # inside the driver's bounded tail capture
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def force(df) -> None:
    """Evaluate the full plan without shipping rows to the driver."""
    df.write.mode("overwrite").format("noop").save()


def bench_kmeans_iteration(
    spark,
    bench_n: int = BENCH_N,
    methods: tuple = ("arrow", "expr"),
    repeats: int = BENCH_REPEATS,
) -> dict:
    """Seconds/iteration of the reference dataflow (assign -> CF agg ->
    collect k rows) on ``bench_n`` cached points — BASELINE.md's headline
    unit (published grid points: n=100k and n=400k, Fig 3.1/3.5)."""
    from pyspark.sql import functions as F

    from k_means_in_mapreduce_spark.operators import kmeans_df as K

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = emb.count()
    copies = max(1, (bench_n + n0 - 1) // n0)
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
        .limit(bench_n)
    )
    pts = tiled.repartition(CPUS).cache()
    n = pts.count()  # materialize cache before the clock starts

    # Warm the Python workers (fork + numpy/pandas import) before timing —
    # iteration cadence on a long-lived cluster runs against warm workers.
    K.cluster_features_arrow(pts, K.sample_initial_centroids(
        pts, BENCH_K, 42, "embedding"), "embedding")

    # Median of ``repeats`` fits per method: same-code spread across runs
    # reached 2.6x in round 3 (GC pauses, codegen compile landing inside
    # the timed region), which masked real round-over-round deltas.  The
    # median is robust to bad runs in either direction.  An explicit JVM
    # GC before each timed fit keeps collections of the PREVIOUS run's
    # garbage from landing inside this run's timed region — the r6
    # mllib_400k spread (5.6-13.5 s across 3 runs) was exactly that.
    def _gc():
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass  # private API; a bench must never die on it

    out = {"n": n}
    for method in methods:
        walls, iters = [], 1
        for _ in range(repeats):
            _gc()
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
    for _ in range(repeats):
        _gc()
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


def scratch_entry_pattern(tag: str):
    """Compiled matcher for .tmp scratch entries belonging to the sf_dir
    with sanitized ``tag`` — the known scratch-name families, anchored on
    artifacts._scratch's ``--`` name/tag delimiter plus the EXACT tag.
    A sanitized tag can never contain '-' (scratch_tag maps it to '_'),
    and the art_/bkt_ name wildcard excludes '-', so the first ``--``
    pins the tag boundary: clearing sf_dir A can no longer match an
    entry of a different sf_dir B in ANY direction — including the old
    residual where B's path ends with A's full path and the variable
    family name absorbed B's extra prefix (ADVICE r6/r7, closed by the
    delimiter; entries under the pre-delimiter naming are orphaned by
    the rename and were swept once when it landed).

    A tripwire test (tests/test_artifacts.py) enumerates the package's
    actual ``_scratch(sf_dir, ...)`` call sites against this pattern, so
    a new scratch family added without extending it fails CI instead of
    silently corrupting the bench's cold column (its first run would time
    a warm serve of last run's artifact)."""
    import re

    return re.compile(
        r"^(?:art_[A-Za-z0-9_]+|bkt_[A-Za-z0-9_]+|ivf_index|centroids_text"
        r"|orders_csv|events_json|orders_part|lineitem_orc"
        r"|orders_corrupt_csv|points_text)--"
        + re.escape(tag)
        + r"(?:\.fingerprint)?$"
    )


def clear_artifact_cache(sf_dir: str) -> int:
    """Delete EVERY fingerprint-keyed scratch entry for this sf_dir (the
    `art_*` artifacts, the persisted IVF index, bucketed table copies and
    their .fingerprint markers — anything artifacts._scratch named with
    the sf tag) so the first run of an artifact-backed query measures the
    cold build, not a read of last run's output. Note the cold column is
    per-ARTIFACT, not per-query: when several queries share one artifact
    (e.g. the Jaccard pair list), only the first consumer's first run
    pays the build; later consumers' "cold" rows time a warm serve."""
    import shutil

    from k_means_in_mapreduce_spark.artifacts import scratch_tag

    pat = scratch_entry_pattern(scratch_tag(sf_dir))
    tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".tmp")
    removed = 0
    if os.path.isdir(tmp):
        for entry in os.listdir(tmp):
            if pat.match(entry):
                full = os.path.join(tmp, entry)
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                else:
                    try:
                        os.remove(full)
                    except OSError:
                        pass
                removed += 1
    return removed


def main() -> None:
    import __spark_entry__ as E

    keep_artifacts = "--keep-artifacts" in sys.argv[1:]
    cleared = 0 if keep_artifacts else clear_artifact_cache(SF_DIR)

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

    # Headline k-means grid FIRST, against a clean JVM: measured last, the
    # n=400k point swung 0.39 -> 1.44 s/iter purely from the GC/memory
    # pressure left behind by 111 queries (isolated re-run: 0.43).
    hl_start = read_host_load()
    km = bench_kmeans_iteration(spark)
    # 400k point: median-of-5 (VERDICT r6 item 3 — the 3-run mllib spread
    # was 2.4x). The pre-run GC + extra repeats stabilized the MEDIAN
    # (mllib_400k median fit 9.0 -> 1.75 s); the recorded min..max spread
    # remains box-bound: isolated experiments swung the same fit 1.7-6.3 s
    # within minutes regardless of driver memory (8g vs 16g) or a GC
    # settle sleep, so the spread list is reported as-is and the median
    # is the comparable number.
    km4 = bench_kmeans_iteration(
        spark, BENCH_N_LARGE, methods=("arrow",), repeats=5
    )
    hl_after_kmeans = read_host_load()

    # Warm column = min over the runs AFTER the first (steady state: the
    # first run absorbs one-off costs — artifact builds, shuffle file
    # creation, codegen compile). Cold column = that first run. Streaming
    # queries get an extra repeat: their wall time includes state-store
    # setup + micro-batch scheduling, which showed a 2-4x same-code spread
    # at sf0.1 (the r5 "regressions" were min-of-2 catching two bad runs).
    per_query: dict[str, float] = {}
    per_query_cold: dict[str, float] = {}
    for name, fn in sorted(E.queries().items()):
        repeats = 4 if name.startswith("stream_") else 3
        try:
            walls = []
            for _ in range(repeats):
                t0 = time.monotonic()
                force(fn(spark, SF_DIR))
                walls.append(time.monotonic() - t0)
            per_query_cold[name] = round(walls[0], 3)
            per_query[name] = round(min(walls[1:]), 3)
        except Exception as ex:  # a broken query shows up as -1, not a crash
            per_query[name] = per_query_cold[name] = -1.0
            print(f"# BENCH ERROR {name}: {type(ex).__name__}: {ex}", file=sys.stderr)

    hl_end = read_host_load()

    repo = os.path.dirname(os.path.abspath(__file__))
    result_file = os.path.join(repo, "BENCH_RESULT.json")

    per_query["_kmeans_100k_per_iter_arrow"] = round(km["arrow"]["sec_per_iter"], 3)
    per_query["_kmeans_100k_per_iter_expr"] = round(km["expr"]["sec_per_iter"], 3)
    per_query["_kmeans_100k_per_iter_mllib"] = round(km["mllib"]["sec_per_iter"], 3)
    # second published grid point (Fig 3.5: Hadoop ~26 s/iter, sequential
    # Python 0.24 s); arrow only — the expr path's unit is pinned at 100k
    per_query["_kmeans_400k_per_iter_arrow"] = round(km4["arrow"]["sec_per_iter"], 3)
    per_query["_kmeans_400k_per_iter_mllib"] = round(km4["mllib"]["sec_per_iter"], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    kmeans_grid_load = host_load_delta(hl_start, hl_after_kmeans)
    result = {
        # headline = the engine's own Arrow dataflow (assign -> CF agg),
        # the recommended production fit path; the expression-oracle and
        # MLlib numbers ride alongside so no reader has to guess which
        # path "value" is (VERDICT r6 item 3: 0.325 matched neither label)
        "metric": "kmeans_sec_per_iteration_n100k_arrow",
        "value": round(km["arrow"]["sec_per_iter"], 3),
        "value_expr": round(km["expr"]["sec_per_iter"], 3),
        "value_mllib": round(km["mllib"]["sec_per_iter"], 3),
        # min-of-reps companions (see iter_min): the contention-robust
        # reading of the same grid — "value" stays the median so the
        # round-over-round trend keeps comparing like with like
        "value_min": iter_min(km["arrow"]),
        "value_min_expr": iter_min(km["expr"]),
        "value_min_mllib": iter_min(km["mllib"]),
        "unit": "sec",
        "queries": per_query,
        "queries_cold": per_query_cold,
        "cold_artifacts": not keep_artifacts,
        "artifact_dirs_cleared": cleared,
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
        "kmeans_400k": {
            "n": km4["n"],
            "sec_per_iter_arrow": round(km4["arrow"]["sec_per_iter"], 3),
            "sec_per_iter_mllib": round(km4["mllib"]["sec_per_iter"], 3),
            "sec_per_iter_arrow_min": iter_min(km4["arrow"]),
            "sec_per_iter_mllib_min": iter_min(km4["mllib"]),
        },
        # at-run-time load evidence per phase (ADVICE r15): steal_frac /
        # loadavg recorded here let a contention call rest on data from
        # the run itself, not only on post-hoc sibling comparison
        "host_load": {
            "kmeans_grid": kmeans_grid_load,
            "queries": host_load_delta(hl_after_kmeans, hl_end),
            "run": host_load_delta(hl_start, hl_end),
        },
        # one-field adjudication hint in the JSON tail (VERDICT r17
        # item 3); value/value_min semantics unchanged — this only READS
        # them. See contention_suspect() for the two arms + thresholds.
        "contention_suspect": contention_suspect(
            round(km["arrow"]["sec_per_iter"], 3),
            iter_min(km["arrow"]),
            kmeans_grid_load,
        ),
        "contention_evidence": (
            "value/value_expr/value_mllib are medians a contended box can "
            "inflate; adjudicate outliers against value_min* (min-of-reps, "
            "uninflatable by a noisy neighbor), the kmeans_spreads rep "
            "lists, the host_load steal/busy fractions above, and the "
            "contention_outlier annotations in .benchmarks/MANIFEST.json"
        ),
        # per-method wall-clock spreads (sorted; BENCH_REPEATS fits per
        # 100k entry, 5 per 400k one) so variance is visible next to the
        # medians
        "kmeans_spreads": {
            "arrow_100k": km["arrow"]["spread"],
            "expr_100k": km["expr"]["spread"],
            "mllib_100k": km["mllib"]["spread"],
            "arrow_400k": km4["arrow"]["spread"],
            "mllib_400k": km4["mllib"]["spread"],
        },
        "total_query_sec": round(
            sum(v for v in per_query.values() if v > 0), 3
        ),
        "total_query_sec_cold": round(
            sum(v for v in per_query_cold.values() if v > 0), 3
        ),
        "n_queries": len(per_query),
        "n_errors": sum(1 for v in per_query.values() if v < 0),
        "result_file": result_file,
    }
    # Full per-query detail goes to a FIXED path the driver/judge can read
    # (plus a timestamped archive for round-over-round diffs).
    with open(result_file, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    outdir = os.path.join(repo, ".benchmarks")
    os.makedirs(outdir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    with open(os.path.join(outdir, f"bench_{stamp}_sf{sf}.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)

    spark.stop()
    # Compact line LAST, after spark.stop(), so no Spark output can trail
    # it: full "queries" is ~5 KB which overflows the driver's ~2000-char
    # stdout tail — summarize to the 10 slowest warm rows and point at
    # result_file for the rest.
    ranked = sorted(
        ((k, v) for k, v in per_query.items() if v > 0), key=lambda kv: -kv[1]
    )
    # host_load/contention_evidence stay file-only: ~0.7 KB of static
    # evidence prose would crowd real numbers out of the ~2000-char tail
    compact = {
        k: v
        for k, v in result.items()
        if k not in ("queries", "queries_cold", "host_load",
                     "contention_evidence")
    }
    # shrink the slowest-query summary until the line fits the driver's
    # ~2000-char tail — never die or overflow after a successful run
    for top in (10, 5, 2, 0):
        compact["queries"] = dict(ranked[:top])
        line = json.dumps(compact)
        if len(line) < 1900:
            break
    print(line)


if __name__ == "__main__":
    main()
