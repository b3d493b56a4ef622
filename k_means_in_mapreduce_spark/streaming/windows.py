"""Structured Streaming surface over the ``events`` table
(SURVEY §2.9 [extension]).

The reference is strictly batch (its "iteration" is a driver while-loop of
full MapReduce jobs, ``KMeans.java:130-187``); this module adds the stream
processing a production deployment of the same pipeline needs:

- tumbling / sliding event-time windows (``F.window``)
- session windows with an inactivity gap (``F.session_window``)
- watermarking for late data
- ``foreachBatch`` incremental model scoring (streaming k-means
  assignment against a broadcast/literal centroid set)

Each entry point replays the parquet events table as a file-source stream
into a memory sink and returns the materialized result, so the SAME
DuckDB oracles that check the batch forms check the streaming forms: the
contract is batch/stream semantic equivalence (same engine, same
expressions — Structured Streaming's core promise).

Scale notes: file-source + memory-sink is the test harness only; a real
deployment swaps source/sink for Kafka + a transactional sink and keeps
every transformation identical. State size: tumbling/sliding windows keep
O(windows x types) rows; session windows O(active sessions); watermarks
bound both.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_mem_counter = itertools.count()

# events.parquet raw schema (ts read as int64 nanos, converted after load —
# same convention as sources.tables.load_table)
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# (sf_dir, spark application id, source fingerprint) -> probed stream
# schema. Keyed on the applicationId, NOT id(spark): sessions are
# recreated across tests and CPython reuses addresses after GC, so an
# id() key could serve a schema probed under a dead session. Keyed on the
# source CONTENT fingerprint too: a regenerated events.parquet can change
# ts vintage (int64-nanos vs TIMESTAMP), and a stale schema would misread
# it for the rest of the session — same staleness rule as artifacts.py.
_PROBED_SCHEMA: dict[tuple[str, str, str], T.StructType] = {}


def _remember_schema(key: tuple[str, str, str], schema: T.StructType) -> None:
    """Insert with a size cap (ADVICE r21: stale-fingerprint / dead-session
    entries never evicted — unbounded in a long-lived regenerating
    session). Oldest-inserted entries drop first; a dropped live entry
    only costs one re-probe."""
    while len(_PROBED_SCHEMA) >= 64:
        del _PROBED_SCHEMA[next(iter(_PROBED_SCHEMA))]
    _PROBED_SCHEMA[key] = schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The stream source needs an explicit schema; probe the actual file's
    # ts physical type with a batch read (generator vintages differ: int64
    # nanos vs TIMESTAMP(MICROS) — see sources.tables.normalize_event_ts).
    # The probe costs a file listing + footer read (~0.1 s) and every
    # streaming query pays it, so memoize per (sf_dir, session).
    from ..artifacts import source_fingerprint
    from ..sources.tables import normalize_event_ts

    key = (
        os.path.abspath(sf_dir),
        spark.sparkContext.applicationId,
        source_fingerprint(f"{sf_dir}/events.parquet"),
    )
    schema = _PROBED_SCHEMA.get(key)
    if schema is None:
        probed = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        schema = T.StructType(
            [
                T.StructField(f.name, probed[f.name].dataType if f.name == "ts" else f.dataType)
                for f in _EVENTS_RAW_SCHEMA.fields
            ]
        )
        _remember_schema(key, schema)
    # the file source requires a directory: stream the sf dir, filtered
    # down to the events table file
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_event_ts(raw)


# State partitioning for the stateful queries in this module. Unlike batch
# shuffles (AQE re-coalesces at runtime), a streaming query's state
# partition count is pinned into its checkpoint at first start — real
# deployments size it to stateful-key cardinality/throughput PER QUERY,
# not from the session's batch shuffle default. 8 partitions comfortably
# hold these queries' state (O(users) keys). A stream-stream join keeps 4
# state stores per partition, so oversizing multiplies fixed per-store
# per-batch cost; it gets its own smaller setting (measured at sf0.1:
# 32 partitions -> 5.6 s, 8 -> 3.1 s, 4 -> 2.4 s, 2 -> 2.4 s, identical
# results — 4 balances per-store overhead against parallel headroom).
STATE_PARTITIONS = 8
JOIN_STATE_PARTITIONS = 4


def _run_to_memory(
    agg: DataFrame,
    mode: str = "complete",
    state_partitions: int = STATE_PARTITIONS,
    no_data_batches: bool = False,
) -> DataFrame:
    """Execute a streaming aggregation to completion against a uniquely
    named memory sink; return the result as a static DataFrame.

    ``no_data_batches`` maps to ``spark.sql.streaming.noDataMicroBatches
    .enabled`` for the query's duration. Default False: after the data is
    exhausted, the extra empty micro-batch Spark schedules to advance the
    watermark only spins every state store (and, in complete mode,
    rewrites the whole sink) without changing what a bounded replay
    emits — complete-mode aggs re-emit everything per batch anyway,
    append-mode dedup/inner-join rows are emitted in the batch both
    inputs arrive (measured at sf0.1: inner join 1.9 -> 1.3 s, streaming
    dedup 1.1 -> 0.85 s). The LEFT OUTER join passes True: its unmatched
    rows are emitted ONLY when the final watermark passes their join
    window, which happens in exactly that trailing no-data batch —
    skipping it would drop those rows (semantics, not speed).

    Concurrency note (the kmeans_df.fit AQE-toggle hazard class): SQL
    confs are SESSION-global, so two concurrent streaming queries on the
    SAME SparkSession would race this toggle (and the shuffle-partitions
    one above it, which pins STATE partitioning) — a loser reading the
    other's "false" could silently drop the left join's unmatched rows.
    Callers needing concurrent streaming runs must give each its own
    ``spark.newSession()``; the registry/bench/driver run queries
    sequentially."""
    name = f"stream_result_{next(_mem_counter)}"
    spark = agg.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled",
        "true" if no_data_batches else "false",
    )
    try:
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # Materialize JVM-side and sever lineage from the (stopped) memory
        # sink: localCheckpoint keeps the rows as executor blocks — no
        # collect-to-Python round-trip (1.6 s for ~95k session rows at
        # sf0.1, vs 0.2 s for the checkpoint).
        out = spark.table(name).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
        # DROP the sink's temp view on EVERY path — it pins the full
        # materialized result in driver memory for the session lifetime,
        # and a failed query (schema mismatch, executor loss) must not
        # leak its partial sink either (same leak class as the fixed CLI
        # cache leak). dropTempView on a never-created view is a no-op.
        spark.catalog.dropTempView(name)
    return out


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows by event_type with a 1h watermark — streaming
    twin of the batch ``events_hourly_by_type`` (same oracle)."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg)


def stream_sliding_quarter_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows advancing every 15min (each event lands in 4
    windows)."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg)


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Semantics note: ``session_window`` merges an event into a session iff
    its time is STRICTLY before previous-end (= last ts + gap), i.e. a gap
    of exactly 30:00.000000 starts a new session — identical to the batch
    ``events_sessionized`` rule (gap > 30min splits ... merge iff
    gap < 30min; they differ only at exact equality, which has measure
    zero in µs data). session_end is reported as last-event-time (window
    end minus the gap) to match the batch form.
    """
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            (
                F.col("session_window.end") - F.expr("INTERVAL 30 MINUTES")
            ).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg)


def stream_stream_error_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermark-bounded state: clicks within
    10 minutes AFTER an error by the same user — the streaming twin of the
    batch ``events_range_error_click`` (same oracle).

    Both sides carry a watermark and the join condition bounds the event
    times against each other, so Spark can expire join state: an error row
    is dropped from state once the click-side watermark passes
    error_ts + 10min, and vice versa. Without the time-range condition
    state would grow unboundedly — this is THE correctness/scale contract
    of stream-stream joins. Output mode must be append (join emits a row
    exactly when both sides have arrived)."""
    errors, clicks = _error_click_sides(spark, sf_dir)
    joined = _error_click_join(errors, clicks, "inner")
    return _run_to_memory(
        joined, mode="append", state_partitions=JOIN_STATE_PARTITIONS
    )


def _error_click_sides(spark: SparkSession, sf_dir: str):
    """Watermarked error/click sides off ONE source stream (a second
    read_events_stream call would repeat the schema probe)."""
    ev = read_events_stream(spark, sf_dir)
    errors = (
        ev.filter(F.col("event_type") == "error")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("error_event_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("e_ts"),
        )
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    return errors, clicks


def _error_click_join(errors: DataFrame, clicks: DataFrame, how: str) -> DataFrame:
    return errors.join(
        clicks,
        (F.col("e_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") > F.col("e_ts"))
        & (F.col("c_ts") <= F.col("e_ts") + F.expr("INTERVAL 600 SECOND")),
        how,
    ).select(
        "error_event_id",
        "click_event_id",
        F.col("e_user_id").alias("user_id"),
        # exact integer microsecond difference, ONE rounding at the final
        # divide — casting each timestamp to double first rounds twice
        # (~0.5 µs ulp at 2024 epochs) and can diverge from the oracle's
        # date_diff('microsecond')/1e6 in the last bits
        (
            (F.unix_micros("c_ts") - F.unix_micros("e_ts")).cast("double")
            / F.lit(1_000_000.0)
        ).alias("gap_sec"),
    )


def stream_stream_error_click_left_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every error row, with its
    in-window clicks or a single null-click row — the "did anyone react?"
    shape of incident pipelines, and the semantics the inner join can't
    express.

    The outer-specific contract: an unmatched error can only be EMITTED
    once the engine can prove no matching click will ever arrive — i.e.
    when the global watermark (min over both sides' ``max(ts) − delay``)
    passes the error's join window ``e_ts + 600s`` (strictly). Errors
    whose window the final watermark never passes stay in state forever
    and are NOT emitted: on a bounded replay the result therefore equals
    the batch left join MINUS unmatched errors within the trailing
    (delay + 600s) horizon — this is inherent to outer stream joins, not
    an artifact of the harness, and the oracle encodes exactly that
    cutoff. State size and eviction are identical to the inner form."""
    errors, clicks = _error_click_sides(spark, sf_dir)
    joined = _error_click_join(errors, clicks, "left_outer")
    # no_data_batches=True is REQUIRED here: the unmatched-error rows are
    # emitted by the trailing watermark-advancing batch (see _run_to_memory)
    return _run_to_memory(
        joined,
        mode="append",
        state_partitions=JOIN_STATE_PARTITIONS,
        no_data_batches=True,
    )


def stream_static_enriched_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the stateless lookup every event
    pipeline runs: a purchase stream joined per-micro-batch against a
    static dimension table (customer segment).

    Unlike a stream-stream join there is NO state store and no watermark
    requirement: the static side is (re)planned into each micro-batch —
    Catalyst broadcasts it below the auto-broadcast threshold, so at
    100 TB/day stream volume the enrichment is a per-batch broadcast-hash
    join, the same plan a batch enrichment gets."""
    from ..sources import load_table

    ev = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = ev.join(cust, ev["user_id"] == cust["c_custkey"]).select(
        "event_id", "user_id", "c_mktsegment", "value"
    )
    return _run_to_memory(joined, mode="append")


def stream_dedup_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: collapse repeated (user, event_type)
    activity within the same minute to one row — the exactly-once /
    retry-collapse shape every event-ingest pipeline needs.

    ``dropDuplicates`` keeps one row per key in the state store; the
    watermark on the minute column lets Spark EVICT keys older than the
    horizon, so state is bounded by keys-per-hour, not stream length —
    without an event-time column in the dedup key the state would grow
    forever. Output is the distinct key set, which is order-independent
    and therefore exactly the batch DISTINCT (oracle) WHEN every
    duplicate arrives within the watermark horizon of its first
    occurrence — that bounded-lateness contract is precisely what the
    eviction trades for bounded state: a duplicate arriving after its
    key was evicted re-emits, and a key wholly later than the watermark
    is dropped. The single-file replay here satisfies the contract by
    construction; a deployment sizes the horizon to its real dedup
    window (e.g. the producer's max retry delay)."""
    ev = read_events_stream(spark, sf_dir)
    keys = (
        ev.select(
            "user_id",
            "event_type",
            F.date_trunc("minute", "ts").alias("minute_start"),
        )
        .withWatermark("minute_start", "1 hour")
        .dropDuplicates(["user_id", "event_type", "minute_start"])
    )
    return _run_to_memory(keys, mode="append")


def stream_kmeans_scoring(
    spark: SparkSession,
    sf_dir: str,
    centroids: list[list[float]],
) -> DataFrame:
    """foreachBatch incremental model scoring: each micro-batch of vectors
    is assigned to its nearest centroid (same expression as the batch
    path) and per-cluster counts are merged into a driver-side running
    state — the streaming analogue of the reference's scoring pass, with
    the centroid set as the broadcast model."""
    from ..operators.kmeans_df import assign_clusters

    # Probe the file's own schema like read_events_stream does — a
    # hard-coded struct silently misreads a regenerated fixture whose
    # embedding element type or column set changed (the batch loader
    # adapts automatically; the stream source must be told). Memoized per
    # (sf_dir, session, source fingerprint) in the same _PROBED_SCHEMA
    # dict the events probe uses — the footer read costs a driver job's
    # worth of latency per invocation otherwise.
    from ..artifacts import source_fingerprint

    _key = (
        os.path.abspath(sf_dir) + "#embeddings",
        spark.sparkContext.applicationId,
        source_fingerprint(f"{sf_dir}/embeddings.parquet"),
    )
    schema = _PROBED_SCHEMA.get(_key)
    if schema is None:
        schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
        _remember_schema(_key, schema)
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )

    totals: dict[int, int] = {}

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        counts = (
            assign_clusters(batch_df, centroids)
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in counts:
            totals[r["cluster_id"]] = totals.get(r["cluster_id"], 0) + r["n"]

    # stateless foreachBatch: a trailing no-data batch would only call
    # score_batch with an empty frame — skip it (same rationale and
    # restore discipline as _run_to_memory)
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = stream.writeStream.foreachBatch(score_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )

    rows = [(cid, n) for cid, n in sorted(totals.items())]
    return spark.createDataFrame(rows, "cluster_id int, num_points bigint")
