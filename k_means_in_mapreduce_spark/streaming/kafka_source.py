"""Transport-pluggable events stream source (SURVEY §2.9 scale note).

The streaming queries in this package are written against ONE logical
events schema — ``(event_id, ts, user_id, event_type, value, props)``.
The test harness replays parquet through the file source
(``windows.read_events_stream``); a production deployment swaps the
TRANSPORT and keeps every transformation, watermark, and state layout
identical. This module makes that swap concrete:

- ``events_kafka_stream`` — the production branch: Kafka source, one JSON
  event per record, ``from_json`` into the same schema. Needs the
  ``spark-sql-kafka`` connector on the classpath and a broker; in this
  container neither exists, so the builder raises the connector's own
  "Failed to find data source" AnalysisException — tests pin that the
  failure is clean and early, and everything downstream of the parse is
  shared code that IS tested (via the rate branch).
- ``events_rate_stream`` — a broker-less stand-in on the built-in
  ``rate-micro-batch`` source: deterministic synthetic events derived
  arithmetically from the row counter, so transport-agnostic tests can
  assert exact per-type counts. This is the branch CI exercises.

Scale notes (Kafka branch): partitions of the source topic bound read
parallelism — size topic partitions ~ executor cores; ``maxOffsetsPerTrigger``
bounds per-batch work so state checkpoints stay regular under backlog;
the JSON parse is a narrow map (no shuffle before the first stateful op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One logical event, as carried in a Kafka record's value (JSON).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENT_TYPES = ("click", "view", "purchase", "error")


def events_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Events stream over Kafka — the production transport.

    Fails at ``.load()`` with the connector's AnalysisException when
    ``spark-sql-kafka`` is absent (this container) — deliberately not
    wrapped: the upstream error names the missing artifact and the fix.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e")
    ).select("e.*")


def events_rate_stream(
    spark: SparkSession, rows_per_batch: int = 100, start_ts: str = "2024-01-01"
) -> DataFrame:
    """Deterministic synthetic events on the built-in ``rate-micro-batch``
    source — same schema as the Kafka branch, no broker needed.

    Row counter ``value`` drives every field, so batch 0 is exactly rows
    0..rows_per_batch-1 and per-type counts are predictable in tests."""
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .load()
    )
    v = F.col("value")
    return rate.select(
        v.alias("event_id"),
        (F.to_timestamp(F.lit(start_ts)) + F.make_interval(secs=v * 60)).alias(
            "ts"
        ),
        (v % 50).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]), (v % 4 + 1).cast("int")
        ).alias("event_type"),
        (v % 97).cast("double").alias("value"),
        F.to_json(F.struct((v % 7).alias("variant"))).alias("props"),
    )
