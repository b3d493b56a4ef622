"""Parquet table loaders for the driver-generated testdata tables.

Native format is Parquet (columnar scan, predicate pushdown, column
pruning — all free from Catalyst). The only normalization applied on
load is casting ``embeddings.embedding`` from ``array<float>`` to
``array<double>``: the reference's data plane is double-typed
(``Point.java:12`` — ``ArrayList<Double>``), and float->double widening
is exact, so Spark and the DuckDB oracle see identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to µs with
        # INTEGER division (double division loses precision at 1e18 ns).
        # DuckDB's parquet scan truncates ns->µs the same way, so the
        # oracle sees identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "embeddings":
        df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    from ..session import TABLES

    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
