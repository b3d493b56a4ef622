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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "embeddings":
        df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    from ..session import TABLES

    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
