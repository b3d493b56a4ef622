"""Statistical aggregates, sketches, and semi-structured extraction
(SURVEY §2.4 "[absent]" distinct/statistics rows + §2.7 json functions —
completing the scalar/aggregate surface with Spark builtins).

- exact quantiles (``percentile`` — linear interpolation, matches
  DuckDB's ``quantile_cont``)
- moments: stddev/variance/skewness-free stats per group
- exact COUNT(DISTINCT) (plans as a two-stage partial-distinct
  aggregate) and the HLL sketch variant (``approx_count_distinct``) as
  the at-scale path
- JSON path extraction from the ``events.props`` string column
  (``get_json_object`` — codegen'd, no UDF)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "lineitem_price_quantiles",
    """
    SELECT l_returnflag,
           count(*) AS n_rows,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per return flag. Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share the linear-interpolation
    definition, so this is hash-comparable. At 100 TB the drop-in
    replacement is ``approx_percentile`` (t-digest style sketch, mergeable
    partial state)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
        F.percentile("l_extendedprice", F.lit(0.50)).alias("p50"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
    )


@query(
    "orders_price_moments",
    """
    SELECT o_orderstatus,
           avg(o_totalprice) AS mean_price,
           stddev_samp(o_totalprice) AS sd_price,
           var_samp(o_totalprice) AS var_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def orders_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per status — single partial/final
    aggregation pass (sum, sum-of-squares partials)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.avg("o_totalprice").alias("mean_price"),
        F.stddev_samp("o_totalprice").alias("sd_price"),
        F.var_samp("o_totalprice").alias("var_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "events_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinality per type (two-stage partial-distinct
    plan)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@query("events_distinct_users_hll")  # sketch — approximate, rows-only
def events_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch — the at-scale variant of
    events_distinct_users: constant-size mergeable state instead of a
    per-group hash set. tests assert relative error < 5% vs exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx")
    )


@query(
    "events_props_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           avg(CAST(props->>'$.k' AS BIGINT)) AS avg_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props string column
    (``get_json_object`` — codegen'd expression, no UDF, pushes the parse
    into the scan stage)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg(k).alias("avg_k"),
        F.max(k).alias("max_k"),
    )
