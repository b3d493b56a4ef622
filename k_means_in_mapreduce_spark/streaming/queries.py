"""Registry entries for the streaming surface.

Each streaming query materializes through a memory sink and is checked
against the SAME batch-semantics DuckDB oracle as its batch twin — the
engine's batch/stream equivalence contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import _ASSIGN_CTE, _fixed_centroids, query
from . import windows as W


@query(
    "stream_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           sum(value) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.stream_tumbling_hourly(spark, sf_dir)


@query(
    "stream_sliding_quarter_hour",
    """
    SELECT TIMESTAMP '1970-01-01'
               + INTERVAL (floor(epoch(ts) / 900) * 900 - t.i * 900) SECOND
               AS window_start,
           event_type,
           count(*) AS n_events,
           sum(value) AS total_value
    FROM events CROSS JOIN range(0, 4) t(i)
    GROUP BY window_start, event_type
    """,
)
def stream_sliding_quarter_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding by 15min: every event belongs to exactly 4
    windows — the oracle enumerates them by bucket arithmetic."""
    return W.stream_sliding_quarter_hour(spark, sf_dir)


@query(
    "stream_session_windows",
    """
    WITH gaps AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, sum(value) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30min). NOTE the oracle splits on gap >= 30min
    (strict window-overlap semantics of session_window), vs the batch
    ``events_sessionized`` which splits on gap > 30min — they differ only
    on gaps of exactly 30:00.000000."""
    return W.stream_session_windows(spark, sf_dir)


@query(
    "stream_range_error_click",
    """
    SELECT e.event_id AS error_event_id,
           c.event_id AS click_event_id,
           e.user_id,
           CAST(date_diff('microsecond', e.ts, c.ts) AS DOUBLE) / 1000000.0
               AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND c.ts > e.ts
     AND c.ts <= e.ts + INTERVAL 600 SECOND
    """,
)
def stream_range_error_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join — must produce exactly the
    batch range-join's rows (batch/stream equivalence on joins)."""
    return W.stream_stream_error_click_join(spark, sf_dir)


@query(
    "stream_left_error_click",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         wm AS (
             SELECT least((SELECT max(ts) FROM e), (SELECT max(ts) FROM c))
                        - INTERVAL 1 HOUR AS w
         )
    SELECT e.event_id AS error_event_id,
           c.event_id AS click_event_id,
           e.user_id,
           CAST(date_diff('microsecond', e.ts, c.ts) AS DOUBLE) / 1000000.0
               AS gap_sec
    FROM e JOIN c
      ON e.user_id = c.user_id
     AND c.ts > e.ts
     AND c.ts <= e.ts + INTERVAL 600 SECOND
    UNION ALL
    SELECT e.event_id, CAST(NULL AS BIGINT), e.user_id, CAST(NULL AS DOUBLE)
    FROM e, wm
    WHERE e.ts + INTERVAL 600 SECOND < wm.w
      AND NOT EXISTS (
          SELECT 1 FROM c
          WHERE c.user_id = e.user_id
            AND c.ts > e.ts
            AND c.ts <= e.ts + INTERVAL 600 SECOND
      )
    """,
)
def stream_left_error_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join. The oracle is the batch
    left join PLUS the outer join's watermark-expiry contract: an
    unmatched error row is emitted iff the final global watermark
    (min of both sides' max(ts), minus the 1h delay) strictly passes its
    join window e_ts + 600s — unmatched errors in the trailing horizon
    stay in state and are never emitted on a bounded replay. The cutoff
    rule is pinned empirically (verified identical at sf0.001/0.01/0.1)
    and hash-bound by this oracle."""
    return W.stream_stream_error_click_left_join(spark, sf_dir)


@query(
    "stream_static_enriched_purchases",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def stream_static_enriched_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless stream-static dimension join — must equal the batch
    join exactly (no state, no watermark, no late-data semantics)."""
    return W.stream_static_enriched_purchases(spark, sf_dir)


@query(
    "stream_dedup_clicks",
    """
    SELECT DISTINCT user_id, event_type,
           CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute_start
    FROM events
    """,
)
def stream_dedup_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-evicted streaming dropDuplicates — result must equal the
    batch DISTINCT over the same keys."""
    return W.stream_dedup_clicks(spark, sf_dir)


@query(
    "stream_kmeans_scoring",
    f"""WITH {_ASSIGN_CTE}
    SELECT cluster_id, count(*) AS num_points FROM assign GROUP BY cluster_id""",
)
def stream_kmeans_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch streaming assignment against the fixed centroid model;
    running per-cluster totals must equal the batch cluster sizes."""
    cents = _fixed_centroids(spark, sf_dir)
    return W.stream_kmeans_scoring(spark, sf_dir, cents)
