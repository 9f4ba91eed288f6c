"""Monitoring operators: metrics snapshot + rolling time-frame health.

Engine-side parity for the reference's monitoring layer
(cbddl/src/monitoring/pipeline_monitor.py:1-150), which exports
Prometheus-style gauges/counters (row counts, null rates, freshness)
from driver-side loops. Here each gauge is a column aggregate and the
whole snapshot is ONE long-format relation — the shape a metrics
scraper or a `foreachBatch` metrics sink consumes directly, computed
with map-side partial aggregation instead of per-table driver polls.

ts06 extends the ts* family (filters.py) with the TPC-DS-style rolling
window: per-key trailing 30-day RANGE frame over the daily grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

ROLLING_DAYS = 30
_EPOCH_DAY0 = "2024-01-01"


def epoch_seconds_ntz(col_name: str):
    """Epoch seconds (fractional micros kept) of an NTZ timestamp column.

    Field extraction, not unix_timestamp (session-TZ-dependent and
    truncates to seconds) or unix_micros (LTZ-only). unix_date is
    int32, so it is cast to long BEFORE the 86400 multiply — the bare
    int product overflows (ANSI: throws) for dates >= 2038-01-19.
    """
    return (
        F.unix_date(F.col(col_name).cast("date")).cast("long") * 86400
        + F.hour(col_name) * 3600
        + F.minute(col_name) * 60
        + F.expr(f"date_part('SECOND', {col_name})")
    )


@query(
    "ts06_rolling_30d_frame",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               DATE_DIFF('day', DATE '{_EPOCH_DAY0}', CAST(ts AS DATE)) AS day_num,
               SUM(value) AS day_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    )
    -- day ships as an ISO string; windowed SUM(int) CAST to BIGINT
    -- (DuckDB HUGEINT -> pandas float64 breaks the driver dtype hash)
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           ROUND(day_value, 4) AS day_value,
           ROUND(AVG(day_value) OVER w, 4) AS avg_30d,
           CAST(SUM(n_events) OVER w AS BIGINT) AS events_30d,
           CAST(COUNT(*) OVER w AS INT) AS days_in_frame
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                 RANGE BETWEEN {ROLLING_DAYS - 1} PRECEDING AND CURRENT ROW)
    """,
)
def ts06_rolling_30d_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day rolling aggregate per key (TPC-DS Q47/Q57 shape).

    The level-vs-trend monitor at monthly horizon: aggregate events to
    the (event_type, day) grain, then a RANGE frame over a NUMERIC day
    index computes each day's trailing-30-day average and volume.
    RANGE (not ROWS) is load-bearing: a gap day must not stretch the
    frame to 30 *observed* rows — the frame is defined by the calendar,
    so missing days shrink it. The window runs over the daily
    aggregate, never raw events (at 100 TB the daily grain is ~10^5
    rows per key-year — window input stays post-aggregation). The plan
    carries two exchanges — (event_type, day) for the aggregate, then
    event_type alone for the window (the coarser key does not satisfy
    the finer partitioning; same posture as ts04) — but both move
    daily-grain rows, never raw events.
    ``days_in_frame`` makes partial frames (series head) explicit so
    consumers can suppress alerts until the window fills.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    daily = events.groupBy(
        "event_type",
        day.alias("day"),
        F.datediff(day, F.lit(_EPOCH_DAY0).cast("date")).alias("day_num"),
    ).agg(F.sum("value").alias("day_value"), F.count("*").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("day_value", 4).alias("day_value"),
        F.round(F.avg("day_value").over(w), 4).alias("avg_30d"),
        F.sum("n_events").over(w).alias("events_30d"),
        F.count("*").over(w).cast("int").alias("days_in_frame"),
    )


@query(
    "mon01_metrics_snapshot",
    oracle="""
    SELECT 'orders_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM orders
    UNION ALL
    SELECT 'lineitem_rows', CAST(COUNT(*) AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT 'events_rows', CAST(COUNT(*) AS DOUBLE) FROM events
    UNION ALL
    SELECT 'documents_rows', CAST(COUNT(*) AS DOUBLE) FROM documents
    UNION ALL
    SELECT 'events_distinct_users', CAST(COUNT(DISTINCT user_id) AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'events_freshness_epoch_s', CAST(EPOCH(MAX(ts)) AS DOUBLE) FROM events
    UNION ALL
    SELECT 'events_null_props_frac',
           ROUND(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6)
    FROM events
    UNION ALL
    SELECT 'orders_avg_totalprice', ROUND(AVG(o_totalprice), 4) FROM orders
    UNION ALL
    SELECT 'documents_avg_chars', ROUND(AVG(CAST(n_chars AS DOUBLE)), 4)
    FROM documents
    """,
)
def mon01_metrics_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One long-format metrics snapshot: (metric, value) gauge rows.

    The engine-side form of the reference's Prometheus export
    (pipeline_monitor.py's row-count / freshness / null-rate gauges):
    every gauge is a column aggregate with map-side partials, the
    per-table scans run as independent 1-row jobs unioned into one
    relation, and the output shape is scraper-ready long format — no
    driver-side loops over tables, no per-metric round trips. At scale
    each leg reads only the columns its gauges need (count-only legs
    scan zero columns via parquet row-group counts).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def gauge(name: str, df_agg: DataFrame) -> DataFrame:
        return df_agg.select(
            F.lit(name).alias("metric"), F.col("value").cast("double").alias("value")
        )

    legs = [
        gauge("orders_rows", orders.agg(F.count("*").alias("value"))),
        gauge("lineitem_rows", lineitem.agg(F.count("*").alias("value"))),
        gauge("events_rows", events.agg(F.count("*").alias("value"))),
        gauge("documents_rows", documents.agg(F.count("*").alias("value"))),
        gauge(
            "events_distinct_users",
            events.agg(F.countDistinct("user_id").alias("value")),
        ),
        gauge(
            "events_freshness_epoch_s",
            events.agg(F.max("ts").alias("mx")).select(
                epoch_seconds_ntz("mx").alias("value")
            ),
        ),
        gauge(
            "events_null_props_frac",
            events.agg(
                F.round(
                    F.sum(F.when(F.col("props").isNull(), 1).otherwise(0))
                    / F.count("*"),
                    6,
                ).alias("value")
            ),
        ),
        gauge(
            "orders_avg_totalprice",
            orders.agg(F.round(F.avg("o_totalprice"), 4).alias("value")),
        ),
        gauge(
            "documents_avg_chars",
            documents.agg(
                F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("value")
            ),
        ),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
