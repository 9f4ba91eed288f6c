"""Projection / filter / predicate operators (SURVEY.md §2.2, P1–P10).

All predicates here are expressed as native Column expressions so
Catalyst pushes them into the parquet scan (``PushedFilters`` in
``explain("formatted")``) and prunes columns (``ReadSchema``). At 100 TB
that is the difference between scanning a table and scanning a few
row-group footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "p01_projection",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS mktsegment
    FROM customer
    """,
)
def p01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection / reorder (P1: cbddl/src/api/main.py:138-142).

    Catalyst column pruning means the parquet scan reads only these three
    columns' pages.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


@query(
    "p02_flag_filter",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderstatus AS status, o_totalprice AS totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def p02_flag_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag/equality filter partitioning the dataset.

    P2/P10: ``df[df['Is Individual Owner'] == True]``
    (cbddl/src/analytics/demographics_analyzer.py:18-19;
    cbddl/src/etl/pipeline.py:436). Pushed to the scan as an equality
    filter on a dictionary-encoded column.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )


@query(
    "p03_point_lookup",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           o_orderstatus AS status, o_totalprice AS totalprice
    FROM orders
    WHERE o_orderkey = 42
    """,
)
def p03_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (P3: cbddl/src/api/main.py:178).

    Pushed down as an equality predicate; parquet row-group min/max stats
    skip every row group that cannot contain the key.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 42).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )


@query(
    "p04_ci_substring",
    oracle="""
    SELECT p_partkey AS partkey, p_name AS name
    FROM part
    WHERE UPPER(p_name) LIKE '%WIDGET%'
    """,
)
def p04_ci_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring search.

    P4: ``str.contains(search, case=False)`` on names
    (cbddl/src/api/main.py:135,233,236;
    cbddl/src/analytics/demographics_analyzer.py:109,120).
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.upper(F.col("p_name")).contains("WIDGET")).select(
        F.col("p_partkey").alias("partkey"), F.col("p_name").alias("name")
    )


@query(
    "p05_regex_predicate",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE REGEXP_MATCHES(text, '\\bstream\\b.*\\bwindow\\b')
    """,
)
def p05_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate over text.

    P5: digit / non-alpha / word-boundary regexes
    (cbddl/src/analytics/demographics_analyzer.py:75-77,151-156).
    """
    documents = load_table(spark, sf_dir, "documents")
    return documents.filter(F.col("text").rlike(r"\bstream\b.*\bwindow\b")).select(
        "doc_id", "lang"
    )


@query(
    "p06_null_drop",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL
    """,
)
def p06_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-drop on a column subset before analysis.

    P6/P7: ``.dropna()`` / ``WHERE x IS NOT NULL``
    (cbddl/src/analytics/demographics_analyzer.py:52,129,191;
    cbddl/src/etl/pipeline.py:312-313). IS NOT NULL pushes down to the
    parquet null-count statistics.
    """
    documents = load_table(spark, sf_dir, "documents")
    return documents.na.drop(subset=["text", "lang"])


@query(
    "p08_batch_scoped",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE user_id = 7
    """,
)
def p08_batch_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scope rows to one processing unit's key.

    P8: ``WHERE batch_id = :batch_id`` (cbddl/src/etl/pipeline.py:220-221).
    The test tables have no batch_id; user_id plays the scoping key. In
    the warehouse pipeline (plans/warehouse.py) batch_id is a real column
    and also the write-partition key, so this filter becomes partition
    pruning (zero-I/O for other batches).
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("user_id") == 7).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "p09_time_range",
    oracle="""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-29 00:00:00'
    """,
)
def p09_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range predicate (recent-window scan).

    P9: ``WHERE created_at > NOW() - INTERVAL '1 hour'``
    (cbddl/src/monitoring/pipeline_monitor.py:165,220,294). A fixed
    boundary replaces NOW() so the result is deterministic; the interval
    arithmetic itself is exercised in f13_time_arith. Timestamp
    predicates prune on parquet row-group min/max — and on date
    partitions when the lake is date-partitioned (S7).
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("ts") > F.lit("2024-01-29 00:00:00").cast("timestamp")).select(
        "event_id", "ts", "event_type", "value"
    )


@query(
    "ts01_hourly_rollup",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           ROUND(COUNT(CASE WHEN event_type = 'error' THEN 1 END) * 100.0 / COUNT(*), 2)
               AS error_rate_pct,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def ts01_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational monitoring rollup: per-hour throughput + error rate.

    The batch form of the reference's monitor queries (events/min and
    error-rate windows, cbddl/src/monitoring/pipeline_monitor.py:
    152-207) — date_trunc bucketing plus conditional aggregates in one
    pass. The streaming twin is windowed_user_stats (streaming/jobs.py);
    at scale this rollup is what lands in the gold layer for dashboards
    (reference's agg_daily_* tables, schema.sql:167-199, at hour grain).
    """
    events = load_table(spark, sf_dir, "events")
    errors = F.count(F.when(F.col("event_type") == "error", 1))
    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count("*").alias("n_events"),
            errors.alias("n_errors"),
            F.round(errors * 100.0 / F.count("*"), 2).alias("error_rate_pct"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
