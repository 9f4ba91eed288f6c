"""Projection / filter / predicate operators (SURVEY.md §2.2, P1–P10).

All predicates here are expressed as native Column expressions so
Catalyst pushes them into the parquet scan (``PushedFilters`` in
``explain("formatted")``) and prunes columns (``ReadSchema``). At 100 TB
that is the difference between scanning a table and scanning a few
row-group footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
           -- centi-units (skew01's integer rule): exact at any fold order
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total_value_v100
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
            F.sum(F.floor(F.col("value") * 100)).alias("total_value_v100"),
        )
    )


@query(
    "ts02_cohort_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
        FROM events
    )
    -- cohort_day ships as an ISO string: Spark DATE -> pandas date
    -- objects vs DuckDB DATE -> datetime64 breaks the driver's hash.
    SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
           DATE_DIFF('day', c.cohort_day, a.active_day) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    WHERE DATE_DIFF('day', c.cohort_day, a.active_day) BETWEEN 0 AND 7
    GROUP BY c.cohort_day, day_offset
    ORDER BY c.cohort_day, day_offset
    """,
)
def ts02_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active N days after their first-seen day.

    The standard product-analytics rollup (cohort = first-activity
    date; cells = distinct users active at each day offset). Dataflow:
    per-user min-date aggregate (one user-key shuffle) and the DISTINCT
    (user, day) activity set reuse the SAME user partitioning for their
    join — at 100 TB the daily-distinct pre-dedup is what keeps the
    join input one row per user-day instead of one per event. The final
    (cohort, offset) agg is tiny (cohorts × 8 offsets).
    """
    events = load_table(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = events.select("user_id", F.to_date("ts").alias("active_day")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff("active_day", "cohort_day"))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "ts03_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def ts03_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → later click → later purchase, per user.

    Order-dependent sequence matching (NOT three independent filters:
    each stage's earliest timestamp must follow the previous stage's).
    Each stage is a conditional min-aggregate joined back on the user
    key — every shuffle is user-cardinality, and all three stages plus
    the joins share one user_id partitioning, so Spark plans a single
    exchange chain rather than re-partitioning per stage. The stage
    counts land in one row via a 1-row cross join (no collect).
    """
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


@query(
    "ts04_deviation_from_mean",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, SUM(value) AS day_value
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    -- day ships as an ISO string (Spark date objects vs DuckDB
    -- datetime64 breaks the driver's dtype-sensitive hash)
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           ROUND(day_value, 4) AS day_value,
           ROUND(AVG(day_value) OVER (PARTITION BY event_type), 4) AS type_avg,
           ROUND(ABS(day_value / AVG(day_value) OVER (PARTITION BY event_type) - 1), 4)
               AS dev_frac
    FROM daily
    QUALIFY ABS(day_value / AVG(day_value) OVER (PARTITION BY event_type) - 1) > 0.05
    ORDER BY event_type, day
    """,
)
def ts04_deviation_from_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous days: daily value vs the series mean (TPC-DS Q47 shape).

    The category-average-vs-member-deviation pattern: aggregate to
    (event_type, day) grain, window-average within each event_type,
    keep days deviating >5% from their series mean. Complements dq03
    (lag vs previous day) and dq04 (distribution shape) with the
    level-vs-trend check. The executed plan carries TWO hash exchanges
    — one for the (event_type, day) aggregate, then a re-shuffle to
    event_type alone for the window (the coarser key does NOT satisfy
    the finer partitioning) — but both move post-aggregation rows
    (~150 at sf0.01), so the cost is noise; what matters at scale is
    that no window touches raw events. Deviation is computed from
    UNROUNDED sums on both engines; rounding happens only at output.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("day_value"))
    )
    w = Window.partitionBy("event_type")
    # Both window columns are materialized BEFORE the deviation filter —
    # like SQL QUALIFY — otherwise the average would re-evaluate over
    # only the surviving rows.
    return (
        daily.select(
            "event_type",
            "day",
            "day_value",
            F.avg("day_value").over(w).alias("avg_raw"),
        )
        .withColumn("dev", F.abs(F.col("day_value") / F.col("avg_raw") - 1))
        .filter(F.col("dev") > 0.05)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("day_value", 4).alias("day_value"),
            F.round("avg_raw", 4).alias("type_avg"),
            F.round("dev", 4).alias("dev_frac"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts05_all_channel_users",
    oracle="""
    SELECT user_id, COUNT(*) AS first_week_events
    FROM events
    WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY user_id
    HAVING COUNT(DISTINCT event_type) = 5
    ORDER BY user_id
    """,
)
def ts05_all_channel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in ALL channels in week one (TPC-DS Q38 shape).

    TPC-DS writes this as an INTERSECT chain (customers in store ∩
    catalog ∩ web); the scalable rewrite is one scan + grouped distinct
    count = k — no k-way self-join, no repeated scans of the fact. The
    time predicate pushes to the parquet scan; the only shuffle is the
    user_id aggregation, with partial distinct-aggregation map-side.
    Engine-parity note: HAVING on count distinct, output carries the
    plain per-user event count alongside.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("first_week_events"),
            F.countDistinct("event_type").alias("nt"),
        )
        .filter(F.col("nt") == 5)
        .select("user_id", "first_week_events")
        .orderBy("user_id")
    )
