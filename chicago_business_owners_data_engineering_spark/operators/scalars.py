"""Scalar-function surface (SURVEY.md §2.8, F1–F20).

Every scalar family the reference uses, as native Column expressions —
all of these fuse into whole-stage codegen (no shuffle, no UDF). The
cleaning semantics (null-token map, trim/upper, concat_ws null-skip)
live in :mod:`..functions.cleaning` and are exercised here plus in unit
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cleaning import normalize_string, null_if_token
from ..registry import query


@query(
    "f01_normalize_strings",
    oracle="""
    SELECT p_partkey AS partkey,
           UPPER(TRIM(p_name)) AS name_norm,
           NULLIF(TRIM(p_brand), '') AS brand_norm
    FROM part
    """,
)
def f01_normalize_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim + uppercase + empty→null normalization.

    F1/F2: ``str.strip().str.upper()`` + ``.replace('', nan)``
    (cbddl/src/data_ingestion/ingestion_pipeline.py:86-99;
    cbddl/src/etl/pipeline.py:131-134).
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        normalize_string(F.col("p_name")).alias("name_norm"),
        null_if_token(F.trim(F.col("p_brand"))).alias("brand_norm"),
    )


@query(
    "f03_concat_ws_names",
    oracle="""
    SELECT c_custkey AS custkey,
           CONCAT_WS(' ', NULLIF(c_mktsegment, 'FURNITURE'), c_name) AS display_name
    FROM customer
    """,
)
def f03_concat_ws_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-skipping string concatenation (the combine_name semantics).

    F3/U1: the reference's only true row-UDF — first/mi/last/suffix
    joined skipping nulls (cbddl/src/data_ingestion/ingestion_pipeline.py:109-123,
    3 copies) — replaced by ``concat_ws``, which skips NULLs exactly like
    the pandas apply. NULLIF injects nulls to prove the skip.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("custkey"),
        F.concat_ws(
            " ", F.nullif(F.col("c_mktsegment"), F.lit("FURNITURE")), F.col("c_name")
        ).alias("display_name"),
    )


@query(
    "f08_case_classification",
    oracle="""
    SELECT p_partkey AS partkey,
           CASE
               WHEN p_size < 10 THEN 'small'
               WHEN p_size < 30 THEN 'medium'
               ELSE 'large'
           END AS size_class,
           CASE
               WHEN p_type IN ('PROMO', 'ECONOMY') THEN 'discount'
               WHEN p_type = 'STANDARD' THEN 'standard'
               ELSE 'premium'
           END AS tier
    FROM part
    """,
)
def f08_case_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CASE WHEN classification (F8/U4).

    business_type / size-bucket / role-category classifiers
    (cbddl/src/etl/pipeline.py:299-310;
    cbddl/src/big_data/streaming_processor.py:285-307).
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.when(F.col("p_type").isin("PROMO", "ECONOMY"), "discount")
        .when(F.col("p_type") == "STANDARD", "standard")
        .otherwise("premium")
        .alias("tier"),
    )


@query(
    "f12_date_parts",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(QUARTER(o_orderdate) AS INT) AS qtr,
           CAST(MONTH(o_orderdate) AS INT) AS mon,
           CAST(DAY(o_orderdate) AS INT) AS dom,
           CAST(DAYOFWEEK(o_orderdate) AS INT) AS dow,
           DAYNAME(o_orderdate) AS day_name,
           MONTHNAME(o_orderdate) AS month_name,
           DAYOFWEEK(o_orderdate) IN (0, 6) AS is_weekend
    FROM orders
    """,
)
def f12_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + calendar names + weekend flag.

    F12: EXTRACT(YEAR/QUARTER/MONTH/DAY/DOW), TO_CHAR day/month names
    (cbddl/database/schema.sql:300-311). DOW normalized to DuckDB's
    0=Sunday..6 convention (Spark's dayofweek is 1=Sunday..7).
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    dow0 = (F.dayofweek(d) - 1).cast("int")  # 0=Sunday .. 6=Saturday
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year(d).cast("int").alias("yr"),
        F.quarter(d).cast("int").alias("qtr"),
        F.month(d).cast("int").alias("mon"),
        F.dayofmonth(d).cast("int").alias("dom"),
        dow0.alias("dow"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        dow0.isin(0, 6).alias("is_weekend"),
    )


@query(
    "f13_time_arith",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 1 DAY AS ts_plus_day,
           DATE_TRUNC('hour', ts) AS ts_hour,
           ts > TIMESTAMP '2024-01-30 00:00:00' - INTERVAL 24 HOUR AS in_last_day
    FROM events
    """,
)
def f13_time_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + truncation + recency predicate.

    F13/P9: CURRENT_TIMESTAMP - INTERVAL '1 hour' patterns
    (cbddl/src/monitoring/pipeline_monitor.py:165; cbddl/database/schema.sql:314)
    with a fixed anchor replacing NOW() for determinism.
    """
    events = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-30 00:00:00").cast("timestamp")
    return events.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts_plus_day"),
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
        (F.col("ts") > anchor - F.expr("INTERVAL 24 HOURS")).alias("in_last_day"),
    )


@query(
    "f14_epoch_diff",
    oracle="""
    SELECT event_id,
           DATE_DIFF('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS secs_since_epoch_start
    FROM events
    """,
)
def f14_epoch_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-second timestamp difference.

    F14: ``EXTRACT(EPOCH FROM (processed_at - created_at))``
    (cbddl/src/monitoring/pipeline_monitor.py:163,355).
    """
    events = load_table(spark, sf_dir, "events")
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return events.select(
        "event_id",
        (F.unix_timestamp(F.col("ts")) - F.unix_timestamp(base)).alias(
            "secs_since_epoch_start"
        ),
    )


@query(
    "f15_strftime_partition_key",
    oracle="""
    SELECT DISTINCT STRFTIME(o_orderdate, '%Y%m%d') AS date_key
    FROM orders
    """,
)
def f15_strftime_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """yyyyMMdd partition/batch key formatting.

    F15: ``%Y%m%d`` partition ids (cbddl/src/data_lake/storage_manager.py:60;
    cbddl/src/etl/pipeline.py:30) — the date= lake partition key (S7).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.date_format(F.col("o_orderdate"), "yyyyMMdd").alias("date_key")
    ).distinct()


@query(
    "f16_surrogate_keys",
    oracle="""
    SELECT o_orderkey AS orderkey,
           MD5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)) AS surrogate_key
    FROM orders
    """,
)
def f16_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys (content-hash of the natural key).

    F16: the reference uses uuid4 (cbddl/database/schema.sql:14) —
    nondeterministic and unjoinable across reruns. A content hash keys
    identically on every run and every executor; ``uuid()`` remains
    available where true randomness is wanted (plans/warehouse.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.md5(
            F.concat_ws("|", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string"))
        ).alias("surrogate_key"),
    )


@query(
    "f18_json_decode",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
)
def f18_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string payload.

    F18: ``json.loads`` on Kafka messages
    (cbddl/src/big_data/streaming_processor.py:73). get_json_object
    pushes a single-path extraction; from_json with a schema is used in
    streaming/jobs.py where the whole payload is needed.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("prop_k"),
    )


@query(
    "f19_array_ops",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_distinct_types,
           ROUND(COUNT(DISTINCT event_type) * 1.0 / COUNT(*), 6) AS uniqueness_ratio
    FROM events
    GROUP BY user_id
    """,
)
def f19_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collected-list size / distinct-size / uniqueness ratio.

    F19: ``len(owners)``, ``set(owners)`` ratios
    (cbddl/src/big_data/streaming_processor.py:260-283;
    cbddl/src/api/main.py:181-185). Computed via collect_list/
    array_distinct to exercise the array path — semantically the
    count/countDistinct the oracle states.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.size(F.collect_list("event_type")).cast("long").alias("n_events"),
        F.size(F.array_distinct(F.collect_list("event_type"))).cast("long").alias(
            "n_distinct_types"
        ),
        F.round(
            F.size(F.array_distinct(F.collect_list("event_type")))
            / F.size(F.collect_list("event_type")),
            6,
        ).alias("uniqueness_ratio"),
    )


@query(
    "f13b_date_sequence",
    oracle="""
    -- Dates ship as ISO strings: pandas renders Spark DATE as date
    -- objects but DuckDB DATE as datetime64 — a dtype split the
    -- driver's hash flags even when the values match.
    SELECT CAST(CAST(d AS DATE) AS VARCHAR) AS cal_date,
           CAST(YEAR(d) AS INT) AS yr,
           CAST(MONTH(d) AS INT) AS mon
    FROM (
        SELECT UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-03-31', INTERVAL 1 DAY)) AS d
    )
    """,
)
def f13b_date_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension generator via sequence().

    F13: the reference populates dim_date with a SQL loop
    (cbddl/database/schema.sql:289-317); ``sequence()`` + explode
    generates the calendar declaratively.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cal_date")
    ).select(
        F.date_format("cal_date", "yyyy-MM-dd").alias("cal_date"),
        F.year("cal_date").cast("int").alias("yr"),
        F.month("cal_date").cast("int").alias("mon"),
    )


@query(
    "f23_parameterized_sql",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    """,
)
def f23_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL execution (``spark.sql(query, args=...)``).

    The injection-safe form of the reference's string-interpolated
    queries (cbddl/src/api/main.py builds WHERE clauses from request
    params; cbddl/src/etl/pipeline.py interpolates batch ids):
    parameters bind as typed literals in the parser, never via string
    concatenation, and the plan is cacheable across parameter values.
    """
    from ..catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__f23_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM __f23_orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_price": 1000.0},
    )


# --- f25: sequence-gap detection (gaps and islands) -----------------------------

# 4096-key shards, 4096 shards per supershard: the one global window
# runs over n / 2^24 summary rows.
F25_SHARD_BITS = 12
F25_SUPER_BITS = 12


@query(
    "f25_id_gap_islands",
    oracle="""
    WITH ks AS (
        SELECT o_orderkey AS k,
               LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           nxt - k - 1 AS gap_len
    FROM ks
    WHERE nxt > k + 1
    ORDER BY gap_len DESC, gap_start
    LIMIT 50
    """,
)
def f25_id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 50 widest missing-id ranges in the FINALIZED-order key
    sequence — the gaps half of gaps-and-islands (st01's
    sessionization is the islands half over time; this is the id-space
    audit that catches dropped loads and CDC holes; the status filter
    makes it the "which key ranges contain no finalized orders" audit,
    non-trivial on any corpus where the full key space is dense).

    Sharded gap scan, three levels, no global window over the keys:

    1. shard = k >> SHARD_BITS; per-shard LEAD finds every gap whose
       endpoints fall in the same 2^SHARD_BITS-wide id range (the
       window is PARTITIONED — parallel across the cluster).
    2. one (lo, hi) summary row per non-empty shard; a per-SUPERSHARD
       LEAD over those rows finds gaps between consecutive non-empty
       shards (again partitioned; empty shards are closed for free
       because only non-empty shards emit summary rows).
    3. one (lo, hi) row per non-empty supershard — n / 2^(SHARD_BITS +
       SUPER_BITS) rows, ≈ n/16.7M — closed by one bounded global
       LEAD (the post-aggregation posture: at 10^12 keys this relation
       is ~60k skinny rows).

    A gap exists exactly where the next key (or next unit's min) skips
    ahead; (k+1, next−1) delimits it — no self-join, no
    generate_series materialization of the id space (output stays
    proportional to the number of GAPS). All integers.

    Parity: beyond-reference (audit extension of dq02's existence
    checks; seed cbddl/src/etl/pipeline.py:205-267).
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    ks = orders.select(F.col("o_orderkey").alias("k"))
    return (
        sharded_gap_scan(ks)
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(50)
    )


def sharded_gap_scan(ks: DataFrame) -> DataFrame:
    """All (gap_start, gap_end, gap_len) missing ranges in column ``k``
    via the 3-level sharded scan documented on f25_id_gap_islands.
    """
    from pyspark.sql import Window

    def gaps(df: DataFrame, lo: str, hi: str, w) -> DataFrame:
        out = df.withColumn("nxt_lo", F.lead(lo).over(w))
        return out.filter(F.col("nxt_lo") > F.col(hi) + 1).select(
            (F.col(hi) + 1).alias("gap_start"),
            (F.col("nxt_lo") - 1).alias("gap_end"),
        )

    # Level 0: gaps interior to one shard (partitioned window).
    sharded = ks.withColumn("shard", F.shiftright("k", F25_SHARD_BITS))
    w0 = Window.partitionBy("shard").orderBy("hi")
    inner = gaps(
        sharded.withColumnRenamed("k", "hi").withColumn("lo", F.col("hi")),
        "lo",
        "hi",
        w0,
    )

    # Level 1: gaps between consecutive non-empty shards, partitioned
    # by supershard (one summary row per non-empty shard).
    shard_summary = sharded.groupBy("shard").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    )
    with_super = shard_summary.withColumn(
        "super", F.shiftright("shard", F25_SUPER_BITS)
    )
    w1 = Window.partitionBy("super").orderBy("shard")
    between_shards = gaps(with_super, "lo", "hi", w1)

    # Level 2: gaps between consecutive non-empty supershards — the
    # only global window, over an n/2^24-row bounded summary relation.
    super_summary = with_super.groupBy("super").agg(
        F.min("lo").alias("lo"), F.max("hi").alias("hi")
    )
    w2 = Window.orderBy("super")
    between_supers = gaps(super_summary, "lo", "hi", w2)

    return (
        inner.unionByName(between_shards)
        .unionByName(between_supers)
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
        )
    )


# --- f26: overlapping-interval coalescing --------------------------------------

F26_SPAN_DAYS = 30


@query(
    "f26_interval_merge",
    oracle=f"""
    WITH iv AS (
        SELECT o_custkey AS custkey,
               DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
               DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   + {F26_SPAN_DAYS} AS e
        FROM orders
    ), flagged AS (
        SELECT custkey, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT custkey, s, e,
               CAST(SUM(new_island) OVER (
                   PARTITION BY custkey ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS island_id
        FROM flagged
    )
    SELECT custkey, island_id,
           MIN(s) AS start_day, MAX(e) AS end_day,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM islands GROUP BY custkey, island_id
    ORDER BY custkey, island_id
    """,
)
def f26_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce overlapping intervals per key — the interval twin of
    f25's id-gap islands and the primitive behind activity episodes,
    maintenance-window merging, and coverage accounting.

    Each order opens a {F26_SPAN_DAYS}-day activity interval for its
    customer; touching/overlapping intervals merge into episodes. The
    classic two-window recipe: an interval starts a NEW island iff its
    start exceeds the running MAX(end) of everything before it (ROWS
    … 1 PRECEDING — plain LAG is wrong when an earlier interval
    engulfs its successor), then a cumulative SUM of the island flags
    numbers the episodes, and a per-(key, island) aggregate emits the
    merged spans. Dates become integer day numbers up front so every
    comparison is integer-exact cross-engine.

    Scale shape: both windows partition by the key — one key-hash
    exchange, per-key sort, no self-join, no explode-to-days (the
    naive calendar-explode form is O(days·rows)). Window input is the
    raw interval relation; at 100 TB this is the standard sessionize
    shape (st01 is its timestamp-gap sibling).
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    s = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    iv = orders.select(
        F.col("o_custkey").alias("custkey"),
        s.cast("long").alias("s"),
        (s + F26_SPAN_DAYS).cast("long").alias("e"),
    )
    order_w = Window.partitionBy("custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        order_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(
            order_w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("custkey", "island_id")
        .agg(
            F.min("s").alias("start_day"),
            F.max("e").alias("end_day"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("custkey", "island_id")
    )


@query(
    "f30_unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_centi,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
    )
    SELECT 'n_lines' AS metric, n_lines AS value FROM wide
    UNION ALL SELECT 'qty_centi', qty_centi FROM wide
    UNION ALL SELECT 'revenue_cents', revenue_cents FROM wide
    ORDER BY metric
    """,
)
def f30_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping via the native ``DataFrame.unpivot``
    (Spark 3.4+ melt) — the inverse of a27's pivot, completing the
    reshape pair. The wide input is a 1-row metrics aggregate; unpivot
    emits one (metric, value) row per column — the shape a metrics
    sink or a long-format quality table (dq16/dq17) consumes.

    unpivot requires a common value type, so every metric is an exact
    BIGINT first (quantities in centi-units, money in cents — the
    dtype rule). The expression is a zero-shuffle EXPAND over the
    1-row aggregate; on a grouped input the same call melts per group
    with the ids column retained.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    wide = lineitem.agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_centi"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
        F.count("*").alias("n_lines"),
    )
    return wide.unpivot(
        ids=[], values=["n_lines", "qty_centi", "revenue_cents"],
        variableColumnName="metric", valueColumnName="value",
    ).orderBy("metric")


@query(
    "f31_mom_change",
    oracle="""
    WITH monthly AS (
        SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mnum,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), lagged AS (
        SELECT mnum, cents, LAG(cents, 1) OVER (ORDER BY mnum) AS prev_cents,
               LAG(mnum, 1) OVER (ORDER BY mnum) AS prev_mnum
        FROM monthly
    )
    SELECT CONCAT(CAST(mnum // 12 AS VARCHAR), '-',
                  LPAD(CAST(mnum % 12 + 1 AS VARCHAR), 2, '0')) AS month,
           cents,
           CASE WHEN prev_mnum = mnum - 1 THEN prev_cents END AS prev_cents,
           CASE WHEN prev_mnum = mnum - 1
                THEN CAST((10000 * (cents - prev_cents)) // prev_cents AS BIGINT)
           END AS change_bps
    FROM lagged ORDER BY month
    """,
)
def f31_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change in integer basis points — the
    reporting primitive behind every growth dashboard, with the two
    traps handled explicitly: CALENDAR GAPS (a LAG over a monthly
    rollup silently compares across a missing month; the prev_mnum =
    mnum − 1 guard NULLs the change instead — st06's integer month
    numbers make the adjacency test exact) and float drift (change is
    (10000·Δ) div prev, integer bps, never a float ratio).

    One map-side monthly rollup, one ordered window over the ≤N-month
    relation.
    """
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("mnum")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    w = Window.orderBy("mnum")
    lagged = monthly.select(
        "mnum",
        "cents",
        F.lag("cents", 1).over(w).alias("prev_raw"),
        F.lag("mnum", 1).over(w).alias("prev_mnum"),
    )
    adjacent = F.col("prev_mnum") == F.col("mnum") - 1
    return lagged.select(
        F.concat(
            F.expr("cast(mnum div 12 as string)"),
            F.lit("-"),
            F.lpad((F.col("mnum") % 12 + 1).cast("string"), 2, "0"),
        ).alias("month"),
        "cents",
        F.when(adjacent, F.col("prev_raw")).alias("prev_cents"),
        F.when(adjacent, F.expr("(10000 * (cents - prev_raw)) div prev_raw")).alias(
            "change_bps"
        ),
    ).orderBy("month")


# --- f32: equi-width histogram -------------------------------------------------------

HIST_BINS = 20


@query(
    "f32_equiwidth_histogram",
    oracle=f"""
    WITH b AS (
        SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
    ), binned AS (
        SELECT CAST(CASE WHEN mx > mn
                         THEN LEAST({HIST_BINS} - 1,
                                    FLOOR(((o_totalprice - mn) * {HIST_BINS}.0) /
                                          (mx - mn)))
                         ELSE 0 END
                    AS BIGINT) AS bin,
               mn, mx
        FROM orders, b
    )
    SELECT bin,
           ROUND(mn + (bin * (mx - mn)) / {HIST_BINS}.0, 6) AS lo,
           ROUND(mn + ((bin + 1) * (mx - mn)) / {HIST_BINS}.0, 6) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned
    GROUP BY bin, mn, mx
    ORDER BY bin
    """,
)
def f32_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: the profiling primitive
    behind every distribution dashboard (and the bin spine dq04/dq08
    consume). One 2-value aggregate broadcast onto the scan, the bin
    id as a scan-fused LEAST/FLOOR projection, one bounded-key
    aggregate — the same two-pass shape whatever the corpus size.
    The max value lands in the LAST bin (LEAST clamp), the standard
    closed-top convention; a constant column (mx == mn) degenerates to
    a single bin 0 under ANSI mode instead of dividing by zero; bin
    edges are derived from (mn, mx, bin) with one shared expression so
    both engines emit identical doubles.

    Parity: the reference bins owner counts with pandas value_counts
    on hardcoded edges (cbddl/src/analytics/demographics_analyzer.py);
    this is the data-derived generalization.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = orders.crossJoin(F.broadcast(b)).select(
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(HIST_BINS - 1),
                F.floor(
                    ((F.col("o_totalprice") - F.col("mn")) * float(HIST_BINS))
                    / (F.col("mx") - F.col("mn"))
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bin"),
        "mn",
        "mx",
    )
    return (
        binned.groupBy("bin", "mn", "mx")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(
                F.col("mn") + (F.col("bin") * (F.col("mx") - F.col("mn"))) / float(HIST_BINS), 6
            ).alias("lo"),
            F.round(
                F.col("mn") + ((F.col("bin") + 1) * (F.col("mx") - F.col("mn"))) / float(HIST_BINS), 6
            ).alias("hi"),
            "n",
        )
        .orderBy("bin")
    )


@query(
    "f33_variant_json",
    oracle="""
    -- json_valid guard: Spark's try_parse_json turns a malformed props
    -- string into a NULL variant (all extractions NULL); DuckDB's
    -- JSON_EXTRACT would instead ERROR the whole oracle, turning a
    -- would-be diff into an undiagnosable gate failure. The guard makes
    -- the oracle mirror the NULL-out semantics exactly.
    WITH j AS (
        SELECT event_type,
               CASE WHEN json_valid(props) THEN JSON_EXTRACT(props, '$.k') END AS jk,
               CASE WHEN json_valid(props) THEN JSON_EXTRACT(props, '$.missing') END AS jm
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(jk AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(jk AS BIGINT)) AS BIGINT) AS k_max,
           CAST(SUM(CASE WHEN jm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM j
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def f33_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``parse_json`` ingests the raw ``props`` JSON once into the binary
    VARIANT encoding, then ``variant_get`` path extraction runs typed
    and shredded (no per-access re-parse, unlike get_json_object which
    re-parses the string for every path). ``try_variant_get`` on an
    absent path yields NULL instead of erroring — the schema-drift
    tolerance a 100 TB event lake needs when producers add fields.

    Scale shape: pure projection + one keyed aggregate; parse cost is
    linear and shuffle carries only (type, long, long) triples.

    Parity: beyond-reference (f18's JSON decode generalized to the
    VARIANT cell); oracle extracts the same paths with DuckDB's JSON
    functions over the identical strings.
    """
    events = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed props become a NULL variant (every
    # extraction NULLs out) instead of failing the job — strictly more
    # tolerant than the oracle, which presumes valid JSON; the fixture
    # test pins the malformed-row behavior engine-side.
    v = F.try_parse_json(F.col("props"))
    return (
        events.select(
            "event_type",
            F.variant_get(v, "$.k", "long").alias("k"),
            F.try_variant_get(v, "$.missing", "long").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias(
                "n_missing"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "f34_try_arithmetic",
    oracle="""
    SELECT o_orderkey AS orderkey,
           -- FLOOR: Spark's long cast truncates, DuckDB's rounds
           CASE WHEN CAST(FLOOR(o_totalprice) AS BIGINT) - 100000 = 0 THEN NULL
                ELSE ROUND(o_totalprice / (CAST(FLOOR(o_totalprice) AS BIGINT) - 100000), 6)
           END AS safe_ratio,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-date'
                         ELSE STRFTIME(o_orderdate, '%Y-%m-%d') END
                    AS TIMESTAMP) AS parsed_ts
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def f34_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (``try_divide`` /
    ``try_to_timestamp``): malformed rows become NULL instead of
    failing the job — under ANSI SQL mode (Spark 4's default) a single
    bad row would otherwise kill a 100 TB pass, and pre-filtering every
    denominator/format by hand is the brittle alternative.

    The fixture plants both failure classes deterministically: a zero
    denominator wherever the integer part of o_totalprice equals the
    100000 sentinel, and an unparseable date string on every third
    order. Ratio rounded to 6dp on both engines (same double division);
    the valid timestamps parse identically (ISO yyyy-MM-dd).

    Parity: beyond-reference (ANSI-mode survival kit for F11's
    arithmetic family).
    """
    orders = load_table(spark, sf_dir, "orders")
    denom = F.col("o_totalprice").cast("long") - 100000
    date_str = F.when(
        F.col("o_orderkey") % 3 == 0, F.lit("not-a-date")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    return (
        orders.filter(F.col("o_orderkey") <= 200)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.try_divide(F.col("o_totalprice"), denom), 6).alias(
                "safe_ratio"
            ),
            F.try_to_timestamp(date_str).alias("parsed_ts"),
        )
        .orderBy("orderkey")
    )


@query(
    "f35_collated_group",
    oracle="""
    SELECT LOWER(brand_mixed) AS brand_key,
           MIN(brand_mixed) AS brand_canonical,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_brand)
                    ELSE LOWER(p_brand) END AS brand_mixed
        FROM part
    )
    GROUP BY LOWER(brand_mixed)
    ORDER BY brand_key
    """,
)
def f35_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4's COLLATION support:
    the group key is ``collate(x, 'UTF8_LCASE')`` — comparison
    semantics move into the string TYPE, so every downstream equality,
    join, or DISTINCT on that column is case-insensitive without
    scattering lower() through the pipeline (and without losing the
    original casing, which lower() destroys).

    Mixed case is synthesized deterministically (even part keys upper,
    odd lower) because the fixture's brands are uniformly cased. The
    emitted representative is the BINARY min of the raw strings —
    min/max over a collated column may return either case variant of
    equal keys, so the canonical pick must not depend on collation.
    The oracle replays with LOWER()-key grouping, which is equivalent
    for this ASCII domain.

    Parity: F1's normalize family (cbddl ingestion str.upper()) as the
    type-level cell.
    """
    part = load_table(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper(F.col("p_brand"))
    ).otherwise(F.lower(F.col("p_brand")))
    return (
        part.select(mixed.alias("brand_mixed"))
        .groupBy(
            F.collate(F.col("brand_mixed"), "UTF8_LCASE").alias("brand_coll")
        )
        .agg(
            F.min(F.collate(F.col("brand_mixed"), "UTF8_BINARY")).alias(
                "brand_canonical"
            ),
            F.count("*").alias("n_parts"),
        )
        .select(
            F.lower("brand_canonical").alias("brand_key"),
            "brand_canonical",
            "n_parts",
        )
        .orderBy("brand_key")
    )
