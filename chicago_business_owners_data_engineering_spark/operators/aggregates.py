"""Aggregation operators (SURVEY.md §2.4, A1–A15, A20–A21, A24).

Each query re-expresses a concrete computation from the reference on the
engine's star-schema test tables. Reference citations are to
/root/reference/chicago-business-demographics-data-lake (``cbddl/``).

Scale notes
-----------
Every aggregate here is a single hash-aggregation (map-side partial +
final after one shuffle on the grouping key) — Catalyst's
HashAggregateExec with whole-stage codegen. Two-level patterns
(histogram, entropy) shuffle on the high-cardinality key first, then on
the tiny bucket key; the second shuffle is negligible. Nothing collects
to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "flagship_ownership_histogram",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT
        CASE WHEN n_lines >= 5 THEN '5+' ELSE CAST(n_lines AS VARCHAR) END AS bucket,
        COUNT(*) AS num_orders
    FROM per_order
    GROUP BY 1
    """,
)
def flagship_ownership_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality histogram 1/2/3/4/5+ of lines per order.

    The reference's most characteristic computation: the
    owners-per-business distribution with a 5+ overflow bucket
    (cbddl/src/analytics/demographics_analyzer.py:31-45, A5+A12).
    Two-level aggregation: shuffle on the key, then on the 5-value
    bucket — both hash aggregates with map-side partials.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    bucket = (
        F.when(F.col("n_lines") >= 5, F.lit("5+"))
        .otherwise(F.col("n_lines").cast("string"))
        .alias("bucket")
    )
    return per_order.select(bucket).groupBy("bucket").agg(F.count("*").alias("num_orders"))


@query(
    "a01_dataset_summary",
    oracle="""
    SELECT
        COUNT(*) AS total_rows,
        COUNT(DISTINCT l_orderkey) AS distinct_orders,
        COUNT(DISTINCT l_partkey) AS distinct_parts,
        ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT l_orderkey), 6) AS avg_lines_per_order
    FROM lineitem
    """,
)
def a01_dataset_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count, distinct keys, rows-per-key ratio in one pass.

    A1/A2/A13: len(df), nunique, len/nunique
    (cbddl/src/data_ingestion/ingestion_pipeline.py:59-60;
    cbddl/src/analytics/demographics_analyzer.py:26-30). At 100 TB the
    exact distinct is the expensive part (per-key shuffle); swap in
    ``approx_count_distinct`` when a 2% error is acceptable.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.round(F.count("*") / F.countDistinct("l_orderkey"), 6).alias("avg_lines_per_order"),
    )


@query(
    "a03_conditional_counts",
    oracle="""
    SELECT
        COUNT(*) AS total_orders,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_orders,
        COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_orders,
        COUNT(CASE WHEN o_totalprice > 1000 THEN 1 END) AS big_orders
    FROM orders
    """,
)
def a03_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass conditional counts (COUNT(CASE WHEN ...)).

    A3: per-field completeness counting
    (cbddl/src/etl/pipeline.py:214-217;
    cbddl/src/monitoring/pipeline_monitor.py:161-163). One scan, no
    shuffle beyond the final 1-row reduce.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("total_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_orders"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent_orders"),
        F.count(F.when(F.col("o_totalprice") > 1000, 1)).alias("big_orders"),
    )


@query(
    "a04_conditional_distinct",
    oracle="""
    SELECT
        COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS returned_orders,
        COUNT(DISTINCT CASE WHEN l_returnflag <> 'R' THEN l_orderkey END) AS kept_orders
    FROM lineitem
    """,
)
def a04_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional distinct counts (COUNT(DISTINCT CASE WHEN ...)).

    A4: individual vs corporate distinct-owner split
    (cbddl/src/etl/pipeline.py:417-421; cbddl/database/schema.sql:239-241).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_orderkey"))).alias(
            "returned_orders"
        ),
        F.countDistinct(F.when(F.col("l_returnflag") != "R", F.col("l_orderkey"))).alias(
            "kept_orders"
        ),
    )


@query(
    "a05_orders_per_customer",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS num_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def a05_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped size: count of rows per key.

    A5: ``df.groupby('Account Number').size()``
    (cbddl/src/analytics/demographics_analyzer.py:31-36).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("num_orders")
    )


@query(
    "a06_grouped_multi_agg",
    oracle="""
    SELECT
        l_orderkey,
        COUNT(*) AS n_lines,
        MIN(l_returnflag) AS first_flag,
        STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_numbers,
        CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS total_price_cents
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def a06_grouped_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate incl. an ordered collect_list.

    A6: ``.agg({'Legal Name':'first', 'Owner Full Name': list, ...})``
    (cbddl/src/api/main.py:138-142; cbddl/scripts/run_pipeline.py:81-87).
    The list-valued cell becomes a deterministic sorted string so results
    are order-stable across engines; min() stands in for pandas 'first'
    (which is nondeterministic under parallel scan — we pick a total
    ordering instead).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.min("l_returnflag").alias("first_flag"),
        F.array_join(
            F.sort_array(F.collect_list(F.col("l_linenumber").cast("string"))), ","
        ).alias("line_numbers"),
        # integer cents (skew01's rule): exact at any fold order
        F.sum(F.floor(F.col("l_extendedprice") * 100)).alias("total_price_cents"),
    )


@query(
    "a07_bool_or_per_group",
    oracle="""
    SELECT l_orderkey, BOOL_OR(l_discount > 0.05) AS any_discounted
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def a07_bool_or_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-or aggregate per group.

    A7: ``'Is Individual Owner': 'any'`` (cbddl/scripts/run_pipeline.py:85).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_orderkey").agg(
        F.bool_or(F.col("l_discount") > 0.05).alias("any_discounted")
    )


@query(
    "a08_value_counts",
    oracle="""
    SELECT o_orderpriority AS value, COUNT(*) AS count
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a08_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_counts: frequency table of a column.

    A8: role/name frequency tables
    (cbddl/src/analytics/demographics_analyzer.py:57,89-93).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("value")).agg(
        F.count("*").alias("count")
    )


@query(
    "a09_topk_counts",
    oracle="""
    SELECT l_partkey AS partkey, COUNT(*) AS count
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY count DESC, partkey ASC
    LIMIT 10
    """,
)
def a09_topk_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k of a frequency table, with a deterministic tie-break.

    A9: ``value_counts().head(20)``
    (cbddl/src/analytics/demographics_analyzer.py:57,90,196). Spark
    executes this as TakeOrderedAndProject — per-partition top-k then a
    k-row merge on the driver, never a full global sort; that is the plan
    that survives 100 TB.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("partkey"))
        .limit(10)
    )


@query(
    "a10_scalar_stats",
    oracle="""
    SELECT
        ROUND(AVG(LENGTH(p_name)), 6) AS avg_len,
        MIN(LENGTH(p_name)) AS min_len,
        MAX(LENGTH(p_name)) AS max_len
    FROM part
    """,
)
def a10_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar statistics over a derived expression.

    A10: mean/min/max of name length
    (cbddl/src/analytics/demographics_analyzer.py:58-62,134-137).
    """
    part = load_table(spark, sf_dir, "part")
    return part.agg(
        F.round(F.avg(F.length("p_name")), 6).alias("avg_len"),
        F.min(F.length("p_name")).alias("min_len"),
        F.max(F.length("p_name")).alias("max_len"),
    )


@query(
    "a11_round_avg_by_group",
    oracle="""
    SELECT o_orderstatus AS status, ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a11_round_avg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounded average per group (ROUND(AVG(x),2)).

    A11: ``ROUND(AVG(fbm.total_owners),2)`` (cbddl/src/etl/pipeline.py:495).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.avg("o_totalprice"), 2).alias("avg_price")
    )


@query(
    "a14_duplicate_count",
    oracle="""
    SELECT COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS dup_rows
    FROM lineitem
    """,
)
def a14_duplicate_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of exactly-duplicated rows.

    A14: ``df.duplicated().sum()``
    (cbddl/src/data_ingestion/ingestion_pipeline.py:62). Expressed as
    count(*) minus distinct-count of the full row struct — one shuffle on
    the row hash, no driver-side work.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        (F.count("*") - F.countDistinct(F.struct(*lineitem.columns))).alias("dup_rows")
    )


@query(
    "a15_null_profile",
    oracle="""
    SELECT
        COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS o_orderkey_nulls,
        COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS o_custkey_nulls,
        COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS o_orderstatus_nulls,
        COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS o_totalprice_nulls,
        COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS o_orderdate_nulls,
        COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS o_orderpriority_nulls
    FROM orders
    """,
)
def a15_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts in one scan.

    A15: ``df.isnull().sum().to_dict()`` completeness profile
    (cbddl/src/data_ingestion/ingestion_pipeline.py:61,68-71).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls")
            for c in orders.columns
        ]
    )


@query(
    "a20_keyword_buckets",
    oracle="""
    SELECT
        COUNT(CASE WHEN UPPER(p_name) LIKE '%WIDGET%' THEN 1 END) AS kw_widget,
        COUNT(CASE WHEN UPPER(p_name) LIKE '%BOLT%' THEN 1 END) AS kw_bolt,
        COUNT(CASE WHEN UPPER(p_name) LIKE '%ROD%' THEN 1 END) AS kw_rod,
        COUNT(CASE WHEN UPPER(p_name) LIKE '%SMALL%' THEN 1 END) AS kw_small,
        COUNT(CASE WHEN UPPER(p_name) LIKE '%LARGE%' THEN 1 END) AS kw_large
    FROM part
    """,
)
def a20_keyword_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N keyword-containment counts in ONE pass over the data.

    A20: leadership/ownership keyword counting
    (cbddl/src/analytics/demographics_analyzer.py:103-123). The reference
    scans once per keyword; here all buckets are conditional counts in a
    single scan — the difference between N passes and 1 pass is the whole
    game at 100 TB.
    """
    part = load_table(spark, sf_dir, "part")
    kws = ["widget", "bolt", "rod", "small", "large"]
    return part.agg(
        *[
            F.count(F.when(F.upper(F.col("p_name")).contains(k.upper()), 1)).alias(f"kw_{k}")
            for k in kws
        ]
    )


@query(
    "a21_distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment AS mktsegment, c_nationkey AS nationkey
    FROM customer
    """,
)
def a21_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a projection (dimension-load dedup).

    A21: distinct businesses/owners for dim load
    (cbddl/src/etl/pipeline.py:295-311,328-343).
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_mktsegment").alias("mktsegment"), F.col("c_nationkey").alias("nationkey")
    ).distinct()


@query(
    "a23_correlation",
    oracle="""
    SELECT
        ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        ROUND(CORR(l_discount, l_extendedprice), 6) AS corr_disc_price,
        ROUND(CORR(l_quantity, l_tax), 6) AS corr_qty_tax
    FROM lineitem
    """,
)
def a23_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations as aggregates.

    A23: ``df.corr()`` over metric columns
    (cbddl/src/dashboard/enhanced_streamlit_app.py:578-592). Each corr is
    a single-pass streaming aggregate (co-moment accumulation), not a
    driver-side matrix.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_discount", "l_extendedprice"), 6).alias("corr_disc_price"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("corr_qty_tax"),
    )


@query(
    "a24_pct_of_total",
    oracle="""
    SELECT
        c_mktsegment AS mktsegment,
        COUNT(*) AS count,
        ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 6) AS pct
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def a24_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped percentage-of-total via a grand-total window.

    A24/W5: ``COUNT(*) * 100.0 / SUM(COUNT(*)) OVER ()``
    (cbddl/src/etl/pipeline.py:542; cbddl/database/schema.sql:278).
    The empty-frame window after aggregation runs over the already-tiny
    grouped result, so the single-partition window exchange is harmless.
    """
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    counts = customer.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("*").alias("count")
    )
    total = F.sum("count").over(Window.partitionBy())
    return counts.withColumn("pct", F.round(F.col("count") * 100.0 / total, 6))


@query(
    "a25_map_value_counts",
    oracle="""
    SELECT o_orderpriority,
           to_json(map_from_entries(
               list_sort(list(struct_pack(key := o_orderstatus, value := cnt)))
           )) AS status_counts
    FROM (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
          FROM orders
          GROUP BY o_orderpriority, o_orderstatus)
    GROUP BY o_orderpriority
    """,
)
def a25_map_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed aggregation output: per-group value_counts as a MAP column.

    F20's full form: the reference surfaces ``value_counts().to_dict()``
    as a python dict (cbddl/src/analytics/demographics_analyzer.py:57,
    89-93); here the dict is a first-class ``MapType(String,Long)``
    column (see :func:`map_value_counts`). Two-level plan: the heavy
    shuffle groups on the (priority, status) pair with map-side combine;
    the second exchange moves one tiny struct per pair. Entries are
    sorted before map construction so serialization is deterministic;
    the comparison surface is ``to_json`` of the map, byte-identical
    across engines, while the pytest asserts the genuine dict values.
    """
    return map_value_counts(spark, sf_dir).select(
        "o_orderpriority", F.to_json("status_counts").alias("status_counts")
    )


def map_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-status counts as a real MapType(String,Long) column."""
    orders = load_table(spark, sf_dir, "orders")
    pair_counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    return pair_counts.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("o_orderstatus").alias("key"),
                        F.col("cnt").alias("value"),
                    )
                )
            )
        ).alias("status_counts")
    )


# --- a30: ordered grouped string aggregation ------------------------------------


@query(
    "a30_grouped_string_agg",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           STRING_AGG(DISTINCT CAST(c_nationkey AS VARCHAR), ','
                      ORDER BY CAST(c_nationkey AS VARCHAR)) AS nation_list
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def a30_grouped_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered, de-duplicated string aggregation per group — the
    LISTAGG/STRING_AGG reporting primitive.

    The one aggregate where determinism is usually lost by default:
    bare collect_list order is partition-arrival order (run-to-run
    nondeterministic), so the repo form is collect_set → array_sort →
    array_join — exactly the DISTINCT ... ORDER BY contract of ANSI
    LISTAGG, reproducible on any partitioning. Sorting the STRING
    forms on both engines sidesteps the numeric-vs-lexicographic
    collation question entirely.

    Scale trap, documented: a group's concatenation is unbounded — at
    100 TB you cap the set (slice(array_sort(...), 1, K) with the
    count column telling the reader what was dropped); the fixture's
    25-nation domain needs no cap.

    Parity: reference seed is the comma-joined owner-name lists in
    cbddl/src/analytics/demographics_analyzer.py; this is the engine
    form.
    """
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.array_join(
                F.array_sort(F.collect_set(F.col("c_nationkey").cast("string"))),
                ",",
            ).alias("nation_list"),
        )
        .orderBy("c_mktsegment")
    )


# --- a34: exact weighted median -------------------------------------------------


@query(
    "a34_weighted_median",
    oracle="""
    WITH per_val AS (
        SELECT l_returnflag AS returnflag,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS w
        FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ), cum AS (
        SELECT returnflag, qty, w,
               CAST(SUM(w) OVER (PARTITION BY returnflag ORDER BY qty)
                    AS BIGINT) AS cw,
               CAST(SUM(w) OVER (PARTITION BY returnflag) AS BIGINT) AS tw
        FROM per_val
    )
    SELECT returnflag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN qty END) AS BIGINT)
               AS w_median_qty,
           CAST(MIN(tw) AS BIGINT) AS total_w_cents
    FROM cum GROUP BY returnflag
    ORDER BY returnflag
    """,
)
def a34_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT revenue-weighted median quantity per return flag — the
    "what order size carries half the money" statistic (a33's sketch
    answers the approximate form; this is the exact small-domain
    companion: when the VALUE domain is bounded — quantities,
    ratings, bucketed sizes — the exact weighted median costs one
    value-keyed aggregate, no sketch needed).

    Weighted median = smallest value whose cumulative weight reaches
    half the total, decided by the integer cross-multiplication
    ``2·cum ≥ total`` (no halving division). Weights are exact price
    CENTS (floor(x·100 + 0.5) — bit-identical on both engines);
    quantities are integer-valued by construction and cast exactly.

    Scale shape: the only data-sized exchange is the (flag, qty)
    aggregate — the domain relation it produces is |flags|·|distinct
    qty| rows (~350 here, bounded at any corpus size), and the
    cumulative windows partition by flag over that bounded relation.

    Parity: beyond-reference (distributional analytics seed
    cbddl/src/analytics/demographics_analyzer.py:120-141 describe()).
    """
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    per_val = (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_quantity").cast("long").alias("qty"),
            cents.alias("c"),
        )
        .groupBy("returnflag", "qty")
        .agg(F.sum("c").alias("w"))
    )
    w_cum = Window.partitionBy("returnflag").orderBy("qty")
    w_all = Window.partitionBy("returnflag")
    cum = per_val.select(
        "returnflag",
        "qty",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return (
        cum.groupBy("returnflag")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("qty"))).alias(
                "w_median_qty"
            ),
            F.min("tw").alias("total_w_cents"),
        )
        .orderBy("returnflag")
    )


@query(
    "a35_percentile_disc",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
               CUME_DIST() OVER (PARTITION BY l_returnflag
                                 ORDER BY CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cd
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN cd >= 0.25 THEN cents END) AS BIGINT) AS p25_cents,
           CAST(MIN(CASE WHEN cd >= 0.5  THEN cents END) AS BIGINT) AS p50_cents,
           CAST(MIN(CASE WHEN cd >= 0.75 THEN cents END) AS BIGINT) AS p75_cents
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a35_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles (``percentile_disc``) of line price
    per return flag — the SQL:2003 inverse-distribution aggregate that
    a33's sketch approximates. Discrete semantics return an ACTUAL
    element (the smallest value whose cumulative distribution reaches
    p), so on integer cents the result is engine-independent — no
    interpolation arithmetic to diverge. The oracle spells out that
    standard definition with a CUME_DIST window rather than trusting
    DuckDB's quantile_disc index convention.

    Scale shape: Spark plans percentile_disc as a partial/final typed
    aggregate over the group's value multiset — one shuffle on the
    5-value flag domain; no global sort.

    Parity: extends A10's scalar stats (cbddl pandas .describe()) with
    the exact-quantile cell; a33 carries the sketch twin.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).createOrReplaceTempView("__a35_cents")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS p25_cents,
               CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY cents) AS BIGINT) AS p50_cents,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS p75_cents
        FROM __a35_cents GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@query(
    "a36_grouped_mode",
    oracle="""
    WITH counts AS (
        SELECT c.c_mktsegment, o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY COUNT(*) DESC, o.o_orderpriority ASC
               ) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    )
    SELECT c_mktsegment AS mktsegment,
           o_orderpriority AS mode_priority,
           n AS mode_count
    FROM counts WHERE rn = 1 ORDER BY mktsegment
    """,
)
def a36_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped MODE: the most frequent order priority per
    market segment through Spark 3.4+'s ``mode(col, deterministic)``
    aggregate — ties resolve to the LOWEST value, which is what makes
    the result a total function of the data (the default
    nondeterministic mode would hash-flake on any tied segment).

    The mode count is re-derived by a join back onto the (segment,
    priority) rollup so both engines report the same (value, count)
    pair; the oracle spells the deterministic rule out as
    ROW_NUMBER OVER (count DESC, value ASC).

    Parity: A8's value_counts / idxmax family
    (cbddl/src/analytics/demographics_analyzer.py top-category
    tabulations) as the single-call SQL aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == customer["c_custkey"],
    )
    modes = joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.mode("o_orderpriority", True).alias("mode_priority")
    )
    counts = joined.groupBy(
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("o_orderpriority").alias("mode_priority"),
    ).agg(F.count("*").alias("mode_count"))
    return (
        modes.join(counts, ["mktsegment", "mode_priority"])
        .select("mktsegment", "mode_priority", "mode_count")
        .orderBy("mktsegment")
    )
