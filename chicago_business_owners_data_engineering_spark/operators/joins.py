"""Join operators (SURVEY.md §2.3, J1–J7).

Physical-strategy posture: dimension tables (region/nation/customer/
supplier/part) get explicit ``F.broadcast`` hints — at warehouse scale
the fact side never shuffles for these joins. Fact-to-fact joins
(lineitem ⋈ orders) are left to Catalyst, which picks sort-merge with
AQE skew splitting; both sides shuffle on the join key once and the
partitioning is reusable by downstream aggregation on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "j01_inner_equi_join",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_name AS cust_name,
           c.c_mktsegment AS mktsegment, o.o_totalprice AS totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j01_inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dimension, broadcast.

    J1: staging ⋈ dim_business on account_number
    (cbddl/src/etl/pipeline.py:392). customer is a dimension → broadcast
    hash join, no shuffle of orders.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "j02_disjunctive_join",
    oracle="""
    SELECT DISTINCT c.c_custkey AS custkey, s.s_suppkey AS suppkey
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey OR c.c_custkey = s.s_suppkey
    """,
)
def j02_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-predicate join rewritten as a DISJOINT union of equi-joins.

    J2: staging ⋈ dim_owner ON (first=first AND last=last) OR
    (entity=entity) (cbddl/src/etl/pipeline.py:393-396). A literal OR
    join degenerates to a broadcast-nested-loop (O(n·m) at scale). The
    naive rewrite unions both equi-join arms and dedups — but the dedup
    is a full shuffle of the (large) match set. Disjoint decomposition
    removes it: arm k keeps only rows NOT matching disjuncts < k (here
    a cheap residual filter on columns already in hand), so the arms
    are disjoint by construction, each arm's pairs are unique (joins of
    key-distinct inputs), and the union needs no dedup at all — the
    textbook disjunctive-join plan, zero wide shuffles.
    """
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    arm1 = customer.join(
        F.broadcast(supplier), customer.c_nationkey == supplier.s_nationkey
    ).select(F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("suppkey"))
    arm2 = (
        customer.join(F.broadcast(supplier), customer.c_custkey == supplier.s_suppkey)
        # residual: drop pairs disjunct 1 already produced — i.e. where
        # its predicate evaluated TRUE; NULL keys never matched arm 1,
        # so coalesce keeps them (plain != would wrongly drop them)
        .filter(F.coalesce(customer.c_nationkey != supplier.s_nationkey, F.lit(True)))
        .select(F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("suppkey"))
    )
    return arm1.unionByName(arm2)


@query(
    "j03_multiway_star_join",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS num_customers,
           -- integer cents: exact at any fold order (skew01's rule)
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS total_acctbal_cents
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def j03_multiway_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join with aggregation.

    J3-shaped: staging ⋈ dim_role plus the snowflake chain
    (cbddl/src/etl/pipeline.py:397,432-436). Both dims broadcast; the
    only shuffle is the final small groupBy.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("num_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 100)).alias("total_acctbal_cents"),
        )
    )


@query(
    "j04_left_outer_join",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
           COUNT(o.o_orderkey) AS num_orders,
           CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS total_spent_cents
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def j04_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched dimension rows.

    J4: dim_business ⟕ fact chains (cbddl/src/etl/pipeline.py:432-436;
    cbddl/database/schema.sql:243-247). COUNT(col) counts only matched
    rows — null-join rows contribute 0, matching SQL semantics.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("cust_name"))
        .agg(
            F.count("o_orderkey").alias("num_orders"),
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100)), F.lit(0)
            ).alias("total_spent_cents"),
        )
    )


@query(
    "j05_anti_join_integrity",
    oracle="""
    SELECT COUNT(*) AS orphan_orders
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def j05_anti_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join referential-integrity orphan count.

    J5: fact ⟕ dim WHERE dim.key IS NULL → count
    (cbddl/src/etl/pipeline.py:573-591). Broadcast anti join: one scan of
    the fact side, no shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    orphans = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left_anti"
    )
    return orphans.agg(F.count("*").alias("orphan_orders"))


@query(
    "j06_scalar_subquery_argmax",
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS num_orders,
           (SELECT o_orderpriority FROM orders
            GROUP BY o_orderpriority
            ORDER BY COUNT(*) DESC, o_orderpriority ASC LIMIT 1) AS most_common_priority
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def j06_scalar_subquery_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery argmax attached as a constant column.

    J6: ``(SELECT title ... ORDER BY count DESC LIMIT 1)``
    (cbddl/src/etl/pipeline.py:517-522). Computed as a 1-row aggregate
    cross-joined onto the grouped result — Catalyst turns the 1-row side
    into a broadcast, so this is two small aggregations, not a
    correlated per-row subquery. Deterministic tie-break added on the
    argmax.
    """
    orders = load_table(spark, sf_dir, "orders")
    top = (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
        .limit(1)
        .select(F.col("o_orderpriority").alias("most_common_priority"))
    )
    by_status = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("num_orders")
    )
    return by_status.crossJoin(F.broadcast(top))


@query(
    "j07_fact_fact_join",
    oracle="""
    SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
           ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS net_price,
           o.o_orderdate AS orderdate, o.o_orderpriority AS priority
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def j07_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-to-large equi-join with a pushed-down filter.

    J7: Account Number linkage across datasets (readme.md:70-71,83).
    Catalyst pushes o_orderstatus='O' below the join (smaller build
    side), then picks sort-merge or shuffled-hash with AQE handling any
    orderkey skew. The join keys partition both sides identically, so a
    downstream groupBy(orderkey) reuses the exchange.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.col("o_orderdate").alias("orderdate"),
        F.col("o_orderpriority").alias("priority"),
    )


@query(
    "j09_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def j09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having ≥1 finished order.

    Completes the semi family next to j05's anti join (the reference's
    EXISTS-style integrity checks, cbddl/src/etl/pipeline.py:573-591).
    Semi joins never duplicate or widen the left side — the build side
    carries keys only, so at 100 TB this is a broadcast of distinct
    filtered keys (or a bloom-pruned shuffle), not a full join.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return customer.join(
        finished, customer.c_custkey == finished.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           -- l_quantity is integral: the BIGINT sum is exact, value unchanged
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: semi filter derived from an aggregate.

    The "large volume customer" shape: an aggregation over the fact
    derives the qualifying key set, which then semi-joins back to prune
    the detail join. The derived key set is small (HAVING is highly
    selective) so it broadcasts; the big lineitem⋈orders join happens
    only for qualifying orders. This agg→semi→join dataflow is the
    standard way to express "top entities by derived measure" without
    joining everything first.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    pruned = orders.join(
        F.broadcast(big), orders.o_orderkey == big.l_orderkey, "left_semi"
    )
    return (
        pruned.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("o_orderkey") == lineitem.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.floor("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# Non-uniform price bands for the range join (lo inclusive, hi exclusive).
PRICE_BANDS = [
    ("budget", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("premium", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, 500_000.0),
]
RANGE_BUCKET = 50_000.0  # coarse bucket width for the equi-join rewrite


@query(
    "j10_range_join",
    oracle="""
    SELECT b.band_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_price_cents
    FROM orders o
    JOIN (VALUES ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                 ('premium', 150000.0, 300000.0), ('luxury', 300000.0, 500000.0))
         AS b(band_name, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_name
    """,
)
def j10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via bucket decomposition, not nested loops.

    ``fact.value BETWEEN dim.lo AND dim.hi`` has no equi-key, so Spark
    plans a nested-loop join — O(n·m) when the interval side outgrows
    the broadcast limit. The standard rewrite: pick a coarse bucket
    width, explode each interval over the buckets it overlaps, bucket
    the fact value once, EQUI-join on the bucket, then apply the exact
    range as a residual filter. Join cost becomes O(n + m·spread) on a
    hash key. Buckets here are 50k wide → each band covers 1-4 buckets.
    (Same dataflow as an as-of join by coarse time bucket; see j08 for
    the order-based alternative.)
    """
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band_name string, lo double, hi double")
    # explode each interval over the coarse buckets it overlaps
    bands_b = bands.select(
        "band_name",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / RANGE_BUCKET).cast("long"),
                # hi is exclusive: a band ending exactly on a bucket edge
                # does not overlap the next bucket
                F.floor((F.col("hi") - 1e-9) / RANGE_BUCKET).cast("long"),
            )
        ).alias("bucket"),
    )
    fact_b = orders.withColumn(
        "bucket", F.floor(F.col("o_totalprice") / RANGE_BUCKET).cast("long")
    )
    return (
        fact_b.join(F.broadcast(bands_b), "bucket")
        .filter((F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")))
        .groupBy("band_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).alias("total_price_cents"),
        )
    )


# SCD2 cutover date for the simulated dimension history (j11).
SCD2_CUTOVER = "1996-01-01"


@query(
    "j11_scd2_point_in_time",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1992-01-01' AS valid_from,
               TIMESTAMP '{SCD2_CUTOVER}' AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN 'UPGRADED'
                    ELSE c_mktsegment END AS segment,
               TIMESTAMP '{SCD2_CUTOVER}' AS valid_from,
               NULL AS valid_to
        FROM customer
    )
    SELECT d.segment,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= d.valid_from
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def j11_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join: each fact row meets the dimension
    version that was valid AT ITS OWN timestamp.

    The temporal-warehouse join w09's validity intervals exist for:
    a slowly-changing dimension keeps one row per (key, version) with
    [valid_from, valid_to) windows, and facts must join the historical
    version, not the current one. The dimension history is simulated
    deterministically (every customer re-segmented at the cutover,
    every third one upgraded) so the DuckDB oracle replays it exactly.

    Scale shape: the PRIMARY join condition is key equality
    (custkey) — a plain broadcast/shuffle HASH join — with the interval
    test applied as a residual filter on the few versions per key;
    point-in-time joins only degrade to nested loops when written
    WITHOUT the key equality. Version counts per key are small by the
    nature of SCD2 (attribute-change events), so the residual scan per
    probe is O(versions), and for version-heavy keys j08's as-of
    ordering or j10's interval bucketing applies unchanged. The
    half-open [from, to) convention makes every timestamp match EXACTLY
    one version — the invariant that keeps the join multiplicity 1 and
    makes the aggregate independent of version overlap bugs.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cutover = F.lit(SCD2_CUTOVER).cast("timestamp")
    v1 = customer.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        cutover.alias("valid_to"),
    )
    v2 = customer.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("UPGRADED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        cutover.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    joined = orders.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
    )
    return (
        joined.groupBy("segment", F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("segment", "order_year")
    )


# --- j12: null-safe join semantics ------------------------------------------


@query(
    "j12_null_safe_join",
    oracle="""
    WITH c AS (
        SELECT c_custkey, NULLIF(c_nationkey, 0) AS nk FROM customer
    ), s AS (
        SELECT s_suppkey, NULLIF(s_nationkey, 0) AS nk FROM supplier
    )
    SELECT COALESCE(CAST(c.nk AS VARCHAR), 'NULL') AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    GROUP BY 1
    ORDER BY nation_key
    """,
)
def j12_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): customer ×
    supplier pairs per nation key where nation 0 has been NULLed out —
    the NULLs MATCH each other instead of silently dropping.

    The semantics gap plain equi-joins hide: `NULL = NULL` is NULL, so
    rows with a NULL key vanish from an inner join — the classic
    silent-data-loss bug when a dimension key is optional. Spark's
    `eqNullSafe` compiles to the same hash-join as `=` (the NULL bucket
    is just another key), so this costs nothing over j01; DuckDB spells
    it IS NOT DISTINCT FROM. NULLIF plants the NULL population
    deterministically from real data, and the output groups pair counts
    per key with NULL shown explicitly — the row that proves the NULL
    bucket joined.

    Scale note: a real optional-key join at 100 TB puts ALL null-keyed
    rows in ONE hash bucket — the worst skew key by construction — so
    the production form either pre-splits the NULL population (union of
    a null-only cross-count and a non-null equi-join, exactly this
    query's GROUP BY shape) or salts that bucket (skew02's recipe).

    Parity: §2.3 join-semantics completion (the reference's pandas
    merges drop NaN keys silently, cbddl/src/etl/pipeline.py).
    """
    customer = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("c_nk")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("s_nk")
    )
    return (
        customer.join(supplier, customer["c_nk"].eqNullSafe(supplier["s_nk"]))
        .groupBy(
            F.coalesce(F.col("c_nk").cast("string"), F.lit("NULL")).alias(
                "nation_key"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("nation_key")
    )


# --- j13: interval-overlap join (bucketed range join) ----------------------------

# (the first-draft bucket decomposition and its OVERLAP_BUCKET_SEC knob were
# removed when the 10x probe flagged it — see the docstring below)
ERROR_HALO_MIN = 5  # an error event disturbs ±5 minutes


@query(
    "j13_interval_overlap_join",
    oracle=f"""
    WITH sess AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM events WHERE event_type <> 'error'
        GROUP BY user_id, CAST(ts AS DATE)
    ), err AS (
        SELECT event_id, CAST(ts AS DATE) AS day,
               GREATEST(ts - INTERVAL {ERROR_HALO_MIN} MINUTE,
                        CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS w_start,
               LEAST(ts + INTERVAL {ERROR_HALO_MIN} MINUTE,
                     CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)) AS w_end
        FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id, STRFTIME(s.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT e.event_id) AS BIGINT) AS n_error_overlaps
    FROM sess s
    JOIN err e ON s.day = e.day
              AND s.s_start <= e.w_end AND e.w_start <= s.s_end
    GROUP BY s.user_id, s.day
    ORDER BY n_error_overlaps DESC, s.user_id ASC, day ASC
    LIMIT 50
    """,
)
def j13_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join computed by BOUNDARY RANKS, not pair
    materialization: which user activity intervals overlap error-halo
    windows, per day — the incident blast-radius question ("whose
    session was live while the system was erroring?"). Spark has no
    native band/range join; the naive form compiles to a per-day
    nested loop.

    The first draft used the textbook bucket decomposition (explode
    intervals into 10-min epoch buckets, equi-join on (day, bucket),
    re-filter exactly) — and the 10× probe flagged it at exponent 1.50:
    user-day activity intervals span most of the day, so every session
    hit every bucket and the "decomposed" join degenerated back to
    sessions × errors per day. The lesson: bucket decomposition only
    helps when intervals are SHORT relative to the bucket; for long
    intervals the right tool is counting by ranks. An interval count is
    two cumulative lookups —

        overlaps(s) = #{w_start ≤ s_end} − #{w_end < s_start}

    (valid because w_start ≤ w_end: every window ending before the
    session also started before it ends) — so each side contributes
    its BOUNDARIES to a day-partitioned ordered sweep, a running count
    of error boundaries answers both lookups, and no session×error
    pair ever materializes. Boundary ties encode the predicate's ≤ / <
    exactly: error starts sort BEFORE queries at equal t (≤ counts
    them), error ends sort AFTER queries at equal t (< excludes them).
    Cost: two day-keyed window sorts over sessions+errors boundaries —
    linear, probe re-verified. The oracle still runs the naive
    predicate join, certifying the rank arithmetic is exact.

    Parity: beyond-reference (range joins; the as-of sibling is j08).
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    sess = (
        events.filter(F.col("event_type") != "error")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    err = events.filter(F.col("event_type") == "error").select(
        F.col("ts").cast("date").alias("day"),
        F.greatest(
            F.col("ts") - F.expr(f"INTERVAL {ERROR_HALO_MIN} MINUTE"),
            F.col("ts").cast("date").cast("timestamp"),
        ).alias("w_start"),
        F.least(
            F.col("ts") + F.expr(f"INTERVAL {ERROR_HALO_MIN} MINUTE"),
            F.date_add(F.col("ts").cast("date"), 1).cast("timestamp"),
        ).alias("w_end"),
    )

    def rank_sweep(q_points: DataFrame, e_points: DataFrame, e_first: bool) -> DataFrame:
        """Running count of error boundaries at each query point.
        ``e_first`` controls the equal-timestamp rule: True counts a
        boundary AT the query time (≤), False excludes it (<)."""
        e_tie, q_tie = (0, 1) if e_first else (1, 0)
        pts = e_points.select(
            "day", "t", F.lit(e_tie).alias("tie"), F.lit(1).alias("is_err"),
            F.lit(None).cast("long").alias("user_id"),
        ).unionByName(
            q_points.select(
                "day", "t", F.lit(q_tie).alias("tie"), F.lit(0).alias("is_err"), "user_id"
            )
        )
        w = (
            Window.partitionBy("day")
            .orderBy("t", "tie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            pts.select("day", "user_id", F.col("is_err"), F.sum("is_err").over(w).alias("cnt"))
            .filter(F.col("is_err") == 0)
            .select("day", "user_id", "cnt")
        )

    cnt_le = rank_sweep(
        sess.select("day", F.col("s_end").alias("t"), "user_id"),
        err.select("day", F.col("w_start").alias("t")),
        e_first=True,
    ).withColumnRenamed("cnt", "n_started_by_end")
    cnt_lt = rank_sweep(
        sess.select("day", F.col("s_start").alias("t"), "user_id"),
        err.select("day", F.col("w_end").alias("t")),
        e_first=False,
    ).withColumnRenamed("cnt", "n_ended_before_start")
    return (
        cnt_le.join(cnt_lt, ["day", "user_id"])
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("n_started_by_end") - F.col("n_ended_before_start")).alias(
                "n_error_overlaps"
            ),
        )
        .filter(F.col("n_error_overlaps") > 0)
        .orderBy(F.desc("n_error_overlaps"), F.asc("user_id"), F.asc("day"))
        .limit(50)
    )


# --- j14: nearest-in-time join (asof direction='nearest') ----------------------------


@query(
    "j14_nearest_event_join",
    oracle="""
    SELECT event_id, user_id, nearest_order, nearest_date, gap_days
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey AS nearest_order,
               o.o_orderdate AS nearest_date,
               CAST(ABS(DATE_DIFF('day', CAST(e.ts AS DATE), o.o_orderdate))
                    AS BIGINT) AS gap_days,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY ABS(DATE_DIFF('day', CAST(e.ts AS DATE),
                                          o.o_orderdate)),
                            o.o_orderdate ASC, o.o_orderkey ASC
               ) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id
    ) WHERE rn = 1
    """,
)
def j14_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join: each event matched to its customer's order
    CLOSEST in time, either direction — pandas ``merge_asof
    (direction='nearest')`` as a distributed plan. j08 is the backward
    form ("state as of"); the nearest form is the attribution/feature
    join ("which order is this event ABOUT") where an event may precede
    its order. Ties (equidistant before/after) resolve to the EARLIER
    date then the smaller key — deterministic where pandas is
    first-encountered-wins.

    Plan shape: one equi hash join on the customer key (both relations
    shuffle once; per-customer candidate groups are order-count
    bounded), then a per-event row_number. At warehouse scale the same
    plan runs bucketed-by-custkey with zero extra exchange (S7's
    layout); the window partitions on event_id so its sort is
    candidate-group-local.

    Parity: reference joins events to owners eagerly in pandas
    (cbddl/src/etl/pipeline.py's merge); the time-nearest form is the
    beyond-reference generalization of j08.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cand = events.select("event_id", "user_id", F.col("ts").cast("date").alias("eday")).join(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        F.col("o_custkey") == F.col("user_id"),
    )
    gap = F.abs(F.datediff(F.col("o_orderdate"), F.col("eday")))
    w = Window.partitionBy("event_id").orderBy(
        gap.asc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("nearest_order"),
            F.col("o_orderdate").alias("nearest_date"),
            gap.cast("long").alias("gap_days"),
        )
    )


@query(
    "j15_lateral_topk",
    oracle="""
    SELECT s.c_mktsegment AS mktsegment, l.orderkey, l.cents
    FROM (SELECT DISTINCT c_mktsegment FROM customer) s
    JOIN LATERAL (
        SELECT o.o_orderkey AS orderkey,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = s.c_mktsegment
        ORDER BY cents DESC, orderkey
        LIMIT 3
    ) l ON TRUE
    ORDER BY mktsegment, cents DESC, orderkey
    """,
)
def j15_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: top-3 orders by value per market
    segment, written as the SQL-standard ``JOIN LATERAL (... ORDER BY
    ... LIMIT k)`` instead of the window-function idiom (o06's shape).

    The point is the API cell: Spark 3.4+ plans a correlated lateral
    subquery with ORDER BY + LIMIT as DomainJoin → rewritten to a
    partitioned TakeOrdered per correlation key — the same physical
    shape as row_number ≤ k, so the declarative form costs nothing at
    scale while composing better (arbitrary correlated predicates, no
    manual rank column). Price in integer cents with an orderkey
    tie-break, so the top-3 frontier is a total function of the data.

    Parity: beyond-reference (the reference's per-group top-k is a
    pandas groupby-head; this is its SQL-standard correlated form).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    customer.createOrReplaceTempView("__j15_customer")
    orders.createOrReplaceTempView("__j15_orders")
    return spark.sql(
        """
        SELECT s.c_mktsegment AS mktsegment, l.orderkey, l.cents
        FROM (SELECT DISTINCT c_mktsegment FROM __j15_customer) s
        JOIN LATERAL (
            SELECT o.o_orderkey AS orderkey,
                   CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM __j15_orders o JOIN __j15_customer c
              ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = s.c_mktsegment
            ORDER BY cents DESC, orderkey
            LIMIT 3
        ) l
        ORDER BY mktsegment, cents DESC, orderkey
        """
    )
