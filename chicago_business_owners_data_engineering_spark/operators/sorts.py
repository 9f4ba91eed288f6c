"""Sort / limit / top-k / pagination operators (SURVEY.md §2.6, O1–O5).

Ordered-limit queries compile to TakeOrderedAndProject (per-partition
heap top-k + k-row driver merge), not a global sort. Pagination uses an
explicit total order so pages are deterministic and non-overlapping —
the reference paginates an unordered frame (O4) which is unstable under
any parallel execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "o01_sort_desc_counts",
    oracle="""
    SELECT p_brand AS brand, COUNT(*) AS count
    FROM part
    GROUP BY p_brand
    ORDER BY count DESC, brand ASC
    """,
)
def o01_sort_desc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency table sorted descending with tie-break.

    O1: ``sort_values('count', ascending=False)``
    (cbddl/scripts/run_pipeline.py:95-96,105-106).
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("brand"))
    )


@query(
    "o02_argmax_limit1",
    oracle="""
    SELECT event_type AS value, COUNT(*) AS count
    FROM events
    GROUP BY event_type
    ORDER BY count DESC, value ASC
    LIMIT 1
    """,
)
def o02_argmax_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT 1 argmax (O2: cbddl/src/etl/pipeline.py:517-522)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(1)
    )


@query(
    "o03_ordered_batch_fetch",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    ORDER BY ts ASC, event_id ASC
    LIMIT 100
    """,
)
def o03_ordered_batch_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor-style ordered batch fetch (ORDER BY ts LIMIT n).

    O3: change-stream poll ``ORDER BY created_at LIMIT :batch_size``
    (cbddl/src/big_data/streaming_processor.py:139-144). event_id breaks
    timestamp ties.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy(F.asc("ts"), F.asc("event_id"))
        .limit(100)
        .select("event_id", "ts", "event_type")
    )


@query(
    "o04_pagination",
    oracle="""
    SELECT custkey, name, acctbal, total_count
    FROM (
        SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal,
               ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn,
               COUNT(*) OVER () AS total_count
        FROM customer
    )
    WHERE rn > 40 AND rn <= 60
    """,
)
def o04_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic offset/limit pagination + total count.

    O4: ``df.iloc[offset:offset+limit]`` with total_count/has_more
    (cbddl/src/api/main.py:144-156,238-250). Implemented as a
    row_number range over a total order, so page N is stable across
    runs and executors; total_count rides along as a grand-total
    window. Page = offset 40, limit 20.
    """
    customer = load_table(spark, sf_dir, "customer")
    offset, limit = 40, 20
    w = Window.orderBy("c_custkey")
    numbered = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("total_count"),
    )
    return numbered.filter((F.col("rn") > offset) & (F.col("rn") <= offset + limit)).drop("rn")


@query(
    "o05_topk_head",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def o05_topk_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows by a measure (O5: analytics ``.head(k)`` everywhere).

    TakeOrderedAndProject: no global sort at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_totalprice").alias("totalprice"))
    )


@query(
    "o06_topk_per_group",
    oracle="""
    SELECT custkey, orderkey, totalprice
    FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def o06_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window — the scalable form of the
    reference's per-entity heads (dashboard top lists). One shuffle on
    the group key; no driver involvement."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "o07_keyset_pagination",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
    FROM customer
    WHERE c_custkey > 40
    ORDER BY c_custkey
    LIMIT 20
    """,
)
def o07_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: the scale path o04 documents.

    Offset pagination (o04) ranks the whole result to skip N rows —
    inherently a global window whose cost grows with the offset. Keyset
    pagination carries the last-seen key instead: `key > cursor` is a
    pushed-down scan predicate and the page is a TakeOrdered over only
    qualifying rows — page cost is O(page), independent of how deep
    into the result the client is. The API surface difference (cursor
    token vs page number) is the price (no random page jumps).
    """
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_custkey") > 40)
        .orderBy(F.asc("c_custkey"))
        .limit(20)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
