"""Set operations (SURVEY.md §2.7).

The reference implements none directly — its nearest relatives are
SELECT DISTINCT and upsert, and the J2 OR-join rewrite introduces a
union internally. The engine exposes the full family; these queries
pin the semantics (DISTINCT-set vs bag) against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _open_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


def _finished_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


@query(
    "set01_union_distinct",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set01_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): customers with open or finished orders."""
    return (
        _open_custkeys(spark, sf_dir)
        .unionByName(_finished_custkeys(spark, sf_dir))
        .distinct()
    )


@query(
    "set02_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set02_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both open and finished orders."""
    return _open_custkeys(spark, sf_dir).intersect(_finished_custkeys(spark, sf_dir))


@query(
    "set03_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set03_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with open orders but no finished ones."""
    return _open_custkeys(spark, sf_dir).exceptAll(_finished_custkeys(spark, sf_dir)).distinct()


@query(
    "set04_union_evolved_schema",
    oracle="""
    SELECT doc_id, lang, source, n_chars, NULL AS quality_tier FROM documents
    WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, NULL AS source, n_chars,
           CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS quality_tier
    FROM documents
    WHERE doc_id % 2 = 1
    """,
)
def set04_union_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two table generations with different
    columns combined by NAME, absentees null-filled.

    The lakehouse reality at 100 TB: older partitions lack columns
    newer ones carry. ``unionByName(allowMissingColumns=True)`` aligns
    by name (positional UNION would silently mis-map), fills missing
    columns with NULL, and stays a zero-shuffle bag union — each input
    partition passes through unchanged. The two "generations" here are
    carved from documents by doc_id parity: gen1 has `source` but no
    `quality_tier`; gen2 the reverse.
    """
    documents = load_table(spark, sf_dir, "documents")
    gen1 = documents.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "source", "n_chars"
    )
    gen2 = documents.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(F.col("n_chars") >= 300, "long").otherwise("short").alias("quality_tier"),
    )
    return gen1.unionByName(gen2, allowMissingColumns=True).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.col("quality_tier").cast("string").alias("quality_tier"),
    )
