"""Diversity-index aggregates (SURVEY.md §2.4 A16–A17, §2.10 U2).

The reference implements Shannon entropy and Gini-Simpson as
driver-side numpy loops over a pandas value_counts
(cbddl/src/analytics/demographics_analyzer.py:205-215). Here both are
two-stage distributed aggregations — groupBy(value).count() then a
closed-form reduce — so they scale to arbitrary cardinality without a
UDAF and without collecting the distribution anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def shannon_entropy(df: DataFrame, column: str, out: str = "entropy") -> DataFrame:
    """H = -Σ p·log2(p) over the value distribution of ``column``.

    Composable two-stage aggregate (A16,
    cbddl/src/analytics/demographics_analyzer.py:205-209): the first
    shuffle is on the value, the second is a 1-row reduce.
    """
    counts = df.groupBy(column).agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return counts.crossJoin(F.broadcast(total)).agg(
        F.round(-F.sum(p * F.log2(p)), 6).alias(out)
    )


def gini_simpson(df: DataFrame, column: str, out: str = "gini") -> DataFrame:
    """1 - Σ p² (A17, cbddl/src/analytics/demographics_analyzer.py:211-215)."""
    counts = df.groupBy(column).agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return counts.crossJoin(F.broadcast(total)).agg(
        F.round(F.lit(1.0) - F.sum(p * p), 6).alias(out)
    )


@query(
    "a16_shannon_entropy",
    oracle="""
    WITH counts AS (
        SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority
    )
    SELECT ROUND(-SUM((cnt * 1.0 / (SELECT SUM(cnt) FROM counts))
                 * LOG2(cnt * 1.0 / (SELECT SUM(cnt) FROM counts))), 6) AS entropy
    FROM counts
    """,
)
def a16_shannon_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the order-priority distribution."""
    orders = load_table(spark, sf_dir, "orders")
    return shannon_entropy(orders, "o_orderpriority")


@query(
    "a17_gini_simpson",
    oracle="""
    WITH counts AS (
        SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY c_mktsegment
    )
    SELECT ROUND(1.0 - SUM(POW(cnt * 1.0 / (SELECT SUM(cnt) FROM counts), 2)), 6) AS gini
    FROM counts
    """,
)
def a17_gini_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson diversity of the market-segment distribution."""
    customer = load_table(spark, sf_dir, "customer")
    return gini_simpson(customer, "c_mktsegment")


@query(
    "a16b_grouped_entropy",
    oracle="""
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY lang, source
    ), totals AS (
        SELECT lang, SUM(cnt) AS n FROM counts GROUP BY lang
    )
    SELECT c.lang, ROUND(-SUM((c.cnt * 1.0 / t.n) * LOG2(c.cnt * 1.0 / t.n)), 6) AS entropy
    FROM counts c JOIN totals t ON c.lang = t.lang
    GROUP BY c.lang
    """,
)
def a16b_grouped_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy per group — the scalable generalization the reference
    cannot express: source-diversity of each language's documents,
    computed for every group in one shuffled plan (no per-group loop).
    """
    documents = load_table(spark, sf_dir, "documents")
    counts = documents.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
    totals = counts.groupBy("lang").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return (
        counts.join(totals, "lang")
        .groupBy("lang")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"))
    )
