"""Engine rewrite rules (plans/rules.py): the rule must FIRE on the
matching pattern (plan assertion: the pathological operator disappears
from the executed physical plan), must PRESERVE semantics (differential
against the naive plan's own result), and must FALL THROUGH untouched
on near-miss patterns — the three properties that make it a rule rather
than a helper function. SURVEY §4 / VERDICT r5 #5."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chicago_business_owners_data_engineering_spark.catalog import load_table
from chicago_business_owners_data_engineering_spark.plans.rules import (
    fuse_filter_counts,
    rewrite_or_join,
)


def _executed(df) -> str:
    df.collect()  # AQE: finalize THIS plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial
    # Plan ==" — assert against the final one only (operator counts
    # would otherwise double).
    return plan.split("== Initial Plan ==")[0]


# ------------------------------------------------------------------
# rule 1: OR-of-equi join → disjoint union of equi-joins
# ------------------------------------------------------------------

def test_or_join_rule_fires_and_kills_nested_loop(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cond = (c.c_nationkey == s.s_nationkey) | (c.c_custkey == s.s_suppkey)

    naive = c.join(s, cond).select("c_custkey", "s_suppkey")
    naive_plan = _executed(naive)
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan

    rw = rewrite_or_join(c, s, cond)
    assert rw.fired, rw.reason
    opt = rw.df.select("c_custkey", "s_suppkey")
    opt_plan = _executed(opt)
    assert "BroadcastNestedLoopJoin" not in opt_plan
    assert "CartesianProduct" not in opt_plan
    assert opt_plan.count("HashJoin") + opt_plan.count("SortMergeJoin") >= 2

    # semantics: exact multiset equality with the naive OR join
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, opt.collect()))


def test_or_join_rule_handles_three_disjuncts_and_null_keys(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").withColumn(
        # plant NULLs in a join key: residual filters must be NULL-safe
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_nationkey")),
    )
    s = load_table(spark, sf_dir, "supplier")
    cond = (
        (c.c_nationkey == s.s_nationkey)
        | (c.c_custkey == s.s_suppkey)
        | (c.c_custkey == s.s_nationkey)
    )
    naive = c.join(s, cond).select("c_custkey", "s_suppkey")
    rw = rewrite_or_join(c, s, cond)
    assert rw.fired, rw.reason
    got = rw.df.select("c_custkey", "s_suppkey")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, got.collect()))


def test_or_join_rule_falls_through_on_non_equi_disjunct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cond = (c.c_nationkey == s.s_nationkey) | (c.c_acctbal < s.s_acctbal)
    rw = rewrite_or_join(c, s, cond)
    assert not rw.fired
    # fall-through still computes the correct (naive) answer
    assert rw.df.count() == c.join(s, cond).count()


def test_or_join_rule_falls_through_on_single_side_equality(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    # second disjunct compares two LEFT attributes — not a join predicate
    cond = (c.c_nationkey == s.s_nationkey) | (c.c_custkey == c.c_nationkey)
    rw = rewrite_or_join(c, s, cond)
    assert not rw.fired


def test_or_join_rule_falls_through_on_outer_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cond = (c.c_nationkey == s.s_nationkey) | (c.c_custkey == s.s_suppkey)
    rw = rewrite_or_join(c, s, cond, how="left")
    assert not rw.fired


# ------------------------------------------------------------------
# rule 2: union of per-predicate count scans → one-pass aggregate
# ------------------------------------------------------------------

def _naive_counts(part, kws):
    naive = None
    for k in kws:
        b = (
            part.filter(F.upper(F.col("p_name")).contains(k.upper()))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(k).alias("kw"), "cnt")
        )
        naive = b if naive is None else naive.unionByName(b)
    return naive


def test_fuse_counts_rule_fires_and_single_scans(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    kws = ["widget", "bolt", "rod", "small", "large"]
    naive = _naive_counts(part, kws)
    naive_plan = _executed(naive)
    assert naive_plan.count("Scan parquet") == len(kws)

    rw = fuse_filter_counts(naive)
    assert rw.fired, rw.reason
    fused_plan = _executed(rw.df)
    assert fused_plan.count("Scan parquet") == 1

    # semantics: same (kw, cnt) rows the naive plan produces
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, rw.df.collect()))
    assert rw.df.columns == ["kw", "cnt"]


def test_fuse_counts_rule_falls_through_on_mixed_sources(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    a = (
        part.filter(F.upper(F.col("p_name")).contains("WIDGET"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("widget").alias("kw"), "cnt")
    )
    b = (
        supplier.filter(F.upper(F.col("s_name")).contains("X"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("sup_x").alias("kw"), "cnt")
    )
    rw = fuse_filter_counts(a.unionByName(b))
    assert not rw.fired
    assert rw.df.count() == 2  # fall-through executes the naive union


def test_fuse_counts_rule_falls_through_on_grouped_aggregate(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    a = (
        part.filter(F.upper(F.col("p_name")).contains("WIDGET"))
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("widget").alias("kw"), "cnt")
    )
    b = (
        part.filter(F.upper(F.col("p_name")).contains("BOLT"))
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("bolt").alias("kw"), "cnt")
    )
    rw = fuse_filter_counts(a.unionByName(b))
    assert not rw.fired


def test_fuse_counts_rule_falls_through_on_non_union(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    rw = fuse_filter_counts(part.select("p_name"))
    assert not rw.fired
