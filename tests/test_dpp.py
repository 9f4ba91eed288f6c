"""Dynamic partition pruning over the date-partitioned lake layout.

S7's partitioned writes exist so that downstream joins prune at the
DIRECTORY level. Static pruning (a literal date predicate) is asserted
elsewhere; this test pins the RUNTIME variant — Spark's dynamic
partition pruning (DPP), where the partition filter is only known after
a dimension filter executes. At 100 TB this is the difference between
scanning every date directory of a fact table and scanning the handful
a filtered dim selects, so a regression here (e.g. a write layout or
session flag change that silently disables DPP) is a scale bug even
though every result stays correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fact_path = str(tmp_path / "orders_by_month")
    (
        orders.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("order_month")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    n_months = fact.select("order_month").distinct().count()
    assert n_months > 12  # the layout actually has many partitions

    # Independent calendar dim: (month, quarter). The quarter filter is
    # selective on the DIM, not on the partition column — the partition
    # set reaching the fact scan is only known once the dim is
    # evaluated, which is exactly the DPP shape.
    dim_path = str(tmp_path / "month_dim")
    quarter = F.concat(
        F.substring("order_month", 1, 4),
        F.lit("-Q"),
        F.ceil(F.substring("order_month", 6, 2).cast("int") / 3).cast("string"),
    )
    (
        fact.select("order_month")
        .distinct()
        .withColumn("quarter", quarter)
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path).filter(F.col("quarter") == "1996-Q1")
    joined = fact.join(dim, "order_month").agg(F.count("*").alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # And the pruned plan must compute the unpruned semantics.
    months = {r["order_month"] for r in dim.select("order_month").collect()}
    expected = (
        fact.filter(F.col("order_month").isin(*months))
        .agg(F.count("*").alias("n"))
        .collect()[0]["n"]
    )
    assert joined.collect()[0]["n"] == expected
