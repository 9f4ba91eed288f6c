"""Table catalog: parquet loading + temp-view registration.

The reference declares a dtype map at CSV ingest and relies on parquet
self-describing schemas thereafter (SURVEY.md §1.3). We do the same:
parquet is the storage format, schemas travel with the files, and the
engine registers each table as a temp view so both the DataFrame API and
``spark.sql`` see one catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always below any sane broadcast threshold, so
# joins against them should be broadcast-hash joins (no shuffle of the
# fact side). Used by operators to decide on an explicit broadcast hint.
SMALL_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    For compute-heavy per-row pipelines (shingling, edit distance,
    vector math) whose input is a SINGLE-row-group parquet fixture:
    Spark can only split parquet at row-group boundaries, so the scan —
    and every projection fused into it — runs as one task locally no
    matter what maxPartitionBytes says. Spreading the raw rows first
    costs one narrow shuffle of the (small) input and buys full-core
    evaluation of the expensive expressions above it. On a production
    table with many files/row groups this is a near-no-op (the scan is
    already parallel), so the call is safe to leave in at scale; put it
    BELOW the expensive projection — Spark does not push project
    through a user repartition, which is exactly the point.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
