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
from pyspark.sql import functions as F

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


# Columns stored as INT64 TIMESTAMP(NANOS) in the source parquet; Spark
# reads them as long (see session.py nanosAsLong) and we restore
# micros-precision TimestampType here — matching how external engines
# (DuckDB, pandas) surface the same files.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name in _NANOS_TS_COLUMNS:
        # Runtime-settable; needed even when the session wasn't built by
        # session.get_spark (e.g. the driver's own session).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001 — conf may be static on some builds
            pass
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


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
