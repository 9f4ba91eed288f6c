"""CSV ingestion (SURVEY.md §2.1 S1–S2, §3.1 stage 1).

The reference's ingestion pipeline
(cbddl/src/data_ingestion/ingestion_pipeline.py:25-136): typed CSV load
with an na_values token list, trim/upper cleaning, three derived
columns, quality metrics, parquet out. Re-expressed as one lazy Spark
lineage:

- explicit StructType (no inference pass over the data);
- the multi-token null map as an expression (Spark's ``nullValue``
  option takes one token; the expression form also works for any
  source, not just CSV);
- derived columns via concat_ws / isNull / a window count — no row UDF;
- chunked reading (S2) is subsumed by Spark's partitioned file scan.

At scale: CSV is a line-splittable format, so a 100 TB drop parallelizes
by ``maxPartitionBytes`` without code changes; the quality profile is
one extra aggregation over the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleaning import combine_name, is_individual, normalize_string

# The reference dataset's shape (readme.md:18; ingestion_pipeline.py:31-45).
BUSINESS_OWNERS_SCHEMA = T.StructType(
    [
        T.StructField("account_number", T.LongType()),
        T.StructField("legal_name", T.StringType()),
        T.StructField("owner_first_name", T.StringType()),
        T.StructField("owner_middle_initial", T.StringType()),
        T.StructField("owner_last_name", T.StringType()),
        T.StructField("suffix", T.StringType()),
        T.StructField("legal_entity_owner", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)

STRING_COLS = [f.name for f in BUSINESS_OWNERS_SCHEMA.fields if f.dataType == T.StringType()]


def read_business_owners_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: schema-first CSV scan; null tokens normalized downstream."""
    return (
        spark.read.schema(BUSINESS_OWNERS_SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def clean_business_owners(df: DataFrame) -> DataFrame:
    """The clean_data pass (ingestion_pipeline.py:76-107): normalize
    strings, then derive owner_full_name / is_individual_owner /
    has_multiple_owners."""
    out = df
    for c in STRING_COLS:
        out = out.withColumn(c, normalize_string(F.col(c)))
    w = Window.partitionBy("account_number")
    return (
        out.withColumn(
            "owner_full_name",
            combine_name(
                F.col("owner_first_name"),
                F.col("owner_middle_initial"),
                F.col("owner_last_name"),
                F.col("suffix"),
            ),
        )
        .withColumn("is_individual_owner", is_individual(F.col("legal_entity_owner")))
        .withColumn("has_multiple_owners", F.count("*").over(w) > 1)
    )


def quality_metrics(df: DataFrame) -> DataFrame:
    """validate_data_quality (ingestion_pipeline.py:54-74) as one
    aggregation: row/distinct counts, duplicate rows, per-column null
    counts + completeness percentage."""
    n = F.count("*")
    return df.agg(
        n.alias("total_rows"),
        F.countDistinct("account_number").alias("unique_accounts"),
        (n - F.countDistinct(F.struct(*df.columns))).alias("duplicate_rows"),
        *[
            F.round(F.count(F.when(F.col(c).isNotNull(), 1)) * 100.0 / n, 2).alias(
                f"{c}_completeness_pct"
            )
            for c in df.columns
        ],
    )


def run_ingestion(
    spark: SparkSession, csv_path: str, parquet_out: str
) -> tuple[DataFrame, DataFrame]:
    """run_ingestion_pipeline (ingestion_pipeline.py:152-178):
    load → clean → quality profile → parquet. Returns (cleaned, quality)."""
    cleaned = clean_business_owners(read_business_owners_csv(spark, csv_path))
    cleaned.write.mode("overwrite").parquet(parquet_out)
    return spark.read.parquet(parquet_out), quality_metrics(cleaned)
