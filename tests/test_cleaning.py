"""Unit tests for the cleaning semantics (SURVEY.md §7 risk register:
null-token coercion, concat_ws null-skipping vs CONCAT empty-string
gaps, is_individual null-test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chicago_business_owners_data_engineering_spark.functions.cleaning import (
    combine_name,
    is_individual,
    normalize_string,
    null_if_token,
)


def test_null_tokens_coerced(spark):
    df = spark.createDataFrame(
        [("x",), ("",), ("  ",), ("N/A",), ("NULL",), ("null",), (None,), (" ok ",)],
        "v string",
    )
    out = [r[0] for r in df.select(null_if_token(F.col("v")).alias("v")).collect()]
    assert out == ["x", None, None, None, None, None, None, " ok "]


def test_normalize_trims_uppers_and_nulls(spark):
    df = spark.createDataFrame([(" abc ",), ("n/a",), (None,), ("  ",)], "v string")
    out = [r[0] for r in df.select(normalize_string(F.col("v")).alias("v")).collect()]
    assert out == ["ABC", None, None, None]


def test_combine_name_skips_nulls_like_reference(spark):
    # reference combine_name: parts joined by single spaces, nulls skipped
    # (cbddl/src/data_ingestion/ingestion_pipeline.py:109-123)
    df = spark.createDataFrame(
        [("JOHN", None, "DOE", None), ("A", "B", "C", "JR"), (None, None, None, None),
         ("X", "", "Y", "N/A")],
        "f string, m string, l string, s string",
    )
    out = [
        r[0]
        for r in df.select(
            combine_name(F.col("f"), F.col("m"), F.col("l"), F.col("s")).alias("n")
        ).collect()
    ]
    assert out == ["JOHN DOE", "A B C JR", "", "X Y"]


def test_is_individual_null_test(spark):
    df = spark.createDataFrame([("ACME LLC",), (None,), ("",), ("N/A",)], "e string")
    out = [r[0] for r in df.select(is_individual(F.col("e")).alias("i")).collect()]
    assert out == [False, True, True, True]
