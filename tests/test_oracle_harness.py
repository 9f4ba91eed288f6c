"""Self-tests for the differential-oracle comparator (tools/check_oracle).

The entire correctness story routes through canon_rows/canon_value; a
comparator that canonicalizes two DIFFERENT results to the same string
would green-light broken queries. These tests pin that it detects every
mismatch class the harness claims to check — and stays insensitive to
the things it claims to ignore (row order, column order, float noise
below the rounding grain).
"""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "check_oracle", "/root/repo/tools/check_oracle.py"
)
check_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_oracle)
canon_rows = check_oracle.canon_rows
canon_value = check_oracle.canon_value


def test_insensitive_to_row_and_column_order():
    a = canon_rows([(1, "x"), (2, "y")], ["k", "v"])
    b = canon_rows([("y", 2), ("x", 1)], ["v", "k"])
    assert a == b


def test_detects_value_mismatch():
    a = canon_rows([(1, "x")], ["k", "v"])
    b = canon_rows([(1, "z")], ["k", "v"])
    assert a != b


def test_detects_row_count_mismatch():
    a = canon_rows([(1,), (2,)], ["k"])
    b = canon_rows([(1,)], ["k"])
    assert a != b


def test_detects_swapped_values_across_columns():
    # same multiset of cell values, different row composition
    a = canon_rows([(1, "x"), (2, "y")], ["k", "v"])
    b = canon_rows([(1, "y"), (2, "x")], ["k", "v"])
    assert a != b


def test_float_noise_below_grain_ignored_above_grain_detected():
    assert canon_value(1.23456789012) == canon_value(1.23456789019)
    assert canon_value(1.2345) != canon_value(1.2346)


def test_null_vs_string_null_distinct():
    assert canon_value(None) != canon_value("None")
    assert canon_value(None) != canon_value("")


def test_nested_lists_compared_elementwise():
    assert canon_value([1.0, 2.0]) == canon_value((1.0, 2.0))
    assert canon_value([1.0, 2.0]) != canon_value([2.0, 1.0])


def test_bool_not_conflated_with_int():
    # engines disagreeing on bool vs int types must still hash equal
    # only when the VALUES agree under python str semantics
    assert canon_value(True) == "True"
    assert canon_value(1) == "1"
    assert canon_value(True) != canon_value(1)
