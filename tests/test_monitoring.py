"""Monitoring operators: rolling RANGE-frame semantics + snapshot shape."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_range_frame_is_calendar_not_row_count(spark):
    """The load-bearing RANGE-vs-ROWS distinction in ts06: with a gap
    in the series, the trailing frame is bounded by the CALENDAR window
    (day_num distance), not by a count of observed rows."""
    rows = [
        ("a", 0, 10.0),
        ("a", 1, 20.0),
        # days 2..30 missing entirely
        ("a", 31, 40.0),  # 30-day frame reaches back to day 2 -> alone
        ("a", 32, 60.0),  # frame covers days 3..32 -> {31, 32}
    ]
    df = spark.createDataFrame(rows, "event_type string, day_num int, day_value double")
    w = Window.partitionBy("event_type").orderBy("day_num").rangeBetween(-29, 0)
    got = {
        r["day_num"]: (r["n"], r["avg"])
        for r in df.select(
            "day_num",
            F.count("*").over(w).alias("n"),
            F.avg("day_value").over(w).alias("avg"),
        ).collect()
    }
    assert got[1] == (2, 15.0)  # days 0,1 both inside
    assert got[31] == (1, 40.0)  # day 1 is 30 days back -> outside
    assert got[32] == (2, 50.0)  # days 31,32


def test_ts06_day_strings_and_frame_cap(spark, sf_dir):
    from chicago_business_owners_data_engineering_spark.operators.monitoring import (
        ROLLING_DAYS,
        ts06_rolling_30d_frame,
    )

    out = ts06_rolling_30d_frame(spark, sf_dir)
    rows = out.collect()
    assert rows
    # day ships as an ISO string (driver dtype posture), frames bounded
    for r in rows[:50]:
        datetime.date.fromisoformat(r["day"])
        assert 1 <= r["days_in_frame"] <= ROLLING_DAYS
        assert r["events_30d"] >= 1


def test_epoch_seconds_survives_2038_and_keeps_micros(spark):
    """unix_date is int32; without the long cast, day*86400 overflows
    (ANSI mode: throws) for any timestamp from 2038-01-19 on."""
    from chicago_business_owners_data_engineering_spark.operators.monitoring import (
        epoch_seconds_ntz,
    )

    df = spark.createDataFrame(
        [("2040-06-01 12:00:00.500123",), ("2024-01-31 00:37:12.194062",)],
        "s string",
    ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
    got = sorted(float(r[0]) for r in df.select(epoch_seconds_ntz("ts")).collect())
    assert got[0] == 1706661432.194062  # micros preserved
    assert got[1] == 2222164800.500123  # > 2^31: would overflow int32


def test_mon01_snapshot_longform_gauges(spark, sf_dir):
    from chicago_business_owners_data_engineering_spark.operators.monitoring import (
        mon01_metrics_snapshot,
    )

    snap = {r["metric"]: r["value"] for r in mon01_metrics_snapshot(spark, sf_dir).collect()}
    orders_n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert snap["orders_rows"] == float(orders_n)
    assert 0.0 <= snap["events_null_props_frac"] <= 1.0
    # freshness is a real 2024 epoch instant
    assert 1.7e9 < snap["events_freshness_epoch_s"] < 1.8e9


def test_gap_fill_day_grain_forward_fill(spark):
    """The library resampler at a different grain than ts07: daily
    buckets, two keys, exact forward-fill and zero backfill."""
    from chicago_business_owners_data_engineering_spark.operators.monitoring import (
        gap_fill,
    )

    rows = [
        ("a", "2024-01-01 10:00:00", 5),
        ("a", "2024-01-04 09:00:00", 7),
        ("b", "2024-01-02 00:30:00", 1),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v long").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r["k"], str(r["bucket_start"])[:10]): (r["is_gap"], r["filled"])
        for r in gap_fill(df, ["k"], "ts", F.sum("v"), grain="day").collect()
    }
    # spine: 2024-01-01 .. 2024-01-04 for BOTH keys
    assert len(out) == 8
    assert out[("a", "2024-01-01")] == (False, 5)
    assert out[("a", "2024-01-02")] == (True, 5)   # carried forward
    assert out[("a", "2024-01-03")] == (True, 5)
    assert out[("a", "2024-01-04")] == (False, 7)
    assert out[("b", "2024-01-01")] == (True, 0)   # leading gap -> 0
    assert out[("b", "2024-01-02")] == (False, 1)
    assert out[("b", "2024-01-04")] == (True, 1)


def test_gap_fill_interpolation(spark):
    """interp mode: exact linear values inside a gap, backfill before
    the first observation, carry-forward after the last."""
    from chicago_business_owners_data_engineering_spark.operators.monitoring import (
        gap_fill,
    )

    rows = [
        ("a", "2024-01-02 00:00:00", 10.0),
        ("a", "2024-01-05 00:00:00", 40.0),  # 3-day gap: 20, 30 between
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        str(r["bucket_start"])[:10]: r["filled"]
        for r in gap_fill(df, ["k"], "ts", F.sum("v"), grain="day", method="interp").collect()
    }
    assert out == {
        "2024-01-02": 10.0,
        "2024-01-03": 20.0,
        "2024-01-04": 30.0,
        "2024-01-05": 40.0,
    }
    # leading + trailing behavior: add observations away from the edges
    rows2 = rows + [("b", "2024-01-03 08:00:00", 7.0)]
    df2 = spark.createDataFrame(rows2, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out2 = {
        (r["k"], str(r["bucket_start"])[:10]): r["filled"]
        for r in gap_fill(df2, ["k"], "ts", F.sum("v"), grain="day", method="interp").collect()
    }
    assert out2[("b", "2024-01-02")] == 7.0  # backfill before first obs
    assert out2[("b", "2024-01-05")] == 7.0  # carry after last obs
    assert out2[("a", "2024-01-04")] == 30.0  # interp unchanged by key b


def test_dq08_ks_matches_python_recompute(spark, sf_dir):
    """Recompute the grid-ECDF KS statistic in plain Python (independent
    of the SQL shape) and check statistic, argmax bin, and bounds."""
    import datetime
    import math

    from chicago_business_owners_data_engineering_spark.catalog import load_table
    from chicago_business_owners_data_engineering_spark.operators.curation import (
        _DRIFT_SPLIT,
        KS_BIN_WIDTH,
        KS_BINS,
        dq08_ks_drift,
    )

    split = datetime.datetime.fromisoformat(_DRIFT_SPLIT)
    ref, cur = [0] * KS_BINS, [0] * KS_BINS
    for r in load_table(spark, sf_dir, "events").select("ts", "value").collect():
        b = min(int(math.floor(r["value"] / KS_BIN_WIDTH)), KS_BINS - 1)
        (ref if r["ts"] < split else cur)[b] += 1
    n_ref, n_cur = sum(ref), sum(cur)
    cr = cc = 0
    best = (-1, None)
    for b in range(KS_BINS):
        cr += ref[b]
        cc += cur[b]
        d = abs(cr * n_cur - cc * n_ref)
        if d > best[0]:
            best = (d, b)

    [row] = dq08_ks_drift(spark, sf_dir).collect()
    assert (row["n_ref"], row["n_cur"]) == (n_ref, n_cur)
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert abs(row["ks_stat"] - best[0] / (n_ref * n_cur)) < 1e-6
    assert row["ks_at_bin"] == best[1]


def test_ts10_slope_matches_numpy_ols(spark, sf_dir):
    """ts10's BIGINT rational is the genuine least-squares slope: refit
    each nation's daily series with numpy.polyfit and compare, and check
    the rational and the rounded ratio agree."""
    import numpy as np

    from chicago_business_owners_data_engineering_spark.operators.monitoring import (
        TS10_FROM,
        TS10_TO,
        ts10_linear_trend,
    )
    from chicago_business_owners_data_engineering_spark.catalog import load_table

    got = {r.n_name: r for r in ts10_linear_trend(spark, sf_dir).collect()}
    assert got, "no nations in the window"

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = {}
    rows = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(TS10_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(TS10_TO).cast("timestamp"))
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit(TS10_FROM).cast("date")
            ).alias("x"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    for r in rows:
        daily.setdefault(r.n_name, {})
        daily[r.n_name][r.x] = daily[r.n_name].get(r.x, 0) + r.cents

    for name, series in daily.items():
        row = got[name]
        assert row.n_days == len(series)
        xs = np.array(sorted(series), dtype=float)
        ys = np.array([series[x] for x in sorted(series)], dtype=float)
        if len(xs) < 2 or row.slope_den == 0:
            assert row.slope_cents_per_day is None
            continue
        expected = np.polyfit(xs, ys, 1)[0]
        rational = row.slope_num / row.slope_den
        assert abs(rational - expected) <= 1e-6 * max(1.0, abs(expected))
        assert row.slope_cents_per_day == round(rational, 6)


def test_cusum_changepoint_hand_computed(spark, tmp_path):
    """ts11 against a by-hand CUSUM walk: a clean level step lands the
    argmax on the last day of the left segment, with the sign read out
    as an upward shift."""
    # 4 days at 10.00, then 4 days at 30.00 (one event per day)
    rows = []
    for i, v in enumerate([10.0] * 4 + [30.0] * 4):
        rows.append((i, f"2024-02-{i+1:02d} 12:00:00", 1, "purchase", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from chicago_business_owners_data_engineering_spark.registry import QUERIES

    [r] = QUERIES["ts11_cusum_changepoint"](spark, str(tmp_path)).collect()
    # n=8, S=16000 cents; left days: 8*1000-16000 = -8000 each;
    # walk: -8000,-16000,-24000,-32000 then +8000 steps back to 0.
    assert r.cp_day == "2024-02-04"
    assert r.n_days == 8
    assert r.max_abs_cusum == 32000
    assert bool(r.shift_up) is True


def test_weekday_seasonality_hand_computed(spark, tmp_path):
    """ts12 against a by-hand profile: Mondays at 2x the weekly mean
    index ~2000 milli, numbering pinned to ISO Monday=0 (2024-02-05 is
    a Monday), and the nested-div replay matches exactly."""
    rows = [
        # two Mondays at 30.00, two Tuesdays at 10.00
        (0, "2024-02-05 09:00:00", 1, "purchase", 30.0, "{}"),
        (1, "2024-02-12 09:00:00", 1, "purchase", 30.0, "{}"),
        (2, "2024-02-06 09:00:00", 1, "purchase", 10.0, "{}"),
        (3, "2024-02-13 09:00:00", 1, "purchase", 10.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from chicago_business_owners_data_engineering_spark.registry import QUERIES

    got = {
        r.weekday: r
        for r in QUERIES["ts12_weekday_seasonality"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}  # Monday=0, Tuesday=1
    # overall mean 2000 cents; Monday mean 3000 -> 1500 milli;
    # Tuesday mean 1000 -> 500 milli (exact nested-div integers)
    # exact nested-div replay: (6000c*1e6 div 2)*1000 div (8000c*1e6 div 4)
    assert got[0].index_milli == (6000 * 1_000_000 // 2) * 1000 // (
        8000 * 1_000_000 // 4
    )
    assert got[0].index_milli == 1500
    assert got[1].index_milli == 500
    assert got[0].n_events == 2 and got[0].sum_cents == 6000


def test_seasonal_anomaly_deseasonalizes_before_flagging(spark, tmp_path):
    """ts13's point: a high-but-normal peak weekday is NOT an anomaly
    once adjusted, while a genuinely broken day on the same weekday
    IS. Four weeks of a 2-level weekly pattern + one planted spike."""
    rows, i = [], 0
    # Mondays at 40.00, other days at 10.00, 4 weeks (2024-02-05 = Mon)
    import datetime

    d0 = datetime.date(2024, 2, 5)
    for off in range(28):
        day = d0 + datetime.timedelta(days=off)
        base = 40.0 if day.weekday() == 0 else 10.0
        if off == 21:  # a Monday gone wrong: 10x its seasonal level
            base = 400.0
        rows.append((i, f"{day} 12:00:00", 1, "purchase", base, "{}"))
        i += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from chicago_business_owners_data_engineering_spark.registry import QUERIES

    got = [r.day for r in QUERIES["ts13_seasonal_anomaly"](spark, str(tmp_path)).collect()]
    assert "2024-02-26" in got  # the broken Monday
    # ordinary peak Mondays adjusted away
    assert "2024-02-05" not in got and "2024-02-12" not in got
