"""Round-8 operator fixtures: boundary and tie semantics for the nine
new API-cell queries (VARIANT, try-arithmetic, collation, LATERAL,
percentile_disc, deterministic mode, native session_window, curriculum
phases, snapshot diff) pinned on hand corpora."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_st10_session_boundary_is_inclusive(spark, tmp_path):
    """session_window's merge bound is INCLUSIVE (measured, then pinned
    here AND in the oracle): an event at exactly prev+gap still merges;
    only ts > prev+gap starts a new session — at full microsecond
    precision, unlike st01's truncated-seconds DATE_DIFF rule."""
    from chicago_business_owners_data_engineering_spark.operators.pipeline_ml import (
        SESSION_GAP_S,
        st10_session_window_native,
    )

    gap = datetime.timedelta(seconds=SESSION_GAP_S)
    rows = [
        # user 1: second event at EXACTLY the gap -> still merges
        (1, BASE, 1, "view", 1.0, "{}"),
        (2, BASE + gap, 1, "view", 1.0, "{}"),
        # user 2: one microsecond PAST the gap -> new session
        (3, BASE, 2, "view", 1.0, "{}"),
        (4, BASE + gap + datetime.timedelta(microseconds=1), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = st10_session_window_native(spark, str(tmp_path)).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0].n_events == 2
    assert len(by_user[2]) == 2
    # session_end = last event ts + gap (the window's upper bound)
    assert by_user[1][0].session_end == BASE + gap + gap
    # and the oracle agrees on this exact boundary corpus
    import duckdb

    from chicago_business_owners_data_engineering_spark.registry import get_oracles

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    want = con.execute(get_oracles()["st10_session_window_native"]).fetchall()
    eng = sorted(tuple(r) for r in got)
    assert eng == sorted(tuple(w) for w in want)


def test_f33_malformed_json_degrades_to_null(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.scalars import (
        f33_variant_json,
    )

    rows = [
        (1, BASE, 1, "view", 1.0, '{"k": 5}'),
        (2, BASE, 1, "view", 1.0, "this is not json"),
        (3, BASE, 1, "view", 1.0, '{"k": 7}'),
    ]
    _write_events(spark, tmp_path, rows)
    [r] = f33_variant_json(spark, str(tmp_path)).collect()
    # malformed row still counted, its extraction NULLs out of the sum
    assert r.n_events == 3 and r.k_sum == 12 and r.k_max == 7
    assert r.n_missing == 3  # $.missing absent everywhere


def test_f34_planted_zero_denominator_and_bad_date(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.scalars import (
        f34_try_arithmetic,
    )

    rows = [
        # floor(100000.75) - 100000 = 0 -> try_divide -> NULL
        (1, 5, "O", 100000.75, BASE, "1-URGENT"),
        # orderkey 3 -> planted 'not-a-date' -> try_to_timestamp NULL
        (3, 5, "O", 42.5, BASE, "1-URGENT"),
        (4, 5, "O", 42.5, BASE, "1-URGENT"),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r.orderkey: r for r in f34_try_arithmetic(spark, str(tmp_path)).collect()}
    assert got[1].safe_ratio is None and got[1].parsed_ts is not None
    assert got[3].parsed_ts is None and got[3].safe_ratio is not None
    assert got[4].parsed_ts == BASE


def test_tp25_phases_partition_the_corpus(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.pipeline_ml import (
        tp25_curriculum_phases,
    )

    # 8 docs, two per diversity tier; equal-score docs must share a phase
    texts = {
        1000: "a b c d",          # uniq 4/4 -> 1000
        750: "a a b c",           # 3/4 -> 750
        500: "a a b b",           # 2/4 -> 500
        250: "a a a a",           # 1/4 -> 250
    }
    rows = []
    for i, (score, text) in enumerate(sorted(texts.items())):
        rows.append((2 * i, text, "en", "web", len(text)))
        rows.append((2 * i + 1, text, "en", "web", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = tp25_curriculum_phases(spark, str(tmp_path)).collect()
    assert [r.phase for r in got] == [1, 2, 3, 4]
    assert all(r.n_docs == 2 for r in got)  # equal scores stay together
    assert sum(r.n_docs for r in got) == 8
    # phase 1 = highest diversity; ranges strictly descending, disjoint
    assert got[0].score_min == got[0].score_max == 1000
    assert got[3].score_min == got[3].score_max == 250
    for hi, lo in zip(got, got[1:]):
        assert hi.score_min > lo.score_max


def test_a36_mode_tie_resolves_to_lowest(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.aggregates import (
        a36_grouped_mode,
    )

    orders = [
        (1, 10, "O", 1.0, BASE, "2-HIGH"),
        (2, 10, "O", 1.0, BASE, "1-URGENT"),
        (3, 11, "O", 1.0, BASE, "3-MEDIUM"),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, "cust10", 0, 0.0, "SEG"), (11, "cust11", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    [r] = a36_grouped_mode(spark, str(tmp_path)).collect()
    # 1-URGENT, 2-HIGH, 3-MEDIUM each appear once: tie -> lowest value
    assert r.mode_priority == "1-URGENT" and r.mode_count == 1


def test_f35_collation_merges_case_variants(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.scalars import (
        f35_collated_group,
    )

    # even partkeys get UPPER, odd get lower -> both variants of each
    # brand exist and must collapse into one collated group
    rows = [(i, f"part{i}", "Brand#%d" % (i % 3), "STANDARD", 5) for i in range(12)]
    spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    got = f35_collated_group(spark, str(tmp_path)).collect()
    assert [r.brand_key for r in got] == ["brand#0", "brand#1", "brand#2"]
    assert all(r.n_parts == 4 for r in got)
    # canonical representative is the BINARY min = the UPPER variant
    assert all(r.brand_canonical == r.brand_key.upper() for r in got)


def test_wh07_classifies_all_four_change_types(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.plans.warehouse import (
        wh07_snapshot_diff,
    )

    d95 = datetime.datetime(1995, 6, 1)
    d96 = datetime.datetime(1996, 6, 1)
    orders = [
        # cust 1: only 1995 -> removed
        (1, 1, "O", 10.0, d95, "1-URGENT"),
        # cust 2: only 1996 -> added
        (2, 2, "O", 20.0, d96, "1-URGENT"),
        # cust 3: both, same cents -> unchanged
        (3, 3, "O", 30.0, d95, "1-URGENT"),
        (4, 3, "O", 30.0, d96, "1-URGENT"),
        # cust 4: both, different -> changed
        (5, 4, "O", 40.0, d95, "1-URGENT"),
        (6, 4, "O", 55.5, d96, "1-URGENT"),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r.custkey: r for r in wh07_snapshot_diff(spark, str(tmp_path)).collect()}
    assert got[1].change_type == "removed" and got[1].delta_cents == -1000
    assert got[2].change_type == "added" and got[2].delta_cents == 2000
    assert got[3].change_type == "unchanged" and got[3].delta_cents == 0
    assert got[4].change_type == "changed" and got[4].delta_cents == 1550


def test_a35_percentile_disc_returns_actual_elements(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.aggregates import (
        a35_percentile_disc,
    )

    # 4 values: SQL-standard disc p25=first, p50=second, p75=third
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "A", "O", BASE),
        (2, 1, 1, 1, 1.0, 20.0, 0.0, 0.0, "A", "O", BASE),
        (3, 1, 1, 1, 1.0, 30.0, 0.0, 0.0, "A", "O", BASE),
        (4, 1, 1, 1, 1.0, 40.0, 0.0, 0.0, "A", "O", BASE),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    [r] = a35_percentile_disc(spark, str(tmp_path)).collect()
    assert (r.p25_cents, r.p50_cents, r.p75_cents) == (1000, 2000, 3000)


def test_j15_lateral_matches_window_topk(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.joins import (
        j15_lateral_topk,
    )
    from pyspark.sql import Window

    custs = [(i, f"c{i}", 0, 0.0, "SEG_A" if i < 3 else "SEG_B") for i in range(6)]
    orders = [(k, k % 6, "O", float(100 + 7 * k), BASE, "1-URGENT") for k in range(30)]
    spark.createDataFrame(
        custs, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = sorted(
        (r.mktsegment, r.orderkey, r.cents)
        for r in j15_lateral_topk(spark, str(tmp_path)).collect()
    )
    # independent window-function reference
    c = spark.read.parquet(str(tmp_path / "customer.parquet"))
    o = spark.read.parquet(str(tmp_path / "orders.parquet"))
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        c.c_mktsegment.alias("seg"),
        o.o_orderkey.alias("ok"),
        F.floor(o.o_totalprice * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("seg").orderBy(F.desc("cents"), F.asc("ok"))
    want = sorted(
        (r.seg, r.ok, r.cents)
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    )
    assert got == want and len(got) == 6


def test_apply_in_arrow_streaming_twin(spark, tmp_path):
    """The applyInArrow STREAMING cell (ROADMAP's last uncovered API
    cell): grouped-map Arrow UDFs are unsupported directly on a
    streaming DataFrame (update-mode retraction semantics don't exist
    for arbitrary grouped maps), so the production form is foreachBatch
    running the SAME Arrow kernel per micro-batch — pinned here to be
    row-identical to the batch u08 path over the same files, and the
    direct-attach path is pinned as raising AnalysisException so a
    future Spark that adds support breaks this test visibly."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from chicago_business_owners_data_engineering_spark.functions.udfs import (
        ARROW_CENTS_ROLLUP_SCHEMA,
        arrow_cents_rollup,
    )

    src = tmp_path / "ev_stream"
    src.mkdir()
    for b in range(2):
        pd.DataFrame(
            {
                "event_id": [10 * b + i for i in range(4)],
                "event_type": ["view", "view", "click", "click"],
                "value": [1.005, 2.0, 3.125, 4.0],
            }
        ).to_parquet(str(src / f"b{b}.parquet"))
    schema = "event_id long, event_type string, value double"

    # direct attach: unsupported — pinned
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        (
            stream.groupBy("event_type")
            .applyInArrow(arrow_cents_rollup, schema=ARROW_CENTS_ROLLUP_SCHEMA)
            .writeStream.format("memory")
            .queryName("u09_direct")
            .outputMode("complete")
            .start()
        )

    # the production twin: same kernel inside foreachBatch
    out = tmp_path / "u09_out"

    def apply_batch(batch_df, batch_id):
        (
            batch_df.groupBy("event_type")
            .applyInArrow(arrow_cents_rollup, schema=ARROW_CENTS_ROLLUP_SCHEMA)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(str(out))
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.batch_id, r.event_type): (
            r.total_cents,
            r.n_events,
            r.first_event_id,
            r.last_event_id,
        )
        for r in spark.read.parquet(str(out)).collect()
    }
    # batch reference: u08's exact kernel over each file separately
    # (maxFilesPerTrigger=1 -> one file per micro-batch); batch ids are
    # assigned in file order by the file-source
    for b in range(2):
        ref = {
            r.event_type: (
                r.total_cents,
                r.n_events,
                r.first_event_id,
                r.last_event_id,
            )
            for r in spark.read.parquet(str(src / f"b{b}.parquet"))
            .groupBy("event_type")
            .applyInArrow(arrow_cents_rollup, schema=ARROW_CENTS_ROLLUP_SCHEMA)
            .collect()
        }
        by_file = {
            et: v for (bid, et), v in got.items()
            if got[(bid, et)][2] // 10 == b  # first_event_id encodes the file
        }
        assert by_file == ref
    # IEEE: 1.005 * 100 = 100.4999... -> rounds DOWN to 100 on every
    # engine that rounds the double (not the decimal literal); 100+200
    view_rows = [v for (bid, et), v in got.items() if et == "view"]
    assert all(v[0] == 300 for v in view_rows)
