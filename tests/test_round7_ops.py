"""Round-7 fixtures: the sharded gap scan (f25's engine core) proven
against a pure-Python reference on key sets crafted to cross every
shard/supershard boundary, plus a randomized panel."""

from __future__ import annotations

import random

from chicago_business_owners_data_engineering_spark.operators.scalars import (
    F25_SHARD_BITS,
    F25_SUPER_BITS,
    sharded_gap_scan,
)

SHARD = 1 << F25_SHARD_BITS
SUPER = SHARD << F25_SUPER_BITS


def _expected_gaps(keys):
    ks = sorted(set(keys))
    out = []
    for a, b in zip(ks, ks[1:]):
        if b > a + 1:
            out.append((a + 1, b - 1, b - a - 1))
    return out


def _run(spark, keys):
    ks = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        (r.gap_start, r.gap_end, r.gap_len)
        for r in sharded_gap_scan(ks).collect()
    )
    return got


def test_gap_scan_crosses_all_three_levels(spark):
    keys = [
        10, 12,                 # interior gap 11..11 (level 0)
        SHARD - 1, 2 * SHARD + 8,  # spans the empty shard 1 (level 1)
        SUPER + 5,              # spans the supershard boundary (level 2)
        SUPER + 5 + SHARD * 3,  # another level-1 gap in supershard 1
    ]
    assert _run(spark, keys) == sorted(_expected_gaps(keys))


def test_gap_scan_adjacent_and_duplicate_keys_emit_nothing(spark):
    # consecutive runs and duplicates are not gaps; a single key has none
    assert _run(spark, [5, 6, 7, 7, 8]) == []
    assert _run(spark, [SUPER]) == []
    # two keys straddling a supershard boundary with no hole between
    assert _run(spark, [SUPER - 1, SUPER]) == []


def test_gap_scan_randomized_panel_matches_python_reference(spark):
    rng = random.Random(7)
    # sparse draw over 3 supershards guarantees boundary-spanning gaps
    keys = sorted(rng.sample(range(3 * SUPER), 400))
    assert _run(spark, keys) == sorted(_expected_gaps(keys))


# ------------------------------------------------------------------
# dd17: short-doc corpus differential (the ADVICE r6 scenario — docs
# shorter than the shingle width must band identically on both
# engines, and the true-pair leg must be exact)
# ------------------------------------------------------------------

def test_dd17_short_doc_corpus_matches_oracle(spark, tmp_path):
    import duckdb

    from chicago_business_owners_data_engineering_spark.registry import (
        get_oracles,
        get_queries,
    )

    rows = [
        # two identical 1-word docs: same whole-text shingle, a REAL
        # J=1.0 pair — must be a candidate AND a true pair
        (1, "hello", "en", "web", 5),
        (2, "hello", "en", "web", 5),
        # a 2-word doc that shares nothing
        (3, "two words", "en", "web", 9),
        # a borderline near-dup pair: 4-gram overlap J >= 0.5
        (4, "alpha beta gamma delta epsilon", "en", "web", 30),
        (5, "alpha beta gamma delta zeta", "en", "web", 27),
        # an unrelated long doc
        (6, "one two three four five six seven", "en", "web", 33),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = (
        get_queries()["dd17_lsh_tuning_eval"](spark, str(tmp_path))
        .orderBy("band_size")
        .collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = con.execute(get_oracles()["dd17_lsh_tuning_eval"]).fetchall()

    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    # the exact leg must see both planted true pairs at every band size
    assert all(r.n_true == 2 for r in got)


# ------------------------------------------------------------------
# rows-only hardening (VERDICT r6 #6): golden tests that pin the
# mm02/mm06 stub semantics EXACTLY (the oracle can't reach them), and
# a second u03 equivalence fixture over planted edge cases.
# ------------------------------------------------------------------

def _stub_dims(payload: bytes):
    # independent re-derivation of decode_media's documented formula —
    # if the stub drifts, the golden rows below must fail
    h = 0
    for byt in payload[:64]:
        h = (h * 131 + byt) % 100000
    return 64 + h % 1024, 64 + (h // 7) % 1024, 1 + h % 32


def _write_docs(spark, tmp_path, texts):
    rows = [(i + 1, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_mm02_golden_rows(spark, tmp_path):
    import hashlib

    from chicago_business_owners_data_engineering_spark.operators.multimodal import (
        mm02_decode_features,
    )

    texts = ["hello world", "x", "a" * 200]
    _write_docs(spark, tmp_path, texts)
    got = {r["doc_id"]: r for r in mm02_decode_features(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}
    for i, t in enumerate(texts, start=1):
        payload = t.encode()
        w, h, nf = _stub_dims(payload)
        r = got[i]
        assert (
            r["media_type"], r["byte_len"], r["width"], r["height"],
            r["n_frames"], r["checksum"],
        ) == ("text", len(payload), w, h, nf, hashlib.md5(payload).hexdigest())


def test_mm06_golden_rows(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.multimodal import (
        RESIZE_BOX,
        mm06_resize_batch,
    )

    texts = ["hello world", "a" * 500]
    _write_docs(spark, tmp_path, texts)
    got = {r["doc_id"]: r for r in mm06_resize_batch(spark, str(tmp_path)).collect()}
    for i, t in enumerate(texts, start=1):
        payload = t.encode()
        w, h, _ = _stub_dims(payload)
        scale = min(RESIZE_BOX / w, RESIZE_BOX / h, 1.0)
        out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
        r = got[i]
        assert (r["width"], r["height"], r["out_width"], r["out_height"]) == (
            w, h, out_w, out_h
        )
        assert bytes(r["resized"]) == payload[: out_w * out_h]


def test_u03_second_fixture_edge_cases(spark):
    from chicago_business_owners_data_engineering_spark.functions.udfs import (
        leadership_score_apply_in_pandas,
    )

    rows = [
        (1, "view"), (1, "view"), (1, "buy"), (1, "buy"),  # 4 events, 2 types
        (2, "view"),                                        # singleton group
        (3, None), (3, "buy"),                              # null event_type
    ]
    events = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["user_id"]: (r["n_events"], r["diversity_score"])
        for r in leadership_score_apply_in_pandas(events).collect()
    }
    # hand-computed: nunique drops nulls on both the pandas and native side
    assert got == {1: (4, 0.5), 2: (1, 1.0), 3: (2, 0.5)}


# ------------------------------------------------------------------
# round-7 tail operators: planted fixtures pinning the semantic
# contracts the oracle can't isolate (cap binding, drift extremes)
# ------------------------------------------------------------------

def test_tp24_cap_strands_budget_on_small_high_weight_source(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.pipeline_ml import (
        TP24_BUDGET_X,
        TP24_CAP_MILLI,
        tp24_epoch_budget,
    )

    # src9 (weight 90): tiny (10 tokens) -> allocation ~10.5 epochs of
    # itself, far past the cap; src0 (weight 25): big (1000 tokens)
    rows = [(1, " ".join(["a"] * 10), "en", "src9", 20)] + [
        (2 + i, " ".join(["b"] * 100), "en", "src0", 200) for i in range(10)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r["source"]: r for r in tp24_epoch_budget(spark, str(tmp_path)).collect()}
    t0, t9 = got["src0"], got["src9"]
    assert (t9["tokens"], t0["tokens"]) == (10, 1000)
    # hand-replay of the integer allocation
    t_all, wt_all = 1010, 90 * 10 + 25 * 1000
    for t, w in ((t0, 25), (t9, 90)):
        alloc = TP24_BUDGET_X * t_all * w * t["tokens"] // wt_all
        assert t["alloc_tokens"] == alloc
        cap_tok = TP24_CAP_MILLI * t["tokens"] // 1000
        assert t["granted_tokens"] == min(alloc, cap_tok)
        assert t["stranded_tokens"] == alloc - min(alloc, cap_tok)
        assert t["epochs_milli"] == min(1000 * alloc // t["tokens"], TP24_CAP_MILLI)
    # src9 dominates the weighted pool -> its allocation exceeds 3 epochs
    # of itself and the cap must bind, stranding budget
    assert t9["epochs_milli"] == TP24_CAP_MILLI
    assert t9["stranded_tokens"] > 0
    # budget conservation: total allocation == sum of grants + strands
    assert sum(r["alloc_tokens"] for r in got.values()) == sum(
        r["granted_tokens"] + r["stranded_tokens"] for r in got.values()
    )


def test_sim19_single_source_corpus_has_unit_alignment(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.similarity import (
        SIM19_DIMS,
        sim19_source_centroid_drift,
    )

    docs = [(i, "doc %d" % i, "en", "only", 5) for i in range(4)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    vecs = [(i, [0.25] * SIM19_DIMS) for i in range(4)]
    spark.createDataFrame(vecs, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    [r] = sim19_source_centroid_drift(spark, str(tmp_path)).collect()
    # one source == the corpus: centroids identical, cos^2 = 1.000
    assert r["source"] == "only" and r["n_vecs"] == 4
    assert r["dot"] == r["na2"] == r["nb2"] > 0
    assert r["cos2_milli"] == 1000


def test_sim19_opposed_sources_have_negative_dot(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.similarity import (
        SIM19_DIMS,
        sim19_source_centroid_drift,
    )

    docs = [(0, "a", "en", "up", 1), (1, "b", "en", "up", 1),
            (2, "c", "en", "down", 1)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    vecs = [(0, [0.4] * SIM19_DIMS), (1, [0.4] * SIM19_DIMS),
            (2, [-0.4] * SIM19_DIMS)]
    spark.createDataFrame(vecs, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    got = {r["source"]: r for r in
           sim19_source_centroid_drift(spark, str(tmp_path)).collect()}
    # corpus centroid leans "up" (2 of 3 vectors): the down-source's
    # centroid opposes it -> negative dot; the up-source aligns
    assert got["down"]["dot"] < 0
    assert got["up"]["dot"] > 0 and got["up"]["cos2_milli"] == 1000


def test_sim19_malformed_vector_saturates_identically(spark, tmp_path):
    """ADVICE r7: a component below -1.0005 used to break truncating-div
    vs flooring-// parity (negative qp), and a non-64-width vector used
    to shift the oracle's means silently. Both engines now clamp to
    [-SIM19_CLAMP, SIM19_CLAMP] and derive the dim range from the
    actual array length — a malformed vector must still hash-match."""
    import duckdb

    from chicago_business_owners_data_engineering_spark.operators.similarity import (
        SIM19_DIMS,
    )
    from chicago_business_owners_data_engineering_spark.registry import (
        get_oracles,
        get_queries,
    )

    docs = [(i, "d%d" % i, "en", "poisoned" if i == 0 else "clean", 2)
            for i in range(4)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    bad = [-3.25] * (SIM19_DIMS // 2) + [7.5] * (SIM19_DIMS // 2)
    vecs = [(0, bad)] + [(i, [0.125] * SIM19_DIMS) for i in range(1, 4)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = (
        get_queries()["sim19_source_centroid_drift"](spark, str(tmp_path))
        .orderBy("source")
        .collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    want = con.execute(get_oracles()["sim19_source_centroid_drift"]).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    # saturation is visible: the poisoned source's centroid pins at the
    # clamp (-2000 / +2000 milli per half), so its drift vs the clean
    # corpus centroid must register (cos2 far from 1000)
    by_src = {r["source"]: r for r in got}
    assert by_src["poisoned"]["cos2_milli"] < 1000


def test_a34_weighted_median_hand_fixture(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.operators.aggregates import (
        a34_weighted_median,
    )

    # flag A: qty 1 (weight 1.00), qty 10 (weight 98.99), qty 20 (0.02):
    # half of 100.01 is reached at qty 10. flag B: all weight on qty 5.
    rows = [
        (1, 1, "A", 1.0, 1.00),
        (2, 2, "A", 10.0, 98.99),
        (3, 3, "A", 20.0, 0.02),
        (4, 4, "B", 5.0, 7.77),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_returnflag string, "
        "l_quantity double, l_extendedprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    got = {r["returnflag"]: r for r in a34_weighted_median(spark, str(tmp_path)).collect()}
    assert got["A"]["w_median_qty"] == 10
    assert got["A"]["total_w_cents"] == 100 + 9899 + 2
    assert got["B"]["w_median_qty"] == 5 and got["B"]["total_w_cents"] == 777


def test_wh06_flags_planted_hot_key(spark, tmp_path):
    from chicago_business_owners_data_engineering_spark.plans.warehouse import (
        WH06_BUCKETS,
        wh06_partition_skew_audit,
    )

    # one mega-key (600 rows) + 600 unique keys: the mega-key's bucket
    # must carry >= 1.5x fair share and flag hot
    rows = [(7, i, "A", 1.0, 1.0) for i in range(600)] + [
        (1000 + i, i, "A", 1.0, 1.0) for i in range(600)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_returnflag string, "
        "l_quantity double, l_extendedprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    out = wh06_partition_skew_audit(spark, str(tmp_path)).collect()
    assert len(out) <= WH06_BUCKETS
    assert sum(r["n_rows"] for r in out) == 1200
    hot = [r for r in out if r["is_hot"]]
    assert hot, "the mega-key bucket must flag hot"
    assert max(r["load_milli"] for r in out) >= 1500
    # every bucket's key count is consistent (mega-key adds 1 key, 600 rows)
    mega = max(out, key=lambda r: r["n_rows"])
    assert mega["n_rows"] >= 600 and mega["is_hot"]
