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
