"""Property-based tests for round-6 operators whose scale-path
implementations are REWRITES of a naive definition: the property is
always "optimized plan ≡ naive semantics on ANY input", checked against
a pure-Python reference on hypothesis-generated corpora. Each example
writes one tiny parquet fixture and runs the registry query exactly as
the driver would."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from chicago_business_owners_data_engineering_spark.registry import QUERIES

SETTINGS = dict(max_examples=6, deadline=None)

DAY = datetime.date(2024, 3, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))


# (user_id, minute-of-day, is_error) triples on a single day — small
# keyspace so sessions overlap halos in interesting ways
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=1439),
        st.booleans(),
    ),
    min_size=1,
    max_size=25,
)


@settings(**SETTINGS)
@given(events_strategy)
def test_j13_rank_sweep_equals_naive_overlap_join(spark, tmp_path_factory, evs):
    """The boundary-rank sweep must count EXACTLY the error halos a
    naive interval-overlap predicate join counts (the rewrite that
    replaced the probe-flagged bucket join loses and invents nothing)."""
    path = tmp_path_factory.mktemp("j13")
    rows = []
    for i, (uid, minute, is_err) in enumerate(evs):
        ts = datetime.datetime(2024, 3, 1) + datetime.timedelta(minutes=minute)
        rows.append((i, ts, uid if not is_err else 99, "error" if is_err else "view", 0.0, "{}"))
    _write_events(spark, path, rows)

    day_start = datetime.datetime(2024, 3, 1)
    day_end = day_start + datetime.timedelta(days=1)
    halo = datetime.timedelta(minutes=5)
    sessions: dict[int, list] = {}
    errors = []
    for i, (uid, minute, is_err) in enumerate(evs):
        ts = day_start + datetime.timedelta(minutes=minute)
        if is_err:
            errors.append((max(ts - halo, day_start), min(ts + halo, day_end)))
        else:
            s = sessions.setdefault(uid, [ts, ts])
            s[0] = min(s[0], ts)
            s[1] = max(s[1], ts)
    expected = {}
    for uid, (s1, s2) in sessions.items():
        n = sum(1 for (w1, w2) in errors if s1 <= w2 and w1 <= s2)
        if n > 0:
            expected[(uid, "2024-03-01")] = n

    got = {
        (r.user_id, r.day): r.n_error_overlaps
        for r in QUERIES["j13_interval_overlap_join"](spark, str(path)).collect()
    }
    assert got == expected


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=1439), min_size=1, max_size=20))
def test_ts16_sweep_equals_bruteforce_peak(spark, tmp_path_factory, minutes):
    """The +1/−1 sweep's per-day max must equal brute-force concurrency
    (evaluate the active-interval count at every start instant)."""
    path = tmp_path_factory.mktemp("ts16")
    day_start = datetime.datetime(2024, 3, 1)
    rows = [
        (i, day_start + datetime.timedelta(minutes=m), i, "view", 0.0, "{}")
        for i, m in enumerate(minutes)
    ]
    _write_events(spark, path, rows)

    day_end = day_start + datetime.timedelta(days=1)
    iv = [
        (
            day_start + datetime.timedelta(minutes=m),
            min(day_start + datetime.timedelta(minutes=m + 30), day_end),
        )
        for m in minutes
    ]
    # concurrency is maximized at some interval start (closed-open
    # starts count touching: [s, e) with e==s' counted concurrent
    # matches the engine's starts-before-ends tie rule at equal t —
    # an interval ending exactly at t is still "present" there)
    peak = max(sum(1 for (s, e) in iv if s <= t <= e) for (t, _) in iv)

    [r] = QUERIES["ts16_peak_concurrency"](spark, str(path)).collect()
    assert r.peak_concurrency == peak


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # basket
            st.integers(min_value=1, max_value=6),  # part
        ),
        min_size=2,
        max_size=30,
    )
)
def test_mb01_matches_bruteforce_associations(spark, tmp_path_factory, items):
    """Market-basket output must equal the brute-force pair census
    restricted by the A-Priori filters — counts, confidence and lift
    all floor-exact."""
    path = tmp_path_factory.mktemp("mb01")
    rows = [
        (b, p, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         datetime.datetime(2024, 3, 1))
        for i, (b, p) in enumerate(items)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))

    baskets: dict[int, set] = {}
    for b, p in items:
        baskets.setdefault(b, set()).add(p)
    nb = len(baskets)
    cnt: dict[int, int] = {}
    for s in baskets.values():
        for p in s:
            cnt[p] = cnt.get(p, 0) + 1
    freq = {p for p, c in cnt.items() if c * 1000 >= nb}
    pair_cnt: dict[tuple, int] = {}
    for s in baskets.values():
        fs = sorted(p for p in s if p in freq)
        for i in range(len(fs)):
            for j in range(i + 1, len(fs)):
                pair_cnt[(fs[i], fs[j])] = pair_cnt.get((fs[i], fs[j]), 0) + 1
    expected = {}
    for (a, b), c in pair_cnt.items():
        if c >= 2:
            expected[(a, b)] = (
                c,
                (1000 * c) // nb,
                (1000 * c) // cnt[a],
                (1000 * c) // cnt[b],
                (1000 * c * nb) // (cnt[a] * cnt[b]),
            )

    got = {
        (r.part_a, r.part_b): (
            r.pair_cnt,
            r.support_milli,
            r.conf_a_to_b_milli,
            r.conf_b_to_a_milli,
            r.lift_milli,
        )
        for r in QUERIES["mb01_market_basket"](spark, str(path)).collect()
    }
    # query returns top-50; expected is always smaller here
    assert got == expected
    for (a, b), (c, *_rest) in got.items():
        assert c <= min(cnt[a], cnt[b])  # the A-Priori bound


@settings(**SETTINGS)
@given(
    st.lists(
        st.sampled_from(["alpha beta gamma delta epsilon", "one two three four five",
                         "alpha beta gamma delta zeta", "lorem ipsum dolor sit amet"]),
        min_size=2,
        max_size=10,
    )
)
def test_dd16_weighted_jaccard_values_are_exact(spark, tmp_path_factory, texts):
    """Every emitted pair's weighted Jaccard must equal the pure-Python
    definition on the same shingle sets and per-mille IDF weights, and
    the score must be symmetric-bounded (0, 1000]."""
    path = tmp_path_factory.mktemp("dd16")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))

    def shingles(t):
        w = t.lower().split(" ")
        if len(w) >= 3:
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {t.lower()}

    sh = {i: shingles(t) for i, t in enumerate(texts)}
    n_docs = len(sh)
    df: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    w = {g: (n_docs * 1000) // c for g, c in df.items()}

    rows = QUERIES["dd16_weighted_jaccard_pairs"](spark, str(path)).collect()
    for r in rows:
        inter = sum(w[g] for g in sh[r.doc_a] & sh[r.doc_b])
        union = sum(w[g] for g in sh[r.doc_a] | sh[r.doc_b])
        assert (r.inter_w, r.union_w) == (inter, union)
        assert r.jw_milli == (1000 * inter) // union
        assert 0 < r.jw_milli <= 1000
        assert 10 * inter >= 5 * union  # θ respected
