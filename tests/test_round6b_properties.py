"""Property-based tests for the round-6 tail-session operators: the
property is always "distributed plan ≡ naive pure-Python definition on
ANY input", on hypothesis-generated corpora. Each example writes one
tiny parquet fixture and runs the registry query exactly as the driver
would."""

from __future__ import annotations

import datetime
import itertools
from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st

from chicago_business_owners_data_engineering_spark.registry import QUERIES

SETTINGS = dict(max_examples=6, deadline=None)

DAY = datetime.datetime(2024, 3, 1)
SESSION_GAP_S = 1800


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))


# (user_id, minute-of-day, event_type) — tiny keyspace so sessions
# split/merge and transition matrices stay hand-checkable
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=1439),
        st.sampled_from(["view", "cart", "buy"]),
    ),
    min_size=1,
    max_size=25,
)


def _sessions(evs):
    """Naive sessionization: per user, ordered by (ts, event_id),
    split when the gap exceeds SESSION_GAP_S. Yields lists of
    (minute, event_id, type)."""
    by_user = defaultdict(list)
    for eid, (uid, minute, etype) in enumerate(evs):
        by_user[uid].append((minute * 60, eid, etype))
    for uid, rows in by_user.items():
        rows.sort()
        cur = []
        prev = None
        for sec, eid, etype in rows:
            if prev is not None and sec - prev > SESSION_GAP_S:
                yield cur
                cur = []
            cur.append((sec, eid, etype))
            prev = sec
        if cur:
            yield cur


@settings(**SETTINGS)
@given(events_strategy)
def test_st07_transitions_equal_naive_recompute(spark, tmp_path_factory, evs):
    """The windowed LEAD plan must count exactly the within-session
    consecutive pairs the naive per-user walk counts, with floor
    per-mille conditionals."""
    path = tmp_path_factory.mktemp("st07")
    rows = [
        (eid, DAY + datetime.timedelta(minutes=minute), uid, etype, 0.0, "{}")
        for eid, (uid, minute, etype) in enumerate(evs)
    ]
    _write_events(spark, path, rows)
    trans = Counter()
    for sess in _sessions(evs):
        for (_, _, a), (_, _, b) in zip(sess, sess[1:]):
            trans[(a, b)] += 1
    from_tot = Counter()
    for (a, _), c in trans.items():
        from_tot[a] += c
    expected = {
        (a, b): (c, 1000 * c // from_tot[a]) for (a, b), c in trans.items()
    }
    got = {
        (r.from_type, r.to_type): (r.n_trans, r.p_milli)
        for r in QUERIES["st07_markov_transitions"](spark, str(path)).collect()
    }
    assert got == expected


@settings(**SETTINGS)
@given(events_strategy)
def test_st08_paths_equal_naive_recompute(spark, tmp_path_factory, evs):
    """Session-path mining must emit exactly the naive walk's truncated
    path multiset (ordering inside the aggregate is repartition-proof)."""
    path = tmp_path_factory.mktemp("st08")
    rows = [
        (eid, DAY + datetime.timedelta(minutes=minute), uid, etype, 0.0, "{}")
        for eid, (uid, minute, etype) in enumerate(evs)
    ]
    _write_events(spark, path, rows)
    paths = Counter(
        ">".join(etype for _, _, etype in sess[:5]) for sess in _sessions(evs)
    )
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = {
        r.path: r.n_sessions
        for r in QUERIES["st08_session_paths"](spark, str(path)).collect()
    }
    assert got == dict(top)


@settings(**SETTINGS)
@given(events_strategy)
def test_inc05_incremental_equals_full_rebuild(spark, tmp_path_factory, evs):
    """The state+delta merge must reproduce the full-history top-k for
    ANY arrival split (event_id % 5 assigns the delta) — including
    splits where a delta-heavy user enters from outside the base top-k."""
    path = tmp_path_factory.mktemp("inc05")
    rows = [
        (eid, DAY + datetime.timedelta(minutes=minute), uid, etype, 0.0, "{}")
        for eid, (uid, minute, etype) in enumerate(evs)
    ]
    _write_events(spark, path, rows)
    full = Counter(uid for uid, _, _ in evs)
    expected = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.user_id, r.n_events)
        for r in QUERIES["inc05_incremental_topk"](spark, str(path)).collect()
    ]
    assert got == expected


# baskets: up to 8 baskets over a 6-item universe
baskets_strategy = st.lists(
    st.sets(st.integers(min_value=1, max_value=6), min_size=1, max_size=5),
    min_size=1,
    max_size=8,
)


@settings(**SETTINGS)
@given(baskets_strategy)
def test_mb02_apriori_pruning_is_lossless(spark, tmp_path_factory, baskets):
    """On corpora under 2,000 baskets the 0.1% item floor admits every
    item with ≥1 occurrence and the pair floor admits every sub-pair of
    a support-≥2 triple, so A-Priori pruning must be LOSSLESS: engine
    triples == brute-force triples with support ≥ 2, with exact
    pair→third confidences."""
    path = tmp_path_factory.mktemp("mb02")
    rows = []
    for b, items in enumerate(baskets):
        for i, p in enumerate(sorted(items)):
            rows.append((b + 1, p, i + 1))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    ).write.mode("overwrite").parquet(str(path / "lineitem.parquet"))

    tri = Counter()
    pair = Counter()
    for items in baskets:
        for t in itertools.combinations(sorted(items), 3):
            tri[t] += 1
        for p in itertools.combinations(sorted(items), 2):
            pair[p] += 1
    expected = {}
    for (a, b, c), n in tri.items():
        if n >= 2:
            expected[(a, b, c)] = (
                n,
                1000 * n // pair[(a, b)],
                1000 * n // pair[(a, c)],
                1000 * n // pair[(b, c)],
            )
    got = {
        (r.part_a, r.part_b, r.part_c): (
            r.triple_cnt,
            r.conf_ab_c_milli,
            r.conf_ac_b_milli,
            r.conf_bc_a_milli,
        )
        for r in QUERIES["mb02_frequent_triples"](spark, str(path)).collect()
    }
    assert got == expected


docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=4),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(docs_strategy)
def test_tx20_heaps_curve_equals_naive_recompute(spark, tmp_path_factory, docs):
    """Bucketed first-seen attribution and the cumulative TTR must match
    a naive corpus walk for any token layout."""
    path = tmp_path_factory.mktemp("tx20")
    rows = [
        (i, " ".join(words), "en", "web", len(" ".join(words)))
        for i, words in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))

    mdoc = len(docs) - 1
    bucket = lambda d: d * 10 // (mdoc + 1)
    toks = Counter()
    first_seen = {}
    for d, words in enumerate(docs):
        toks[bucket(d)] += len(words)
        for wrd in words:
            first_seen.setdefault(wrd, d)
    new_types = Counter(bucket(d) for d in first_seen.values())
    expected = {}
    cum_t, cum_ty = 0, 0
    for b in sorted(toks):
        cum_t += toks[b]
        cum_ty += new_types.get(b, 0)
        expected[b] = (new_types.get(b, 0), cum_t, cum_ty, 1000 * cum_ty // cum_t)
    got = {
        r.bucket: (r.new_types, r.cum_tokens, r.cum_types, r.ttr_milli)
        for r in QUERIES["tx20_heaps_curve"](spark, str(path)).collect()
    }
    assert got == expected
