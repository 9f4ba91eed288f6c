"""Registry-wide oracle lints.

The r08 sf0.1 sweep proved ``ROUND(SUM(<double>))`` oracles are
fold-order fragile: skew01's salted two-stage sum landed on the other
side of a rounding boundary from DuckDB's single fold, and the same
class re-breaks at any scale or partitioning change. Round 9 migrated
every money/metric sum to per-row integer quantization (FLOOR(x·100) →
BIGINT sums, skew01's rule); this lint keeps the class retired: any
oracle that hashes a ROUND over a SUM must either sum an
integer-quantized column or carry an explicit waiver here with the
reason the fold is exact or bounded.
"""

from __future__ import annotations

import re

from chicago_business_owners_data_engineering_spark import registry

# Queries allowed to keep ROUND over a SUM, with the reason the fold
# cannot diverge. Every entry must name WHY the inner SUM is exact
# (integer summand) or scale-bounded. Adding a new ROUND(SUM oracle
# without a waiver fails this test.
ROUND_SUM_WAIVERS: dict[str, str] = {
    # integer summands: the SUM is exact BIGINT arithmetic at any fold
    # order; ROUND applies to one deterministic final division
    "q08_market_share": "sums volume_cents (BIGINT); single division then ROUND",
    "q14_promo_revenue": "sums FLOOR(rev*100) BIGINT cents; single ratio division",
    "q17_small_quantity_revenue": "sums FLOOR(price*100) BIGINT; /700.0 once",
    "inc01_incremental_rollup": "avg over exact cent/count integers; one division",
    "mon01_metrics_snapshot": "sums CASE 1/0 integers; one division by COUNT(*)",
    "ts09_seasonal_naive_backtest": "sums BIGINT cent errors; one WAPE division",
    "tp09_token_budget": "window-sums BIGINT token counts; share divisions only",
    # integer summands: counts / CASE 1-0 flags — exact at any fold order
    "a24_pct_of_total": "COUNT(*) window ratio; integer sums, one division",
    "dd14_ngram_novelty": "sums CASE 1/0 integers; one ratio division",
    "ml08_reliability_bins": "sums CASE 1/0 integers; one ratio division",
    "tp06_curation_report": "sums CASE 1/0 integers; one ratio division",
    "tp07_contamination_check": "sums CASE 1/0 integers; one ratio division",
    "ts08_event_transitions": "window-sums BIGINT transition counts; one division",
    "tx07_repetition_stats": "sums BIGINT token counts; single ratio divisions",
    # scale-bounded float sums: the term domain is the CATEGORY space
    # (enum-sized, data-volume-independent) or a constant bin spine, so
    # term count and magnitude never grow with corpus size
    "a16_shannon_entropy": "entropy terms over the enum-sized category domain",
    "a16b_grouped_entropy": "entropy terms over the enum-sized category domain",
    "a17_gini_simpson": "p^2 terms over the enum-sized category domain",
    "u02_entropy_udaf": "entropy terms over the enum-sized category domain",
    "dq04_distribution_drift": "PSI = sum of 10 smoothed terms over a fixed bin spine",
}


def _round_args(sql: str) -> list[str]:
    """Every balanced-paren argument of a ROUND( call in ``sql``."""
    out = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        depth, start = 1, m.end()
        i = start
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.append(sql[start : i - 1])
    return out


def test_no_unwaivered_round_over_sum():
    offenders = {}
    for name, sql in registry.get_oracles().items():
        if any(re.search(r"\bSUM\s*\(", arg, re.I) for arg in _round_args(sql)):
            if name not in ROUND_SUM_WAIVERS:
                offenders[name] = sql
    assert not offenders, (
        "oracles hashing ROUND over a SUM without a waiver (fold-order "
        f"fragile — use integer quantization, skew01's rule): {sorted(offenders)}"
    )


def test_waivers_are_live():
    """A waiver for a query that no longer has the pattern is stale."""
    oracles = registry.get_oracles()
    stale = []
    for name in ROUND_SUM_WAIVERS:
        sql = oracles.get(name, "")
        if not any(re.search(r"\bSUM\s*\(", arg, re.I) for arg in _round_args(sql)):
            stale.append(name)
    assert not stale, f"stale ROUND(SUM waivers: {stale}"


def test_no_round_sum_raw_double_columns():
    """Belt-and-braces: no oracle ROUNDs a SUM whose immediate summand
    is a raw double table column (the exact skew01 failure shape) —
    even waivered queries must quantize before summing money/metrics."""
    raw_double_cols = (
        "l_extendedprice l_quantity l_discount l_tax o_totalprice "
        "c_acctbal s_acctbal p_retailprice value"
    ).split()
    bad = []
    for name, sql in registry.get_oracles().items():
        for arg in _round_args(sql):
            for m in re.finditer(r"\bSUM\s*\(", arg, re.I):
                depth, start = 1, m.end()
                i = start
                while i < len(arg) and depth:
                    if arg[i] == "(":
                        depth += 1
                    elif arg[i] == ")":
                        depth -= 1
                    i += 1
                inner = arg[start : i - 1]
                # a quantized summand always wraps the column in FLOOR/
                # ROUND + CAST ... AS BIGINT; a bare column (behind ANY
                # table alias, not just l./o./c. — ADVICE r9) is the bug
                stripped = inner.strip().lower()
                if any(
                    re.fullmatch(rf"(?:\w+\.)?{re.escape(c)}", stripped)
                    for c in raw_double_cols
                ):
                    bad.append((name, inner.strip()))
    assert not bad, f"oracles ROUND a SUM of a raw double column: {bad}"


def test_r09_front_is_the_mechanical_staleness_pick():
    """From round 9 the rotation invariant is EVIDENCE FRESHNESS: the
    front must equal the 50 stalest queries (ascending last-driver-
    sampled round, then name) derived mechanically from the
    CORRECTNESS_r01..r08 record — no hand-curated front can drift from
    the evidence. The window is pinned at rounds <= 8 so this stays
    reproducible after later rounds add their own driver files."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from rotation import stalest_front

    expected = stalest_front(list(registry.get_queries()), limit=50, max_round=8)
    assert list(registry._R09_FRONT) == expected
