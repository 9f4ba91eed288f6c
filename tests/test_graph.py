"""Large-star/small-star connected components (operators/graph.py).

The differential harness already certifies dd08 against the recursive
DuckDB oracle on the real corpus; these tests pin the ALGORITHMIC
claims on adversarial graph shapes the corpus doesn't contain:
equivalence with min-label propagation, and the logarithmic round
bound on a long chain (where propagation needs diameter rounds).
"""

from __future__ import annotations

import random

from chicago_business_owners_data_engineering_spark.operators.dedup import (
    components_from_pairs,
)
from chicago_business_owners_data_engineering_spark.operators.graph import (
    components_large_small_star,
)


def _components(df):
    return {(r.doc_id, r.component) for r in df.collect()}


def test_matches_propagation_on_random_graph(spark):
    rng = random.Random(11)
    # Three regimes in one graph: a dense blob, sparse random edges,
    # and singleton pairs — exercises dedup/ER-like cluster shapes.
    pairs = [(rng.randint(0, 29), rng.randint(0, 29)) for _ in range(60)]
    pairs += [(100 + rng.randint(0, 199), 100 + rng.randint(0, 199)) for _ in range(80)]
    pairs += [(1000, 1001), (2000, 2001)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    assert _components(components_large_small_star(df)) == _components(
        components_from_pairs(df)
    )


def test_chain_converges_in_log_rounds(spark):
    # A 96-node path has diameter 95: min-label propagation needs ~95
    # rounds; the alternating algorithm must finish in O(log n).
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(95)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    comp = _components(components_large_small_star(df, stats))
    assert comp == {(i, 0) for i in range(96)}
    assert stats["rounds"] <= 10, stats


def test_edge_input_order_and_duplicates_are_irrelevant(spark):
    base = [(5, 3), (3, 5), (3, 1), (9, 7)]
    df = spark.createDataFrame(base * 3, "doc_a long, doc_b long")
    assert _components(components_large_small_star(df)) == {
        (1, 1),
        (3, 1),
        (5, 1),
        (7, 7),
        (9, 7),
    }
