"""Connected components in O(log n) rounds: large-star / small-star.

``dedup.components_from_pairs`` is min-label propagation — one shuffle
per round, rounds = graph DIAMETER. Near-dup clusters are shallow (3-4
rounds), but entity graphs, citation graphs, and link graphs carry long
chains: a diameter-D path costs D full-relation shuffles, and D can be
thousands. The alternating algorithm (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC 2014) converges in O(log n) rounds REGARDLESS of
diameter, by rewiring the graph toward each component's minimum node
every round:

- **large-star(u)**: connect every neighbor LARGER than ``u`` to the
  minimum of ``Γ(u) ∪ {u}``;
- **small-star(u)**: connect every smaller-or-equal neighbor (and
  ``u`` itself) to that minimum.

Both steps preserve connectivity exactly (each replaced edge is
spanned by two new ones through the minimum) and monotonically shrink
the potential Σ edge-heights, so the fixpoint — every component a star
rooted at its minimum node id — is reached without ever materializing
neighborhoods as in-memory lists. Each half-step is one groupBy + one
join keyed on node id: ~4 bounded shuffles per round, O(log n) rounds,
which is the web-scale trade against propagation's diameter-bound
round count.

Reference seed: same near-dup component semantics as dd06
(cbddl/src/etl/pipeline.py:296,329-344 motivates the dedup decision);
the algorithm choice is the beyond-reference scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

# The shared component oracle lives in the registry-free shared_oracles
# module precisely so it can be imported here at decoration time; a
# peer import from dedup would re-enter dedup half-initialized when
# graph is imported first (the registry imports all operator modules).
from .shared_oracles import DD06_COMPONENT_CTE as _DD06_COMPONENT_CTE


def _canonical(pairs: DataFrame) -> DataFrame:
    """Undirected pair relation → distinct (big, small) canonical edges."""
    a, b = F.col("doc_a"), F.col("doc_b")
    return (
        pairs.select(
            F.greatest(a, b).alias("big"), F.least(a, b).alias("small")
        )
        .filter(F.col("big") != F.col("small"))
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """One large-star step over canonical (big, small) edges.

    Works on the bidirectional view: for each node ``src`` the group
    minimum is ``m = min(Γ(src) ∪ {src})``; every LARGER neighbor
    ``dst > src`` is re-attached to ``m``. Emitted edges are already
    canonical — ``m ≤ src < dst`` — so no re-canonicalization shuffle
    is needed. One partial-agg groupBy + one join, both keyed on the
    node id.
    """
    edges = canon.select(
        F.col("big").alias("src"), F.col("small").alias("dst")
    ).unionByName(canon.select(F.col("small").alias("src"), F.col("big").alias("dst")))
    mins = edges.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", "src").alias("m"))
    return (
        edges.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("big"), F.col("m").alias("small"))
        .filter(F.col("big") != F.col("small"))
        .distinct()
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """One small-star step: each node links its ≤-neighbors to the min.

    Canonical edges already point big → small, so grouping by ``big``
    sees exactly the smaller neighborhood; ``m = min(smalls)`` and both
    ``big`` and every other small neighbor re-attach to ``m``. Output
    stays canonical (every emitted edge has left endpoint > m).
    """
    mins = canon.groupBy("big").agg(F.min("small").alias("m"))
    relinked = (
        canon.join(mins, "big")
        .select(F.col("small").alias("big"), F.col("m").alias("small"))
        .unionByName(mins.select(F.col("big"), F.col("m").alias("small")))
        .filter(F.col("big") != F.col("small"))
        .distinct()
    )
    return relinked


def components_large_small_star(
    pairs: DataFrame, stats: dict | None = None, max_rounds: int = 64
) -> DataFrame:
    """(doc_id, component) via the alternating algorithm.

    Same contract as ``dedup.components_from_pairs`` — component = min
    doc_id reachable, only nodes with ≥1 edge appear — but O(log n)
    rounds instead of O(diameter). Convergence is an exact set-equality
    fixpoint: the canonical edge relation is distinct on both sides, so
    equal counts plus an empty one-sided ``exceptAll`` certify
    equality. ``localCheckpoint`` truncates lineage each round, the
    same driver-coordination pattern as the propagation variant.

    ``stats['rounds']`` (when a dict is passed) records the number of
    full large+small rounds — the pytest asserts the logarithmic bound
    on a long chain where propagation would need diameter rounds.
    """
    canon = _canonical(pairs).localCheckpoint(eager=True)
    n_edges = canon.count()
    rounds = 0
    while rounds < max_rounds:
        nxt = _small_star(_large_star(canon)).localCheckpoint(eager=True)
        rounds += 1
        n_next = nxt.count()
        if n_next == n_edges and nxt.exceptAll(canon).isEmpty():
            canon = nxt
            break
        canon, n_edges = nxt, n_next
    else:
        raise RuntimeError(f"no fixpoint after {max_rounds} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    # Star fixpoint: every edge is (member, root); roots label themselves.
    return (
        canon.select(F.col("big").alias("doc_id"), F.col("small").alias("component"))
        .unionByName(
            canon.select(
                F.col("small").alias("doc_id"), F.col("small").alias("component")
            )
        )
        .distinct()
    )


@query(
    "dd08_components_largestar",
    oracle=_DD06_COMPONENT_CTE
    + """
    , sizes AS (
        SELECT component, COUNT(*) AS csize FROM comp GROUP BY component
    )
    SELECT c.doc_id, c.component, s.csize
    FROM comp c JOIN sizes s ON c.component = s.component
    ORDER BY c.doc_id
    """,
)
def dd08_components_largestar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd06's near-dup components recomputed by large-star/small-star.

    Deliberately the SAME answer as dd06 over the same MinHash-LSH edge
    relation (and the same brute-force recursive-CTE oracle): what
    changes is the round complexity of the component step — O(log n)
    alternating rounds instead of diameter-many propagation rounds.
    On the shallow near-dup graph both finish in a handful of rounds;
    the pytest demonstrates the separation on a 64-node chain (6 rounds
    vs 63) where this algorithm is the only viable one at scale.
    """
    from .dedup import _shingle_set, neardup_edges
    from ..catalog import load_table, spread_scan

    documents = spread_scan(load_table(spark, sf_dir, "documents"))
    docs = documents.select("doc_id", _shingle_set(F.col("text")).alias("ws"))
    pairs = neardup_edges(docs, "ws", threshold=0.5, use_lsh=True)
    comp = components_large_small_star(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("csize"))
    return (
        comp.join(sizes, "component")
        .select("doc_id", "component", "csize")
        .orderBy("doc_id")
    )
