"""Association mining over order baskets (A-Priori / frequent pairs).

The market-basket member of the analytics surface: which parts co-occur
in the same order more often than independence predicts. The reference's
analytics layer answers per-dimension frequency questions
(cbddl/src/analytics/demographics_analyzer.py's top-N tabulations);
co-occurrence is the natural next question, and at 100 TB it is also
the canonical "candidate explosion" problem — the implementation must
prune BEFORE pair generation, never enumerate all pairs.

Plan discipline (Agrawal & Srikant, VLDB'94, the A-Priori property):
an item pair can only reach support s if BOTH items individually reach
s, so the frequent-item filter runs first and the pair self-join is
restricted to frequent items inside each basket. Pair volume is then
Σ_basket C(frequent_items_in_basket, 2) — bounded by basket size (≤7
lines in this schema), never |items|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

ITEM_SUPPORT_PERMILLE = 1  # item frequent when in ≥ 0.1% of baskets
PAIR_MIN_COUNT = 2  # absolute noise floor; ranking is top-N by count
TOP_PAIRS = 50


@query(
    "mb01_market_basket",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ), nb AS (
        SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM items
    ), item_cnt AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY item
    ), freq AS (
        SELECT i.item, i.c FROM item_cnt i, nb
        WHERE i.c * 1000 >= {ITEM_SUPPORT_PERMILLE} * nb.n_baskets
    ), pairs AS (
        SELECT a.item AS part_a, b.item AS part_b,
               CAST(COUNT(*) AS BIGINT) AS pair_cnt
        FROM items a
        JOIN items b ON a.basket = b.basket AND a.item < b.item
        JOIN freq fa ON fa.item = a.item
        JOIN freq fb ON fb.item = b.item
        GROUP BY a.item, b.item
    )
    SELECT p.part_a, p.part_b, p.pair_cnt,
           CAST((1000 * p.pair_cnt) // nb.n_baskets AS BIGINT) AS support_milli,
           CAST((1000 * p.pair_cnt) // fa.c AS BIGINT) AS conf_a_to_b_milli,
           CAST((1000 * p.pair_cnt) // fb.c AS BIGINT) AS conf_b_to_a_milli,
           CAST((1000 * p.pair_cnt * nb.n_baskets) // (fa.c * fb.c) AS BIGINT)
               AS lift_milli
    FROM pairs p
    JOIN freq fa ON fa.item = p.part_a
    JOIN freq fb ON fb.item = p.part_b
    CROSS JOIN nb
    WHERE p.pair_cnt >= {PAIR_MIN_COUNT}
    ORDER BY p.pair_cnt DESC, p.part_a ASC, p.part_b ASC
    LIMIT {TOP_PAIRS}
    """,
)
def mb01_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs with support / confidence / lift — A-Priori
    pruned market-basket analysis over order baskets.

    All metrics are integer floor-divisions of exact BIGINT counts
    (support and confidence in per-mille, lift in per-mille of the
    independence expectation) — no float crosses the engine boundary.
    1000·pair_cnt·n_baskets stays far inside int64 at any realistic
    scale because pair_cnt ≤ n_baskets.

    The pair floor is a small ABSOLUTE count (2), not a corpus
    fraction, with ranking done by top-N: on a corpus with no true
    associations the best pair's count grows sub-linearly in baskets
    (binomial max, ~log n), so any corpus-relative support threshold
    silently starves as data grows — the 10× probe caught exactly
    that (0 rows at sf1). Real signal (a pair whose count DOES track
    corpus size) dominates the top-N ranking either way.

    Scale shape: the basket relation shuffles ONCE on basket key; the
    pair self-join reuses that partitioning (co-located), candidates
    are bounded per basket by the A-Priori filter (broadcast frequent
    set), and the output aggregate is pair-keyed. The brute-force
    alternative (items × items with no support pruning) is the
    documented anti-pattern this operator exists to avoid.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    items = lineitem.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    nb = items.agg(F.countDistinct("basket").alias("n_baskets"))
    item_cnt = items.groupBy("item").agg(F.count("*").alias("c"))
    freq = (
        item_cnt.crossJoin(F.broadcast(nb))
        .filter(F.col("c") * 1000 >= ITEM_SUPPORT_PERMILLE * F.col("n_baskets"))
        .select("item", "c")
    )
    fa = F.broadcast(freq).alias("fa")
    fb = F.broadcast(freq).alias("fb")
    a = items.alias("a").join(fa, F.col("a.item") == F.col("fa.item")).select(
        F.col("a.basket").alias("basket"), F.col("a.item").alias("item")
    )
    b = items.alias("b").join(fb, F.col("b.item") == F.col("fb.item")).select(
        F.col("b.basket").alias("basket"), F.col("b.item").alias("item")
    )
    pairs = (
        a.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.basket") == F.col("y.basket"))
            & (F.col("x.item") < F.col("y.item")),
        )
        .groupBy(
            F.col("x.item").alias("part_a"), F.col("y.item").alias("part_b")
        )
        .agg(F.count("*").alias("pair_cnt"))
    )
    ca = freq.select(F.col("item").alias("part_a"), F.col("c").alias("c_a"))
    cb = freq.select(F.col("item").alias("part_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(nb))
        .filter(F.col("pair_cnt") >= PAIR_MIN_COUNT)
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.expr("(1000 * pair_cnt) div n_baskets").alias("support_milli"),
            F.expr("(1000 * pair_cnt) div c_a").alias("conf_a_to_b_milli"),
            F.expr("(1000 * pair_cnt) div c_b").alias("conf_b_to_a_milli"),
            F.expr("(1000 * pair_cnt * n_baskets) div (c_a * c_b)").alias(
                "lift_milli"
            ),
        )
        .orderBy(F.desc("pair_cnt"), F.asc("part_a"), F.asc("part_b"))
        .limit(TOP_PAIRS)
    )


# --- mb02: frequent triples (A-Priori level 3) ---------------------------------------

TRIPLE_MIN_COUNT = 2
TOP_TRIPLES = 100


@query(
    "mb02_frequent_triples",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ), nb AS (
        SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM items
    ), item_cnt AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY item
    ), freq AS (
        SELECT i.item FROM item_cnt i, nb
        WHERE i.c * 1000 >= {ITEM_SUPPORT_PERMILLE} * nb.n_baskets
    ), fi AS MATERIALIZED (
        SELECT basket, item FROM items WHERE item IN (SELECT item FROM freq)
    ), pairs AS MATERIALIZED (
        SELECT a.item AS i1, b.item AS i2, CAST(COUNT(*) AS BIGINT) AS c
        FROM fi a JOIN fi b ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2 HAVING COUNT(*) >= {PAIR_MIN_COUNT}
    ), tri AS (
        SELECT a.item AS part_a, b.item AS part_b, c.item AS part_c,
               CAST(COUNT(*) AS BIGINT) AS triple_cnt
        FROM fi a
        JOIN fi b ON a.basket = b.basket AND a.item < b.item
        JOIN fi c ON a.basket = c.basket AND b.item < c.item
        WHERE (a.item, b.item) IN (SELECT (i1, i2) FROM pairs)
          AND (a.item, c.item) IN (SELECT (i1, i2) FROM pairs)
          AND (b.item, c.item) IN (SELECT (i1, i2) FROM pairs)
        GROUP BY 1, 2, 3
    )
    SELECT t.part_a, t.part_b, t.part_c, t.triple_cnt,
           CAST((1000 * t.triple_cnt) // pab.c AS BIGINT) AS conf_ab_c_milli,
           CAST((1000 * t.triple_cnt) // pac.c AS BIGINT) AS conf_ac_b_milli,
           CAST((1000 * t.triple_cnt) // pbc.c AS BIGINT) AS conf_bc_a_milli
    FROM tri t
    JOIN pairs pab ON pab.i1 = t.part_a AND pab.i2 = t.part_b
    JOIN pairs pac ON pac.i1 = t.part_a AND pac.i2 = t.part_c
    JOIN pairs pbc ON pbc.i1 = t.part_b AND pbc.i2 = t.part_c
    WHERE t.triple_cnt >= {TRIPLE_MIN_COUNT}
    ORDER BY t.triple_cnt DESC, t.part_a, t.part_b, t.part_c
    LIMIT {TOP_TRIPLES}
    """,
)
def mb02_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Priori level 3: frequent item TRIPLES with the confidence of
    each pair→third rule — the level-wise continuation of mb01 and the
    operator that proves the pruning ladder actually closes (level k
    candidates come only from level k−1 survivors, Agrawal & Srikant
    VLDB'94 §2.1).

    Candidate volume control is the whole design: the three-way
    self-join runs only over FREQUENT items (broadcast semi-filter)
    and only for triples whose THREE sub-pairs each cleared mb01's
    pair floor (broadcast joins against the pair relation — at any
    scale the frequent-pair set is support-bounded, orders of
    magnitude smaller than the basket relation). Within a basket the
    join is co-located on the basket key, so the candidate pass
    reuses one exchange; per-basket volume is C(freq_items, 3),
    bounded by basket size. Confidences are integer per-mille floor
    divisions of exact counts (the mb01 contract).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    items = lineitem.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    nb = items.agg(F.countDistinct("basket").alias("n_baskets"))
    item_cnt = items.groupBy("item").agg(F.count("*").alias("c"))
    freq = (
        item_cnt.crossJoin(F.broadcast(nb))
        .filter(F.col("c") * 1000 >= ITEM_SUPPORT_PERMILLE * F.col("n_baskets"))
        .select("item")
    )
    fi = items.join(F.broadcast(freq), "item").select("basket", "item")
    pairs = (
        fi.alias("a")
        .join(
            fi.alias("b"),
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("i1"), F.col("b.item").alias("i2"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= PAIR_MIN_COUNT)
    )
    tri = (
        fi.alias("x")
        .join(
            fi.alias("y"),
            (F.col("x.basket") == F.col("y.basket"))
            & (F.col("x.item") < F.col("y.item")),
        )
        .join(
            fi.alias("z"),
            (F.col("x.basket") == F.col("z.basket"))
            & (F.col("y.item") < F.col("z.item")),
        )
        .select(
            F.col("x.item").alias("part_a"),
            F.col("y.item").alias("part_b"),
            F.col("z.item").alias("part_c"),
        )
        .join(
            F.broadcast(pairs.select(F.col("i1").alias("part_a"), F.col("i2").alias("part_b"))),
            ["part_a", "part_b"],
        )
        .join(
            F.broadcast(pairs.select(F.col("i1").alias("part_a"), F.col("i2").alias("part_c"))),
            ["part_a", "part_c"],
        )
        .join(
            F.broadcast(pairs.select(F.col("i1").alias("part_b"), F.col("i2").alias("part_c"))),
            ["part_b", "part_c"],
        )
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count("*").alias("triple_cnt"))
        .filter(F.col("triple_cnt") >= TRIPLE_MIN_COUNT)
    )
    pab = pairs.select(F.col("i1").alias("part_a"), F.col("i2").alias("part_b"), F.col("c").alias("c_ab"))
    pac = pairs.select(F.col("i1").alias("part_a"), F.col("i2").alias("part_c"), F.col("c").alias("c_ac"))
    pbc = pairs.select(F.col("i1").alias("part_b"), F.col("i2").alias("part_c"), F.col("c").alias("c_bc"))
    return (
        tri.join(F.broadcast(pab), ["part_a", "part_b"])
        .join(F.broadcast(pac), ["part_a", "part_c"])
        .join(F.broadcast(pbc), ["part_b", "part_c"])
        .select(
            "part_a",
            "part_b",
            "part_c",
            "triple_cnt",
            F.expr("(1000 * triple_cnt) div c_ab").alias("conf_ab_c_milli"),
            F.expr("(1000 * triple_cnt) div c_ac").alias("conf_ac_b_milli"),
            F.expr("(1000 * triple_cnt) div c_bc").alias("conf_bc_a_milli"),
        )
        .orderBy(F.desc("triple_cnt"), "part_a", "part_b", "part_c")
        .limit(TOP_TRIPLES)
    )
