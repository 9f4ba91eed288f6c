"""Engine rewrite rules — the PySpark-native analog of
``spark.experimental.extraOptimizations`` (SURVEY §4's two optional
"engine-ness" demonstrations, VERDICT r5 #5).

A JVM Catalyst rule must be a compiled Scala ``Rule[LogicalPlan]``;
py4j cannot subclass Scala abstract classes from Python, so a pure
PySpark engine registers its rules one level up, at DataFrame
construction time — but matching on the SAME Catalyst structures a JVM
rule would see:

- rule 1 pattern-matches the **Catalyst expression tree** of a join
  condition (``Column`` → ColumnNode tree: ``UnresolvedFunction("or")``
  over ``UnresolvedFunction("=")`` over resolved
  ``AttributeReference`` leaves, side-resolved against each input's
  analyzed ``outputSet``), and
- rule 2 pattern-matches the **analyzed logical plan** of a built
  DataFrame (``Union`` → ``Project*`` → ``Aggregate(count)`` →
  ``Filter`` → common leaf relation, leaf equality by Catalyst
  ``sameResult``), rebuilding the source DataFrame from the matched
  leaf via ``Dataset.ofRows``.

Both are genuine pattern → rewrite → fall-through transformations: an
input that doesn't match executes unchanged (``fired=False``), exactly
like an optimizer rule that doesn't apply. Reference seeds: the OR-join
in cbddl/src/etl/pipeline.py:393-396 (J2) and the per-keyword scan loop
in cbddl/src/analytics/demographics_analyzer.py:103-123 (A20).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.column import Column

from ..registry import query


@dataclass
class Rewrite:
    """Result of applying a rule: the (possibly) rewritten DataFrame,
    whether the pattern matched, and a human-readable trace."""

    df: DataFrame
    fired: bool
    reason: str


# --------------------------------------------------------------------
# rule 1: OR-of-equi join  →  disjoint union of equi-joins
# --------------------------------------------------------------------

def _node(col: Column):
    return col._jc.node()


def _flatten_or(node) -> list:
    """Flatten a left/right-nested ``or`` ColumnNode tree into its
    disjunct list; a non-``or`` node is its own single disjunct."""
    cls = node.getClass().getSimpleName()
    if cls == "UnresolvedFunction" and node.functionName() == "or":
        args = node.arguments()
        out: list = []
        for i in range(args.size()):
            out.extend(_flatten_or(args.apply(i)))
        return out
    return [node]


def _attr_of(node):
    """AttributeReference wrapped by an ExpressionColumnNode leaf, or
    None when the leaf is anything else (literal, computed expr, ...)."""
    if node.getClass().getSimpleName() != "ExpressionColumnNode":
        return None
    expr = node.expression()
    if expr.getClass().getSimpleName() != "AttributeReference":
        return None
    return expr


def rewrite_or_join(
    left: DataFrame, right: DataFrame, cond: Column, how: str = "inner"
) -> Rewrite:
    """If ``cond`` is an OR of plain equi-predicates between ``left``
    and ``right`` attributes, rewrite ``left.join(right, cond)`` into a
    DISJOINT union of equi-joins; otherwise fall through to the plain
    join.

    Why: Catalyst compiles a disjunctive join condition to
    BroadcastNestedLoopJoin/CartesianProduct — O(n·m) row comparisons at
    scale. Each OR arm is individually hash-joinable; arm k additionally
    filters out rows where any EARLIER disjunct already matched (a cheap
    residual on columns in hand, NULL-safe via coalesce), so the arms
    are disjoint by construction and the union needs no dedup shuffle.
    Same decomposition as the hand-built j02 — this rule derives it
    automatically from the condition's Catalyst expression tree.
    """
    spark = left.sparkSession
    fallthrough = left.join(right, cond, how)
    if how != "inner":
        return Rewrite(fallthrough, False, f"how={how!r} not supported")

    l_out = left._jdf.queryExecution().analyzed().outputSet()
    r_out = right._jdf.queryExecution().analyzed().outputSet()

    disjuncts = _flatten_or(_node(cond))
    if len(disjuncts) < 2:
        return Rewrite(fallthrough, False, "condition is not a disjunction")

    arms: list[tuple[Column, Column, Column]] = []  # (eq, l_col, r_col)
    jcol = spark._jvm.org.apache.spark.sql.Column
    for d in disjuncts:
        if not (
            d.getClass().getSimpleName() == "UnresolvedFunction"
            and d.functionName() == "="
            and d.arguments().size() == 2
        ):
            return Rewrite(fallthrough, False, "disjunct is not an equality")
        a, b = d.arguments().apply(0), d.arguments().apply(1)
        ea, eb = _attr_of(a), _attr_of(b)
        if ea is None or eb is None:
            return Rewrite(fallthrough, False, "equality leaf is not an attribute")
        if l_out.contains(ea) and r_out.contains(eb):
            l_node, r_node = a, b
        elif l_out.contains(eb) and r_out.contains(ea):
            l_node, r_node = b, a
        else:
            return Rewrite(
                fallthrough, False, "equality does not span left×right"
            )
        arms.append(
            (Column(jcol(d)), Column(jcol(l_node)), Column(jcol(r_node)))
        )

    parts: list[DataFrame] = []
    for k, (eq, _, _) in enumerate(arms):
        arm = left.join(right, eq, "inner")
        # residual: drop pairs an EARLIER disjunct already produced —
        # i.e. where that predicate evaluated TRUE. NULL keys never
        # matched the earlier arm, so coalesce keeps them (a plain !=
        # would wrongly drop them).
        for lcol, rcol in ((l, r) for _, l, r in arms[:k]):
            arm = arm.filter(F.coalesce(lcol != rcol, F.lit(True)))
        parts.append(arm)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)  # positional: identical schemas by construction
    return Rewrite(out, True, f"rewrote {len(arms)}-way OR join to disjoint union")


# --------------------------------------------------------------------
# rule 2: union of per-predicate count scans  →  one conditional-count
#         aggregate over a single scan
# --------------------------------------------------------------------

def _descend_projects(plan) -> tuple[list, object]:
    """Skip Project wrappers, collecting their projectLists; return
    (project_lists, first non-Project node)."""
    plists = []
    node = plan
    while node.getClass().getSimpleName() == "Project":
        plists.append(node.projectList())
        node = node.children().apply(0)
    return plists, node


def _branch_pattern(branch):
    """Match one Union branch against
    Project* → Aggregate(single count, no keys) → Filter → leaf.
    Returns (label, filter_condition, leaf) or None."""
    plists, agg = _descend_projects(branch)
    if agg.getClass().getSimpleName() != "Aggregate":
        return None
    if agg.groupingExpressions().size() != 0:
        return None
    aggs = agg.aggregateExpressions()
    if aggs.size() != 1 or "count(" not in aggs.apply(0).sql().lower():
        return None
    filt = agg.children().apply(0)
    # the aggregate's own child may also be wrapped in Projects
    f_plists, filt = _descend_projects(filt)
    if filt.getClass().getSimpleName() != "Filter":
        return None
    leaf = filt.children().apply(0)
    if leaf.children().size() != 0:
        return None
    # the branch label: the single string-literal alias in the Project
    # wrappers (the `lit(name).alias(...)` the naive form attaches)
    label = None
    for pl in plists:
        for i in range(pl.size()):
            e = pl.apply(i)
            if (
                e.getClass().getSimpleName() == "Alias"
                and e.child().getClass().getSimpleName() == "Literal"
            ):
                if label is not None:
                    return None  # ambiguous: two literal labels
                label = (e.name(), str(e.child().value()))
    if label is None:
        return None
    return label, filt.condition(), leaf


def fuse_filter_counts(naive: DataFrame) -> Rewrite:
    """If ``naive``'s analyzed plan is a Union of K branches, each a
    labelled scalar COUNT over a Filter of the SAME leaf relation,
    rewrite it into ONE conditional-count aggregate over a single scan
    of that relation (K scans + K aggregates → 1 scan + 1 aggregate).

    The reference's per-keyword loop (demographics_analyzer.py:103-123)
    builds exactly this naive shape; at 100 TB the difference between K
    passes and 1 pass over the corpus is the whole game. Leaf identity
    is Catalyst ``sameResult`` (canonicalized-plan equality, the same
    test a JVM rule would use); filter conditions are re-bound against
    the leaf via their Catalyst SQL form; the matched leaf becomes a
    DataFrame again through ``Dataset.ofRows``. Output keeps the naive
    long format (label, count) so the rewrite is a drop-in replacement.
    """
    spark = naive.sparkSession
    plan = naive._jdf.queryExecution().analyzed()
    # unionByName chains nest: Union(Union(a, b), c) — flatten like _flatten_or
    def flatten_union(node) -> list | None:
        if node.getClass().getSimpleName() != "Union":
            return [node]
        out = []
        ch = node.children()
        for i in range(ch.size()):
            sub = flatten_union(ch.apply(i))
            if sub is None:
                return None
            out.extend(sub)
        return out

    if plan.getClass().getSimpleName() != "Union":
        return Rewrite(naive, False, "plan is not a Union")
    branches = flatten_union(plan)
    matches = [_branch_pattern(b) for b in branches]
    if any(m is None for m in matches):
        return Rewrite(naive, False, "a branch does not match Project*>Aggregate(count)>Filter>leaf")
    leaf0 = matches[0][2]
    if not all(m[2].sameResult(leaf0) for m in matches[1:]):
        return Rewrite(naive, False, "branches scan different relations")
    label_col = matches[0][0][0]
    if not all(m[0][0] == label_col for m in matches[1:]):
        return Rewrite(naive, False, "branches disagree on the label column")
    labels = [m[0][1] for m in matches]
    if len(set(labels)) != len(labels):
        return Rewrite(naive, False, "duplicate branch labels")

    src = DataFrame(
        spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, leaf0
        ),
        spark,
    )
    conds = [F.expr(m[1].sql()) for m in matches]
    cnt_col = [c for c in naive.columns if c != label_col][0]
    fused = src.agg(
        *[F.count(F.when(c, 1)).alias(f"__c{i}") for i, c in enumerate(conds)]
    )
    long = fused.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lab).alias(label_col),
                        F.col(f"__c{i}").alias(cnt_col),
                    )
                    for i, lab in enumerate(labels)
                ]
            )
        ).alias("__kv")
    ).select(f"__kv.{label_col}", f"__kv.{cnt_col}")
    return Rewrite(long, True, f"fused {len(labels)} count scans into one pass")


# --------------------------------------------------------------------
# registry queries: the rules driving real plans (PLANS.md shows the
# rewritten shapes; the driver's differential gate checks semantics)
# --------------------------------------------------------------------

def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..catalog import load_table  # lazy: registry-module import rule

    return load_table(spark, sf_dir, name)


@query(
    "opt01_or_join_rule",
    oracle="""
    SELECT DISTINCT c.c_custkey AS custkey, s.s_suppkey AS suppkey
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey OR c.c_custkey = s.s_suppkey
    """,
)
def opt01_or_join_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j02's disjunctive join built NAIVELY and rewritten by the engine
    rule (rewrite_or_join) instead of by hand — the rule must fire, or
    this query raises (a silent fall-through would execute the
    nested-loop plan this rule exists to kill)."""
    customer = _load(spark, sf_dir, "customer")
    supplier = _load(spark, sf_dir, "supplier")
    cond = (customer.c_nationkey == supplier.s_nationkey) | (
        customer.c_custkey == supplier.s_suppkey
    )
    rw = rewrite_or_join(customer, F.broadcast(supplier), cond)
    assert rw.fired, rw.reason
    return rw.df.select(
        F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("suppkey")
    )


@query(
    "opt02_fused_counts_rule",
    oracle="""
    SELECT 'widget' AS kw, COUNT(CASE WHEN UPPER(p_name) LIKE '%WIDGET%' THEN 1 END) AS cnt FROM part
    UNION ALL
    SELECT 'bolt' AS kw, COUNT(CASE WHEN UPPER(p_name) LIKE '%BOLT%' THEN 1 END) AS cnt FROM part
    UNION ALL
    SELECT 'rod' AS kw, COUNT(CASE WHEN UPPER(p_name) LIKE '%ROD%' THEN 1 END) AS cnt FROM part
    UNION ALL
    SELECT 'small' AS kw, COUNT(CASE WHEN UPPER(p_name) LIKE '%SMALL%' THEN 1 END) AS cnt FROM part
    UNION ALL
    SELECT 'large' AS kw, COUNT(CASE WHEN UPPER(p_name) LIKE '%LARGE%' THEN 1 END) AS cnt FROM part
    """,
)
def opt02_fused_counts_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a20's keyword buckets built NAIVELY (one filtered count per
    keyword, unioned — the reference's actual loop shape) and fused by
    the engine rule (fuse_filter_counts) into a single-scan conditional
    aggregate. The rule must fire, or this query raises."""
    part = _load(spark, sf_dir, "part")
    kws = ["widget", "bolt", "rod", "small", "large"]
    naive = None
    for k in kws:
        branch = (
            part.filter(F.upper(F.col("p_name")).contains(k.upper()))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(k).alias("kw"), "cnt")
        )
        naive = branch if naive is None else naive.unionByName(branch)
    rw = fuse_filter_counts(naive)
    assert rw.fired, rw.reason
    return rw.df
