"""Data-governance operators: pseudonymization views and erasure audits.

The reference stores raw owner PII (names, legal entities) and exposes
it through its API/dashboards (cbddl/src/api/main.py's owner search);
any production deployment of that surface needs the governance layer
between the lake and the analyst: deterministic pseudonymization for
general access (joinable tokens, no raw identifiers) and a
right-to-erasure path with an auditable tombstone trail. tx05 redacts
PII PATTERNS inside free text; this module governs IDENTIFIED columns.

Both operators are plain column expressions / anti-joins — Catalyst
fuses the masking into the scan projection (no UDF, no extra pass) and
the erasure is one broadcast anti-join per table, which is exactly why
the governance layer can live IN the engine instead of a post-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

TOKEN_LEN = 16  # md5-prefix pseudonym length


@query(
    "gov01_pseudonymize",
    oracle=f"""
    SELECT c_custkey AS custkey,
           SUBSTRING(MD5(CONCAT('cust|', c_name)), 1, {TOKEN_LEN}) AS name_token,
           CONCAT('***', SUBSTRING(c_name, LENGTH(c_name) - 3, 4)) AS name_hint,
           c_mktsegment AS mktsegment,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000 * 1000
               AS acctbal_bucket
    FROM customer
    ORDER BY custkey
    """,
)
def gov01_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymized analyst view of the customer dimension: the PII
    column is replaced by a deterministic salted-hash token (equal
    names → equal tokens, so joins/groupBys still work), a
    format-preserving hint keeps the last 4 characters for support
    workflows, and the quasi-identifying balance is generalized to
    $1,000 buckets (the dq06 k-anonymity treatment applied at view
    definition time rather than audit time).

    Determinism is the point — tokenization must be stable across
    batches or every downstream join breaks — and also the caveat: a
    deterministic token is pseudonymization (GDPR art. 4(5)), NOT
    anonymization; the salt must live in a secret manager at
    deployment (a literal here so both engines replay it). All
    expressions are scan-fused projections — the masked view costs
    nothing over the raw scan.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("custkey"),
        F.substring(F.md5(F.concat(F.lit("cust|"), F.col("c_name"))), 1, TOKEN_LEN).alias(
            "name_token"
        ),
        F.concat(
            F.lit("***"),
            F.substring(F.col("c_name"), F.length("c_name") - 3, 4),
        ).alias("name_hint"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.expr("cast(round(c_acctbal * 100) as bigint) div 100000 * 1000").alias(
            "acctbal_bucket"
        ),
    ).orderBy("custkey")


ERASURE_MOD = 97  # deterministic demo erasure list: custkey % 97 == 0


@query(
    "gov02_erasure_audit",
    oracle=f"""
    WITH erase AS (
        SELECT c_custkey AS k FROM customer WHERE c_custkey % {ERASURE_MOD} = 0
    )
    SELECT 'customer' AS tbl,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_before,
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM erase e WHERE e.k = c.c_custkey))
               AS BIGINT) AS n_after,
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE EXISTS (SELECT 1 FROM erase e WHERE e.k = c.c_custkey))
               AS BIGINT) AS n_erased
    UNION ALL
    SELECT 'orders',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM erase e WHERE e.k = o.o_custkey))
               AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE EXISTS (SELECT 1 FROM erase e WHERE e.k = o.o_custkey))
               AS BIGINT)
    UNION ALL
    SELECT 'events',
           CAST((SELECT COUNT(*) FROM events) AS BIGINT),
           CAST((SELECT COUNT(*) FROM events v
                 WHERE NOT EXISTS (SELECT 1 FROM erase e WHERE e.k = v.user_id))
               AS BIGINT),
           CAST((SELECT COUNT(*) FROM events v
                 WHERE EXISTS (SELECT 1 FROM erase e WHERE e.k = v.user_id))
               AS BIGINT)
    ORDER BY tbl
    """,
)
def gov02_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure dry-run audit: for a deletion list of subject
    keys, the before/after/erased row counts across EVERY table that
    carries the subject key (the FK web dq14 audits is exactly the
    erasure blast radius). The apply step is the same anti-join feeding
    a rewrite (ups01/wh05's write machinery); this report is the
    auditable evidence a DPO signs off on BEFORE the irreversible
    write, and re-running it after must show n_erased = 0.

    The demo deletion list is a deterministic key predicate so both
    engines replay it; in production it's a small broadcast relation —
    each leg is then one scan + one broadcast anti/semi-join, and on a
    custkey-bucketed lake the erased rows map to a bounded set of
    files (the partition-level delete the lake layer's compaction
    already knows how to rewrite).
    """
    erase_pred = lambda col: F.col(col) % ERASURE_MOD == 0  # noqa: E731

    legs = []
    for tbl, key in (("customer", "c_custkey"), ("orders", "o_custkey"), ("events", "user_id")):
        t = load_table(spark, sf_dir, tbl)
        legs.append(
            t.agg(
                F.count("*").alias("n_before"),
                F.count(F.when(~erase_pred(key), 1)).alias("n_after"),
                F.count(F.when(erase_pred(key), 1)).alias("n_erased"),
            ).select(F.lit(tbl).alias("tbl"), "n_before", "n_after", "n_erased")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("tbl")


# --- gov03: retention sweep audit ----------------------------------------------------

RETENTION_DAYS = 90  # purge horizon relative to the newest event


@query(
    "gov03_retention_sweep",
    oracle=f"""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    tagged AS (
        SELECT event_type, ts,
               ts < mx - INTERVAL {RETENTION_DAYS} DAY AS expired
        FROM events, anchor
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(CASE WHEN expired THEN 1 END) AS BIGINT) AS n_expired,
           CAST((1000 * COUNT(CASE WHEN expired THEN 1 END)) // COUNT(*)
                AS BIGINT) AS expired_permille,
           MIN(ts) AS oldest_ts,
           CAST(COUNT(DISTINCT CASE WHEN expired
                THEN CAST(DATE_TRUNC('month', ts) AS DATE) END) AS BIGINT)
               AS purge_months
    FROM tagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def gov03_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy audit: per event type, how many rows are past
    the {RETENTION_DAYS}-day horizon and how many month partitions a
    purge would touch — the planning query an operator runs BEFORE
    gov02's erasure pass (that one deletes identified subjects, this
    sweeps by age). Anchoring to MAX(ts) instead of the wall clock
    keeps the audit replayable (and the oracle differential exact);
    production substitutes current_timestamp at the one literal.

    Scale shape: the 1-row anchor broadcasts onto the scan, the age
    predicate is a scan-fused projection, and the rollup keys on
    event_type (bounded). purge_months counting distinct MONTHS, not
    rows, is the point — at 100 TB with month-partitioned lakes
    (sources/lake.py) the sweep cost is proportional to partitions
    touched, which is exactly what this reports.
    """
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("mx"))
    tagged = events.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        "ts",
        (F.col("ts") < F.col("mx") - F.expr(f"INTERVAL {RETENTION_DAYS} DAY")).alias(
            "expired"
        ),
    )
    return (
        tagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(F.col("expired"), 1)).alias("n_expired"),
            F.expr(
                "(1000 * count(case when expired then 1 end)) div count(*)"
            ).alias("expired_permille"),
            F.min("ts").alias("oldest_ts"),
            F.countDistinct(
                F.when(F.col("expired"), F.trunc("ts", "month"))
            ).alias("purge_months"),
        )
        .orderBy("event_type")
    )
