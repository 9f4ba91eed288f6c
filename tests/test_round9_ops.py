"""Round-9 hardening tests.

sim10 partial oracle (VERDICT r8 #7): the OPQ query is rows-only
because the trained rotation (driver-side eigendecomposition + SVD +
Lloyd) has no SQL twin — but everything DOWNSTREAM of the rotation is
deterministic. This test oracle-checks that tail differentially:

1. the trusted stage — train (mu, R, codebooks) exactly as
   sim10_opq_topk does and rotate the corpus through the SAME
   Arrow-batched pandas UDF the query uses;
2. the integer-grid handoff — quantize the rotated vectors to a fixed
   integer grid IN SPARK and materialize them to parquet, so both
   engines consume bit-identical inputs (sim19/sim06's discipline:
   integer arithmetic, not bit-mirrored float folds);
3. the oracled stage — the distance-table build, per-subspace
   encoding, ADC scoring and the (ad, vec_id)-ordered candidate top-k
   plus the exact re-rank, computed independently by Spark (native
   expressions over the quantized relation) and by DuckDB (generated
   SQL with the quantized codebooks/query embedded as literals), and
   compared EXACTLY — every distance is a BIGINT, so there is no
   tolerance anywhere.

Leaves only the rotation itself rows-only; COVERAGE.md records sim10
as partial-oracle on this basis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import duckdb
import pytest
from pyspark.sql import functions as F

from chicago_business_owners_data_engineering_spark.catalog import load_table
from chicago_business_owners_data_engineering_spark.operators.similarity import (
    OPQ_SAMPLE,
    PQ_DSUB,
    PQ_M,
    PQ_NCODES,
    PQ_RERANK,
    QUERY_VEC_ID,
    TOP_K,
    _opq_train,
)

GRID = 1 << 20  # rotated coords are O(1); |x|·2^20 ≈ 1e6, d2 sums ≪ 2^53


def _int_d2(a, b):
    """Exact BIGINT squared L2 between two long-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def test_sim10_adc_tail_matches_duckdb_on_integer_grid(spark, sf_dir, tmp_path):
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("raw"),
    )
    sample = emb.orderBy("vec_id").limit(OPQ_SAMPLE).collect()
    X = np.array([list(r["raw"]) for r in sample], dtype=np.float64)
    mu, R, cb, _hist = _opq_train(X)

    b_mu = spark.sparkContext.broadcast(mu)
    b_rt = spark.sparkContext.broadcast(np.ascontiguousarray(R.T))

    @pandas_udf("array<double>")
    def rotate(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.values).astype(np.float64)
        Y = (M - b_mu.value) @ b_rt.value
        return pd.Series(list(Y))

    # Integer-grid handoff: quantize ONCE in Spark, materialize, and
    # let both engines read the same integers.
    quant_path = str(tmp_path / "sim10_rotated_int.parquet")
    (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", rotate("raw").alias("v"))
        .select(
            "vec_id",
            "label",
            F.transform("v", lambda x: F.round(x * GRID).cast("long")).alias("iv"),
        )
        .write.mode("overwrite")
        .parquet(quant_path)
    )

    # Quantize model parameters identically on the driver (numpy round
    # is exact half-even on these magnitudes; both engines consume the
    # SAME resulting integers as literals, so the rule cannot diverge).
    icb = [
        [[int(round(x * GRID)) for x in cb[m][c]] for c in range(PQ_NCODES)]
        for m in range(PQ_M)
    ]
    by_id = {int(r["vec_id"]): np.array(r["raw"], dtype=np.float64) for r in sample}
    qrot = (by_id[QUERY_VEC_ID] - mu) @ R.T
    iqv = [int(round(x * GRID)) for x in qrot]

    # ---- Spark tail: LUT + encode + ADC + exact re-rank, all BIGINT
    lut = [
        [
            sum((iqv[m * PQ_DSUB + i] - icb[m][c][i]) ** 2 for i in range(PQ_DSUB))
            for c in range(PQ_NCODES)
        ]
        for m in range(PQ_M)
    ]
    coded = spark.read.parquet(quant_path)
    code_cols = []
    for m in range(PQ_M):
        cb_lit = F.array(
            *[
                F.array(*[F.lit(x).cast("long") for x in icb[m][c]])
                for c in range(PQ_NCODES)
            ]
        )
        scored = F.transform(
            cb_lit,
            lambda c, i: F.struct(
                _int_d2(F.slice(F.col("iv"), m * PQ_DSUB + 1, PQ_DSUB), c).alias("d"),
                i.alias("c"),
            ),
        )
        code_cols.append(F.array_min(scored)["c"].alias(f"code{m}"))
    coded = coded.select("vec_id", "label", "iv", *code_cols)
    approx = None
    for m in range(PQ_M):
        term = F.element_at(
            F.array(*[F.lit(x).cast("long") for x in lut[m]]), F.col(f"code{m}") + 1
        )
        approx = term if approx is None else approx + term
    iqv_lit = F.array(*[F.lit(x).cast("long") for x in iqv])
    spark_out = (
        coded.select("vec_id", "label", "iv", approx.alias("ad"))
        .orderBy("ad", "vec_id")
        .limit(PQ_RERANK)
        .select("vec_id", "label", _int_d2(F.col("iv"), iqv_lit).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(TOP_K)
        .collect()
    )
    spark_rows = [(r["vec_id"], r["label"], r["d2"]) for r in spark_out]

    # ---- DuckDB replay from the same parquet + the same literals
    cb_values = ", ".join(
        f"({m}, {c}, {icb[m][c]}::BIGINT[])"
        for m in range(PQ_M)
        for c in range(PQ_NCODES)
    )
    lut_values = ", ".join(
        f"({m}, {c}, {lut[m][c]})" for m in range(PQ_M) for c in range(PQ_NCODES)
    )
    sql = f"""
    WITH e AS (
        SELECT vec_id, label, iv::BIGINT[] AS iv
        FROM '{quant_path}/*.parquet'
    ), cb(m, c, sub) AS (VALUES {cb_values}),
    lut(m, c, d) AS (VALUES {lut_values}),
    enc AS (
        SELECT e.vec_id, cb.m, cb.c,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id, cb.m
                   ORDER BY list_sum(list_transform(
                       list_zip(e.iv[cb.m * {PQ_DSUB} + 1 : cb.m * {PQ_DSUB} + {PQ_DSUB}],
                                cb.sub),
                       x -> (x[1] - x[2]) * (x[1] - x[2]))), cb.c) AS rn
        FROM e CROSS JOIN cb
    ),
    approx AS (
        SELECT enc.vec_id, CAST(SUM(lut.d) AS BIGINT) AS ad
        FROM enc JOIN lut ON enc.m = lut.m AND enc.c = lut.c
        WHERE enc.rn = 1
        GROUP BY enc.vec_id
    ),
    cand AS (SELECT vec_id FROM approx ORDER BY ad, vec_id LIMIT {PQ_RERANK})
    SELECT e.vec_id, e.label,
           CAST(list_sum(list_transform(
               list_zip(e.iv, {iqv}::BIGINT[]),
               x -> (x[1] - x[2]) * (x[1] - x[2]))) AS BIGINT) AS d2
    FROM e JOIN cand USING (vec_id)
    ORDER BY d2, e.vec_id
    LIMIT {TOP_K}
    """
    duck_rows = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]

    assert len(spark_rows) == TOP_K
    assert spark_rows == duck_rows  # exact — integer arithmetic end to end

    # Faithfulness: the quantized tail is a stand-in for the query as
    # shipped — at GRID=2^20 the integer ADC ordering reproduces
    # sim10's own float top-k ids on this corpus (training is
    # deterministic, so both paths share the same model).
    from chicago_business_owners_data_engineering_spark.operators.similarity import (
        sim10_opq_topk,
    )

    float_ids = [r["vec_id"] for r in sim10_opq_topk(spark, sf_dir).collect()]
    assert [r[0] for r in spark_rows] == float_ids
