"""10× scale probe: measure per-query scaling exponents on a real fixture.

Motivation (VERDICT r3 #5): the dd12 word-set trap — fine at sf0.01,
65 s at sf0.1 because the OUTPUT was quadratic — was caught by ad-hoc
vigilance. This tool makes that check systematic: it materializes a 10×
fixture from the bench SF, runs the most expensive registry queries at
1× and 10×, and fits a scaling exponent per query

    exponent = log(t_10x / t_1x) / log(10)

so ~1.0 reads "linear", ≳1.3 reads "super-linear — explain or fix".
Output-row counts at both scales are recorded too, because the usual
cause of a super-linear TIME is a super-linear ANSWER.

Fixture design — 10 disjoint key-shifted shards, NOT 10 raw copies:

- Keyed tables (customer/supplier/part/orders/lineitem/events) get all
  primary AND foreign keys offset by ``copy * stride`` with one stride
  per key family, so referential joins stay intact and each shard is an
  independent world. GroupBys/joins then scale linearly in both input
  and output — the correct null hypothesis for exponent fitting. Raw
  row duplication would instead collapse groupBys (same keys 10×) and
  square self-join outputs by construction.
- ``documents``: doc_id offset; every token in copy k>0 is tagged
  ``_k`` so shingle/token sets across shards are DISJOINT — each
  shard replicates the base duplicate/near-dup structure instead of
  every doc gaining 9 cross-copy near-dups (which would force a
  quadratic pair count no matter how good the operator is).
- ``embeddings``: vec_id offset; copy k's vectors are multiplied by a
  per-shard Rademacher sign mask (deterministic ±1 per dimension).
  Sign masks preserve INTRA-shard cosines exactly (cos(m⊙a, m⊙b) =
  Σ mᵢ²aᵢbᵢ = cos(a,b)) while cross-shard cosine becomes a
  random-sign-weighted sum concentrating near 0, so semantic-dedup
  structure replicates per shard. (The first draft used a circular
  rotation by k dims; the probe's own rows_ratio diagnostic caught it —
  ml03 emitted 20.7× rows instead of 10× because adjacent shards'
  rotations differ by one position and the vectors are lag-1
  autocorrelated. The diagnostic exists precisely for this failure
  shape; see SCALE_PROBE.md.)
- ``region``/``nation`` stay as-is: dimensions have fixed cardinality
  at any SF.
- Every table is written with 32 files so 10× scans actually
  parallelize (single-row-group inputs serialize scans — see PERF.md
  "scan parallelism"); this is also what a production layout looks
  like.

Each probed query runs under a cancellable job group with a hard
per-query timeout (default 600 s): a run that blows the budget at 10×
is itself the finding (recorded as ``timeout``), not a reason for the
probe to hang.

Usage:
    python tools/scale_probe.py [--base /root/testdata/sf0.1]
        [--factor 10] [--timeout 600] [--keep-fixture DIR]
Prints one JSON line per query and a final summary JSON line; the
committed human-readable digest lives in SCALE_PROBE.md.

100× protocol (VERDICT r4 #4): the brief targets ~100 TB, so the most
expensive queries get a two-decade span on top of the full 10× sweep:

    python tools/scale_probe.py --base /root/testdata/sf0.01 \
        --factor 100 --queries "$(python -c 'from tools.scale_probe \
        import PROBE100_QUERIES; print(",".join(PROBE100_QUERIES))')"

Basing at sf0.01 keeps the END scale at ~sf1 (6M orders / 60M lines
locally feasible) while the fitted exponent covers the full 100×
span — a quadratic term invisible at 10× is 10× louder here. The
shard construction generalizes unchanged (k ranges over 0..99).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from chicago_business_owners_data_engineering_spark import registry
from chicago_business_owners_data_engineering_spark.session import get_spark

# The most expensive registry queries by the r03 bench record (ml03,
# dd12, er02/er03, inc02, dd06, dd04 lead every round), plus one
# representative per heavy family not already present (graph, ANN,
# retrieval, sessionization) and one scan-bound control whose exponent
# SHOULD be ~1.0 (q01) to calibrate the fixed-cost floor.
PROBE_QUERIES: tuple[str, ...] = (
    "q01_pricing_summary",  # control: one scan + one agg, linear by design
    "ml03_semantic_dedup",
    "ml03_semdedup_cos0.9",  # pseudo-query: production-θ calibration of ml03
    "dd12_prefix_filter_jaccard",
    "er03_entity_revenue",
    "er02_entity_clusters",
    "inc02_incremental_components",
    "dd06_neardup_components",
    "dd04_minhash_lsh_pairs",
    "gr01_pagerank",
    "gr05_kcore",
    "sim12_ivf_mmr_rerank",
    "sim13_knn_join",
    "sim13_knnjoin_scaledk",  # pseudo-query: k ∝ corpus size calibration
    "sim14_pq_knn_join",
    "sim14_pqjoin_scaledk",  # pseudo-query: same k knob as sim13
    "ml04_density_dedup",
    "ml04_density_scaledk",  # pseudo-query: k ∝ n + out-of-tail θ
    "sim03_ivf_topk",
    "tx11_bm25_search",
    "st01_sessionization",
    "tx13_bigram_surprisal",  # bigram vocab grows with corpus — verify the agg stays linear
    "dq08_ks_drift",  # per-column rank/window over the union — linear check
    "dq09_mann_whitney",  # same grid-bounded shape as dq08 — linear check
    "ml05_fasttext_quality",  # explode + broadcast + doc agg — linear check
    "dd13_containment_join",  # asymmetric prefix probe — output-sensitivity check
    "tx14_bpe_merges",  # merge rounds run on the vocab table — sublinear check
    "tx15_bpe_tokenize",  # corpus explode + broadcast vocab join — linear check
    "tx15_bpe_widecharset",  # pseudo-query: charset widened to see all fixture shards
    "dq10_mad_outliers",  # grid-bounded robust stats — linear check
    "ts09_seasonal_naive_backtest",  # hourly-grain self-join — linear check
    "gr07_lpa_communities",  # bounded label rounds on node-keyed shuffles — linear check
    "gr08_bfs_hops",  # bounded BFS relaxations, same exchange layout — linear check
    "ts10_linear_trend",  # sufficient-stats aggregate — linear check
    "tp16_dsir_resample",  # explode + broadcast bucket table + doc agg — linear check
    "gr09_link_prediction",  # capped wedge enumeration — candidate-volume check
    "tx16_collocations",  # vocab-keyed count shuffles — linear check
    "dq12_key_discovery",  # single EXPAND-pass multi-distinct — linear check
    "dq13_l_diversity",  # (QI, sensitive)-spine distinct agg — linear check
    "ts11_cusum_changepoint",  # day-keyed rollup + bounded window — linear check
    "er04_golden_record",  # blocked match graph + entity-keyed modes — linear check
    "inc03_incremental_distinct",  # dedup + (day,user)-keyed anti-join — linear check
    "gr10_degree_assortativity",  # degree joins + 1-row sufficient stats — linear check
    "tp17_decontaminate_train",  # shingle-keyed join + doc anti-join — linear check
    "ts12_weekday_seasonality",  # two partial-agg rollups over one scan — linear check
    "dd14_ngram_novelty",  # shingle-keyed min + same-exchange join — linear check
    "dq14_referential_orphans",  # five broadcast-probed FK legs — linear check
    "ml08_reliability_bins",  # ml05 scoring shape + bounded bin rollup — linear check
    "st02_last_touch_attribution",  # one user-keyed journey window — linear check
    "sim15_ivf_recall_eval",  # fixed panel × corpus exact leg — linear check
    "dd15_simhash_hamming_pairs",  # band-equality join — candidate-volume check
    "gr11_clustering_coefficient",  # oriented wedge join + node-keyed joins — E^1.5 check
    "wh04_scd2_merge",  # key-partitioned close-and-open join — linear check
    "ts13_seasonal_anomaly",  # day rollup + bounded median windows — linear check
    # round-5 additions
    "mon02_slo_burn_rate",  # hourly rollup + bounded RANGE frames — linear check
    "dq15_profile_drift",  # two multi-distinct EXPAND passes — linear check
    "inc04_incremental_neardup_probe",  # delta-band index probe — collision-volume check
    "st03_funnel_conversion",  # stage-chained user-keyed mins — linear check
    "ab02_srm_check",  # distinct-user pass + 1-row readout — linear check
    "tx17_repetition_signals",  # explode→count→per-doc MAX chains — linear check
    "f26_interval_merge",  # key-partitioned island windows — linear check
    "st04_cohort_retention",  # customer-keyed distinct + matrix rollup — linear check
    "er05_blocking_quality",  # brand-keyed Σ|group|² truth leg — quadratic-in-group check
    "mon03_freshness_lag",  # grouped max + 1-row head broadcast — linear check
    # round-6 additions
    "mb01_market_basket",  # basket-keyed pair self-join — candidate-volume check
    "dd16_weighted_jaccard_pairs",  # minhash-band candidates + weighted verify — collision check
    "j13_interval_overlap_join",  # bucketed range join — bucket-collision-volume check
    "ts16_peak_concurrency",  # 2-points-per-event day-keyed sweep — linear check
    "sim16_range_search",  # centroid-floor cell probe — pruned-scan check
    "ab03_cuped_readout",  # user-keyed sufficient-stats pass — linear check
    "st05_rfm_segments",  # customer rollup + 3 bounded ntile windows — linear check
    "st06_cohort_ltv",  # customer-keyed min + fact join + grid windows — linear check
    "wh05_cdc_apply",  # two key-windows + one full-outer join — linear check
    "dq17_row_invariants",  # one parent join, all rules conditional-counted — linear check
    "tx18_lexical_diversity",  # (source, word)-keyed vocab rollup — linear check
    "ts17_autocorrelation",  # daily rollup + bounded lag windows — linear check
    "ts18_rolling_wau",  # (day,user) dedup + bounded day-range join — x7-blowup check
    "mon04_error_budget",  # daily rollup + bounded cumulative window — linear check
    "tx19_langid_confusion",  # one grouped count over the lang grid — linear check
    "f31_mom_change",  # monthly rollup + bounded lag window — linear check
    "gov01_pseudonymize",  # scan-fused masking projection — linear check
    "gov02_erasure_audit",  # three conditional-count scans — linear check
    # round-7 additions
    "f25_id_gap_islands",  # 3-level sharded gap scan — partitioned-window linear check
    "dd17_lsh_tuning_eval",  # band sweep + exact prefix-join true leg — collision check
    "tp23_pipeline_report",  # composed funnel card — end-to-end linear check
    "tp24_epoch_budget",  # source rollup + 1-row total broadcast — linear check
    "tx22_rank_decay",  # vocab agg + TakeOrdered-512 — linear check
    "sim19_source_centroid_drift",  # posexplode + keyed aggregates — linear check
    "a34_weighted_median",  # bounded value-domain aggregate + windows — linear check
    "wh06_partition_skew_audit",  # 32-bucket rollup + 1-row total — linear check
)

# The 100× set: the top-10 most expensive registry queries by the
# latest bench record (BENCH_r04 per-query seconds: er04 4.1, sim15
# 2.2, dq12 2.2, dd14 2.0, dd15 1.5, dd04 1.2; plus the historically
# heaviest families — calibrated semantic dedup, prefix-filter
# Jaccard, entity clustering, PageRank) with the q01 scan-bound
# control to calibrate the fixed-cost floor.
PROBE100_QUERIES: tuple[str, ...] = (
    "q01_pricing_summary",  # control: linear by design
    "er04_golden_record",
    "sim15_ivf_recall_eval",
    "dq12_key_discovery",
    "dd14_ngram_novelty",
    "dd15_simhash_hamming_pairs",
    "dd04_minhash_lsh_pairs",
    "ml03_semdedup_cos0.9",  # production-θ calibration (registry θ sits in the random tail)
    "dd12_prefix_filter_jaccard",
    "er02_entity_clusters",
    "gr01_pagerank",
)

# Round-6 100× additions (VERDICT r5 #3): the heavy families whose fixes
# were validated at 10× only — the ml03 lesson is that 10× hides
# quadratics. inc04 is the heaviest bench query (collision volume over
# two decades); dd13's asymmetric prefix filter meets 100×-denser
# templates; sim13/sim14 run the k ∝ n calibration; ml04 the scaled-k +
# out-of-tail θ; tx14/tx15 the BPE train/apply pair (widened charset so
# the tokenizer sees every fixture shard).
PROBE100_R6: tuple[str, ...] = (
    "inc04_incremental_neardup_probe",
    "dd13_containment_join",
    "sim13_knnjoin_scaledk",
    "sim14_pqjoin_scaledk",
    "ml04_density_scaledk",
    "tx14_bpe_merges",
    "tx15_bpe_widecharset",
)

# Round-8 100× additions (VERDICT r7 #3): the eight round-7 operators
# previously probed at 10× only. The ml03/ml09 precedent: fixed knobs
# can hide quadratics below 10×; the two-decade span makes a quadratic
# term 10× louder.
PROBE100_R8: tuple[str, ...] = (
    "a34_weighted_median",
    "wh06_partition_skew_audit",
    "tp24_epoch_budget",
    "tx22_rank_decay",
    "sim19_source_centroid_drift",
    "f25_id_gap_islands",
    "dd17_lsh_tuning_eval",
    "tp23_pipeline_report",
)

# Round-9 100× additions (VERDICT r8 #4): the nine round-8 operators
# previously probed at 10× only. Verdict priority: wh07 (10× exponent
# 0.42, the round's highest — full-outer snapshot diff), st10 (session
# merge under gap semantics), f35 (collation grouping); plus skew01,
# whose integer-cents fix landed after its last probe.
# Round-11 100× set (VERDICT r10 #8): the r10/r11 rewrites whose
# shuffle-byte claims need a measured exponent — ml04's broadcast
# survivor mins (replacing the noise-hot window), sim13/ml09 canonical
# scoring, dd11's hash prefilter (first 100× probe), the star-forest
# convergence + r11 extraction dedup under three fixpoint consumers,
# and dq12's adaptive prescreen. q01 rides as the linear control.
PROBE100_R11: tuple[str, ...] = (
    "q01_pricing_summary",
    "ml04_density_scaledk",
    "sim13_knnjoin_scaledk",
    "ml09_knneval_scaledk",
    "dd11_char_span_dedup",
    "dd06_neardup_components",
    "inc02_incremental_components",
    "er03_entity_revenue",
    "dq12_key_discovery",
)

PROBE100_R9: tuple[str, ...] = (
    "wh07_snapshot_diff",
    "st10_session_window_native",
    "f35_collated_group",
    "f33_variant_json",
    "f34_try_arithmetic",
    "j15_lateral_topk",
    "a35_percentile_disc",
    "a36_grouped_mode",
    "tp25_curriculum_phases",
    "skew01_salted_agg",
)

# One stride per key family — shared by every table that references the
# family, so cross-table joins keep matching inside a shard and never
# match across shards.
KEY_FAMILIES: dict[str, tuple[tuple[str, str], ...]] = {
    # family: ((table, column), ...); stride = max(column over first table)+1
    # events.user_id DRAWS FROM the custkey domain (j08 joins
    # o_custkey = user_id), so it must share the custkey stride — its
    # own smaller stride would land shard-k users inside shard-0's
    # custkey range and corrupt the events↔orders link.
    "custkey": (("customer", "c_custkey"), ("orders", "o_custkey"), ("events", "user_id")),
    "suppkey": (("supplier", "s_suppkey"), ("lineitem", "l_suppkey")),
    "partkey": (("part", "p_partkey"), ("lineitem", "l_partkey")),
    "orderkey": (("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
    "eventid": (("events", "event_id"),),
    "docid": (("documents", "doc_id"),),
    # label is the IVF cell id: offsetting it gives each shard its own
    # cells, so label-blocked queries (sim03/sim12) probe a replica of
    # base-scale cell structure instead of cells that mix 10
    # decorrelated shards into near-zero centroids.
    "veclabel": (("embeddings", "label"),),
    "vecid": (("embeddings", "vec_id"),),
}

REPLICATED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
COPIED_TABLES = ("region", "nation")

FIXTURE_FILES = 32  # files per table: real multi-file layout at 10×


def _strides(spark: SparkSession, base: str) -> dict[tuple[str, str], int]:
    """Resolve (table, column) -> additive stride for shard k."""
    out: dict[tuple[str, str], int] = {}
    for cols in KEY_FAMILIES.values():
        t0, c0 = cols[0]
        df = spark.read.parquet(os.path.join(base, f"{t0}.parquet"))
        stride = int(df.agg(F.max(c0)).first()[0]) + 1
        for t, c in cols:
            out[(t, c)] = stride
    return out


def _shard(df: DataFrame, table: str, k: int, strides: dict[tuple[str, str], int]) -> DataFrame:
    """Produce shard k of `table`: keys offset, text/embeddings made disjoint."""
    dtypes = dict(df.dtypes)
    for (t, c), stride in strides.items():
        if t == table:
            # cast back to the column's original dtype: the offset must
            # not silently widen the schema (int label stays int)
            df = df.withColumn(c, (F.col(c) + F.lit(k * stride)).cast(dtypes[c]))
    if k == 0:
        return df
    if table == "documents":
        tagged = F.array_join(
            F.transform(F.split(F.col("text"), " "), lambda x: F.concat(x, F.lit(f"_{k}"))),
            " ",
        )
        df = df.withColumn("text", tagged).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if table == "embeddings":
        # ±1 per (shard, dim) from xxhash64 parity — deterministic, no RNG
        sign = lambda i: (  # noqa: E731
            F.lit(1.0) - F.lit(2.0) * F.pmod(F.xxhash64(F.lit(k) * 4099 + i), F.lit(2))
        ).cast("float")
        masked = F.transform(F.col("embedding"), lambda x, i: x * sign(i))
        df = df.withColumn("embedding", masked)
    return df


def _manifest_path(out: str) -> str:
    return os.path.join(out, "_fixture_manifest.json")


def fixture_manifest(spark: SparkSession, base: str, out: str, factor: int) -> dict:
    """What this fixture was built from — written at build time and
    checked by --reuse-fixture, so a stale fixture built at a different
    --base/--factor can't silently corrupt scaling exponents."""
    rows = {
        t: spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        for t in (*COPIED_TABLES, *REPLICATED_TABLES)
    }
    return {"base": os.path.abspath(base), "factor": factor, "rows": rows}


def build_fixture(spark: SparkSession, base: str, out: str, factor: int) -> None:
    strides = _strides(spark, base)
    for table in COPIED_TABLES:
        src = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
        src.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    for table in REPLICATED_TABLES:
        src = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
        shards = [_shard(src, table, k, strides) for k in range(factor)]
        full = shards[0]
        for s in shards[1:]:
            full = full.unionByName(s)
        (
            full.repartition(FIXTURE_FILES)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{table}.parquet"))
        )
    with open(_manifest_path(out), "w") as f:
        json.dump(fixture_manifest(spark, base, out, factor), f, indent=1)


def _ml03_calibrated(spark: SparkSession, sf_dir: str):
    """ml03's engine at a production duplicate threshold (θ=0.9, outside
    the random-cosine tail) — the registry pin θ=0.4 sits INSIDE that
    tail for this 64-dim corpus, so its output pair density grows with
    corpus size by semantics, not by implementation. This probe shows
    the same blocking yields ~10× rows at 10× data once θ is calibrated."""
    from chicago_business_owners_data_engineering_spark.operators.clustering import (
        semantic_dedup_components,
    )

    return semantic_dedup_components(spark, sf_dir, cos_threshold=0.9)


def _ml03_scaled_k(spark: SparkSession, sf_dir: str):
    """ml03's engine at FULL production calibration: θ=0.9 AND
    k ∝ corpus size (constant ~250-vector cell width). The 100× probe
    measured θ-only calibration (_ml03_calibrated, fixed k=8) at
    exponent 1.29: with k fixed, cells grow with the corpus and the
    in-cell quadratic dominates — exactly the sim13/sim14 fixed-k
    failure shape, fixed by the same knob (SemDeDup's cluster count
    scales with n)."""
    from chicago_business_owners_data_engineering_spark.catalog import load_table
    from chicago_business_owners_data_engineering_spark.operators.clustering import (
        semantic_dedup_components,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    return semantic_dedup_components(
        spark, sf_dir, k=max(8, n // 250), cos_threshold=0.9
    )


def _sim13_scaled_k(spark: SparkSession, sf_dir: str):
    """sim13's engine with k ∝ corpus size (constant ~250-vector cell
    width) — the production configuration. The registry pin k=8 was
    probe-flagged at exponent 1.74 (fixed k ⇒ cells grow with the
    corpus ⇒ quadratic candidate pairs); this pseudo-query demonstrates
    the scaled-k fix."""
    from chicago_business_owners_data_engineering_spark.catalog import load_table
    from chicago_business_owners_data_engineering_spark.operators.clustering import (
        knn_join_topk,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    return knn_join_topk(spark, sf_dir, k=max(8, n // 250))


def _sim14_scaled_k(spark: SparkSession, sf_dir: str):
    """sim14's engine with k ∝ corpus size — identical blocking knob to
    sim13 (the registry pin k=8 shares sim13's fixed-k quadratic
    candidate growth); the PQ/ADC candidate stage and bounded re-rank
    are both linear per candidate, so scaled-k should restore ~1.0."""
    from chicago_business_owners_data_engineering_spark.catalog import load_table
    from chicago_business_owners_data_engineering_spark.operators.similarity import (
        pq_knn_join,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    return pq_knn_join(spark, sf_dir, k=max(8, n // 250))


def _ml04_scaled(spark: SparkSession, sf_dir: str):
    """ml04's engine at production calibration: k ∝ corpus size AND a
    threshold nearer the random-cosine tail's edge (θ=0.5 vs the
    registry pin 0.35, which sits inside the tail for this 64-dim
    corpus — fixed-θ neighbor counts grow with corpus size by
    semantics, exactly ml03's measured behavior)."""
    from chicago_business_owners_data_engineering_spark.catalog import load_table
    from chicago_business_owners_data_engineering_spark.operators.clustering import (
        dbscan_density_dedup,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    return dbscan_density_dedup(spark, sf_dir, k=max(8, n // 250), cos_threshold=0.5)


def _ml09_scaled_k(spark: SparkSession, sf_dir: str):
    """ml09's engine with k ∝ corpus size (constant ~250-vector cell
    width) — the production knob its docstring promises. 10× measured
    0.91 with assignment cost dominating; the ml03 100× lesson (732 s
    fixed-k vs 41.8 s scaled) says only the second decade shows
    whether the in-cell quadratic or the linear assignment wins."""
    from chicago_business_owners_data_engineering_spark.catalog import load_table
    from chicago_business_owners_data_engineering_spark.operators.clustering import (
        knn_classifier_eval,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    return knn_classifier_eval(spark, sf_dir, k=max(8, n // 250))


def _tx15_wide(spark: SparkSession, sf_dir: str):
    """tx15's engine with the word charset widened to admit the
    fixture's shard-tagged tokens (``word_3``). The registry pin
    ``^[a-z]+$`` filters every tagged token out, so the pinned probe
    exercises only the untagged shard (rows_ratio 1.0 — the diagnostic
    caught it); this variant sees all 10 shards."""
    from chicago_business_owners_data_engineering_spark.operators.text import (
        bpe_tokenize_counts,
    )

    return bpe_tokenize_counts(spark, sf_dir, word_re="^[a-z0-9_]+$")


# Pseudo-queries: probe-only callables that are not registry entries
# (parameter calibrations of registry engines).
EXTRA_PROBES = {
    "ml03_semdedup_cos0.9": _ml03_calibrated,
    "ml03_semdedup_scaledk": _ml03_scaled_k,
    "sim13_knnjoin_scaledk": _sim13_scaled_k,
    "sim14_pqjoin_scaledk": _sim14_scaled_k,
    "ml04_density_scaledk": _ml04_scaled,
    "tx15_bpe_widecharset": _tx15_wide,
    "ml09_knneval_scaledk": _ml09_scaled_k,
}

# Round-7 100× additions (VERDICT r6 #5): promote ml09's scaled-k twin
# through the second decade.
PROBE100_R7: tuple[str, ...] = (
    "q01_pricing_summary",  # control
    "ml09_knneval_scaledk",
)


def _timed_count(
    spark: SparkSession, fn, sf_dir: str, group: str, timeout_s: float
) -> dict:
    """One full execution → {'sec', 'rows'} | {'timeout': True} | {'error': msg}.

    A query that ERRORS (analysis exception, OOM) is a different finding
    from one that blows the time budget — conflating them would let the
    report claim 'super-linear, timed out at 10×' about a query that
    crashed in two seconds.
    """
    result: dict = {}

    def work() -> None:
        try:
            spark.sparkContext.setJobGroup(group, group, interruptOnCancel=True)
            t0 = time.time()
            result["rows"] = fn(spark, sf_dir).count()
            result["sec"] = time.time() - t0
        except Exception as exc:  # cancellation also surfaces here
            result.setdefault("err", f"{type(exc).__name__}: {exc}"[:300])

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        th.join(10)
        return {"timeout": True}
    if "sec" not in result:
        return {"error": result.get("err", "unknown failure")}
    return {"sec": result["sec"], "rows": result["rows"]}


def probe_query(
    spark: SparkSession, name: str, base: str, big: str, timeout_s: float, factor: int
) -> dict:
    fn = EXTRA_PROBES.get(name) or registry.QUERIES[name]
    rec: dict = {"query": name}
    for label, sf_dir in (("base", base), ("x10", big)):
        samples, rows = [], None
        for i in range(2):
            out = _timed_count(spark, fn, sf_dir, f"probe-{name}-{label}-{i}", timeout_s)
            if "sec" not in out:
                # a truncated measurement poisons the exponent — record
                # ONLY the failure mode, never a partial sec/rows pair
                samples = []
                rec[f"{label}_timeout" if out.get("timeout") else f"{label}_error"] = (
                    out.get("error", True)
                )
                break
            samples.append(out["sec"])
            rows = out["rows"]
        if samples:
            rec[f"{label}_sec"] = round(min(samples), 3)
            rec[f"{label}_rows"] = rows
    if "base_sec" in rec and "x10_sec" in rec:
        rec["exponent"] = round(
            math.log(rec["x10_sec"] / rec["base_sec"]) / math.log(factor), 2
        )
        if rec.get("base_rows") and rec.get("x10_rows"):
            rec["rows_ratio"] = round(rec["x10_rows"] / max(rec["base_rows"], 1), 2)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--keep-fixture", default=None, help="persist fixture here instead of a temp dir")
    ap.add_argument(
        "--reuse-fixture",
        action="store_true",
        help="skip the build when --keep-fixture already holds every table "
        "(pre-build the fixture in a contended window, probe in a quiet one)",
    )
    ap.add_argument("--queries", default=None, help="comma-separated override of PROBE_QUERIES")
    ap.add_argument(
        "--build-only",
        action="store_true",
        help="build the fixture and exit (pair with --keep-fixture)",
    )
    args = ap.parse_args()

    spark = get_spark("scale-probe")
    fixture = args.keep_fixture or tempfile.mkdtemp(prefix="scale_probe_sfx_")
    names = tuple(args.queries.split(",")) if args.queries else PROBE_QUERIES
    try:
        all_tables = [*COPIED_TABLES, *REPLICATED_TABLES]
        complete = all(
            os.path.exists(os.path.join(fixture, f"{t}.parquet", "_SUCCESS"))
            for t in all_tables
        )
        # _SUCCESS markers alone can't tell a fixture built at a
        # different --base/--factor from the right one — reusing a
        # stale fixture silently produces wrong exponents. The manifest
        # (written at build time) must match the current arguments and
        # the on-disk row counts exactly, or we rebuild.
        if complete and args.reuse_fixture:
            try:
                with open(_manifest_path(fixture)) as f:
                    recorded = json.load(f)
                expected = fixture_manifest(spark, args.base, fixture, args.factor)
                if recorded != expected:
                    print(
                        json.dumps(
                            {
                                "fixture_manifest_mismatch": {
                                    "recorded": recorded,
                                    "expected": expected,
                                }
                            }
                        ),
                        flush=True,
                    )
                    complete = False
            except (OSError, ValueError):
                complete = False  # pre-manifest fixture: rebuild once
        if args.reuse_fixture and complete:
            build_s = 0.0
        else:
            t0 = time.time()
            build_fixture(spark, args.base, fixture, args.factor)
            build_s = round(time.time() - t0, 1)
        print(json.dumps({"fixture": fixture, "factor": args.factor, "build_sec": build_s}), flush=True)
        if args.build_only:
            return

        records = []
        for name in names:
            rec = probe_query(spark, name, args.base, fixture, args.timeout, args.factor)
            records.append(rec)
            print(json.dumps(rec), flush=True)

        flagged = [
            r["query"]
            for r in records
            if r.get("exponent", 0) > 1.3 or r.get("x10_timeout") or r.get("x10_error")
        ]
        print(
            json.dumps(
                {
                    "metric": "scale_probe",
                    "base": args.base,
                    "factor": args.factor,
                    "queries": {r["query"]: r.get("exponent") for r in records},
                    "flagged_superlinear": flagged,
                }
            ),
            flush=True,
        )
    finally:
        if not args.keep_fixture:
            shutil.rmtree(fixture, ignore_errors=True)


if __name__ == "__main__":
    main()
