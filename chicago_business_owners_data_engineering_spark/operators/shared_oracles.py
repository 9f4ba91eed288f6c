"""Oracle-SQL constants shared across operator modules.

Lives in its own registry-free module: operator modules import the
registry, and the registry imports every operator module at first use,
so a constant needed at DECORATION time cannot be imported peer-to-peer
without re-entering a partially initialized module (the circular-import
class fixed in round 3). Anything here must stay import-pure: no
registry, no pyspark, just strings.
"""

# fastText-shaped classifier constants (clustering.py re-exports) and
# the curation-pipeline gate thresholds (plans/curation_pipeline.py
# re-imports) — here so plans/pipeline_report.py can build its oracle
# string at decoration time without importing any operator module (a
# module-level operator import there closes a worker-side cycle:
# multimodal -> registry -> pipeline_report -> curation_pipeline ->
# multimodal).
FT_BUCKETS = 64  # hashed-token parameter-table size
FT_KEEP_MICRO = 50_000_000  # decision threshold on the micro-unit score
CURATION_MIN_TOKENS = 5
CURATION_MAX_DUP_TOKEN_FRAC = 0.6
CURATION_MAX_TOP_TOKEN_FRAC = 0.3
CURATION_FT_MIN_MICRO = 35_000_000

# K-means trajectory constants — shared by the embedding-space family
# (ml01-ml04, sim12-sim14). Import-pure ints; clustering.py re-exports
# them as K / DIM / N_PROBES for its engine code.
KMEANS_K = 8
EMB_DIM = 64
KMEANS_N_PROBES = 2

# Shared DuckDB replay of the two-iteration Lloyd trajectory over the
# embeddings table: deterministic init (k lowest vec_ids) -> assign ->
# centroid update -> assign, with the final assignment's distance kept
# in d2. Every embedding-space oracle (ml01/ml02/ml03/ml04, sim13/sim14)
# composes on this single constant so no two can verify against
# different trajectories.
KMEANS_TRAJECTORY_CTE = f"""
    WITH RECURSIVE emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {KMEANS_K})
    ), d1 AS (
        SELECT e.vec_id, c0.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.v, c0.c), c0.cid) AS rn
        FROM emb e CROSS JOIN cents0 c0
    ), a1 AS (
        SELECT vec_id, cid AS cluster FROM d1 WHERE rn = 1
    ), expl AS (
        SELECT a1.cluster AS cid, g.dim, e.v[g.dim + 1] AS x
        FROM a1 JOIN emb e ON a1.vec_id = e.vec_id
        CROSS JOIN (SELECT UNNEST(RANGE(0, {EMB_DIM})) AS dim) g
    ), cents1 AS (
        SELECT cid, LIST(cx ORDER BY dim) AS c
        FROM (SELECT cid, dim, AVG(x) AS cx FROM expl GROUP BY cid, dim)
        GROUP BY cid
    ), d2 AS (
        SELECT e.vec_id, c1.cid, list_distance(e.v, c1.c) AS dist,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.v, c1.c), c1.cid) AS rn
        FROM emb e CROSS JOIN cents1 c1
    )
"""

# Multi-probe blocking on top of the trajectory: each vector exploded to
# its N_PROBES nearest final centroids — the candidate universe for
# ml03/ml04/sim13/sim14.
KMEANS_PROBES_CTE = f"""
    , probes AS (
        SELECT d2.vec_id, d2.cid AS probe, emb.v
        FROM d2 JOIN emb ON d2.vec_id = emb.vec_id
        WHERE d2.rn <= {KMEANS_N_PROBES}
    )
"""

# Word-3-gram shingle sets per document — the single definition of the
# similarity universe the whole near-dup family (dd04, dd06, dd07,
# dd08) verifies against. Shared as a fragment so no two oracles can
# silently diverge on tokenization.
_SHINGLE_CTES = """
    toks AS (
        SELECT doc_id, text, STRING_SPLIT(LOWER(text), ' ') AS t FROM documents
    ), sh AS (
        SELECT doc_id,
               CASE WHEN LEN(t) >= 3
                    THEN LIST_DISTINCT([ARRAY_TO_STRING(t[i:i+2], ' ')
                                        FOR i IN RANGE(1, LEN(t) - 1)])
                    ELSE [LOWER(text)] END AS ws
        FROM toks
    )
"""

# Exact all-pairs shingle-Jaccard edges at threshold 0.5 with the score
# — dd04's oracle. dd04's Spark side generates candidates via banded
# MinHash-LSH then verifies with EXACT Jaccard, so precision is exact
# by construction and this differential check is a RECALL certificate:
# it asserts the band parameters (32 hashes × band size 2) lose no
# ≥0.5 pair ON THIS CORPUS. A borderline pair can legitimately slip a
# banded index with ~s^r per-band probability; production tunes bands
# for its threshold and audits recall exactly this way.
DD04_EXACT_PAIRS_SQL = (
    "WITH "
    + _SHINGLE_CTES
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(LEN(LIST_INTERSECT(a.ws, b.ws)) * 1.0 /
                 (LEN(a.ws) + LEN(b.ws) - LEN(LIST_INTERSECT(a.ws, b.ws))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE LEN(LIST_INTERSECT(a.ws, b.ws)) * 1.0 /
          (LEN(a.ws) + LEN(b.ws) - LEN(LIST_INTERSECT(a.ws, b.ws))) >= 0.5
    """
)

# Shared DuckDB oracle prefix for the near-dup component family:
# shingle sets -> exact-Jaccard edges -> recursive-CTE reachability ->
# min-label components. dd06, dd07 AND dd08 all compose their oracles
# from this single constant so the three queries can never silently
# verify against different similarity graphs.
DD06_COMPONENT_CTE = (
    "WITH RECURSIVE "
    + _SHINGLE_CTES
    + """
    , pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE LEN(LIST_INTERSECT(a.ws, b.ws)) * 1.0 /
              (LEN(a.ws) + LEN(b.ws) - LEN(LIST_INTERSECT(a.ws, b.ws))) >= 0.5
    ), edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach(node, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.r FROM reach r JOIN edges e ON r.node = e.src
    ), comp AS (
        SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
    )
"""
)
