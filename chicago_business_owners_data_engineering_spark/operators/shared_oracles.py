"""Oracle-SQL constants shared across operator modules.

Lives in its own registry-free module: operator modules import the
registry, and the registry imports every operator module at first use,
so a constant needed at DECORATION time cannot be imported peer-to-peer
without re-entering a partially initialized module (the circular-import
class fixed in round 3). Anything here must stay import-pure: no
registry, no pyspark, just strings.
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
