"""Round-8 third-session registrations (registered inside the round-8
driver window via benchqueries._WINDOW): SemDeDup semantic
deduplication and the label-ground-truth retrieval-quality harness
(MRR@k / precision@k).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (parity with sibling modules)

from .benchqueries import _t, register
from .operators import similarity

# One unrolled deterministic Lloyd iteration (same algebra as the
# ns_kmeans_refined oracle in nsqueries2.py), but the final assignment
# CTE ``m`` keeps the vector so downstream pairwise stages can reuse it.
_KMEANS1_M_CTES = (
    "d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "c0 AS (SELECT vec_id AS cell, v AS cv FROM d WHERE vec_id < 8), "
    "a1 AS (SELECT vec_id, v, cell, row_number() OVER (PARTITION BY vec_id ORDER BY "
    " round(list_cosine_similarity(v, cv), 6) DESC, cell) AS rn FROM d, c0), "
    "m1 AS (SELECT cell, i, round(CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS cval "
    " FROM (SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM a1 WHERE rn = 1) "
    " GROUP BY cell, i), "
    "c1 AS (SELECT cell, list(cval ORDER BY i) AS cv FROM m1 GROUP BY cell), "
    "a2 AS (SELECT vec_id, v, cell, round(list_cosine_similarity(v, cv), 6) AS cent_sim, "
    " row_number() OVER (PARTITION BY vec_id ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, cell) AS rn "
    " FROM d, c1), "
    "m AS (SELECT vec_id, v, cell, cent_sim FROM a2 WHERE rn = 1)"
)


register(
    "ns_dedup_semantic",
    f"WITH {_KMEANS1_M_CTES}, "
    "dropped AS (SELECT DISTINCT x.vec_id FROM m x JOIN m y "
    " ON x.cell = y.cell AND y.vec_id < x.vec_id "
    " AND round(list_cosine_similarity(x.v, y.v), 6) >= 0.3) "
    "SELECT vec_id, cell, cent_sim FROM m "
    "WHERE vec_id NOT IN (SELECT vec_id FROM dropped)",
    desc=(
        "SemDeDup (arXiv:2303.09540): k-means cluster the embeddings, then "
        "within each cluster drop every vector with cosine >= 0.3 to a "
        "lower-id member — pair work bounded by cell, never global n^2."
    ),
)(
    lambda spark, sf_dir: similarity.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), n_centroids=8, threshold=0.3, n_iter=1
    )
)


register(
    "ns_sim_mrr",
    "WITH d AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM d WHERE vec_id < 8), "
    "s AS (SELECT query_id, qlabel, d.vec_id, d.label, "
    " round(list_cosine_similarity(d.v, qv), 6) AS cos_sim FROM d, q WHERE d.vec_id <> query_id), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank FROM s), "
    "t AS (SELECT * FROM r WHERE rank <= 10) "
    "SELECT query_id, "
    "CAST(coalesce(min(CASE WHEN label = qlabel THEN rank END), 0) AS INTEGER) AS first_rel_rank, "
    "round(coalesce(CAST(1.0 AS DOUBLE) / min(CASE WHEN label = qlabel THEN rank END), 0.0), 6) AS rr, "
    "CAST(count(CASE WHEN label = qlabel THEN 1 END) AS INTEGER) AS n_rel, "
    "round(CAST(count(CASE WHEN label = qlabel THEN 1 END) AS DOUBLE) / 10.0, 6) AS p_at_k "
    "FROM t GROUP BY query_id",
    desc=(
        "Retrieval-quality harness: exact-cosine top-10 per query vs label "
        "ground truth — first relevant rank, MRR, precision@10; query side "
        "broadcast so the corpus is scanned once for all queries."
    ),
)(
    lambda spark, sf_dir: similarity.retrieval_metrics_per_query(
        _t(spark, sf_dir, "embeddings"), query_ids=list(range(8)), k=10
    )
)
