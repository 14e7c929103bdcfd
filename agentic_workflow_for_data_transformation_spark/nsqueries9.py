"""Round-8 seventh-session registrations: the retrieval-serving and
label-trust layer — reciprocal-rank fusion of two vector rankers
(the hybrid-retrieval merge), maximal-marginal-relevance rerank (the
diversity pass between ANN and the prompt, greedy per query inside
``applyInPandas``), Fleiss' kappa inter-annotator agreement (the
labels-are-real gate before majority voting), and per-class
precision/recall/F1 over the nearest-centroid confusion matrix (the
class-level read the aggregate accuracy hides). All exact-oracle:
integer ranks and counts everywhere, 6-decimal pinned cosines, and
the MMR greedy comparator evaluated as the identical IEEE double
expression on both engines. Registered into the driver window by the
round-8 rotation; also covered by the registry-wide
CORRECTNESS_LOCAL regeneration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .benchqueries import _t, register
from .operators import similarity, stats


def _mmr_sql(n_queries: int, k: int, pool: int) -> str:
    """Unrolled greedy-MMR oracle (house pattern: the unrolled-Lloyd
    PQ-training oracles): candidate pool and pairwise sims as CTEs,
    then k selection stages, each picking per query the argmax of
    0.5*rel - 0.5*max_sim_to_selected (ties on vec_id) among the
    not-yet-selected pool."""
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), ",
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM d WHERE vec_id < {n_queries}), ",
        "s AS (SELECT query_id, d.vec_id, "
        " round(list_cosine_similarity(d.v, qv), 6) AS rel, d.v AS v "
        " FROM d, q WHERE d.vec_id <> query_id), ",
        "cand AS (SELECT query_id, vec_id, rel, v FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY query_id "
        "   ORDER BY rel DESC, vec_id) AS rn FROM s) "
        f" WHERE rn <= {pool}), ",
        "pr AS (SELECT a.query_id, a.vec_id AS a, b.vec_id AS b, "
        " round(list_cosine_similarity(a.v, b.v), 6) AS sim "
        " FROM cand a JOIN cand b ON a.query_id = b.query_id "
        " AND a.vec_id <> b.vec_id), ",
        "sel1 AS (SELECT query_id, vec_id, rel, 1 AS step, 0.0 AS ms FROM ("
        " SELECT *, row_number() OVER (PARTITION BY query_id "
        "  ORDER BY rel DESC, vec_id) AS rn FROM cand) WHERE rn = 1)",
    ]
    for t in range(2, k + 1):
        parts.append(
            f", m{t} AS (SELECT c.query_id, c.vec_id, c.rel, max(p.sim) AS ms "
            f" FROM cand c "
            f" JOIN pr p ON p.query_id = c.query_id AND p.a = c.vec_id "
            f" JOIN sel{t - 1} s ON s.query_id = p.query_id AND s.vec_id = p.b "
            f" LEFT JOIN sel{t - 1} x ON x.query_id = c.query_id "
            f"  AND x.vec_id = c.vec_id "
            f" WHERE x.vec_id IS NULL GROUP BY 1, 2, 3), "
            f"pick{t} AS (SELECT query_id, vec_id, rel, {t} AS step, ms FROM ("
            f" SELECT *, row_number() OVER (PARTITION BY query_id "
            f"  ORDER BY 0.5 * rel - 0.5 * ms DESC, vec_id) AS rn FROM m{t}) "
            f" WHERE rn = 1), "
            f"sel{t} AS (SELECT * FROM sel{t - 1} UNION ALL "
            f" SELECT query_id, vec_id, rel, step, ms FROM pick{t})"
        )
    parts.append(
        f" SELECT query_id, CAST(step AS INTEGER) AS step, vec_id, "
        f"rel AS relevance, ms AS max_sim_prev FROM sel{k}"
    )
    return "".join(parts)


register(
    "ns_sim_rrf_fusion",
    # queries vec_id < 6, k=10, rrf_k=60
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, v AS qv FROM d WHERE vec_id < 6), "
    "s AS (SELECT query_id, d.vec_id, "
    " round(list_cosine_similarity(d.v, qv), 6) AS cos_sim, "
    " round(list_dot_product(d.v, qv), 6) AS dot_score "
    " FROM d, q WHERE d.vec_id <> query_id), "
    "r AS (SELECT query_id, vec_id, "
    " CAST(row_number() OVER (PARTITION BY query_id "
    "   ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank_cos, "
    " CAST(row_number() OVER (PARTITION BY query_id "
    "   ORDER BY dot_score DESC, vec_id) AS INTEGER) AS rank_dot "
    " FROM s), "
    "f AS (SELECT *, round(1.0 / (60 + rank_cos) "
    "   + 1.0 / (60 + rank_dot), 6) AS rrf_score FROM r) "
    "SELECT * FROM (SELECT query_id, vec_id, rank_cos, rank_dot, "
    " rrf_score, CAST(row_number() OVER (PARTITION BY query_id "
    "  ORDER BY rrf_score DESC, vec_id) AS INTEGER) AS fused_rank FROM f) "
    "WHERE fused_rank <= 10",
    desc=(
        "Reciprocal-rank fusion (RRF, k=60) of the cosine and "
        "dot-product rankers per query — the hybrid-retrieval merge "
        "for rankers with incomparable raw scores; fused top-10 with "
        "both source ranks. Integer ranks from 6-decimal-pinned "
        "scores, so the fusion is bit-identical on any engine; one "
        "corpus scan scores both rankers, three windows share one "
        "query_id exchange."
    ),
)(
    lambda spark, sf_dir: similarity.rrf_fusion(
        _t(spark, sf_dir, "embeddings"), query_ids=list(range(6)), k=10
    )
)


register(
    "ns_sim_mmr_rerank",
    _mmr_sql(n_queries=4, k=5, pool=12),
    desc=(
        "Maximal-marginal-relevance rerank: per query, greedy-select "
        "5 of the exact-cosine top-12 candidates maximizing "
        "0.5*rel - 0.5*max_sim_to_selected — the diversity pass "
        "between ANN retrieval and the prompt. Distributed pool + "
        "pairwise sims; the bounded greedy runs per query inside "
        "applyInPandas (a million queries rerank in parallel); the "
        "oracle unrolls the same 5 stages in SQL on the same pinned "
        "6-decimal inputs."
    ),
)(
    lambda spark, sf_dir: similarity.mmr_rerank(
        _t(spark, sf_dir, "embeddings"),
        query_ids=list(range(4)), k=5, pool=12, lam=0.5,
    )
)


register(
    "ns_quality_fleiss_kappa",
    # items = event_id % 311, ratings = event_type, n_raters=5
    "WITH r AS (SELECT event_id % 311 AS item, event_type AS label, "
    " row_number() OVER (PARTITION BY event_id % 311 ORDER BY event_id) "
    "  AS rn FROM events), "
    "t AS (SELECT item, label FROM r WHERE rn <= 5), "
    "pi AS (SELECT item, count(*) AS n FROM t GROUP BY 1), "
    "kept AS (SELECT item FROM pi WHERE n = 5), "
    "dr AS (SELECT CAST(count(*) AS BIGINT) AS n_items_dropped "
    "       FROM pi WHERE n < 5), "
    "nij AS (SELECT t.item, t.label, CAST(count(*) AS BIGINT) AS nij "
    "        FROM t JOIN kept USING (item) GROUP BY 1, 2), "
    "it AS (SELECT CAST(count(DISTINCT item) AS BIGINT) AS n_items, "
    "        CAST(SUM(nij * nij) AS BIGINT) AS s2 FROM nij), "
    "cj AS (SELECT label, SUM(nij) AS cj FROM nij GROUP BY 1), "
    "ct AS (SELECT CAST(count(*) AS INTEGER) AS n_categories, "
    "        CAST(SUM(cj * cj) AS BIGINT) AS c2 FROM cj) "
    "SELECT n_items, CAST(5 AS INTEGER) AS n_raters, n_categories, "
    " n_items_dropped, "
    " round((s2 - n_items * 5) / CAST(n_items * 5 * 4 AS DOUBLE), 6) "
    "  AS p_bar, "
    " round(c2 / CAST((n_items * 5) * (n_items * 5) AS DOUBLE), 6) AS p_e, "
    " round(((s2 - n_items * 5) / CAST(n_items * 5 * 4 AS DOUBLE) "
    "   - c2 / CAST((n_items * 5) * (n_items * 5) AS DOUBLE)) "
    "  / (1.0 - c2 / CAST((n_items * 5) * (n_items * 5) AS DOUBLE)), 6) "
    "  AS kappa "
    "FROM it CROSS JOIN ct CROSS JOIN dr",
    desc=(
        "Fleiss' kappa inter-annotator agreement over a derived "
        "5-ratings-per-item batch (items = event_id mod 311, "
        "categories = event_type): chance-corrected P-bar vs P-e — "
        "the labels-are-real gate before majority-vote aggregation. "
        "Every sufficient statistic is an exact integer; kappa is one "
        "double division, bit-identical on any engine."
    ),
)(
    lambda spark, sf_dir: stats.fleiss_kappa(
        _t(spark, sf_dir, "events").select(
            (F.col("event_id") % 311).alias("item"),
            F.col("event_type").alias("label"),
            F.col("event_id").alias("ord"),
        ),
        item_col="item", label_col="label", n_raters=5, order_col="ord",
    )
)


register(
    "ns_classify_prf",
    # test_fraction=0.2, salt='prf' — replicate sampling.hash_draw,
    # then per-class precision/recall/F1 over the confusion matrix
    "WITH sp AS (SELECT vec_id, label, embedding, "
    " ('0x' || substr(md5('prf|' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT "
    "   % 1000000 < 200000 AS is_test FROM embeddings), "
    "e AS (SELECT vec_id, label, is_test, unnest(embedding) AS val, "
    "      generate_subscripts(embedding, 1) AS i FROM sp), "
    "cent AS (SELECT label AS predicted, i, "
    " CAST(round(CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) "
    "      AS DECIMAL(12,6)) AS c "
    " FROM e WHERE NOT is_test GROUP BY 1, 2), "
    "cn AS (SELECT predicted, SUM(c * c) AS c2 FROM cent GROUP BY 1), "
    "dots AS (SELECT vec_id, label, is_test, predicted, "
    "  SUM(CAST(val AS DECIMAL(20,10)) * c) AS dot "
    " FROM e JOIN cent USING (i) GROUP BY 1, 2, 3, 4), "
    "best AS (SELECT vec_id, label, is_test, predicted, "
    "  row_number() OVER (PARTITION BY vec_id ORDER BY c2 - 2 * dot, predicted) AS rn "
    " FROM dots JOIN cn USING (predicted)), "
    "conf AS (SELECT CASE WHEN is_test THEN 'test' ELSE 'train' END AS slice, "
    " label, predicted, CAST(count(*) AS BIGINT) AS n "
    " FROM best WHERE rn = 1 GROUP BY 1, 2, 3), "
    "lab AS (SELECT slice, label AS cls, SUM(n) AS n_true FROM conf GROUP BY 1, 2), "
    "pred AS (SELECT slice, predicted AS cls, SUM(n) AS n_pred FROM conf GROUP BY 1, 2), "
    "tp AS (SELECT slice, label AS cls, SUM(n) AS tp FROM conf "
    "       WHERE label = predicted GROUP BY 1, 2), "
    "b AS (SELECT COALESCE(l.slice, p.slice) AS slice, "
    "       COALESCE(l.cls, p.cls) AS cls, "
    "       COALESCE(l.n_true, 0) AS n_true, COALESCE(p.n_pred, 0) AS n_pred "
    "      FROM lab l FULL JOIN pred p ON l.slice = p.slice AND l.cls = p.cls) "
    "SELECT b.slice, b.cls, CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp, "
    " CAST(b.n_pred AS BIGINT) AS n_pred, CAST(b.n_true AS BIGINT) AS n_true, "
    " CASE WHEN b.n_pred > 0 "
    "  THEN round(COALESCE(tp.tp, 0) / CAST(b.n_pred AS DOUBLE), 6) "
    "  ELSE 0.0 END AS \"precision\", "
    " CASE WHEN b.n_true > 0 "
    "  THEN round(COALESCE(tp.tp, 0) / CAST(b.n_true AS DOUBLE), 6) "
    "  ELSE 0.0 END AS recall, "
    " CASE WHEN b.n_pred + b.n_true > 0 "
    "  THEN round(2 * COALESCE(tp.tp, 0) / CAST(b.n_pred + b.n_true AS DOUBLE), 6) "
    "  ELSE 0.0 END AS f1 "
    "FROM b LEFT JOIN tp ON tp.slice = b.slice AND tp.cls = b.cls",
    desc=(
        "Per-class precision/recall/F1 over the nearest-centroid "
        "confusion matrix, both slices — the class-level read the "
        "aggregate accuracy hides (a dropped minority class is a "
        "recall row here). Counts are the decimal-exact confusion "
        "cells; P, R and F1=2tp/(n_pred+n_true) are single double "
        "divisions of BIGINTs, 0.0 on empty denominators."
    ),
)(
    lambda spark, sf_dir: similarity.classifier_prf(
        _t(spark, sf_dir, "embeddings"), test_fraction=0.2, salt="prf"
    )
)
