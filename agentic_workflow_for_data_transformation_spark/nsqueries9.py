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
from .operators import linalg, profile, quality, similarity, stats, text


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


register(
    "ns_quality_majority_vote",
    # items = event_id % 311, labels = event_type (the same derived
    # annotation batch ns_quality_fleiss_kappa gates)
    "WITH v AS (SELECT event_id % 311 AS item, event_type AS label, "
    " CAST(count(*) AS BIGINT) AS votes FROM events GROUP BY 1, 2), "
    "r AS (SELECT item, label, votes, "
    " row_number() OVER (PARTITION BY item "
    "  ORDER BY votes DESC, label ASC NULLS FIRST) AS rn, "
    " lead(votes) OVER (PARTITION BY item "
    "  ORDER BY votes DESC, label ASC NULLS FIRST) AS votes2, "
    " SUM(votes) OVER (PARTITION BY item) AS n_ratings FROM v) "
    "SELECT item, label AS majority_label, "
    " CAST(n_ratings AS BIGINT) AS n_ratings, votes AS n_votes, "
    " round(votes / CAST(n_ratings AS DOUBLE), 6) AS vote_share, "
    " CAST(votes - COALESCE(votes2, 0) AS BIGINT) AS margin, "
    " COALESCE(votes2, -1) = votes AS is_tie "
    "FROM r WHERE rn = 1",
    desc=(
        "Majority-vote label aggregation over the derived annotation "
        "batch — per item the winning label with total ratings, vote "
        "share, runner-up margin, and a tie flag (ties break to the "
        "smaller label, flagged). The step after the Fleiss-kappa "
        "agreement gate; one hash aggregate plus one item-partitioned "
        "window, integer-exact except the rounded share."
    ),
)(
    lambda spark, sf_dir: quality.majority_vote(
        _t(spark, sf_dir, "events").select(
            (F.col("event_id") % 311).alias("item"),
            F.col("event_type").alias("label"),
        ),
        item_col="item", label_col="label",
    )
)


def _sweep_sql(n_bins: int = 10) -> str:
    """Threshold-sweep oracle: the ns_text_quality score formula term
    for term, then one 3*n_bins-column conditional aggregate and a
    UNION ALL arm per threshold (the SQL twin of Spark's stack)."""
    heads = ", ".join(
        f"SUM(CASE WHEN q >= CAST({i / n_bins!r} AS DOUBLE) THEN 1 ELSE 0 END) AS d{i}, "
        f"COALESCE(SUM(CASE WHEN q >= CAST({i / n_bins!r} AS DOUBLE) THEN n_words END), 0) AS w{i}, "
        f"COALESCE(SUM(CASE WHEN q >= CAST({i / n_bins!r} AS DOUBLE) "
        f" THEN CAST(q AS DECIMAL(8,6)) END), 0) AS q{i}"
        for i in range(n_bins)
    )
    arms = " UNION ALL ".join(
        f"SELECT CAST({i / n_bins!r} AS DOUBLE) AS threshold, "
        f"CAST(d{i} AS BIGINT) AS n_docs_kept, "
        f"CAST(w{i} AS BIGINT) AS n_words_kept, "
        f"CASE WHEN d{i} > 0 THEN round(CAST(q{i} AS DOUBLE) / d{i}, 6) "
        f" ELSE 0.0 END AS mean_quality_kept, "
        f"CASE WHEN d0 > 0 THEN round(d{i} / CAST(d0 AS DOUBLE), 6) "
        f" ELSE 0.0 END AS share_docs_kept FROM a"
        for i in range(n_bins)
    )
    return (
        "WITH t AS (SELECT text, length(text) AS n_chars, "
        " string_split(text, ' ') AS ws FROM documents), "
        "m AS (SELECT n_chars, len(ws) AS n_words, "
        " len(list_filter(ws, w -> lower(w) IN ('the','a','of','and','to'))) "
        "  AS stop_hits, "
        " len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS nonalnum FROM t), "
        "s AS (SELECT CAST(n_words AS BIGINT) AS n_words, "
        " round(least(1.0, n_words / 50.0) * 0.5 "
        "  + (1.0 - least(1.0, round(nonalnum / greatest(n_chars, 1), 6) * 10)) * 0.3 "
        "  + least(1.0, round(stop_hits / n_words, 6) * 5) * 0.2, 6) AS q "
        " FROM m), "
        f"a AS (SELECT {heads} FROM s) {arms}"
    )


register(
    "ns_quality_threshold_sweep",
    _sweep_sql(10),
    desc=(
        "Quality-threshold tradeoff curve: for each cutoff t in "
        "{0,.1,...,.9}, the documents/words surviving quality_score "
        ">= t and the surviving mean quality — the table that PICKS "
        "the filter cutoff instead of guessing it. All thresholds "
        "compile into ONE conditional aggregate (one scan, one 1-row "
        "exchange, no window), report rows exploded with stack; "
        "counts integer, quality sums DECIMAL(8,6)-pinned."
    ),
)(
    lambda spark, sf_dir: text.quality_threshold_sweep(
        _t(spark, sf_dir, "documents"), n_bins=10
    )
)


def _conformal_sql() -> str:
    """Split-conformal oracle: the quality-score formula term for
    term, the md5 hash split, quantile_cont thresholds over the
    calibration slice (== Spark percentile, the winsorize precedent),
    then one UNION ALL arm per coverage level."""
    levels = [(0.8, 0.2, 80), (0.9, 0.1, 90), (0.95, 0.05, 95)]
    ts = ", ".join(
        f"round(quantile_cont(CASE WHEN cal THEN q END, {p!r}), 6) AS t{tag}"
        for _, p, tag in levels
    )
    ks = ", ".join(
        f"CAST(SUM(CASE WHEN q >= t{tag} THEN 1 ELSE 0 END) AS BIGINT) AS k{tag}"
        for _, _, tag in levels
    )
    arms = " UNION ALL ".join(
        f"SELECT CAST({c!r} AS DOUBLE) AS coverage, n_cal, "
        f"t{tag} AS threshold, n_test, k{tag} AS n_test_kept, "
        f"CASE WHEN n_test > 0 THEN round(k{tag} / CAST(n_test AS DOUBLE), 6) "
        f" ELSE 0.0 END AS observed_coverage FROM one, cov"
        for c, _, tag in levels
    )
    return (
        "WITH t AS (SELECT doc_id, text, length(text) AS n_chars, "
        " string_split(text, ' ') AS ws FROM documents), "
        "m AS (SELECT doc_id, n_chars, len(ws) AS n_words, "
        " len(list_filter(ws, w -> lower(w) IN ('the','a','of','and','to'))) "
        "  AS stop_hits, "
        " len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS nonalnum FROM t), "
        "s AS (SELECT doc_id, "
        " round(least(1.0, n_words / 50.0) * 0.5 "
        "  + (1.0 - least(1.0, round(nonalnum / greatest(n_chars, 1), 6) * 10)) * 0.3 "
        "  + least(1.0, round(stop_hits / n_words, 6) * 5) * 0.2, 6) AS q "
        " FROM m), "
        "b AS (SELECT doc_id, q, "
        " ('0x' || substr(md5('conf|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT "
        "  % 1000000 < 500000 AS cal FROM s), "
        "one AS (SELECT "
        " CAST(SUM(CASE WHEN cal THEN 1 ELSE 0 END) AS BIGINT) AS n_cal, "
        " CAST(SUM(CASE WHEN NOT cal THEN 1 ELSE 0 END) AS BIGINT) AS n_test, "
        f" {ts} FROM b), "
        f"cov AS (SELECT {ks} FROM b, one WHERE NOT cal) "
        f"{arms}"
    )


register(
    "ns_quality_conformal",
    _conformal_sql(),
    desc=(
        "Split-conformal quality-filter calibration: md5 hash split "
        "into calibration/test, each coverage level's threshold at "
        "the (1-coverage) exact quantile of calibration quality "
        "scores, observed test coverage reported beside the target — "
        "the cutoff with a guarantee instead of a guess. One "
        "conditional aggregate for all thresholds, one broadcast-back "
        "coverage pass; two scans total for any number of levels."
    ),
)(
    lambda spark, sf_dir: quality.conformal_quality_thresholds(
        _t(spark, sf_dir, "documents")
    )
)


register(
    "ns_quality_kripp_alpha",
    # same derived annotation batch as fleiss/majority, but NO
    # trimming — alpha handles varying ratings-per-item natively
    "WITH nij AS (SELECT event_id % 311 AS item, event_type AS label, "
    " CAST(count(*) AS BIGINT) AS nij FROM events GROUP BY 1, 2), "
    "pi AS (SELECT item, CAST(SUM(nij) AS BIGINT) AS ni, "
    " CAST(SUM(nij * (nij - 1)) AS BIGINT) AS ai FROM nij GROUP BY 1), "
    "pa AS (SELECT * FROM pi WHERE ni >= 2), "
    "dr AS (SELECT CAST(count(*) AS BIGINT) AS n_items_dropped "
    "       FROM pi WHERE ni < 2), "
    "occ AS (SELECT CAST(count(*) AS BIGINT) AS n_items, "
    " SUM(CAST(round(ai / CAST(ni - 1 AS DOUBLE), 12) AS DECIMAL(24,12))) "
    "  AS socc FROM pa), "
    "mc AS (SELECT label, SUM(nij) AS nc FROM nij "
    "       JOIN pa USING (item) GROUP BY 1), "
    "marg AS (SELECT CAST(count(*) AS INTEGER) AS n_categories, "
    " CAST(SUM(nc) AS BIGINT) AS n_ratings, "
    " CAST(SUM(nc * nc) AS BIGINT) AS nc2 FROM mc) "
    "SELECT n_items, n_items_dropped, n_ratings, n_categories, "
    " round(n_ratings - CAST(socc AS DOUBLE), 6) AS d_observed, "
    " round((CAST(n_ratings AS DOUBLE) * n_ratings - nc2) "
    "   / (n_ratings - 1.0), 6) AS d_expected, "
    " round(1.0 - (n_ratings - CAST(socc AS DOUBLE)) "
    "   / ((CAST(n_ratings AS DOUBLE) * n_ratings - nc2) "
    "      / (n_ratings - 1.0)), 6) AS alpha "
    "FROM occ CROSS JOIN marg CROSS JOIN dr",
    desc=(
        "Krippendorff's alpha (nominal) over the derived annotation "
        "batch with NO per-item trimming — the agreement gate when "
        "ratings-per-item vary (unlike Fleiss' fixed-n): coincidence-"
        "matrix D_o vs D_e from exact integer marginals, per-item "
        "quotients pinned DECIMAL(24,12) so the sum is partition-order "
        "exact. One hash aggregate, one fold, two 1-row aggregates."
    ),
)(
    lambda spark, sf_dir: stats.krippendorff_alpha(
        _t(spark, sf_dir, "events").select(
            (F.col("event_id") % 311).alias("item"),
            F.col("event_type").alias("label"),
        ),
        item_col="item", label_col="label",
    )
)


register(
    "x_ldiversity",
    # quasi user_id, sensitive event_type, l=3
    "WITH g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
    " CAST(count(DISTINCT event_type) AS BIGINT) AS d "
    " FROM events GROUP BY 1) "
    "SELECT 'user_id' AS quasi, 'event_type' AS sensitive, "
    " CAST(3 AS INTEGER) AS l, "
    " CAST(SUM(n) AS BIGINT) AS n_rows, "
    " CAST(count(*) AS BIGINT) AS n_groups, "
    " CAST(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT) "
    "   AS n_violating_groups, "
    " CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT) "
    "   AS n_rows_at_risk, "
    " round(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) "
    "   / CAST(SUM(n) AS DOUBLE), 6) AS risk_ratio, "
    " CAST(min(d) AS BIGINT) AS min_diversity "
    "FROM g",
    desc=(
        "l-diversity privacy audit — the homogeneity-attack gap "
        "k-anonymity leaves open: quasi-identifier groups whose "
        "sensitive column takes fewer than l distinct values, and the "
        "rows they expose, folded to one report row. One hash "
        "aggregate on the quasi key (count + count-distinct share the "
        "exchange), integer-exact except the rounded ratio."
    ),
)(
    lambda spark, sf_dir: quality.l_diversity_audit(
        _t(spark, sf_dir, "events"), ["user_id"], "event_type", l=3
    )
)


def _benford_sql() -> str:
    from .operators.stats import BENFORD_EXPECTED

    case = " ".join(
        f"WHEN '{d}' THEN {e!r}" for d, e in BENFORD_EXPECTED.items()
    )
    return (
        "WITH s AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR) "
        "  AS vs FROM events WHERE value IS NOT NULL), "
        "d AS (SELECT substr(regexp_replace("
        "  replace(replace(vs, '.', ''), '-', ''), '^0+', ''), 1, 1) "
        "  AS digit FROM s), "
        "c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d "
        "      WHERE digit <> '' GROUP BY 1), "
        "t AS (SELECT SUM(n_obs) AS tot FROM c) "
        "SELECT digit, n_obs, "
        " round(n_obs / CAST(tot AS DOUBLE), 6) AS share, "
        f" (CASE digit {case} END) AS benford_expected, "
        f" round(n_obs / CAST(tot AS DOUBLE) - (CASE digit {case} END), 6) "
        "  AS excess "
        "FROM c CROSS JOIN t"
    )


register(
    "x_benford",
    _benford_sql(),
    desc=(
        "Benford's-law first-digit audit over the value column — the "
        "data-forensics screen for fabricated/capped numerics: per "
        "leading digit the observed share vs the log10(1+1/d) "
        "expectation and the excess. Digits come from the DECIMAL "
        "string rendering (identical cross-engine), never float "
        "log10; one scan, one 9-group aggregate, broadcast total."
    ),
)(
    lambda spark, sf_dir: stats.benford_audit(
        _t(spark, sf_dir, "events"), col="value"
    )
)


register(
    "ns_sim_map",
    # queries vec_id < 8, k=10 — mirrors the engine: pinned cosines,
    # rank window, cumulative relevant count, DECIMAL(18,12) AP sum,
    # ideal = min(same-label corpus count - 1, k)
    "WITH d AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv "
    "      FROM d WHERE vec_id < 8), "
    "lc AS (SELECT label, CAST(count(*) AS BIGINT) AS nlab "
    "       FROM embeddings GROUP BY 1), "
    "s AS (SELECT query_id, qlabel, d.vec_id, d.label, "
    " round(list_cosine_similarity(d.v, qv), 6) AS cos_sim "
    " FROM d, q WHERE d.vec_id <> query_id), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
    " ORDER BY cos_sim DESC, vec_id) AS rank FROM s), "
    "t AS (SELECT *, CAST(label = qlabel AS INTEGER) AS rel, "
    " SUM(CAST(label = qlabel AS INTEGER)) OVER (PARTITION BY query_id "
    "  ORDER BY cos_sim DESC, vec_id "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_rel_cum "
    " FROM r WHERE rank <= 10), "
    "g AS (SELECT query_id, qlabel, "
    " CAST(SUM(rel) AS INTEGER) AS n_rel_topk, "
    " COALESCE(SUM(CASE WHEN rel = 1 THEN "
    "   CAST(round(n_rel_cum / CAST(rank AS DOUBLE), 12) "
    "     AS DECIMAL(18,12)) END), 0) AS psum "
    " FROM t GROUP BY 1, 2) "
    "SELECT query_id, n_rel_topk, "
    " CAST(least(nlab - 1, 10) AS INTEGER) AS ideal_n, "
    " CASE WHEN least(nlab - 1, 10) > 0 THEN "
    "  round(CAST(psum AS DOUBLE) / least(nlab - 1, 10), 6) "
    "  ELSE 0.0 END AS ap_at_k "
    "FROM g JOIN lc ON g.qlabel = lc.label",
    desc=(
        "MAP@10 retrieval harness per query — average precision over "
        "the relevant ranks normalized by the best achievable count "
        "(same-label corpus rows capped at k); the order-sensitive "
        "metric between MRR and NDCG. Integer ranks from pinned "
        "cosines, precision terms DECIMAL(18,12)-summed; query side "
        "broadcast, corpus scanned once, two windows share one "
        "exchange."
    ),
)(
    lambda spark, sf_dir: similarity.map_at_k(
        _t(spark, sf_dir, "embeddings"), query_ids=list(range(8)), k=10
    )
)


def _corr_sql(cols: list[str]) -> str:
    # delegate to the sqlgen 'correlate' renderer so the oracle formula
    # (pairwise-complete masking, DECIMAL(24,6) product widening for
    # DuckDB's int64 DECIMAL multiply) lives in exactly one place
    from .plans.sqlgen import spec_to_sql

    return spec_to_sql(
        {"ops": [{"op": "correlate", "cols": list(cols)}]}, "lineitem"
    )


register(
    "x_corr_matrix",
    _corr_sql(["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
    desc=(
        "Pairwise Pearson correlation matrix over the lineitem "
        "measures — which 'independent' features are the same signal "
        "twice, read after per-column profiling. All d + d(d+1)/2 "
        "moments pin DECIMAL inside ONE global aggregate (single "
        "scan), pair rows exploded with stack; r closed-form in "
        "doubles from exact sums, NULL on zero variance."
    ),
)(
    lambda spark, sf_dir: profile.correlation_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
)


# --- round-9: all-but-the-top common-direction audit ------------------------


def _abtt_sql(n_iter: int = 6) -> str:
    # delegate to the sqlgen 'common_direction' renderer so the
    # unrolled power-iteration oracle lives in exactly one place (the
    # NL twin p101 renders the identical chain)
    from .plans.sqlgen import spec_to_sql

    return spec_to_sql(
        {"ops": [{"op": "common_direction", "n_iter": n_iter}]},
        "embeddings",
    )


register(
    "ns_embed_common_direction",
    _abtt_sql(6),
    desc=(
        "All-but-the-top audit (Mu & Viswanath, ICLR 2018): per "
        "vector, the projection onto the corpus TOP principal "
        "component (found by 6 fixed power-iteration rounds run "
        "IN-PLAN over the integer-exact Gram statistics — no numpy "
        "eigh, so even the eigenvector is hash-checked) plus the "
        "centered norm and projection ratio — exactly what the "
        "standard anisotropy-correction step subtracts. Two corpus "
        "scans total (Gram stats, per-row aggregates); the iteration "
        "itself touches only the d*d covariance frame."
    ),
)(
    lambda spark, sf_dir: linalg.common_direction_audit(
        _t(spark, sf_dir, "embeddings")
    )
)
