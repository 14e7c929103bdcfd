"""Round-8 fifth-session registrations (part 2): winnowing document
fingerprints (the MOSS algorithm — the missing member of the dedup
family between stride-sampled substring spans and the full shingle
index), the nearest-centroid classifier trained on-cluster over the
labeled embeddings (decimal-exact end to end, so even the confusion
matrix has an exact SQL oracle), and the pairwise Jensen-Shannon
divergence map between per-source unigram distributions (the
distribution-level twin of the embedding centroid-similarity map).
Registered into the driver window by the round-8 rotation; also
covered by the registry-wide CORRECTNESS_LOCAL regeneration.
"""

from __future__ import annotations

from .benchqueries import _t, register
from .operators import corpus, dedup, similarity

register(
    "ns_dedup_winnowing",
    # k=4-word grams, window w=5, max_df=100, overlap >= 0.5
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "g AS (SELECT doc_id, i, "
    " ('0x' || substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 15))::BIGINT AS h "
    " FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 2, 1))) AS i "
    "       FROM w WHERE len(ws) >= 8)), "
    "fd AS (SELECT doc_id, fp FROM ("
    "        SELECT doc_id, i, min(h) OVER (PARTITION BY doc_id ORDER BY i "
    "          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS fp FROM g) "
    "       WHERE i >= 5 GROUP BY doc_id, fp), "
    "kept AS (SELECT doc_id, fp FROM ("
    "          SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS dfc FROM fd) "
    "         WHERE dfc <= 100), "
    "sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1), "
    "pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "        CAST(count(*) AS BIGINT) AS shared_fps "
    "       FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id "
    "       GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, shared_fps, "
    " round(shared_fps / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) AS overlap "
    "FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id "
    "JOIN sz sb ON pr.doc_b = sb.doc_id "
    "WHERE round(shared_fps / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) >= 0.5",
    desc=(
        "Winnowing (MOSS) fingerprint dedup: per-doc window-min of "
        "4-gram hashes (w=5, ~2/(w+1) density with the shared-substring "
        "guarantee), then doc pairs ranked by containment overlap of "
        "fingerprint sets; fingerprints in >100 docs dropped first — "
        "the boilerplate guard that bounds the self-join fan-out."
    ),
)(
    lambda spark, sf_dir: dedup.winnow_shared_pairs(
        _t(spark, sf_dir, "documents"), k=4, w=5, max_df=100, threshold=0.5
    )
)

register(
    "ns_classify_nearest_centroid",
    # test_fraction=0.2, salt='nc' — replicate sampling.hash_draw
    "WITH sp AS (SELECT vec_id, label, embedding, "
    " ('0x' || substr(md5('nc|' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT "
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
    " FROM dots JOIN cn USING (predicted)) "
    "SELECT CASE WHEN is_test THEN 'test' ELSE 'train' END AS slice, "
    " label, predicted, CAST(count(*) AS BIGINT) AS n_vecs "
    "FROM best WHERE rn = 1 GROUP BY 1, 2, 3",
    desc=(
        "Nearest-centroid classifier as a label-separability audit: "
        "md5 hash split, decimal-exact per-label centroids from the "
        "train slice, argmin squared-Euclidean assignment of BOTH "
        "slices (pure DECIMAL |c|^2 - 2 t.c, label tiebreak), per-"
        "slice confusion matrix out — the resubstitution-vs-held-out "
        "gap is the are-my-labels-real check before GPU spend."
    ),
)(
    lambda spark, sf_dir: similarity.nearest_centroid_classifier(
        _t(spark, sf_dir, "embeddings"), test_fraction=0.2, salt="nc"
    )
)

register(
    "ns_corpus_js_divergence",
    "WITH t AS (SELECT source AS g, unnest(string_split(text, ' ')) AS w "
    "           FROM documents), "
    "c AS (SELECT g, w, count(*) AS c FROM t GROUP BY 1, 2), "
    "n AS (SELECT g, sum(c) AS n FROM c GROUP BY 1), "
    "p AS (SELECT g, w, CAST(c AS DOUBLE) / n AS p FROM c JOIN n USING (g)), "
    "i AS (SELECT a.g AS source_a, b.g AS source_b, "
    "       CAST(count(*) AS BIGINT) AS n_shared_words, "
    "       sum(a.p * ln(2.0 * a.p / (a.p + b.p)) "
    "           + b.p * ln(2.0 * b.p / (a.p + b.p))) AS s, "
    "       sum(a.p) AS pin, sum(b.p) AS qin "
    "      FROM p a JOIN p b ON a.w = b.w AND a.g < b.g GROUP BY 1, 2) "
    "SELECT source_a, source_b, n_shared_words, "
    " round(0.5 * (s + (1.0 - pin) * ln(2.0) + (1.0 - qin) * ln(2.0)), 6) "
    "   AS js_divergence FROM i",
    desc=(
        "Pairwise Jensen-Shannon divergence between per-source unigram "
        "distributions — which dumps say the same things, read before "
        "mix weights; the union-of-vocab sum folds into "
        "intersection-only join terms plus closed-form one-sided mass."
    ),
)(
    lambda spark, sf_dir: corpus.js_divergence_by_group(
        _t(spark, sf_dir, "documents"), group_col="source"
    )
)
