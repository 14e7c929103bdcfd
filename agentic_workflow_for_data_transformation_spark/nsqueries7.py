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

from pyspark.sql import functions as F

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
        "the boilerplate guard that bounds the self-join fan-out. "
        "Pair LISTING is output-bound on heavily duplicated corpora "
        "(BENCH_SCALE); the keep-first apply (p84) is the linear path."
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

register(
    "ns_corpus_datacard",
    "WITH nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
    "  CAST(count(DISTINCT text) AS DOUBLE) AS ndt, "
    "  quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS p50, "
    "  quantile_cont(CAST(n_chars AS DOUBLE), 0.9) AS p90 FROM documents), "
    "tok AS (SELECT lang AS l, unnest(string_split(text, ' ')) AS w FROM documents), "
    "cnt AS (SELECT l, w, count(*) AS c FROM tok GROUP BY 1, 2), "
    "tt AS (SELECT CAST(sum(c) AS DOUBLE) AS n_tokens, "
    "  CAST(count(DISTINCT w) AS DOUBLE) AS ndw FROM cnt), "
    "lt AS (SELECT l, sum(c) AS n FROM cnt GROUP BY 1) "
    "SELECT 'corpus' AS section, 'all' AS \"key\", 'n_docs' AS metric, n_docs AS value FROM nd "
    "UNION ALL SELECT 'corpus', 'all', 'dup_text_ratio', round(1.0 - ndt / n_docs, 6) FROM nd "
    "UNION ALL SELECT 'length', 'all', 'p50_chars', round(p50, 6) FROM nd "
    "UNION ALL SELECT 'length', 'all', 'p90_chars', round(p90, 6) FROM nd "
    "UNION ALL SELECT 'corpus', 'all', 'n_tokens', n_tokens FROM tt "
    "UNION ALL SELECT 'corpus', 'all', 'distinct_words', ndw FROM tt "
    "UNION ALL SELECT 'lang', CAST(lang AS VARCHAR), 'doc_share', "
    "  round(count(*) / (SELECT n_docs FROM nd), 6) FROM documents GROUP BY lang "
    "UNION ALL SELECT 'source', CAST(source AS VARCHAR), 'doc_share', "
    "  round(count(*) / (SELECT n_docs FROM nd), 6) FROM documents GROUP BY source "
    "UNION ALL SELECT 'lang', CAST(l AS VARCHAR), 'unigram_entropy', "
    "  round(-sum((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))), 6) "
    "  FROM cnt JOIN lt USING (l) GROUP BY l",
    desc=(
        "One-call corpus DATACARD: long-format (section, key, metric, "
        "value) release datasheet — doc/token totals, exact dup-text "
        "ratio, exact length percentiles, per-lang/source doc shares, "
        "per-lang unigram entropy; diff two datacards and you have the "
        "release notes. Document sections are single-scan aggregates; "
        "token sections share one checkpointed (lang, word) count table."
    ),
)(
    lambda spark, sf_dir: corpus.corpus_datacard(
        _t(spark, sf_dir, "documents")
    )
)

register(
    "ns_sim_cluster_exemplars",
    # k=3 exemplars per label, trained on all rows
    "WITH e AS (SELECT vec_id, label, unnest(embedding) AS val, "
    "      generate_subscripts(embedding, 1) AS i FROM embeddings), "
    "cent AS (SELECT label AS predicted, i, "
    " CAST(round(CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) "
    "      AS DECIMAL(12,6)) AS c FROM e GROUP BY 1, 2), "
    "cn AS (SELECT predicted, SUM(c * c) AS c2 FROM cent GROUP BY 1), "
    "dots AS (SELECT vec_id, label, "
    "  SUM(CAST(val AS DECIMAL(20,10)) * c) AS dot, "
    "  SUM(CAST(val * val AS DECIMAL(20,10))) AS t2 "
    " FROM e JOIN cent ON e.i = cent.i AND e.label = cent.predicted "
    " GROUP BY 1, 2), "
    "r AS (SELECT vec_id, label, "
    "  CAST(t2 AS DECIMAL(30,12)) + CAST(c2 AS DECIMAL(30,12)) "
    "    - 2 * CAST(dot AS DECIMAL(30,12)) AS d2, "
    "  row_number() OVER (PARTITION BY label ORDER BY "
    "    CAST(t2 AS DECIMAL(30,12)) + CAST(c2 AS DECIMAL(30,12)) "
    "      - 2 * CAST(dot AS DECIMAL(30,12)), vec_id) AS rank "
    " FROM dots JOIN cn ON label = predicted) "
    "SELECT label, rank, vec_id, round(CAST(d2 AS DOUBLE), 6) AS d2 "
    "FROM r WHERE rank <= 3",
    desc=(
        "Cluster exemplars: the 3 most central vectors per label (pure-"
        "DECIMAL distance to the label's own centroid, id tiebreak) — "
        "what a curator eyeballs before merging, pruning, or naming a "
        "cluster; each (row, pos) joins only its OWN label's centroid "
        "row, fan-out 1."
    ),
)(
    lambda spark, sf_dir: similarity.cluster_exemplars(
        _t(spark, sf_dir, "embeddings"), k=3
    )
)

register(
    "ns_classify_label_margin",
    # k_flag=10 review queue; margins are pinned-decimal differences
    "WITH e AS (SELECT vec_id, label, unnest(embedding) AS val, "
    "      generate_subscripts(embedding, 1) AS i FROM embeddings), "
    "cent AS (SELECT label AS predicted, i, "
    " CAST(round(CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) "
    "      AS DECIMAL(12,6)) AS c FROM e GROUP BY 1, 2), "
    "cn AS (SELECT predicted, SUM(c * c) AS c2 FROM cent GROUP BY 1), "
    "dots AS (SELECT vec_id, label, predicted, "
    "  SUM(CAST(val AS DECIMAL(20,10)) * c) AS dot "
    " FROM e JOIN cent USING (i) GROUP BY 1, 2, 3), "
    "sc AS (SELECT vec_id, label, predicted, "
    "  CAST(c2 AS DECIMAL(30,12)) - 2 * CAST(dot AS DECIMAL(30,12)) AS pd2 "
    " FROM dots JOIN cn USING (predicted)), "
    "own AS (SELECT vec_id, pd2 AS own_d2 FROM sc WHERE label = predicted), "
    "oth AS (SELECT vec_id, label, predicted AS nearest_other, pd2 AS other_d2, "
    "  row_number() OVER (PARTITION BY vec_id ORDER BY pd2, predicted) AS rn "
    " FROM sc WHERE label <> predicted) "
    "SELECT o.vec_id AS vec_id, label, nearest_other, "
    " round(CAST(own_d2 - other_d2 AS DOUBLE), 6) AS margin "
    "FROM own w JOIN oth o ON w.vec_id = o.vec_id AND o.rn = 1 "
    "ORDER BY margin DESC, vec_id LIMIT 10",
    desc=(
        "Label-noise review queue (confident-learning shape): the 10 "
        "vectors whose own-label centroid is farthest beyond the "
        "nearest OTHER centroid (pinned-decimal margin, shared |t|^2 "
        "cancels) — what a curator re-labels first; broadcast model, "
        "label-count fan-out, one TakeOrdered."
    ),
)(
    lambda spark, sf_dir: similarity.label_margin_audit(
        _t(spark, sf_dir, "embeddings"), k_flag=10
    )
)

register(
    "ns_dedup_savings_by_source",
    "WITH r AS (SELECT doc_id AS _id, source, CAST(n_chars AS BIGINT) AS _len, "
    "  md5(text) AS _h FROM documents), "
    "k AS (SELECT _h, min(_id) AS _keep FROM r GROUP BY 1) "
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    " CAST(sum(CASE WHEN _id <> _keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs, "
    " CAST(sum(_len) AS BIGINT) AS chars_total, "
    " CAST(sum(CASE WHEN _id <> _keep THEN _len ELSE 0 END) AS BIGINT) AS chars_saved, "
    " round(sum(CASE WHEN _id <> _keep THEN _len ELSE 0 END) "
    "       / CAST(sum(_len) AS DOUBLE), 6) AS savings_ratio "
    "FROM r JOIN k USING (_h) GROUP BY source",
    desc=(
        "Dedup SAVINGS report: per source, documents and characters "
        "exact dedup removes (corpus-wide keeper = lowest id per md5 "
        "digest) — the storage business case; digests-only exchanges, "
        "source-cardinality output. Prices what dup_rate_by_source "
        "locates."
    ),
)(
    lambda spark, sf_dir: dedup.dedup_savings_by_source(
        _t(spark, sf_dir, "documents")
    )
)

register(
    "ns_dedup_cluster_sizes",
    "WITH g AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n_copies "
    "FROM documents GROUP BY 1) "
    "SELECT n_copies, CAST(count(*) AS BIGINT) AS n_groups, "
    " CAST(n_copies * count(*) AS BIGINT) AS n_docs, "
    " CAST((n_copies - 1) * count(*) AS BIGINT) AS n_removable "
    "FROM g GROUP BY n_copies",
    desc=(
        "Duplicate-cluster size HISTOGRAM: how many exact-duplicate "
        "groups exist at each copy count, the docs they hold, and the "
        "copies dedup would remove — the how-duplicated-is-my-corpus "
        "curve read next to the savings report; one digest aggregate "
        "then a histogram over group sizes (distinct-text cardinality, "
        "then copy-count cardinality — nothing corpus-sized shuffles "
        "twice)."
    ),
)(
    lambda spark, sf_dir: (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_copies"))
        .groupBy("n_copies")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .select(
            "n_copies",
            "n_groups",
            (F.col("n_copies") * F.col("n_groups")).cast("long").alias("n_docs"),
            ((F.col("n_copies") - F.lit(1)) * F.col("n_groups")).cast("long")
            .alias("n_removable"),
        )
    )
)
