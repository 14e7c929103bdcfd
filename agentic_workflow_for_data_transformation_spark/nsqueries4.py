"""Round-8 third-session registrations (registered inside the round-8
driver window via benchqueries._WINDOW): SemDeDup semantic
deduplication, the label-ground-truth retrieval harnesses (MRR@k /
precision@k, hard-negative mining), CCNet perplexity bucketing, and
incremental near-dup dedup against a persisted LSH bucket archive.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (parity with sibling modules)

from .benchqueries import _t, register
from .operators import similarity, text

# One unrolled deterministic Lloyd iteration (same algebra as the
# ns_kmeans_refined oracle in nsqueries2.py), but the final assignment
# CTE ``m`` keeps the vector so downstream pairwise stages can reuse
# it, and the centroid count auto-scales with the input
# (similarity.auto_cells — the oracle computes the identical
# greatest(8, ceil(n/512)) from count(*), so the sizing is portable).
_KMEANS1_M_CTES = (
    "d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "k AS (SELECT greatest(8, CAST(ceil(count(*) / 512.0) AS BIGINT)) AS kc FROM d), "
    "c0 AS (SELECT vec_id AS cell, v AS cv FROM d WHERE vec_id < (SELECT kc FROM k)), "
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
        "lower-id member — cell count auto-scales (similarity.auto_cells) "
        "so pair work stays ~n * cell, never global n^2."
    ),
)(
    lambda spark, sf_dir: similarity.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), n_centroids=None, threshold=0.3,
        n_iter=1
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


register(
    "ns_sim_hard_negatives",
    "WITH d AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    "a AS (SELECT vec_id AS anchor_id, label AS anchor_label, v AS av FROM d WHERE vec_id < 8), "
    "s AS (SELECT anchor_id, anchor_label, d.vec_id, d.label, "
    " round(list_cosine_similarity(d.v, av), 6) AS cos_sim FROM d, a "
    " WHERE d.label <> anchor_label), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id "
    " ORDER BY cos_sim DESC, vec_id) AS neg_rank FROM s) "
    "SELECT anchor_id, anchor_label, vec_id AS negative_id, "
    "label AS negative_label, cos_sim, CAST(neg_rank AS INTEGER) AS neg_rank "
    "FROM r WHERE neg_rank <= 5",
    desc=(
        "Hard-negative mining: per anchor, the 5 most cosine-similar "
        "DIFFERENT-label vectors (boundary negatives for contrastive "
        "training) — anchors broadcast, corpus scanned once; the bucketed "
        "kNN join is the every-anchor sibling at scale."
    ),
)(
    lambda spark, sf_dir: similarity.hard_negatives_per_anchor(
        _t(spark, sf_dir, "embeddings"), anchor_ids=list(range(8)), k=5
    )
)


register(
    "ns_text_perplexity_buckets",
    "WITH b AS (SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS w "
    " FROM documents), "
    "ref AS (SELECT w FROM b WHERE source = 'src0'), "
    "t AS (SELECT CAST(count(*) AS DOUBLE) AS _n, "
    " CAST(count(DISTINCT w) AS DOUBLE) AS _v FROM ref), "
    "vocab AS (SELECT w, count(*) AS _cnt FROM ref GROUP BY w), "
    "sc AS (SELECT doc_id, lang, -ln((coalesce(_cnt, 0) + 1) / (_n + _v)) AS nll "
    " FROM b LEFT JOIN vocab USING (w) CROSS JOIN t), "
    "pd AS (SELECT doc_id, lang, count(*) AS n_tokens, "
    " round(sum(nll) / count(*), 6) AS xent FROM sc GROUP BY 1, 2), "
    f"cuts AS (SELECT lang, quantile_cont(xent, {1.0 / 3.0!r}) AS q33, "
    f" quantile_cont(xent, {2.0 / 3.0!r}) AS q67 FROM pd GROUP BY lang) "
    "SELECT doc_id, lang, n_tokens, xent, "
    "CASE WHEN xent <= q33 THEN 'head' WHEN xent <= q67 THEN 'middle' "
    "ELSE 'tail' END AS ppl_bucket FROM pd JOIN cuts USING (lang)",
    desc=(
        "CCNet-style perplexity bucketing (arXiv:1911.00359): cross-entropy "
        "under an add-one unigram LM trained on the src0 reference slice, "
        "head/middle/tail tertiles per language via broadcast percentile "
        "cutoffs — no language-sized window sort."
    ),
)(
    lambda spark, sf_dir: text.perplexity_buckets(
        _t(spark, sf_dir, "documents"), ref_source="src0"
    )
)


def _reg_incremental_lsh():
    from pyspark.sql import functions as F

    from .nsqueries import _SHINGLE_CTE, _buckets_sql, _sig_sql
    from .operators import dedup

    def build(spark, sf_dir):
        docs = _t(spark, sf_dir, "documents")
        return dedup.incremental_neardup_new_docs(
            new=docs.filter(F.col("doc_id") % 5 == 0),
            archive=docs.filter(F.col("doc_id") % 5 != 0),
            threshold=0.5,
        )

    register(
        "ns_dedup_incremental_lsh",
        f"WITH {_SHINGLE_CTE}, {_sig_sql()}, {_buckets_sql()}, "
        "cand AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS arch_id FROM buckets x "
        " JOIN buckets y ON x.band_idx = y.band_idx AND x.band_key = y.band_key "
        " AND x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0), "
        "inter AS (SELECT a.doc_id AS new_id, b.doc_id AS arch_id, count(*) AS n_inter "
        " FROM e a JOIN e b ON a.s = b.s AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 "
        " GROUP BY 1, 2), "
        "sizes AS (SELECT doc_id, len(sh) AS sz FROM sh), "
        "matched AS (SELECT DISTINCT new_id FROM cand JOIN inter USING (new_id, arch_id) "
        " JOIN sizes sa ON new_id = sa.doc_id JOIN sizes sb ON arch_id = sb.doc_id "
        " WHERE round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 6) >= 0.5) "
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT new_id FROM matched)",
        desc=(
            "Incremental NEAR-dup ingest dedup (dedup."
            "incremental_neardup_new_docs): batch band keys equi-join the "
            "archive's LSH buckets, exact Jaccard verifies candidates with "
            "both sides id-restricted, survivors leave via one anti join — "
            "the fuzzy twin of the exact-digest incremental rung; "
            "write_lsh_archive persists the bucketed archive side."
        ),
    )(build)


_reg_incremental_lsh()


def _bpe_encode_sql(n_merges: int = 3) -> str:
    # train CTEs identical to nsqueries3._bpe_sql, but the symbol chain
    # keeps the word so the final fused form encodes the vocabulary;
    # per-doc counts join exploded words to the encoded vocab
    ctes = [
        "bw AS (SELECT w, count(*) AS wc FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "WHERE len(w) > 0 GROUP BY w)",
        "s0 AS (SELECT w, array_to_string(string_split(w, ''), ' ') AS s, wc FROM bw)",
    ]
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"p{r} AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM ("
            "SELECT unnest(list_transform(range(1, len(ws)), "
            "i -> ws[i] || ' ' || ws[i+1])) AS pair, wc "
            f"FROM (SELECT string_split(s, ' ') AS ws, wc FROM {prev})) "
            "GROUP BY pair)"
        )
        ctes.append(
            f"b{r} AS (SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{r} AS (SELECT w, trim(replace(replace("
            "' ' || replace(s, ' ', '  ') || ' ', "
            f"' ' || (SELECT replace(pair, ' ', '  ') FROM b{r}) || ' ', "
            f"' ' || (SELECT replace(pair, ' ', '') FROM b{r}) || ' '"
            f"), '  ', ' ')) AS s, wc FROM {prev})"
        )
    ctes.append(
        f"enc AS (SELECT w, len(string_split(s, ' ')) AS n_tok FROM s{n_merges})"
    )
    ctes.append(
        "dw AS (SELECT doc_id, w FROM (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS w FROM documents) WHERE len(w) > 0)"
    )
    return (
        f"WITH {', '.join(ctes)} "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens "
        "FROM dw JOIN enc USING (w) GROUP BY doc_id"
    )


register(
    "ns_text_bpe_encode",
    _bpe_encode_sql(3),
    desc=(
        "BPE encode (text.bpe_encode_token_counts): apply the 3 trained "
        "merges to the distinct vocabulary via the same boundary-doubled "
        "replace algebra, then count tokenizer tokens per document — the "
        "serving half of the BPE trainer; encode work is vocab-sized, "
        "per-doc counts via one broadcast word join."
    ),
)(
    lambda spark, sf_dir: text.bpe_encode_token_counts(
        _t(spark, sf_dir, "documents"), n_merges=3
    )
)


def _reg_leakage_audit():
    from .nsqueries import _VERIFIED_CTES
    from .operators import dedup
    from .operators.sampling import split_thresholds

    t_train, t_val = split_thresholds([90.0, 5.0, 5.0])
    draw = ("(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
            " % 1000000)")

    register(
        "ns_split_leakage_audit",
        f"WITH {_VERIFIED_CTES}, "
        "verified AS (SELECT c.doc_a, c.doc_b FROM cand c "
        " JOIN jac USING (doc_a, doc_b) WHERE jaccard >= 0.5), "
        "tags AS (SELECT doc_id, CASE "
        f" WHEN {draw} < {t_train} THEN 'train' "
        f" WHEN {draw} < {t_val} THEN 'val' "
        " ELSE 'test' END AS split FROM documents) "
        "SELECT least(ta.split, tb.split) AS split_a, "
        "greatest(ta.split, tb.split) AS split_b, "
        "CAST(count(*) AS BIGINT) AS n_pairs, "
        "least(ta.split, tb.split) <> greatest(ta.split, tb.split) AS leaked "
        "FROM verified JOIN tags ta ON doc_a = ta.doc_id "
        "JOIN tags tb ON doc_b = tb.doc_id GROUP BY 1, 2",
        desc=(
            "Train/test leakage audit (dedup.split_leakage_audit): verified "
            "near-dup pairs joined to their hash-split tags, counted per "
            "unordered split pair — cross-split rows with n_pairs > 0 ARE "
            "the contamination finding; LSH-bounded pair work, one tiny "
            "final aggregate."
        ),
    )(
        lambda spark, sf_dir: dedup.split_leakage_audit(
            _t(spark, sf_dir, "documents"), threshold=0.5
        )
    )


_reg_leakage_audit()
