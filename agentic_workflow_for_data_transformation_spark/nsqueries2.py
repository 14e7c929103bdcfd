"""North-star registrations, rounds 2-4 (mostly registered AFTER the
driver's 50-row correctness window — see the DRIVER CORRECTNESS WINDOW
note in benchqueries.py; out-of-window queries are covered by the
freshness-gated CORRECTNESS_LOCAL.json full-registry report instead):
redaction, int8 quantization, minhash Jaccard estimation, tf-idf,
iterated k-means, grouped-map scaling, KS drift, corpus mix, profiling,
residual-bucketed kNN, cross-corpus overlap, audio frame energy,
corpus interleave, bigram LM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .benchqueries import _DESCRIPTIONS, _t, register
from .nsqueries import (
    _COS,
    _SHINGLE_CTE,
    _VERIFIED_CTES,
    _RESIDUAL_CTR_CTES,
    _auto_bucket_sql,
    _buckets_sql,
    _residual_bucket_sql,
    _dedup_cached,
    _sig_sql,
)
from .operators import corpus, dedup, graph, multimodal, profile, quality, sampling, similarity, stats, text

register(
    "ns_text_redact",
    "SELECT doc_id, substr(md5(regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'[0-9]{4,}', '<NUM>', 'g')), 1, 16) AS redacted_md5, "
    "CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
    "+ len(regexp_extract_all(text, '[0-9]{4,}')) AS INTEGER) AS n_masked "
    "FROM documents",
)(
    lambda spark, sf_dir: text.redact_text(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.substring(F.md5("redacted"), 1, 16).alias("redacted_md5"),
        F.col("n_masked").cast("int").alias("n_masked"),
    )
)


register(
    "ns_embed_quantize",
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "s AS (SELECT vec_id, v, CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0 "
    "THEN list_max(list_transform(v, x -> abs(x))) / 127.0 ELSE 1.0 END AS scale FROM d) "
    "SELECT vec_id, round(scale, 9) AS scale, "
    "CAST(unnest(range(len(v))) AS INTEGER) AS dim_idx, "
    "CAST(round(unnest(v) / scale) AS INTEGER) AS q FROM s",
)(
    lambda spark, sf_dir: similarity.quantize_int8(
        _t(spark, sf_dir, "embeddings")
    ).select("vec_id", "scale", F.posexplode("qvec").alias("dim_idx", "q"))
)


register(
    "ns_dedup_minhash_estimate",
    f"WITH {_SHINGLE_CTE}, {_sig_sql()}, {_buckets_sql()}, "
    "cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b FROM buckets x "
    " JOIN buckets y ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id) "
    "SELECT doc_a, doc_b, round(("
    + " + ".join(f"CAST(sa.h{i} = sb.h{i} AS INTEGER)" for i in range(16))
    + ") / 16.0, 6) AS est_jaccard "
    "FROM cand JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id",
)(
    lambda spark, sf_dir: dedup.minhash_estimate_pairs(
        _t(spark, sf_dir, "documents"),
        sig=_dedup_cached(spark, sf_dir, "sig"),
        cand=_dedup_cached(spark, sf_dir, "cand"),
    )
)


register(
    "ns_text_tfidf_top",
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), "
    "tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY 1, 2), "
    "dfreq AS (SELECT w, count(*) AS dfreq FROM tf GROUP BY 1), "
    "n AS (SELECT count(*) AS n_docs FROM documents), "
    "scored AS (SELECT doc_id, w, round(tf * (ln((n_docs + 1) * 1.0 / (dfreq + 1)) + 1), 6) AS tfidf "
    " FROM tf JOIN dfreq USING (w) CROSS JOIN n), "
    "r AS (SELECT doc_id, w, tfidf, row_number() OVER "
    " (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rnk FROM scored) "
    "SELECT doc_id, w AS term, tfidf, CAST(rnk AS INTEGER) AS rnk FROM r WHERE rnk <= 3",
)(lambda spark, sf_dir: text.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3))


register(
    "ns_kmeans_refined",
    # one Lloyd iteration unrolled: init cells (vec_id < 8) -> assign ->
    # decimal-mean refine (rounded 6) -> final assignment
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "c0 AS (SELECT vec_id AS cell, v AS cv FROM d WHERE vec_id < 8), "
    "a1 AS (SELECT vec_id, v, cell, row_number() OVER (PARTITION BY vec_id ORDER BY "
    " round(list_cosine_similarity(v, cv), 6) DESC, cell) AS rn FROM d, c0), "
    "m1 AS (SELECT cell, i, round(CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS cval "
    " FROM (SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM a1 WHERE rn = 1) "
    " GROUP BY cell, i), "
    "c1 AS (SELECT cell, list(cval ORDER BY i) AS cv FROM m1 GROUP BY cell), "
    "a2 AS (SELECT vec_id, cell, round(list_cosine_similarity(v, cv), 6) AS cent_sim, "
    " row_number() OVER (PARTITION BY vec_id ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, cell) AS rn "
    " FROM d, c1) "
    "SELECT vec_id, cell, cent_sim FROM a2 WHERE rn = 1",
)(lambda spark, sf_dir: similarity.kmeans_assign(_t(spark, sf_dir, "embeddings"), n_centroids=8, n_iter=1))


register(
    "ns_chunk_documents",
    # sliding word windows: starts 1, 1+stride, ... while start <= len;
    # tail chunks may be short, no suffix dropped (stride 16, size 32)
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "st AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws), 16)) AS start FROM w), "
    "c AS (SELECT doc_id, start, list_slice(ws, start, least(start + 31, len(ws))) AS chunk FROM st) "
    "SELECT doc_id, CAST((start - 1) / 16 AS INTEGER) AS chunk_idx, "
    "CAST(len(chunk) AS INTEGER) AS n_chunk_words, "
    "md5(array_to_string(chunk, ' ')) AS chunk_md5 FROM c",
)(
    lambda spark, sf_dir: corpus.chunk_documents(
        _t(spark, sf_dir, "documents"), size=32, stride=16
    ).withColumn("n_chunk_words", F.col("n_chunk_words").cast("int"))
)


register(
    "ns_text_repetition",
    # intra-doc n-gram repetition over the same 60-bit gram hash the
    # Spark side aggregates, so distinctness is bit-identical
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "g AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 3 THEN "
    "list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) "
    "ELSE CAST([] AS VARCHAR[]) END) AS s FROM w) "
    "SELECT doc_id, count(*) AS n_grams, "
    "count(DISTINCT ('0x' || substr(md5(s), 1, 15))::BIGINT) AS n_distinct, "
    "round(1 - count(DISTINCT ('0x' || substr(md5(s), 1, 15))::BIGINT) * 1.0 / count(*), 6) "
    "AS repetition FROM g GROUP BY doc_id",
)(lambda spark, sf_dir: text.repetition_ratio(_t(spark, sf_dir, "documents")))


register(
    "ns_groupwise_scale",
    "WITH m AS (SELECT event_type, min(value) AS lo, max(value) AS hi "
    "FROM events GROUP BY 1) "
    "SELECT event_id, events.event_type, "
    "round(CASE WHEN hi > lo THEN (value - lo) / (hi - lo) ELSE 0.0 END, 6) AS scaled "
    "FROM events JOIN m ON events.event_type = m.event_type",
)(
    lambda spark, sf_dir: text.groupwise_minmax_scale(
        _t(spark, sf_dir, "events")
    )
)



# Demoted from the driver window in round 3 (duplicate topk shapes:
# bruteforce, lsh, and partitioned variants remain in-window) to make
# room for two events-family queries — see the DRIVER CORRECTNESS
# WINDOW note in benchqueries.py.
register(
    "ns_sim_topk_ivf",
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "c AS (SELECT vec_id AS cent_id, v AS cv FROM d WHERE vec_id < 8), "
    "a AS (SELECT vec_id, v, cent_id, "
    "  row_number() OVER (PARTITION BY vec_id ORDER BY "
    + _COS.format(a="v", b="cv") + " DESC, cent_id) AS rn FROM d, c), "
    "cells AS (SELECT vec_id, v, cent_id AS cell FROM a WHERE rn = 1), "
    "q AS (SELECT v AS qv FROM d WHERE vec_id = 0), "
    "probe AS (SELECT cent_id AS probe_cell, qv FROM c, q "
    "  ORDER BY " + _COS.format(a="qv", b="cv") + " DESC, cent_id LIMIT 2) "
    "SELECT vec_id, cell, " + _COS.format(a="v", b="qv") + " AS cos_sim "
    "FROM cells JOIN probe ON cell = probe_cell WHERE vec_id <> 0 "
    "ORDER BY cos_sim DESC, vec_id LIMIT 5",
)(
    lambda spark, sf_dir: similarity.topk_cosine_ivf(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=5, n_centroids=8, n_probe=2
    )
)


register(
    "ns_sim_topk_multi",
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, v AS qv FROM d WHERE vec_id IN (0, 1, 2, 3)), "
    "s AS (SELECT query_id, vec_id, " + _COS.format(a="v", b="qv") + " AS cos_sim, "
    " row_number() OVER (PARTITION BY query_id ORDER BY "
    + _COS.format(a="v", b="qv") + " DESC, vec_id) AS rn "
    " FROM d, q WHERE vec_id <> query_id) "
    "SELECT query_id, vec_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM s WHERE rn <= 3",
)(
    lambda spark, sf_dir: similarity.topk_cosine_multi(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3], k=3
    )
)


# ---------------------------------------------------------- round 3 ops

register(
    "ns_corpus_mix_weights",
    "SELECT lang, count(*) AS n_docs, "
    "round(pow(count(*), 0.7) / sum(pow(count(*), 0.7)) OVER (), 6) AS weight "
    "FROM documents GROUP BY lang",
)(lambda spark, sf_dir: corpus.mix_weights(_t(spark, sf_dir, "documents"), alpha=0.7))


register(
    "ns_dedup_containment",
    f"WITH {_VERIFIED_CTES} "
    "SELECT c.doc_a, c.doc_b, "
    "round(i.n_inter * 1.0 / sa.sz, 6) AS cont_a_in_b, "
    "round(i.n_inter * 1.0 / sb.sz, 6) AS cont_b_in_a "
    "FROM cand c JOIN inter i USING (doc_a, doc_b) "
    "JOIN sizes sa ON c.doc_a = sa.doc_id JOIN sizes sb ON c.doc_b = sb.doc_id "
    "WHERE greatest(round(i.n_inter * 1.0 / sa.sz, 6), "
    "round(i.n_inter * 1.0 / sb.sz, 6)) >= 0.5",
)(
    lambda spark, sf_dir: dedup.containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5,
        cand=_dedup_cached(spark, sf_dir, "cand"),
    )
)


_BITS4_BUCKET = (
    "concat(CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END, "
    "CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END, "
    "CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END, "
    "CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END)"
)

register(
    "ns_ann_recall_lsh",
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    f"b AS (SELECT vec_id, v, {_BITS4_BUCKET} AS bucket FROM d), "
    "q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM b "
    " WHERE vec_id IN (0, 1, 2, 3)), "
    "ex AS (SELECT query_id, vec_id FROM ("
    " SELECT q.query_id, d.vec_id, row_number() OVER (PARTITION BY q.query_id "
    " ORDER BY " + _COS.format(a="d.v", b="q.qv") + " DESC, d.vec_id) AS rn "
    " FROM d, q WHERE d.vec_id <> q.query_id) WHERE rn <= 5), "
    "ann AS (SELECT query_id, vec_id FROM ("
    " SELECT q.query_id, b.vec_id, row_number() OVER (PARTITION BY q.query_id "
    " ORDER BY " + _COS.format(a="b.v", b="q.qv") + " DESC, b.vec_id) AS rn "
    " FROM b, q WHERE b.vec_id <> q.query_id AND b.bucket = q.qbucket) WHERE rn <= 5), "
    "h AS (SELECT a.query_id, count(*) AS n_hits FROM ann a "
    " JOIN ex USING (query_id, vec_id) GROUP BY 1), "
    "c AS (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1) "
    "SELECT c.query_id, c.n_ann, coalesce(h.n_hits, 0) AS n_hits, "
    "round(coalesce(h.n_hits, 0) / 5.0, 6) AS recall "
    "FROM c LEFT JOIN h USING (query_id)",
)(
    lambda spark, sf_dir: similarity.ann_recall_vs_bruteforce(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3], k=5, bits=4
    )
)


register(
    "ns_dedup_exact_norm",
    "WITH n AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace("
    "lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5 "
    "FROM documents) "
    "SELECT norm_md5, min(doc_id) AS keeper_id, count(*) AS n_copies "
    "FROM n GROUP BY 1",
)(lambda spark, sf_dir: dedup.normalized_exact_dedup(_t(spark, sf_dir, "documents")))


register(
    "ns_corpus_length_hist",
    "SELECT lang, CAST(floor(log2(n_chars::DOUBLE)) AS BIGINT) AS log2_bucket, "
    "count(*) AS n_docs, min(n_chars) AS min_len, max(n_chars) AS max_len "
    "FROM documents WHERE n_chars > 0 GROUP BY 1, 2",
)(lambda spark, sf_dir: corpus.length_histogram(_t(spark, sf_dir, "documents")))


register(
    "ns_ks_drift_per_user",
    # pooled-ECDF running counts; RANGE frame (the ORDER BY default)
    # counts all rows with value <= current, matching searchsorted-right
    "WITH u AS (SELECT user_id, value, "
    " CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c, "
    " CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v "
    " FROM events WHERE event_type IN ('click', 'view')), "
    "tot AS (SELECT user_id, CAST(sum(is_c) AS BIGINT) AS n, "
    " CAST(sum(is_v) AS BIGINT) AS m FROM u GROUP BY 1), "
    "r AS (SELECT user_id, "
    " sum(is_c) OVER (PARTITION BY user_id ORDER BY value) AS k, "
    " sum(is_v) OVER (PARTITION BY user_id ORDER BY value) AS j "
    " FROM u) "
    "SELECT r.user_id, CAST(max(abs(k * m - j * n)) AS BIGINT) AS ks_num, n, m "
    "FROM r JOIN tot USING (user_id) WHERE n > 0 AND m > 0 "
    "GROUP BY r.user_id, n, m",
)(
    lambda spark, sf_dir: stats.ks_statistic_cogrouped(
        _t(spark, sf_dir, "events").filter(F.col("event_type") == "click"),
        _t(spark, sf_dir, "events").filter(F.col("event_type") == "view"),
        key_col="user_id", value_col="value",
    )
)


register(
    "ns_sim_knn_bucketed",
    "WITH d AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    f"{_RESIDUAL_CTR_CTES}, "
    "b AS (SELECT vec_id, d.label AS label, v, "
    f"{_residual_bucket_sql()} AS bucket FROM d JOIN ctr ON d.label = ctr.label), "
    "p AS (SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS nn_vec_id, "
    + _COS.format(a="a.v", b="b.v") + " AS cos_sim, "
    "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
    + _COS.format(a="a.v", b="b.v") + " DESC, b.vec_id) AS rn "
    "FROM b a JOIN b b ON a.label = b.label AND a.bucket = b.bucket "
    "AND a.vec_id <> b.vec_id) "
    "SELECT vec_id, label, nn_vec_id, cos_sim FROM p WHERE rn = 1",
)(
    lambda spark, sf_dir: similarity.knn_join_bucketed(
        _t(spark, sf_dir, "embeddings"), k=1, bits=None
    )
)


register(
    "ns_profile_table",
    # one branch per profiled column, stringified min/max so the
    # columns share a schema — mirrors the stack() unpivot exactly
    "WITH a AS (SELECT count(*) AS _n, "
    " count(o_orderpriority) AS nn1, count(DISTINCT o_orderpriority) AS nd1, "
    " CAST(min(o_orderpriority) AS VARCHAR) AS mn1, CAST(max(o_orderpriority) AS VARCHAR) AS mx1, "
    " count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2, "
    " CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2, "
    " count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3, "
    " CAST(min(o_orderstatus) AS VARCHAR) AS mn3, CAST(max(o_orderstatus) AS VARCHAR) AS mx3 "
    " FROM orders) "
    "SELECT 'o_orderpriority' AS \"column\", _n AS n_rows, nn1 AS n_non_null, "
    " nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM a "
    "UNION ALL SELECT 'o_custkey', _n, nn2, nd2, mn2, mx2 FROM a "
    "UNION ALL SELECT 'o_orderstatus', _n, nn3, nd3, mn3, mx3 FROM a",
)(
    lambda spark, sf_dir: profile.profile_table(
        _t(spark, sf_dir, "orders"),
        cols=["o_orderpriority", "o_custkey", "o_orderstatus"],
    )
)


_NORM_MD5 = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), "
    "' +', ' ', 'g')))"
)

register(
    "ns_dedup_incremental",
    # odd doc_ids are the 'new batch', evens the historical corpus
    f"WITH nh AS (SELECT *, {_NORM_MD5} AS h FROM documents WHERE doc_id % 2 = 1), "
    f"seen AS (SELECT DISTINCT {_NORM_MD5} AS h FROM documents WHERE doc_id % 2 = 0), "
    "keep AS (SELECT h, min(doc_id) AS doc_id FROM nh GROUP BY h) "
    "SELECT nh.doc_id, text, lang, source, n_chars FROM nh "
    "JOIN keep USING (h, doc_id) WHERE h NOT IN (SELECT h FROM seen)",
)(
    lambda spark, sf_dir: dedup.incremental_new_docs(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1),
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0),
    )
)


register(
    "ns_corpus_length_buckets",
    "SELECT CAST(ceil(n_chars / 128.0) * 128 AS BIGINT) AS bucket_len, "
    "count(*) AS n_docs, "
    "CAST(CAST(ceil(n_chars / 128.0) * 128 AS BIGINT) * count(*) - sum(n_chars) AS BIGINT) AS padding_waste "
    "FROM documents WHERE n_chars > 0 GROUP BY 1",
)(
    lambda spark, sf_dir: corpus.length_bucket_stats(
        _t(spark, sf_dir, "documents"), bucket=128
    )
)


register(
    "ns_corpus_mix_apply",
    # keep rate per lang = floor(budget * w / n * 1e6), hash-draw filter
    "WITH c AS (SELECT lang, count(*) AS n_docs, "
    " pow(count(*), 0.7) / sum(pow(count(*), 0.7)) OVER () AS w FROM documents GROUP BY lang), "
    "r AS (SELECT lang, least(1000000, CAST(floor(200 * w / n_docs * 1000000) AS BIGINT)) AS kb FROM c) "
    "SELECT doc_id, documents.lang, source FROM documents JOIN r ON documents.lang = r.lang "
    "WHERE ('0x' || substr(md5('mix|' || doc_id), 1, 15))::BIGINT % 1000000 < kb",
)(
    lambda spark, sf_dir: corpus.apply_mix_sampling(
        _t(spark, sf_dir, "documents"), budget=200
    ).select("doc_id", "lang", "source")
)


register(
    "ns_text_surprisal",
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), "
    "t AS (SELECT count(*) AS total FROM w), "
    "v AS (SELECT w, count(*) AS cnt FROM w GROUP BY 1) "
    "SELECT doc_id, count(*) AS n_tokens, "
    "round(sum(-ln(cnt * 1.0 / total)) / count(*), 6) AS surprisal "
    "FROM w JOIN v USING (w) CROSS JOIN t GROUP BY doc_id",
)(lambda spark, sf_dir: text.unigram_surprisal(_t(spark, sf_dir, "documents")))


register(
    "ns_multimodal_audio_energy",
    # per-character code points mirror np.frombuffer(uint8) on the
    # ASCII corpus; floor(rms*1e6) is engine-exact (integer sums of
    # squares are exact in float64, sqrt is IEEE)
    "WITH i AS (SELECT doc_id, unnest(range(1, len(text) + 1)) AS pos, text "
    " FROM documents), "
    "s AS (SELECT doc_id, CAST((pos - 1) // 256 AS INT) AS frame, "
    " ord(substr(text, CAST(pos AS INT), 1)) AS code FROM i) "
    "SELECT doc_id, frame, CAST(count(*) AS INT) AS n_samples, "
    "CAST(floor(sqrt(sum(code * code) * 1.0 / count(*)) * 1000000) AS BIGINT) "
    "AS rms_micro FROM s GROUP BY doc_id, frame",
    desc=(
        "Audio-branch multimodal: per-frame RMS energy over the binary "
        "waveform payload via Arrow-batched mapInPandas + numpy — real "
        "decode (frombuffer), declared schema, exact integer-microunit "
        "oracle."
    ),
)(
    lambda spark, sf_dir: multimodal.audio_frame_energy(
        multimodal.with_binary_payload(_t(spark, sf_dir, "documents"))
    )
)


register(
    "ns_multimodal_audio_zcr",
    # 16-bit little-endian PCM from character code-point pairs
    # (c1 + 256*c2, two's complement at 32768) — byte-exact vs
    # np.frombuffer('<i2') on the ASCII corpus; output is pure
    # integer counting, no float semantics to disagree on
    "WITH i AS (SELECT doc_id, unnest(range(1, len(text) // 2 + 1)) AS pos, text "
    " FROM documents), "
    "s AS (SELECT doc_id, pos, CAST((pos - 1) // 256 AS INT) AS frame, "
    " ord(substr(text, CAST(2 * pos - 1 AS INT), 1)) "
    " + 256 * ord(substr(text, CAST(2 * pos AS INT), 1)) AS u FROM i), "
    "v AS (SELECT doc_id, pos, frame, "
    " CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x FROM s), "
    "p AS (SELECT doc_id, frame, x, "
    " lead(x) OVER (PARTITION BY doc_id ORDER BY pos) AS nx, "
    " lead(frame) OVER (PARTITION BY doc_id ORDER BY pos) AS nframe FROM v) "
    "SELECT doc_id, frame, CAST(count(*) AS INT) AS n_samples, "
    "CAST(count(*) FILTER (WHERE nframe = frame AND ((x < 0) <> (nx < 0))) "
    " AS INT) AS n_crossings "
    "FROM p GROUP BY doc_id, frame",
    desc=(
        "Audio-branch multimodal #2: per-frame zero-crossing rate over "
        "the waveform payload read as 16-bit little-endian PCM — real "
        "numpy decode in Arrow-batched mapInPandas, integer-exact "
        "oracle (sign-flip counting, no floats)."
    ),
)(
    lambda spark, sf_dir: multimodal.audio_frame_zcr(
        multimodal.with_binary_payload(_t(spark, sf_dir, "documents"))
    )
)


register(
    "ns_cross_corpus_overlap",
    f"WITH {_VERIFIED_CTES} "
    "SELECT c.doc_a, c.doc_b, jaccard FROM cand c JOIN jac USING (doc_a, doc_b) "
    "WHERE jaccard >= 0.5 AND (doc_a % 2) <> (doc_b % 2)",
    desc=(
        "Cross-corpus contamination PAIRS: verified near-dups restricted to "
        "pairs straddling the corpus split (id parity as the corpus label) — "
        "train/benchmark overlap reported as auditable pair evidence, where "
        "ns_decontaminate only filters. Shares the session-scoped LSH "
        "intermediates, so the marginal cost is one filter over the pair "
        "table."
    ),
)(
    lambda spark, sf_dir: _dedup_cached(spark, sf_dir, "pairs").filter(
        (F.col("doc_a") % 2) != (F.col("doc_b") % 2)
    )
)


register(
    "ns_dedup_embedding_apply",
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    f"b AS (SELECT vec_id, v, {_auto_bucket_sql('v')} AS bucket FROM d), "
    "r AS (SELECT bucket, min(vec_id) AS rep_id FROM b GROUP BY 1), "
    "rv AS (SELECT r.bucket, r.rep_id, b.v AS rv FROM r JOIN b ON r.rep_id = b.vec_id), "
    "s AS (SELECT b.vec_id, b.bucket, rv.rep_id, "
    + _COS.format(a="b.v", b="rv.rv") + " AS cos_to_rep "
    " FROM b JOIN rv ON b.bucket = rv.bucket) "
    "SELECT vec_id, bucket, cos_to_rep FROM s "
    "WHERE vec_id = rep_id OR cos_to_rep < 0.9",
    desc="Applied embedding dedup by canopy representative selection — one aggregation + one equi-join + one cosine per row, the LINEAR path where pair enumeration is quadratic.",
)(
    lambda spark, sf_dir: similarity.embedding_dedup_apply(
        _t(spark, sf_dir, "embeddings"), threshold=0.9, bits=None
    )
)


@register(
    "ns_corpus_interleave",
    "WITH s AS (SELECT source, row_number() OVER (ORDER BY source) AS src_idx, "
    " count(*) OVER () AS n_src FROM (SELECT DISTINCT source FROM documents)), "
    "r AS (SELECT doc_id, source, row_number() OVER "
    " (PARTITION BY source ORDER BY doc_id) AS rn FROM documents) "
    "SELECT doc_id, r.source, (rn - 1) * n_src + src_idx AS interleave_key "
    "FROM r JOIN s ON r.source = s.source",
)
def ns_corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave across sources: assigns
    each document the training-order key (rank_within_source - 1) *
    n_sources + source_index, so consuming in key order alternates
    sources 1-per-step — the curriculum shape mixture training wants.
    No global sort is ever computed: the per-source rank is a
    partitioned window and the source index comes from a broadcast
    20-row dimension; the total order exists only as a sortable key."""
    docs = _t(spark, sf_dir, "documents")
    # The src_idx/n_src windows run over the ~20-row distinct-source
    # dimension, where one partition is the POINT. The key must be a
    # constant-valued but NON-FOLDABLE expression: lit(1) gets
    # constant-folded away by Catalyst, leaving an unpartitioned
    # WindowExec that warns (round-6 plan trace); pmod(length(source),
    # 1) is 0 on every row but stays nullable, so it survives as a
    # real partition column and the dimension is read exactly once.
    # Pinned by tests/test_plans.py::test_no_unpartitioned_windows_*.
    one = Window.partitionBy(F.pmod(F.length("source"), F.lit(1)))
    srcs = (
        docs.select("source").distinct()
        .select(
            "source",
            F.row_number().over(one.orderBy("source")).alias("src_idx"),
            F.count(F.lit(1)).over(one).alias("n_src"),
        )
    )
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    return (
        docs.join(F.broadcast(srcs), "source")
        .select(
            "doc_id",
            "source",
            ((rn - 1) * F.col("n_src") + F.col("src_idx")).alias("interleave_key"),
        )
    )


@register(
    "ns_text_bigram_lm",
    "WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents), "
    "g AS (SELECT unnest(list_transform(range(1, len(ws)), "
    " i -> [ws[i], ws[i+1]])) AS bg FROM w WHERE len(ws) >= 2), "
    "c AS (SELECT bg[1] AS w1, bg[2] AS w2, count(*) AS n FROM g GROUP BY 1, 2) "
    "SELECT w1, w2, n, round(n * 1.0 / sum(n) OVER (PARTITION BY w1), 6) AS p "
    "FROM c",
)
def ns_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model table: corpus-wide P(w2 | w1) as
    count(w1,w2) / count(w1-prefix). One explode + hash-aggregate over
    the corpus (map-side combine collapses to vocab^2 rows per
    partition), then a window over the tiny vocab^2 count table for
    the conditional — the big scan never sees a window function."""
    docs = _t(spark, sf_dir, "documents")
    ws = docs.select(F.split("text", " ").alias("ws")).filter(F.size("ws") >= 2)
    pairs = ws.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, F.size("ws") - 1),
                F.slice("ws", 2, F.size("ws") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    )
    c = (
        pairs.select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.select(
        "w1", "w2", "n",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy("w1")), 6).alias("p"),
    )


# catalog lines for this module's lambda registrations — see the note
# in nsqueries.py; tools/gen_catalog.py emits docstring-or-desc
_DESCRIPTIONS.update({
    "ns_text_redact": "PII-style redaction: regex-mask emails and long digit runs, reporting a masked-span count per document.",
    "ns_embed_quantize": "Symmetric int8 vector quantization: per-vector scale + rounded components, exploded per dimension for the oracle.",
    "ns_dedup_minhash_estimate": "Signature-only Jaccard estimate (matching-hash fraction) per LSH candidate pair — the O(k)/pair screen before exact verify.",
    "ns_text_tfidf_top": "Top-3 TF-IDF terms per document: term/document frequencies as two hash-aggregates, smoothed idf, per-doc window rank.",
    "ns_kmeans_refined": "One unrolled Lloyd iteration of cosine k-means: assign to seed centroids, decimal-exact mean refine, reassign.",
    "ns_chunk_documents": "Sliding-window chunking (32-word windows, stride 16) as a pure narrow explode — no shuffle, tail chunks kept.",
    "ns_text_repetition": "Intra-document 3-gram repetition ratio (1 - distinct/total grams) over a 60-bit gram hash.",
    "ns_groupwise_scale": "Grouped min-max scaling of event values per event_type via applyInPandas (grouped-map Arrow path).",
    "ns_sim_topk_ivf": "IVF top-k: assign vectors to nearest seed centroid cells, probe the query's 2 closest cells only — partition-pruned ANN.",
    "ns_sim_topk_multi": "Multi-query brute-force top-k: all query vectors broadcast once, one scan scores every (query, row) pair.",
    "ns_corpus_mix_weights": "Power-law (alpha=0.7) corpus mix weights per language from document counts — the sampling policy table.",
    "ns_dedup_containment": "Asymmetric containment (|A∩B|/min |A|,|B|) over LSH candidates — catches subset duplication symmetric Jaccard misses.",
    "ns_ann_recall_lsh": "ANN recall@5 harness: bucketed ANN vs exact brute-force for 4 query vectors in one bucketed scan, recall per query.",
    "ns_dedup_exact_norm": "Normalized exact dedup: lowercase/strip-punctuation normalization, then groups on the 16-byte md5 of the normal form.",
    "ns_corpus_length_hist": "Document length histogram in 64-char bins: one hash-aggregate over a computed bin key.",
    "ns_sim_knn_bucketed": "Approximate per-label kNN join blocked by (label, residual sign-LSH bucket) with auto-sized bits — the linear-scaling sibling of the exact harness.",
    "ns_profile_table": "One-pass column profiler (rows, non-null, distinct, min/max as strings) unpivoted to one row per column.",
    "ns_dedup_incremental": "Incremental ingest dedup: anti-join the new batch's normalized digests against the existing corpus — only digests shuffle.",
    "ns_corpus_length_buckets": "Padding-bucket accounting: round lengths up to 128-char buckets and report wasted padding chars per bucket.",
    "ns_text_surprisal": "Unigram-surprisal quality score (mean -log2 corpus frequency per word) — a perplexity proxy from two aggregates.",
    "ns_ks_drift_per_user": "Kolmogorov-Smirnov drift statistic between click and view value distributions per user via cogrouped applyInPandas.",
    "ns_corpus_mix_apply": "Apply the power-law mix policy as a deterministic hash-draw sampler: per-language keep thresholds, stable membership.",
})


from .nsqueries import _EN  # noqa: E402  (quality-score stopword set)

register(
    "ns_corpus_build_e2e",
    # the full corpus build as ONE composed statement: quality gate ->
    # exact-dedup keepers -> benchmark decontamination -> sequence
    # packing. CTE names are prefixed (qt/qm/qs, kp, bm/bad, cl,
    # pt/pc) so the reused quality/shingle/pack fragments can't
    # collide.
    "WITH qt AS (SELECT doc_id, text, length(text) AS n_chars, "
    " string_split(text, ' ') AS ws FROM documents), "
    "qm AS (SELECT doc_id, n_chars, len(ws) AS n_words, "
    f" len(list_filter(ws, w -> lower(w) IN {_EN})) AS stop_hits, "
    " len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS nonalnum FROM qt), "
    "qs AS (SELECT doc_id FROM qm WHERE "
    " round(least(1.0, n_words / 50.0) * 0.5 "
    "  + (1.0 - least(1.0, round(nonalnum / greatest(n_chars, 1), 6) * 10)) * 0.3 "
    "  + least(1.0, round(stop_hits / n_words, 6) * 5) * 0.2, 6) >= 0.55), "
    "kp AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), "
    f"{_SHINGLE_CTE}, "
    "bm AS (SELECT DISTINCT s FROM e WHERE doc_id % 97 = 0), "
    "bad AS (SELECT DISTINCT doc_id FROM e WHERE doc_id % 97 <> 0 "
    " AND s IN (SELECT s FROM bm)), "
    "cl AS (SELECT d.doc_id, d.lang, d.text FROM documents d "
    " JOIN qs ON d.doc_id = qs.doc_id JOIN kp ON d.doc_id = kp.doc_id "
    " WHERE d.doc_id % 97 <> 0 "
    " AND d.doc_id NOT IN (SELECT doc_id FROM bad)), "
    "pt AS (SELECT doc_id, lang, "
    " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
    " CAST(floor(doc_id / 128.0) AS BIGINT) AS grp FROM cl), "
    "pc AS (SELECT *, SUM(n_tokens) OVER "
    " (PARTITION BY lang, grp ORDER BY doc_id) AS cum FROM pt) "
    "SELECT lang, grp, CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS seq_id, "
    "COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens, "
    "MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc "
    "FROM pc GROUP BY 1, 2, 3",
    desc=(
        "END-TO-END corpus build in one declarative plan: quality gate "
        "(score >= 0.55) -> exact-dedup keepers (min doc_id per md5) -> "
        "benchmark decontamination (broadcast shingle anti-join, "
        "doc_id % 97 as the benchmark split) -> greedy sequence packing "
        "(256-token budget, 128-doc groups). Every stage is the "
        "registered operator run on its own; composed, Catalyst sees one "
        "plan: slim semi/anti joins on doc_id, the 100 TB side never "
        "shuffled on text. Honest scan count: each stage derives from its "
        "own scan of documents (4 pruned-column scans); at 100 TB you "
        "would checkpoint the quality-gated subset once and feed the "
        "later stages from it — the JOIN structure is unchanged."
    ),
)(
    lambda spark, sf_dir: (lambda docs: corpus.pack_sequences(
        docs.filter(F.col("doc_id") % 97 != 0)
        .join(
            text.with_quality_score(docs)
            .filter(F.col("quality_score") >= 0.55)
            .select("doc_id"),
            "doc_id", "left_semi",
        )
        .join(
            docs.groupBy(F.md5("text").alias("_h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"),
            "doc_id", "left_semi",
        )
        .join(
            corpus.contaminated_ids(
                docs.filter(F.col("doc_id") % 97 != 0),
                docs.filter(F.col("doc_id") % 97 == 0),
            ).select("doc_id"),
            "doc_id", "left_anti",
        ),
        budget=256, group_size=128,
    ))(_t(spark, sf_dir, "documents"))
)


register(
    "ns_text_boilerplate_ratio",
    f"WITH {_SHINGLE_CTE}, "
    "f AS (SELECT s, count(*) AS nd FROM e GROUP BY s) "
    "SELECT doc_id, count(*) AS n_grams, "
    "CAST(count(*) FILTER (WHERE nd >= 2) AS BIGINT) AS n_common, "
    "round(count(*) FILTER (WHERE nd >= 2) * 1.0 / count(*), 6) "
    "AS boilerplate_ratio "
    "FROM e JOIN f USING (s) GROUP BY doc_id",
    desc=(
        "Cross-document boilerplate ratio: fraction of a doc's distinct "
        "3-gram shingles occurring in >= 2 documents corpus-wide — the "
        "RefinedWeb/CCNet template-text quality signal, sibling of the "
        "intra-document repetition ratio. One DF aggregate on the 60-bit "
        "gram hash, one join back, one per-doc aggregate."
    ),
)(
    lambda spark, sf_dir: text.boilerplate_ratio(
        _t(spark, sf_dir, "documents"), min_docs=2
    )
)


register(
    "ns_text_token_pmi",
    # rank on the RAW likelihood ratio (IEEE-exact identical doubles in
    # both engines); ln only on the reported, 6-decimal-rounded pmi
    "WITH w AS (SELECT lang AS label, unnest(string_split(text, ' ')) AS word "
    " FROM documents), "
    "cw AS (SELECT word, count(*) AS c_w FROM w GROUP BY word), "
    "cl AS (SELECT label, count(*) AS c_l FROM w GROUP BY label), "
    "cwl AS (SELECT label, word, count(*) AS c_wl FROM w GROUP BY label, word), "
    "t AS (SELECT count(*) AS n_total FROM w), "
    "s AS (SELECT label, word, c_wl, "
    " (c_wl * 1.0 * n_total) / (c_w * c_l) AS score "
    " FROM cwl JOIN cw USING (word) JOIN cl USING (label) CROSS JOIN t "
    " WHERE c_wl >= 5), "
    "r AS (SELECT label, word, c_wl, score, row_number() OVER "
    " (PARTITION BY label ORDER BY score DESC, word ASC) AS rn FROM s) "
    "SELECT label, word, c_wl, round(ln(score), 6) AS pmi, CAST(rn AS BIGINT) AS rn "
    "FROM r WHERE rn <= 10",
    desc=(
        "Token-label pointwise mutual information: top-10 tokens most "
        "characteristic of each language by PMI with a min-count floor "
        "— the classic feature-selection / corpus-analysis measure. "
        "Three map-side-combined aggregates + broadcast 1-row total; "
        "ranking key is the raw likelihood ratio so cross-engine order "
        "is bit-identical, ln only decorates the report."
    ),
)(
    lambda spark, sf_dir: text.token_label_pmi(
        _t(spark, sf_dir, "documents"), label_col="lang", k=10, min_count=5
    ).withColumn("rn", F.col("rn").cast("long"))
)


register(
    "ns_sample_weighted",
    # Efraimidis-Spirakis priority u^(1/weight), u from the portable
    # 60-bit hash; identical double expressions in both engines
    "WITH p AS (SELECT doc_id, lang, n_chars, "
    " pow((('0x' || substr(md5('wrs|' || doc_id), 1, 15))::BIGINT + 1) "
    "   / 1152921504606846976.0, 1.0 / n_chars) AS pri FROM documents), "
    "r AS (SELECT doc_id, lang, n_chars, row_number() OVER "
    " (PARTITION BY lang ORDER BY pri DESC, doc_id ASC) AS rn FROM p) "
    "SELECT doc_id, lang, n_chars FROM r WHERE rn <= 10",
    desc=(
        "Weighted sampling without replacement, per language: top-10 by "
        "the Efraimidis-Spirakis priority u^(1/n_chars) with a "
        "deterministic per-doc hash draw — inclusion probability "
        "proportional to document length, fully reproducible across "
        "runs, shards, and engines."
    ),
)(
    lambda spark, sf_dir: sampling.weighted_sample_per_group(
        _t(spark, sf_dir, "documents"),
        group_col="lang", weight_col="n_chars", k=10, key_col="doc_id",
    ).select("doc_id", "lang", "n_chars")
)


def _pagerank_sql(iters: int = 5, scale: int = 10**12) -> str:
    """Unrolled integer-PageRank oracle over the verified near-dup pair
    graph — every operation BIGINT, so the result is bit-identical to
    the Spark side regardless of join/partition order."""
    parts = [
        "p0 AS (SELECT doc_a, doc_b FROM cand JOIN jac USING (doc_a, doc_b) "
        " WHERE jaccard >= 0.5)",
        "ed AS (SELECT doc_a AS src, doc_b AS dst FROM p0 "
        " UNION ALL SELECT doc_b AS src, doc_a AS dst FROM p0)",
        "dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src)",
        "nd AS (SELECT DISTINCT src AS node FROM ed)",
        "nn AS (SELECT count(*) AS n FROM nd)",
        f"r0 AS (SELECT node, {scale} // n AS rank_scaled FROM nd CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            # CAST: DuckDB widens SUM(BIGINT) to HUGEINT (float in pandas)
            f"r{k} AS (SELECT nd.node, CAST(({scale} * 15) // (100 * nn.n) "
            f" + COALESCE(CAST(SUM((p.rank_scaled * 85) // (100 * dg.deg)) AS BIGINT), 0) AS BIGINT) AS rank_scaled "
            f" FROM nd CROSS JOIN nn "
            f" LEFT JOIN ed ON ed.dst = nd.node "
            f" LEFT JOIN dg ON dg.src = ed.src "
            f" LEFT JOIN r{k-1} p ON p.node = ed.src "
            f" GROUP BY nd.node, nn.n)"
        )
    return ", ".join(parts) + f" SELECT node, rank_scaled FROM r{iters}"


register(
    "ns_graph_pagerank",
    f"WITH {_VERIFIED_CTES}, {_pagerank_sql()}",
    desc=(
        "PageRank centrality over the verified near-dup pair graph "
        "(5 iterations, damping 0.85) in exact scaled-integer "
        "arithmetic — float in-mass sums are partition-order-dependent, "
        "integer sums are associative, so the ranks are bit-identical "
        "across engines and reruns. Corpus use: the most-central doc of "
        "a duplicate cluster is its canonical representative. Per "
        "iteration: one edge-list equi-join + one map-side-combined sum."
    ),
)(
    lambda spark, sf_dir: (lambda pairs: graph.pagerank_integer(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
    ))(_dedup_cached(spark, sf_dir, "pairs"))
)


register(
    "ns_corpus_incremental_stats",
    # the oracle recomputes from scratch over ALL documents — equality
    # proves the monoid merge (history state + batch state) is exact
    "SELECT lang, source, count(*) AS n, "
    "CAST(sum(n_chars) AS BIGINT) AS total, "
    "CAST(sum(n_chars * n_chars) AS BIGINT) AS total_sq, "
    "min(n_chars) AS lo, max(n_chars) AS hi, "
    "round(sum(n_chars) * 1.0 / count(*), 6) AS mean_chars, "
    "round((sum(n_chars * n_chars) * 1.0 - sum(n_chars) * 1.0 * sum(n_chars) "
    " / count(*)) / count(*), 6) AS var_chars "
    "FROM documents GROUP BY lang, source",
    desc=(
        "Incremental aggregate maintenance: per-(lang, source) corpus "
        "stats kept as a mergeable monoid state (n, sum, sum-of-squares, "
        "min, max) — the Spark side merges a HISTORY state with a new "
        "BATCH state, the oracle recomputes from scratch; equality "
        "proves batch ingest never needs to rescan history. Integer "
        "measures make the state exact, so mean and variance derive "
        "bit-identically."
    ),
)(
    lambda spark, sf_dir: (lambda docs: corpus.merge_agg_states(
        corpus.agg_state(docs.filter(F.col("doc_id") % 11 != 0),
                         ["lang", "source"], "n_chars"),
        corpus.agg_state(docs.filter(F.col("doc_id") % 11 == 0),
                         ["lang", "source"], "n_chars"),
    ).select(
        "lang", "source", "n", "total", "total_sq", "lo", "hi",
        F.round(F.col("total") * 1.0 / F.col("n"), 6).alias("mean_chars"),
        F.round(
            (F.col("total_sq") * 1.0
             - F.col("total") * 1.0 * F.col("total") / F.col("n"))
            / F.col("n"), 6,
        ).alias("var_chars"),
    ))(_t(spark, sf_dir, "documents"))
)


_EXPECTATIONS = [
    {"kind": "not_null", "col": "text"},
    {"kind": "unique", "col": "doc_id"},
    {"kind": "accepted_values", "col": "lang", "values": ["en", "de", "fr"]},
    {"kind": "range", "col": "n_chars", "lo": 1, "hi": 375},
    {"kind": "regex", "col": "source", "pattern": "^src[0-9]+$"},
    {"kind": "min_rows", "n": 100},
]

register(
    "ns_quality_expectations",
    "WITH a AS (SELECT count(*) AS n, "
    " CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0, "
    " count(DISTINCT doc_id) AS d1, "
    " CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dn1, "
    " CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN ('en','de','fr') THEN 1 ELSE 0 END) AS BIGINT) AS v2, "
    " CAST(sum(CASE WHEN n_chars IS NULL OR n_chars NOT BETWEEN 1 AND 375 THEN 1 ELSE 0 END) AS BIGINT) AS v3, "
    " CAST(sum(CASE WHEN source IS NULL OR NOT regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS v4 "
    " FROM documents) "
    "SELECT '0_not_null_text' AS expectation, 'not_null' AS kind, 'text' AS col, n AS n_rows, v0 AS n_violations, v0 = 0 AS passed FROM a "
    "UNION ALL SELECT '1_unique_doc_id', 'unique', 'doc_id', n, n - d1 - (CASE WHEN dn1 > 0 THEN 1 ELSE 0 END), n - d1 - (CASE WHEN dn1 > 0 THEN 1 ELSE 0 END) = 0 FROM a "
    "UNION ALL SELECT '2_accepted_values_lang', 'accepted_values', 'lang', n, v2, v2 = 0 FROM a "
    "UNION ALL SELECT '3_range_n_chars', 'range', 'n_chars', n, v3, v3 = 0 FROM a "
    "UNION ALL SELECT '4_regex_source', 'regex', 'source', n, v4, v4 = 0 FROM a "
    "UNION ALL SELECT '5_min_rows_*', 'min_rows', '*', n, "
    " CASE WHEN n < 100 THEN 100 - n ELSE 0 END, n >= 100 FROM a",
    desc=(
        "Declarative data-quality contract (Deequ/Great-Expectations "
        "pattern): not-null, key uniqueness, accepted values, numeric "
        "range, regex shape, and min-row-count checked in ONE aggregate "
        "pass — each per-row check is a conditional sum and uniqueness "
        "an exact count-distinct inside a single scan, however many "
        "expectations are declared. The report (one row per "
        "expectation, violation counts) is what batch ingest gates on."
    ),
)(
    lambda spark, sf_dir: quality.check_expectations(
        _t(spark, sf_dir, "documents"), _EXPECTATIONS
    )
)


register(
    "ns_stats_chi_square",
    "WITH o AS (SELECT lang, source, count(*) AS observed FROM documents GROUP BY lang, source), "
    "ra AS (SELECT lang, count(*) AS rt FROM documents GROUP BY lang), "
    "cb AS (SELECT source, count(*) AS ct FROM documents GROUP BY source), "
    "t AS (SELECT count(*) AS n FROM documents) "
    "SELECT lang, source, observed, "
    "round((rt * ct) / n, 6) AS expected, "
    "round((observed - (rt * ct) / n) * (observed - (rt * ct) / n) / ((rt * ct) / n), 6) AS contrib, "
    "CAST(floor((observed - (rt * ct) / n) * (observed - (rt * ct) / n) / ((rt * ct) / n) * 1000000) AS BIGINT) AS contrib_micro "
    "FROM o JOIN ra USING (lang) JOIN cb USING (source) CROSS JOIN t",
    desc=(
        "Chi-square independence contribution table for lang x source: "
        "per-cell observed vs independence-expected counts and the "
        "(o-e)^2/e contribution — the drill-down that names WHICH cells "
        "drive an association. Integer-microunit contributions sum "
        "exactly (partition-order-independent) where a float chi2 total "
        "would drift. Three count aggregates + two marginal equi-joins."
    ),
)(
    lambda spark, sf_dir: stats.chi_square_cells(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )
)


register(
    "ns_corpus_contamination_score",
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN "
    "list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) "
    "ELSE CAST([] AS VARCHAR[]) END AS sh FROM w), "
    "e AS (SELECT doc_id, unnest(sh) AS s FROM sh), "
    "c AS (SELECT * FROM e WHERE doc_id % 97 <> 0), "
    "bs AS (SELECT DISTINCT s FROM e WHERE doc_id % 97 = 0) "
    "SELECT c.doc_id, count(*) AS n_grams, "
    "CAST(count(bs.s) AS BIGINT) AS n_hit, "
    "round(count(bs.s) * 1.0 / count(*), 6) AS contamination "
    "FROM c LEFT JOIN bs ON c.s = bs.s GROUP BY c.doc_id",
    desc=(
        "GRADED benchmark contamination: per training doc, the fraction "
        "of its distinct 3-gram shingles appearing anywhere in the "
        "benchmark split — the audit/threshold/stratify sibling of the "
        "binary ns_decontaminate filter. The benchmark gram set "
        "broadcasts (eval suites are small), so the corpus never "
        "shuffles for the join."
    ),
)(
    lambda spark, sf_dir: (lambda docs: corpus.contamination_scores(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
    ))(_t(spark, sf_dir, "documents"))
)


register(
    "ns_stats_key_skew",
    "WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id), "
    "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c), "
    "b AS (SELECT CAST(floor(log2(n)) AS INT) AS bucket, count(*) AS n_keys, "
    " CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT) AS max_key_rows "
    " FROM c GROUP BY 1) "
    "SELECT bucket, n_keys, n_rows, max_key_rows, "
    "round(n_rows * 1.0 / total, 6) AS row_share FROM b CROSS JOIN t",
    desc=(
        "Shuffle-skew diagnostic: log2-bucketed histogram of per-key row "
        "counts with each bucket's share of all rows — the pre-flight "
        "check before a big groupBy/join that decides whether salting or "
        "AQE skew-join is needed. Two aggregates, the second over "
        "|log2 buckets| rows."
    ),
)(
    lambda spark, sf_dir: stats.key_skew_profile(
        _t(spark, sf_dir, "events"), "user_id"
    )
)


register(
    "ns_stats_robust_outliers",
    "WITH med AS (SELECT event_type, median(value) AS m FROM events GROUP BY 1), "
    "dev AS (SELECT e.event_type, e.value, m, abs(e.value - m) AS ad "
    " FROM events e JOIN med USING (event_type)), "
    "mad AS (SELECT event_type, median(ad) AS md FROM dev GROUP BY 1) "
    "SELECT dev.event_type, count(*) AS n, round(max(m), 6) AS median, "
    "round(max(md), 6) AS mad, "
    "CAST(sum(CASE WHEN ad > 3.0 * 1.4826 * md THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_outliers "
    "FROM dev JOIN mad USING (event_type) GROUP BY dev.event_type",
    desc=(
        "Robust per-group outliers via median/MAD: |x - median| > "
        "3 * 1.4826 * MAD — the outlier test that is not itself dragged "
        "by the outliers (unlike mean/stddev z-scores, cf. "
        "x_event_rate_anomaly). Two grouped medians + two equi-joins on "
        "the group key."
    ),
)(
    lambda spark, sf_dir: stats.robust_outliers(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )
)
