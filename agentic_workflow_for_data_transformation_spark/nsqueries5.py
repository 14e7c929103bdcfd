"""Round-8 fourth-session registrations: the Gopher heuristic-quality
rule battery, DSIR hashed-n-gram importance weighting, tokenizer
fertility per language, and the schema-evolving JSONL source round
trip. All four carry exact DuckDB oracles (the JSONL query's oracle
recomputes the aggregate straight from the parquet view the fixture
derives from, so the round trip itself is what's checked).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .benchqueries import _t, register
from .operators import corpus, text
from .sources import io as sio

_GOPHER_STOPLIST = "['the','be','to','of','and','that','have','with']"

register(
    "ns_quality_gopher",
    "WITH s AS (SELECT doc_id, text, lang, source, n_chars, "
    " string_split(text, ' ') AS ws, string_split(text, chr(10)) AS ls FROM documents), "
    "sig AS (SELECT doc_id, text, lang, source, n_chars, "
    " CAST(len(ws) AS BIGINT) AS n_words, len(ls) AS nl, "
    " round((length(text) - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE), 6) AS mean_word_len, "
    " (length(text) - length(replace(text, '#', ''))) "
    "   + (length(text) - length(replace(text, '...', ''))) / CAST(3 AS DOUBLE) AS nsym, "
    " len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %')) AS nbul, "
    " len(list_filter(ls, l -> l LIKE '%...')) AS nell, "
    " len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha, "
    " CAST(len(list_distinct(list_filter(ws, w -> list_contains("
    + _GOPHER_STOPLIST + ", lower(w))))) AS BIGINT) AS n_req_stopwords FROM s), "
    "r AS (SELECT doc_id, text, lang, source, n_chars, n_words, mean_word_len, "
    " n_req_stopwords, "
    " round(nsym / n_words, 6) AS symbol_ratio, "
    " round(nbul / CAST(nl AS DOUBLE), 6) AS bullet_ratio, "
    " round(nell / CAST(nl AS DOUBLE), 6) AS ellipsis_ratio, "
    " round(nalpha / CAST(n_words AS DOUBLE), 6) AS alpha_ratio FROM sig) "
    "SELECT *, "
    " n_words BETWEEN 50 AND 100000 AS r_word_count, "
    " mean_word_len BETWEEN 3.0 AND 10.0 AS r_word_len, "
    " symbol_ratio <= 0.1 AS r_symbols, bullet_ratio <= 0.9 AS r_bullets, "
    " ellipsis_ratio <= 0.3 AS r_ellipsis, alpha_ratio >= 0.8 AS r_alpha, "
    " n_req_stopwords >= 2 AS r_stopwords, "
    " (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0) "
    " AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3 "
    " AND alpha_ratio >= 0.8 AND n_req_stopwords >= 2 AS passes_gopher "
    "FROM r",
    desc=(
        "Gopher quality-rule battery (Rae et al. 2021 table A1): word-count "
        "bounds, mean-word-length band, symbol/bullet/ellipsis ratios, "
        "alphabetic-word fraction, two-distinct-required-stopwords — one "
        "shuffle-free codegen'd projection per document."
    ),
)(
    lambda spark, sf_dir: text.gopher_rules(
        _t(spark, sf_dir, "documents")
    ).select(
        "doc_id", "text", "lang", "source", "n_chars",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len",
        F.col("n_req_stopwords").cast("long").alias("n_req_stopwords"),
        "symbol_ratio", "bullet_ratio", "ellipsis_ratio", "alpha_ratio",
        "r_word_count", "r_word_len", "r_symbols", "r_bullets",
        "r_ellipsis", "r_alpha", "r_stopwords", "passes_gopher",
    )
)


register(
    "ns_corpus_dsir_weights",
    "WITH e AS (SELECT doc_id, lang = 'en' AS is_t, "
    " (('0x' || substr(md5(w), 1, 15))::BIGINT % 16) AS bkt "
    " FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)), "
    "c AS (SELECT bkt, CAST(count(*) AS BIGINT) AS r_k, "
    " CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_k FROM e GROUP BY bkt), "
    "t AS (SELECT CAST(sum(r_k) AS BIGINT) AS r_tot, CAST(sum(t_k) AS BIGINT) AS t_tot FROM c), "
    "lr AS (SELECT bkt, CAST(round(ln((t_k + 1) / CAST(t_tot + 16 AS DOUBLE)) "
    " - ln((r_k + 1) / CAST(r_tot + 16 AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lr FROM c, t) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats, "
    " round(CAST(sum(lr) AS DOUBLE), 6) AS log_weight, "
    " round(CAST(sum(lr) AS DOUBLE) / count(*), 6) AS avg_log_ratio "
    "FROM e JOIN lr USING (bkt) GROUP BY doc_id",
    desc=(
        "DSIR importance weights (arXiv:2302.03169): hashed bag-of-words "
        "log-likelihood ratio of target (lang='en') vs raw distribution per "
        "document — one explode feeds both distribution estimates and the "
        "broadcast scoring join; decimal-exact per-doc sums."
    ),
)(
    lambda spark, sf_dir: corpus.dsir_log_weights(
        _t(spark, sf_dir, "documents"), target_pred=F.col("lang") == "en", d=16
    )
)


register(
    "ns_text_token_fertility",
    "WITH t AS (SELECT lang, len(string_split(text, ' ')) AS n_words, "
    r" len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS n_tokens, "
    " length(text) AS n_chars FROM documents) "
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    " CAST(sum(n_words) AS BIGINT) AS total_words, "
    " CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
    " round(sum(n_tokens) / CAST(sum(n_words) AS DOUBLE), 6) AS tokens_per_word, "
    " round(sum(n_chars) / CAST(sum(n_tokens) AS DOUBLE), 6) AS chars_per_token "
    "FROM t GROUP BY lang",
    desc=(
        "Tokenizer fertility per language: tokens-per-word and "
        "chars-per-token from exact integer sums (one scan, one division "
        "per group) — the over-fragmentation audit run before committing a "
        "corpus to a tokenizer."
    ),
)(
    lambda spark, sf_dir: text.token_fertility_by_lang(_t(spark, sf_dir, "documents"))
)


def _q_source_jsonl(spark, sf_dir: str):
    """Build (idempotently, per scale factor) a two-batch JSONL fixture
    derived from the documents table — batch 0 without the ``source``
    field, batch 1 with it, i.e. a schema that EVOLVED between dumps —
    then read both through read_json_evolving and aggregate. The oracle
    computes the same aggregate straight from the parquet view, so a
    hash match proves the JSONL write -> evolving read round trip is
    lossless including the null-fill of the missing column."""
    # key the fixture on the FULL resolved path, not the basename:
    # testdata/sf0.1 and scaledata/sf0.1 must not share a fixture
    import hashlib

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src) if os.path.exists(src) else None
    stamp = f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns if st else 0}|{st.st_size if st else 0}"
    tag = hashlib.md5(stamp.encode()).hexdigest()[:12]
    base = f"/tmp/spark_graft_jsonl_{tag}"
    docs = _t(spark, sf_dir, "documents")
    if not os.path.exists(base + "/_done"):
        a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
        b = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "n_chars", "source"
        )
        sio.write_json_dir(a.coalesce(4), base + "/batch0")
        sio.write_json_dir(b.coalesce(4), base + "/batch1")
        open(base + "/_done", "w").close()
    u = sio.read_json_evolving(spark, [base + "/batch0", base + "/batch1"])
    return u.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("source").cast("long").alias("n_with_source"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


register(
    "x_source_jsonl_evolving",
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    " CAST(count(CASE WHEN doc_id % 2 = 1 THEN source END) AS BIGINT) AS n_with_source, "
    " CAST(sum(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY lang",
    desc=(
        "Schema-evolving JSONL source round trip: two JSONL batches (the "
        "second gained a column) written from documents, read back via "
        "by-name union with missing-column null-fill, aggregated; oracle "
        "recomputes from the parquet view so the trip itself is checked."
    ),
)(_q_source_jsonl)


# the dsir CTE chain, shared by the weights query's oracle and the
# composed importance-sampling oracle below (templated on nothing —
# target lang 'en', d=16, documents table)
_DSIR_CTES = (
    "e AS (SELECT doc_id, lang = 'en' AS is_t, "
    " (('0x' || substr(md5(w), 1, 15))::BIGINT % 16) AS bkt "
    " FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)), "
    "c AS (SELECT bkt, CAST(count(*) AS BIGINT) AS r_k, "
    " CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_k FROM e GROUP BY bkt), "
    "t AS (SELECT CAST(sum(r_k) AS BIGINT) AS r_tot, CAST(sum(t_k) AS BIGINT) AS t_tot FROM c), "
    "lr AS (SELECT bkt, CAST(round(ln((t_k + 1) / CAST(t_tot + 16 AS DOUBLE)) "
    " - ln((r_k + 1) / CAST(r_tot + 16 AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lr FROM c, t), "
    "w AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats, "
    " round(CAST(sum(lr) AS DOUBLE), 6) AS log_weight, "
    " round(CAST(sum(lr) AS DOUBLE) / count(*), 6) AS avg_log_ratio "
    " FROM e JOIN lr USING (bkt) GROUP BY doc_id)"
)


def _q_dsir_sample(spark, sf_dir: str):
    """DSIR end-to-end: importance weights -> importance RESAMPLING.
    Per language, keep 10 documents without replacement with inclusion
    probability proportional to exp(avg log-likelihood ratio) — the
    Efraimidis-Spirakis priority u^(1/weight) over the deterministic
    per-doc hash draw, i.e. the published DSIR recipe's selection step
    made reproducible. The weights chain reuses dsir_log_weights
    unchanged; the join back to the corpus is on doc_id (at 100 TB the
    weight table is doc-count-sized, co-partitioned by the same key)."""
    docs = _t(spark, sf_dir, "documents")
    w = corpus.dsir_log_weights(docs, target_pred=F.col("lang") == "en", d=16)
    j = docs.select("doc_id", "lang").join(w, "doc_id").withColumn(
        "samp_weight", F.exp(F.col("avg_log_ratio"))
    )
    from .operators import sampling

    sel = sampling.weighted_sample_per_group(
        j, group_col="lang", weight_col="samp_weight", k=10,
        key_col="doc_id", salt="dsir",
    )
    return sel.select("doc_id", "lang", "n_feats", "log_weight")


register(
    "ns_corpus_dsir_sample",
    f"WITH {_DSIR_CTES}, "
    "jw AS (SELECT d.doc_id, d.lang, w.n_feats, w.log_weight, "
    " exp(w.avg_log_ratio) AS samp_weight FROM documents d JOIN w ON d.doc_id = w.doc_id), "
    "p AS (SELECT *, pow((('0x' || substr(md5('dsir|' || doc_id), 1, 15))::BIGINT + 1) "
    " / 1152921504606846976.0, 1.0 / samp_weight) AS pri FROM jw), "
    "r AS (SELECT doc_id, lang, n_feats, log_weight, row_number() OVER "
    " (PARTITION BY lang ORDER BY pri DESC, doc_id ASC) AS rn FROM p) "
    "SELECT doc_id, lang, n_feats, log_weight FROM r WHERE rn <= 10",
    desc=(
        "DSIR importance RESAMPLING: the weights chain composed with "
        "per-language Efraimidis-Spirakis selection at probability "
        "proportional to exp(avg log-likelihood ratio) — fully "
        "deterministic, the complete published DSIR recipe end-to-end."
    ),
)(_q_dsir_sample)


def _q_source_orc(spark, sf_dir: str):
    """Partition-pruned ORC source round trip: events land (idempotent
    stamped fixture) as a hive-partitioned ORC layout keyed on
    event_type; the query reads ONLY two partitions back (the filter
    prunes directories at planning time, pinned in test_plans) and
    aggregates. The oracle recomputes from the parquet view, so the
    ORC write -> partitioned read -> prune path is what's checked.
    Timestamps stay out of the round trip on purpose: value/ids are
    binary-exact in ORC, and the determinism contract stays trivial."""
    import hashlib

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    st = os.stat(src) if os.path.exists(src) else None
    stamp = f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns if st else 0}|{st.st_size if st else 0}"
    base = f"/tmp/spark_graft_orc_{hashlib.md5(stamp.encode()).hexdigest()[:12]}"
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    if not os.path.exists(base + "/_done"):
        sio.write_orc_dir(ev.repartition(4), base + "/data",
                          partition_by=["event_type"])
        open(base + "/_done", "w").close()
    back = sio.read_orc(spark, base + "/data")
    return (
        back.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


register(
    "x_source_orc_partitioned",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
    " CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
    " CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM events WHERE event_type IN ('click', 'view') GROUP BY event_type",
    desc=(
        "Hive-partitioned ORC source round trip: events written "
        "partitionBy(event_type), read back with an IN filter that "
        "prunes to 2 of 5 partition directories at planning time; "
        "oracle recomputes from the parquet view."
    ),
)(_q_source_orc)


def _q_frequent_items(spark, sf_dir: str):
    """Frequent-items sketch accuracy harness (Karp et al. single-pass
    heavy hitters, Spark's df.stat.freqItems): the 100 TB path for
    'which values dominate this column' without a full group-by when
    only the candidate SET is needed. The candidate list is
    order-unstable and may contain false positives, so what's
    hash-checked is the one-sided GUARANTEE: every value with true
    frequency > support * n MUST appear among the candidates
    (found_by_sketch is TRUE on every emitted row, same contract shape
    as the Bloom screen and the HLL rsd bound). The exact counts run
    beside the sketch here because this is the harness."""
    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    tot = exact.agg(F.sum("true_count").cast("long").alias("n"))
    cand = ev.stat.freqItems(["event_type"], support=0.1)
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("true_count") > 0.1 * F.col("n"))
        .crossJoin(F.broadcast(cand))
        .select(
            "event_type",
            "true_count",
            F.array_contains(
                F.col("event_type_freqItems"), F.col("event_type")
            ).alias("found_by_sketch"),
        )
    )


register(
    "x_frequent_items",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS true_count, "
    "TRUE AS found_by_sketch FROM events GROUP BY event_type "
    "HAVING count(*) > 0.1 * (SELECT count(*) FROM events)",
    desc=(
        "Single-pass frequent-items sketch with a one-sided guarantee "
        "oracle: every value above the support threshold must be among "
        "the sketch's candidates — a miss hash-mismatches instead of "
        "hiding behind err:no_oracle."
    ),
)(_q_frequent_items)


def _gopher_rep_sql() -> str:
    from .operators.text import GOPHER_REP_BOUNDS as GB

    rules = {
        "r_dup_lines": f"dup_line_frac <= {GB['max_dup_line_frac']}",
        "r_dup_line_chars": f"dup_line_char_frac <= {GB['max_dup_line_char_frac']}",
        "r_top_2gram": f"top2gram_char_frac <= {GB['max_top2gram_char_frac']}",
        "r_dup_5gram": f"dup5gram_char_frac <= {GB['max_dup5gram_char_frac']}",
    }
    rule_cols = ", ".join(f"({e}) AS {n}" for n, e in rules.items())
    passes = " AND ".join(f"({e})" for e in rules.values())
    return (
        "WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents), "
        "pl AS (SELECT doc_id, ln, count(*) AS cnt FROM l GROUP BY 1, 2), "
        "ls AS (SELECT doc_id, "
        " round(sum(cnt - 1) / CAST(sum(cnt) AS DOUBLE), 6) AS dup_line_frac, "
        " round(sum((cnt - 1) * length(ln)) "
        "  / CAST(greatest(sum(cnt * length(ln)), 1) AS DOUBLE), 6) AS dup_line_char_frac "
        " FROM pl GROUP BY 1), "
        "w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), "
        " i -> ws[i] || ' ' || ws[i+1])) AS s FROM w WHERE len(ws) >= 2), "
        "p2 AS (SELECT doc_id, s, count(*) AS cnt FROM g2 GROUP BY 1, 2), "
        "t2 AS (SELECT doc_id, CASE WHEN cnt > 1 THEN cnt * length(s) ELSE 0 END AS t2c, "
        " row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, s) AS rn FROM p2), "
        "g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3), "
        " i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS s "
        " FROM w WHERE len(ws) >= 5), "
        "p5 AS (SELECT doc_id, s, count(*) AS cnt FROM g5 GROUP BY 1, 2), "
        "d5 AS (SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt * length(s) ELSE 0 END) AS d5c "
        " FROM p5 GROUP BY 1), "
        "o AS (SELECT b.doc_id, length(b.text) AS n_chars, "
        " ls.dup_line_frac, ls.dup_line_char_frac, "
        " round(coalesce(t2.t2c, 0) / CAST(length(b.text) AS DOUBLE), 6) AS top2gram_char_frac, "
        " round(coalesce(d5.d5c, 0) / CAST(length(b.text) AS DOUBLE), 6) AS dup5gram_char_frac "
        " FROM documents b JOIN ls USING (doc_id) "
        " LEFT JOIN (SELECT doc_id, t2c FROM t2 WHERE rn = 1) t2 USING (doc_id) "
        " LEFT JOIN d5 USING (doc_id)) "
        f"SELECT *, {rule_cols}, ({passes}) AS passes_gopher_rep FROM o"
    )


register(
    "ns_quality_gopher_rep",
    _gopher_rep_sql(),
    desc=(
        "Gopher repetition rules (Rae et al. 2021 table A1, second half): "
        "duplicate-line fraction by count and character mass, the "
        "character fraction of the most frequent word 2-gram, and the "
        "character fraction inside duplicated 5-grams — three map-side-"
        "combined explodes joined back on the doc key; thresholds shared "
        "with the oracle via text.GOPHER_REP_BOUNDS."
    ),
)(
    lambda spark, sf_dir: text.gopher_repetition(
        _t(spark, sf_dir, "documents")
    )
)


_HEAPS_CUTS = [125_000, 250_000, 500_000, 1_000_000]


def _heaps_sql() -> str:
    dr = "(('0x' || substr(md5('heaps|' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000000)"
    one_cols = ", ".join(
        f"CAST(count(CASE WHEN dr < {c} THEN 1 END) AS BIGINT) AS tok{i}, "
        f"CAST(count(DISTINCT CASE WHEN dr < {c} THEN w END) AS BIGINT) AS typ{i}"
        for i, c in enumerate(_HEAPS_CUTS)
    )
    pts = " UNION ALL ".join(
        f"SELECT CAST({c} AS BIGINT) AS draw_cut, tok{i} AS n_tokens, typ{i} AS n_types FROM one"
        for i, c in enumerate(_HEAPS_CUTS)
    )
    x = "CAST(round(ln(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))"
    y = "CAST(round(ln(CAST(n_types AS DOUBLE)), 6) AS DECIMAL(18,6))"
    return (
        f"WITH e AS (SELECT {dr} AS dr, unnest(string_split(text, ' ')) AS w FROM documents), "
        f"one AS (SELECT {one_cols} FROM e), "
        f"pts AS ({pts}), "
        f"xy AS (SELECT {x} AS x, {y} AS y FROM pts), "
        "m AS (SELECT count(*) AS np, CAST(sum(x) AS DOUBLE) AS sx, "
        " CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(x * x) AS DOUBLE) AS sxx, "
        " CAST(sum(x * y) AS DOUBLE) AS sxy FROM xy), "
        "b AS (SELECT round(CASE WHEN np * sxx - sx * sx <> 0 "
        " THEN (np * sxy - sx * sy) / (np * sxx - sx * sx) END, 6) + 0.0 AS heaps_beta FROM m) "
        "SELECT draw_cut, n_tokens, n_types, heaps_beta FROM pts, b"
    )


register(
    "ns_text_heaps_fit",
    _heaps_sql(),
    desc=(
        "Heaps'-law vocabulary-growth fit over four nested deterministic "
        "hash subsamples (1/8 .. all): single-scan multi-count-distinct "
        "aggregate, OLS slope of ln(types) on ln(tokens) — the lexical-"
        "diversity diagnostic beside the Zipf fit."
    ),
)(
    lambda spark, sf_dir: text.heaps_fit(_t(spark, sf_dir, "documents"))
)
