"""Semantic tests for corpus-construction operators (decontamination,
sequence packing, stratified sampling, deterministic shuffle, source
filtering). The sf0.01 DuckDB oracle covers them at data scale; these
pin the edge-case semantics the oracle hash can't explain on failure."""

from __future__ import annotations

from pyspark.sql import functions as F

from agentic_workflow_for_data_transformation_spark.operators import corpus
from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_decontamination_flags_only_overlapping_docs(spark):
    bench = _docs(spark, [(100, "en", "the quick brown fox jumps")])
    corp = _docs(
        spark,
        [
            (1, "en", "we saw the quick brown fox yesterday"),  # shares 3-gram
            (2, "en", "entirely unrelated words in this text"),
            (3, "en", "short"),  # < n words: no shingles, never flagged
        ],
    )
    hit = {r["doc_id"] for r in corpus.contaminated_ids(corp, bench).collect()}
    assert hit == {1}


def test_decontamination_empty_benchmark_flags_nothing(spark):
    bench = _docs(spark, []).filter(F.lit(False))
    corp = _docs(spark, [(1, "en", "any text at all here")])
    assert corpus.contaminated_ids(corp, bench).count() == 0


def test_pack_sequences_respects_budget_and_order(spark):
    # 5 docs of 4 tokens each, budget 8 -> sequences of 2, 2, 1 docs
    rows = [(i, "en", "a b c d") for i in range(5)]
    out = corpus.pack_sequences(_docs(spark, rows), budget=8, group_size=1024)
    got = {
        (r["seq_id"], r["n_docs"], r["first_doc"], r["last_doc"])
        for r in out.collect()
    }
    assert got == {(0, 2, 0, 1), (1, 2, 2, 3), (2, 1, 4, 4)}


def test_pack_sequences_doc_larger_than_budget_gets_own_bin(spark):
    rows = [(0, "en", " ".join(["w"] * 20)), (1, "en", "a b")]
    out = corpus.pack_sequences(_docs(spark, rows), budget=8, group_size=1024)
    by_seq = {r["seq_id"]: r["n_docs"] for r in out.collect()}
    # the oversized doc fills seq 0 alone; the next doc starts past it
    assert by_seq[0] == 1 and sum(by_seq.values()) == 2


def test_pack_sequences_group_boundary_resets_packing(spark):
    # same doc stream, tiny groups: packing restarts at each group, so
    # a (lang, grp, seq_id) triple never mixes docs across groups
    rows = [(i, "en", "a b c d") for i in range(6)]
    out = corpus.pack_sequences(_docs(spark, rows), budget=8, group_size=2)
    for r in out.collect():
        assert r["first_doc"] // 2 == r["last_doc"] // 2 == r["grp"]


def test_stratified_sample_rates_and_subset(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    out = corpus.stratified_hash_sample(
        docs, rates={"en": 0.2}, default_rate=0.8
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = out.filter(F.col("lang") == "en").count()
    n_rest = docs.filter(F.col("lang") != "en").count()
    k_rest = out.filter(F.col("lang") != "en").count()
    assert 0.05 * n_en <= k_en <= 0.4 * n_en  # ~20%
    assert 0.6 * n_rest <= k_rest <= 0.95 * n_rest  # ~80%
    # zero default rate drops unlisted strata entirely
    only_en = corpus.stratified_hash_sample(docs, rates={"en": 1.0})
    assert only_en.filter(F.col("lang") != "en").count() == 0
    assert only_en.filter(F.col("lang") == "en").count() == n_en


def test_sharded_shuffle_is_a_permutation(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    out = corpus.sharded_shuffle(docs, n_shards=4)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # positions are dense 1..k within each shard
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"]
    # deterministic across runs
    a = sorted(out.collect())
    b = sorted(corpus.sharded_shuffle(docs, n_shards=4).collect())
    assert a == b


def test_source_filter_keeps_whole_sources(spark):
    rows = [
        (1, "long_src", 100),
        (2, "long_src", 100),
        (3, "short_src", 1),
        (4, "short_src", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = corpus.filter_sources_by_mean_len(df)
    assert {r["source"] for r in out.collect()} == {"long_src"}
    assert out.count() == 2  # every doc of the surviving source stays


def test_chunk_documents_overlap_and_tail(spark):
    # 10 words, size 4, stride 2 -> starts 1,3,5,7,9; last chunk short
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = sorted(
        corpus.chunk_documents(df, size=4, stride=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["n_chunk_words"] for r in out] == [4, 4, 4, 4, 2]
    # chunk 1 covers words 2..5 (1-based starts: 3..6)
    import hashlib

    expected = hashlib.md5(" ".join(words[2:6]).encode()).hexdigest()
    assert out[1]["chunk_md5"] == expected


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(7, "only three words")], "doc_id long, text string")
    out = corpus.chunk_documents(df, size=32, stride=16).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0 and out[0]["n_chunk_words"] == 3


def test_apply_mix_sampling_hits_budget_and_shares(spark, sf_dir):
    """The materialized mix must land near the document budget with
    group shares pulled toward the temperature weights (flatter than
    raw shares), deterministically across invocations."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        apply_mix_sampling,
        mix_weights,
    )
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    budget = 200
    out = apply_mix_sampling(docs, budget=budget)
    n = out.count()
    # hash sampling is binomial around the target; generous bounds
    assert 0.6 * budget <= n <= 1.4 * budget
    # determinism: the same call returns the same rows
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in apply_mix_sampling(docs, budget=budget).select("doc_id").collect()}
    assert ids == ids2
    # kept rows per group never exceed the group's population, and
    # every group with a positive keep rate is represented
    want_w = {r[0]: r["weight"] for r in mix_weights(docs).collect()}
    got = {r[0]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    raw = {r[0]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for g, kept in got.items():
        assert kept <= raw[g]
    assert set(got) == set(w for w in want_w if want_w[w] > 0)


def test_merge_agg_states_equals_full_recompute(spark):
    from agentic_workflow_for_data_transformation_spark.operators import corpus
    from pyspark.sql import functions as F

    rows = [(i, ["en", "de", "fr"][i % 3], 10 + (i * 7) % 50) for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    # three "daily batches" merged out of order must equal one full pass
    batches = [df.filter(F.col("doc_id") % 3 == r) for r in (2, 0, 1)]
    inc = corpus.merge_agg_states(
        *[corpus.agg_state(b, ["lang"], "n_chars") for b in batches]
    )
    full = corpus.agg_state(df, ["lang"], "n_chars")
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # merging a state with an empty batch is a no-op
    empty = corpus.agg_state(df.filter(F.lit(False)), ["lang"], "n_chars")
    again = corpus.merge_agg_states(full, empty)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, full.collect()))


def test_contamination_scores_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import corpus

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # full overlap -> 1.0
            (2, "alpha beta gamma epsilon zeta"), # 1 of 3 grams hit
            (3, "one two three four"),            # no overlap -> 0.0
            (4, "xy"),                            # too short -> omitted
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           corpus.contamination_scores(train, bench).collect()}
    assert out[1]["contamination"] == 1.0
    assert out[2]["n_grams"] == 3 and out[2]["n_hit"] == 1
    assert out[3]["contamination"] == 0.0
    assert 4 not in out


def test_bloom_decontamination_one_sided(spark):
    """The Bloom screen must flag EVERY document the exact operator
    flags (no false negatives — the guarantee that makes screen-then-
    verify sound) and over-flag only a bounded sliver (false-positive
    side of the bitset)."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        contaminated_ids,
        contaminated_ids_bloom,
    )
    from agentic_workflow_for_data_transformation_spark.sources import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, "/root/testdata/sf0.001", "documents")
    corpus_side = docs.filter(F.col("doc_id") % 7 != 0)
    bench_side = docs.filter(F.col("doc_id") % 7 == 0)
    exact = {r["doc_id"] for r in contaminated_ids(corpus_side, bench_side).collect()}
    flagged = {
        r["doc_id"]
        for r in contaminated_ids_bloom(corpus_side, bench_side).collect()
    }
    assert exact <= flagged  # one-sided: no false negatives, ever
    n_corpus = corpus_side.count()
    # FP head-room: extra flags stay a small sliver of the CLEAN docs
    assert len(flagged - exact) <= max(5, 0.05 * (n_corpus - len(exact)))


# ------------------------------------------------------- gopher rules


def test_gopher_rules_flags_each_rule_independently(spark):
    from agentic_workflow_for_data_transformation_spark.operators import text as t

    long_good = " ".join(["the", "cat", "sat", "onto", "with"] * 12)  # 60 words
    short = "the cat sat with mat"  # 5 words -> fails word count
    no_stop = " ".join(["zig", "zag", "fizz", "buzz"] * 15)  # no required stopwords
    symbols = " ".join(["the", "with", "###", "#tag"] * 15)  # heavy '#'
    rows = [
        (1, "en", long_good),
        (2, "en", short),
        (3, "en", no_stop),
        (4, "en", symbols),
    ]
    out = {
        r["doc_id"]: r
        for r in t.gopher_rules(_docs(spark, rows)).collect()
    }
    assert out[1]["passes_gopher"]
    assert not out[2]["r_word_count"] and not out[2]["passes_gopher"]
    assert not out[3]["r_stopwords"] and not out[3]["passes_gopher"]
    assert not out[4]["r_symbols"] and not out[4]["passes_gopher"]
    # rules that should still hold on the failing docs
    assert out[2]["r_alpha"] and out[3]["r_word_count"]


def test_gopher_rules_bullet_and_ellipsis_lines(spark):
    from agentic_workflow_for_data_transformation_spark.operators import text as t

    body = " ".join(["the", "word", "with", "of"] * 15)
    bullets = "\n".join(["- item one here"] * 9 + [body])  # 90% bullet lines
    dots = "\n".join([body] + ["trailing words..."] * 9)  # 90% ellipsis lines
    rows = [(1, "en", bullets), (2, "en", dots)]
    out = {r["doc_id"]: r for r in t.gopher_rules(_docs(spark, rows)).collect()}
    assert out[1]["bullet_ratio"] == 0.9 and out[1]["r_bullets"]  # <= 0.9 passes
    assert out[2]["ellipsis_ratio"] == 0.9 and not out[2]["r_ellipsis"]


# --------------------------------------------------------------- DSIR


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from pyspark.sql import functions as F

    # target docs speak 'alpha beta', raw background speaks 'gamma delta'
    rows = [(i, "en", "alpha beta alpha beta alpha") for i in range(5)] + [
        (i, "de", "gamma delta gamma delta gamma") for i in range(5, 10)
    ] + [(10, "de", "alpha beta alpha beta alpha")]  # de doc with en-like text
    out = corpus.dsir_log_weights(
        _docs(spark, rows), target_pred=F.col("lang") == "en", d=16
    )
    w = {r["doc_id"]: r["log_weight"] for r in out.collect()}
    # every target-vocab doc outscores every background-vocab doc,
    # including the background-labeled doc with target-like content
    assert min(w[i] for i in [0, 10]) > max(w[i] for i in range(5, 10))
    assert w[10] == w[0]  # weight depends only on content, not the label
    # n_feats = word count
    nf = {r["doc_id"]: r["n_feats"] for r in out.collect()}
    assert nf[0] == 5


def test_dsir_weights_uniform_when_target_is_everything(spark):
    from pyspark.sql import functions as F

    rows = [(1, "en", "a b c"), (2, "en", "d e f g")]
    out = corpus.dsir_log_weights(
        _docs(spark, rows), target_pred=F.lit(True), d=16
    ).collect()
    # p_target == p_raw for every bucket -> all log-ratios are 0
    assert all(r["log_weight"] == 0.0 for r in out)


# ------------------------------------------------- token fertility


def test_token_fertility_exact_on_tiny_corpus(spark):
    from agentic_workflow_for_data_transformation_spark.operators import text as t

    rows = [(1, "en", "don't stop"), (2, "en", "ok go"), (3, "fr", "oui oui")]
    out = {r["lang"]: r for r in t.token_fertility_by_lang(_docs(spark, rows)).collect()}
    # "don't stop" -> tokens: don ' t stop = 4; "ok go" -> 2; words 2+2
    assert out["en"]["total_words"] == 4 and out["en"]["total_tokens"] == 6
    assert out["en"]["tokens_per_word"] == 1.5
    assert out["fr"]["tokens_per_word"] == 1.0


def test_gopher_repetition_signals_exact(spark):
    from agentic_workflow_for_data_transformation_spark.operators import text as t

    body = "alpha beta gamma delta epsilon zeta"      # 6 words, no repeats
    dup_lines = "\n".join(["same line here", "same line here", "other line"])
    rep2gram = "go go go go stop"                      # top 2-gram 'go go' x3
    rows = [(1, "en", body), (2, "en", dup_lines), (3, "en", rep2gram)]
    out = {r["doc_id"]: r for r in t.gopher_repetition(_docs(spark, rows)).collect()}
    # doc 1: single line, all distinct grams -> all zeros, passes
    assert out[1]["dup_line_frac"] == 0.0 and out[1]["passes_gopher_rep"]
    # doc 2: 1 of 3 lines is a duplicate occurrence
    assert out[2]["dup_line_frac"] == round(1 / 3, 6)
    assert not out[2]["r_dup_lines"] or out[2]["dup_line_frac"] <= 0.3
    # doc 2 duplicate-line chars: 14 of (14*2 + 10) = 14/38
    assert out[2]["dup_line_char_frac"] == round(14 / 38, 6)
    # doc 3: 'go go' occurs 3x, len 5, text len 16 -> 15/16
    assert out[3]["top2gram_char_frac"] == round(15 / 16, 6)
    assert not out[3]["r_top_2gram"] and not out[3]["passes_gopher_rep"]
    # doc 3 is 5 words -> exactly one 5-gram, no duplicates
    assert out[3]["dup5gram_char_frac"] == 0.0


def test_heaps_fit_positive_beta_on_growing_vocabulary(spark):
    from agentic_workflow_for_data_transformation_spark.operators import text as t

    # every doc contributes fresh words plus a small shared core, so
    # vocabulary genuinely grows with sample size -> 0 < beta <= 1
    rows = [
        (i, "en", " ".join([f"w{i}_{j}" for j in range(6)] + ["the", "of"]))
        for i in range(64)
    ]
    out = sorted(
        (r["draw_cut"], r["n_tokens"], r["n_types"], r["heaps_beta"])
        for r in t.heaps_fit(_docs(spark, rows)).collect()
    )
    assert len(out) == 4
    cuts, toks, typs, betas = zip(*out)
    assert list(cuts) == [125_000, 250_000, 500_000, 1_000_000]
    assert toks[-1] == 64 * 8 and typs[-1] == 64 * 6 + 2
    # nested subsamples: counts monotone non-decreasing
    assert all(a <= b for a, b in zip(toks, toks[1:]))
    assert all(a <= b for a, b in zip(typs, typs[1:]))
    assert len(set(betas)) == 1 and 0.0 < betas[0] <= 1.0


def test_dup_rate_by_source_exact_on_tiny_corpus(spark):
    """Hand-checkable 2-source corpus with n=2 grams: s1 has an
    intra-source duplicated gram, one gram is shared across sources,
    and a too-short doc counts in n_docs but contributes no grams."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        dup_rate_by_source,
    )

    rows = [
        # s1 doc 1: grams "a b", "b c"
        (1, "a b c", "s1"),
        # s1 doc 2: grams "a b", "b x"   -> "a b" duplicated within s1
        (2, "a b x", "s1"),
        # s2 doc 3: grams "b c", "c y"   -> "b c" shared with s1 doc 1
        (3, "b c y", "s2"),
        # s2 doc 4: one word, no 2-grams, still a document
        (4, "z", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r["source"]: r for r in dup_rate_by_source(df, n=2).collect()}

    s1, s2 = out["s1"], out["s2"]
    assert s1["n_docs"] == 2 and s2["n_docs"] == 2
    # s1 occurrences: a b (x2), b c, b x = 4 over 3 distinct grams
    assert s1["n_gram_occ"] == 4 and s1["n_distinct_grams"] == 3
    # dup grams in s1: "a b" (2 docs) + "b c" (shared with s2) -> 3 occ
    assert s1["dup_gram_ratio"] == round(3 / 4, 6)
    # cross-source grams in s1: only "b c" -> 1 occ of 4
    assert s1["cross_source_ratio"] == round(1 / 4, 6)
    # s2 occurrences: b c, c y = 2; "b c" is both dup and cross
    assert s2["n_gram_occ"] == 2 and s2["n_distinct_grams"] == 2
    assert s2["dup_gram_ratio"] == round(1 / 2, 6)
    assert s2["cross_source_ratio"] == round(1 / 2, 6)


def test_snapshot_diff_classifies_all_statuses(spark):
    """added / removed / changed each classified; unchanged rows never
    appear in the output."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        snapshot_diff,
    )

    v1 = spark.createDataFrame(
        [(1, "same"), (2, "old text"), (3, "gone")],
        "doc_id bigint, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "same"), (2, "new text"), (4, "fresh")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(v1, v2).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_corpus_datacard_known_values(spark):
    # 4 docs, one exact duplicate text, two langs, two sources:
    # every metric is hand-computable.
    import math

    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        corpus_datacard,
    )

    rows = [
        (1, "a b", "en", "s1", 10),
        (2, "a b", "en", "s1", 20),   # exact dup of doc 1
        (3, "a c", "en", "s2", 30),
        (4, "d d", "de", "s2", 40),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = {
        (r["section"], r["key"], r["metric"]): r["value"]
        for r in corpus_datacard(df).collect()
    }
    assert got[("corpus", "all", "n_docs")] == 4.0
    assert got[("corpus", "all", "dup_text_ratio")] == 0.25
    assert got[("corpus", "all", "n_tokens")] == 8.0
    assert got[("corpus", "all", "distinct_words")] == 4.0
    assert got[("length", "all", "p50_chars")] == 25.0   # interpolated
    assert got[("lang", "en", "doc_share")] == 0.75
    assert got[("source", "s2", "doc_share")] == 0.5
    # en tokens: a=3, b=2, c=1 of 6 -> entropy = -sum p ln p
    p = [3 / 6, 2 / 6, 1 / 6]
    want = round(-sum(x * math.log(x) for x in p), 6)
    assert got[("lang", "en", "unigram_entropy")] == want
    assert got[("lang", "de", "unigram_entropy")] == 0.0  # single word


def test_pack_efficiency_consistent_with_pack_sequences(spark):
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        pack_efficiency,
        pack_sequences,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(df, budget=256, group_size=128).collect()
    eff = {r["lang"]: r for r in
           pack_efficiency(df, budget=256, group_size=128).collect()}
    # per-language sequence counts and token sums must reconcile
    from collections import defaultdict
    n, tok = defaultdict(int), defaultdict(int)
    for r in packed:
        n[r["lang"]] += 1
        tok[r["lang"]] += r["seq_tokens"]
    for lang, r in eff.items():
        assert r["n_seqs"] == n[lang]
        assert r["total_tokens"] == tok[lang]
        assert 0.0 <= r["waste_ratio"] <= 1.0
        # fill + waste accounts for every budgeted slot except overflow
        assert r["mean_fill"] >= 1.0 - r["waste_ratio"] - 1e-6
