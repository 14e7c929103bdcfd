"""Semantics tests for the north-star operators (dedup / similarity /
text / multimodal) on small planted fixtures, independent of the
driver's DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from agentic_workflow_for_data_transformation_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = "the quick brown fox jumps over the lazy cat and runs far away today"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, near),  # near-duplicate (one word differs)
        (4, "completely different words about spark engines and data pipelines"),
        (5, "ab"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    # groups on md5(text) so the shuffle carries digests, not documents
    out = {r["text_md5"]: (r["keeper_id"], r["n_copies"]) for r in dedup.exact_dedup_groups(docs).collect()}
    assert len(out) == 4  # 5 docs, one exact dup
    dup_key = [k for k, (_, n) in out.items() if n == 2]
    assert len(dup_key) == 1 and out[dup_key[0]][0] == 1
    import hashlib
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    assert dup_key[0] == hashlib.md5(base.encode()).hexdigest()


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs[(1, 2)] == 1.0  # identical
    assert 0.5 < pairs[(1, 3)] < 1.0  # one-word-off near dup
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_candidates_recall(docs):
    cand = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in cand and (1, 3) in cand and (2, 3) in cand
    assert (1, 4) not in cand


def test_lsh_verified_pipeline(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           dedup.lsh_verified_pairs(docs, threshold=0.5).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}


def test_simhash_identical_and_near(docs):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2]  # identical text -> identical fingerprint
    assert len(fp[1]) == 16 and set(fp[1]) <= {"0", "1"}
    ham_near = sum(a != b for a, b in zip(fp[1], fp[3]))
    ham_far = sum(a != b for a, b in zip(fp[1], fp[4]))
    assert ham_near <= ham_far  # near-dup at most as far as unrelated doc


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),   # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0], 1),  # opposite, other label
        (4, [0.8, 0.2, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_topk_bruteforce(vectors):
    out = [(r["vec_id"], r["cos_sim"]) for r in
           similarity.topk_cosine_bruteforce(vectors, query_id=0, k=2).collect()]
    assert [v for v, _ in out] == [1, 4]
    assert out[0][1] > 0.99


def test_topk_lsh_prunes_bucket(vectors):
    out = [r["vec_id"] for r in
           similarity.topk_cosine_lsh(vectors, query_id=0, k=5, bits=4).collect()]
    assert 3 not in out  # negative-sign bucket pruned
    assert out and out[0] == 1


def test_knn_per_label(vectors):
    out = {r["vec_id"]: r["nn_vec_id"] for r in
           similarity.knn_join_per_label(vectors, k=1).collect()}
    assert out[0] == 1 and out[1] == 0
    assert out[3] == 4 and out[4] == 3  # label-1 block only has each other


def test_text_operators(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat!"), (2, "der hund und die katze ist da")],
        ["doc_id", "text"],
    )
    toks = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in
            text.with_token_counts(df).collect()}
    assert toks[1] == (5, 6)  # '!' is its own token
    quality = {r["doc_id"]: r for r in text.with_quality_score(df).collect()}
    assert 0.0 <= quality[1]["quality_score"] <= 1.0
    assert quality[1]["stopword_ratio"] == 0.6  # the, and, the
    langs = {r["doc_id"]: r["pred_lang"] for r in text.with_lang_id(df).collect()}
    assert langs[1] == "en" and langs[2] == "de"
    fp = {r["doc_id"]: r for r in text.with_fingerprint(df).collect()}
    assert fp[1]["fp_md5"] != fp[2]["fp_md5"]
    assert fp[1]["fp_prefix"] == fp[1]["fp_md5"][:16]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "a" * 300)], ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in
           multimodal.extract_media_meta(multimodal.with_binary_payload(df)).collect()}
    assert out[1]["n_bytes"] == 3 and out[1]["fake_width"] == 3 and out[1]["fake_height"] == 0
    assert out[2]["n_bytes"] == 300 and out[2]["fake_width"] == 44 and out[2]["fake_height"] == 1
    assert out[1]["media_format"] == "fake"
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"\x89PNG")


def test_connected_components_chain_triangle_singleton(spark):
    from agentic_workflow_for_data_transformation_spark.operators import dedup

    # graph: chain 1-2-3 (diameter > 1), triangle 10-11-12, singleton 99
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 12, 99)], "id long")
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(edges, nodes, id_col="id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_duplicate_clusters_cover_all_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    from agentic_workflow_for_data_transformation_spark.operators import dedup
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    clusters = dedup.duplicate_clusters(docs, threshold=0.5)
    assert clusters.count() == docs.count()  # every doc gets a cluster
    # cluster representative is a member of its own cluster
    reps = clusters.select(F.col("cluster_id").alias("doc_id")).distinct()
    missing = reps.join(clusters.select("doc_id").distinct(), "doc_id", "left_anti").count()
    assert missing == 0


def test_approx_count_distinct_within_rsd_bound(spark):
    """The registered x_approx_count_distinct harness (round-8
    bounds-style oracle) must report exact counts matching a direct
    recompute and every within_rsd_bound TRUE (HLL++ is deterministic
    for fixed input, so this is a hard gate)."""
    from agentic_workflow_for_data_transformation_spark.benchqueries import queries
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.01"
    rows = {
        r["o_orderpriority"]: r
        for r in queries()["x_approx_count_distinct"](spark, sf_dir).collect()
    }
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    exact = {
        r["o_orderpriority"]: r["exact"]
        for r in read_parquet_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(rows) == set(exact)
    for key, ex in exact.items():
        assert rows[key]["exact_custs"] == ex
        assert rows[key]["within_rsd_bound"] is True, key


def test_redact_text_masks_emails_and_numbers(spark):
    from agentic_workflow_for_data_transformation_spark.operators.text import redact_text

    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@site.co.uk or call 5551234567 ext 12"),
         (2, "clean text, nothing to mask")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in redact_text(df).collect()}
    assert rows[1]["redacted"] == "mail me at <EMAIL> or call <NUM> ext 12"
    assert rows[1]["n_masked"] == 2
    assert rows[2]["redacted"] == "clean text, nothing to mask"
    assert rows[2]["n_masked"] == 0


def test_quantize_int8_roundtrip_bound(spark):
    from agentic_workflow_for_data_transformation_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[0]["qvec"] == [127, -64, 32, 0] and abs(rows[0]["scale"] - 1 / 127) < 1e-9
    assert rows[1]["qvec"] == [0, 0, 0, 0] and rows[1]["scale"] == 1.0  # zero vector
    # dequantization error is bounded by half a quantization step
    # (1e-6 slack: the emitted scale is display-rounded to 9 decimals,
    # and exact-half inputs like -0.5/scale = -63.5 sit on the bound)
    for r in rows.values():
        orig = {0: [1.0, -0.5, 0.25, 0.0], 1: [0.0, 0.0, 0.0, 0.0]}[r["vec_id"]]
        for x, q in zip(orig, r["qvec"]):
            assert abs(x - q * r["scale"]) <= r["scale"] / 2 + 1e-6


def test_minhash_estimate_identical_docs_score_one(spark):
    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        minhash_estimate_pairs,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(0, text), (1, text), (2, "completely different words entirely unrelated content here")],
        ["doc_id", "text"],
    )
    rows = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
            for r in minhash_estimate_pairs(df).collect()}
    assert rows[(0, 1)] == 1.0  # identical signatures
    assert all(0.0 <= v <= 1.0 for v in rows.values())


def test_kmeans_assign_multi_iteration(spark, sf_dir):
    """kmeans_assign must run >1 driver-loop iterations with constant
    plan size (localCheckpoint) and keep every vector assigned to a
    live cell."""
    from agentic_workflow_for_data_transformation_spark.operators.similarity import kmeans_assign
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out = kmeans_assign(emb, n_centroids=4, n_iter=3)
    rows = out.collect()
    assert len(rows) == n
    assert {r["cell"] for r in rows} <= set(range(4))
    assert all(-1.0 <= r["cent_sim"] <= 1.0 for r in rows)


def test_repetition_ratio_detects_boilerplate(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),   # 4 identical 3-grams -> 0.75
        (2, "all words here are fully unique"), # 4 distinct 3-grams -> 0.0
        (3, "too short"),                       # < 3 words -> omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_ratio(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 4 and out[1]["n_distinct"] == 1
    assert out[1]["repetition"] == 0.75
    assert out[2]["repetition"] == 0.0


def test_approx_count_distinct_within_rsd(spark):
    """The raw HLL++ sketch itself (independent of the registered
    harness): per-group relative error vs the exact distinct count
    must stay within the configured rsd (0.02). Spark's HLL++ is
    deterministic for fixed input, so this is a hard gate, not a
    flaky probabilistic one."""
    import pyspark.sql.functions as F

    from agentic_workflow_for_data_transformation_spark import benchqueries
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    sf = "/root/testdata/sf0.01"
    rows = {
        r["o_orderpriority"]: (r["approx"], r["n"])
        for r in read_parquet_table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("n"),
        )
        .collect()
    }
    for k, (approx, n) in rows.items():
        rel_err = abs(approx - n) / n
        assert rel_err <= 0.02, f"{k}: approx={approx} exact={n} err={rel_err:.4f}"


def test_approx_percentiles_within_bound(spark):
    """The raw percentile sketch: relative value error under 2% at
    accuracy=10000 on sf0.01 (deterministic — Spark's
    approx_percentile is a deterministic algorithm for fixed input);
    plus the registered harness's rank-error booleans all TRUE."""
    import pyspark.sql.functions as F

    from agentic_workflow_for_data_transformation_spark import benchqueries
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    sf = "/root/testdata/sf0.01"
    raw = {
        r["o_orderpriority"]: (r["a50"], r["a90"], r["p50"], r["p90"])
        for r in read_parquet_table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("a50"),
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("a90"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    for k, (a50, a90, e50, e90) in raw.items():
        assert abs(a50 - e50) / e50 <= 0.02, f"{k} p50: {a50} vs {e50}"
        assert abs(a90 - e90) / e90 <= 0.02, f"{k} p90: {a90} vs {e90}"
    # the registered harness must report every bound satisfied
    for r in benchqueries.queries()["x_approx_percentiles"](spark, sf).collect():
        assert r["p50_in_bound"] is True and r["p90_in_bound"] is True, r


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be invisible in results: salted_join == plain join
    row-for-row, for inner and left, including unmatched left rows."""
    from agentic_workflow_for_data_transformation_spark.operators.joins import salted_join
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    li = read_parquet_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = read_parquet_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(li, s, on="l_suppkey", how=how, salt=4).collect())
        )
        want = sorted(map(tuple, li.join(s, "l_suppkey", how).collect()))
        assert got == want, how


def test_normalized_dedup_catches_reformatting(spark):
    """Case/punctuation/whitespace variants must collapse to one group;
    genuinely different text must not."""
    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        normalized_exact_dedup,
    )

    rows = [
        (1, "Hello, World!"),
        (2, "hello   world"),
        (3, "HELLO-WORLD"),
        (4, "goodbye world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["keeper_id"]: r["n_copies"] for r in normalized_exact_dedup(df).collect()}
    assert out == {1: 3, 4: 1}


def test_containment_bounds_and_dominates_jaccard(spark, sf_dir):
    """Containment is in (0, 1] and max-containment >= jaccard for the
    same pair (set algebra: |A n B|/min sides >= |A n B|/|A u B|)."""
    from agentic_workflow_for_data_transformation_spark.operators import dedup
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    cont = {
        (r["doc_a"], r["doc_b"]): max(r["cont_a_in_b"], r["cont_b_in_a"])
        for r in dedup.containment_pairs(docs, threshold=0.0).collect()
    }
    assert cont, "no candidate pairs at this scale factor"
    assert all(0 < v <= 1.000001 for v in cont.values())
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.lsh_verified_pairs(docs, threshold=0.0).collect()
    }
    shared = set(cont) & set(jac)
    assert shared
    for k in shared:
        assert cont[k] >= jac[k] - 1e-9


def test_mix_weights_sum_to_one_and_flatten(spark, sf_dir):
    """Weights must sum to 1, and alpha < 1 must give every group a
    larger share than its raw proportion when it is below-average size
    (the flattening property the temperature exists for)."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import mix_weights
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    rows = mix_weights(docs, alpha=0.7).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    smallest = min(rows, key=lambda r: r["n_docs"])
    largest = max(rows, key=lambda r: r["n_docs"])
    if smallest["n_docs"] < largest["n_docs"]:
        assert smallest["weight"] > smallest["n_docs"] / total_docs
        assert largest["weight"] < largest["n_docs"] / total_docs


def test_ks_statistic_hand_computed(spark):
    """KS integer numerator against a hand-worked example:
    left = [1, 2, 3] (n=3), right = [2, 4] (m=2).
    pooled v: 1 -> |1*2 - 0*3| = 2; 2 -> |2*2 - 1*3| = 1;
    3 -> |3*2 - 1*3| = 3; 4 -> |3*2 - 2*3| = 0  =>  ks_num = 3
    (classical D = 3 / (3*2) = 0.5)."""
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        ks_statistic_cogrouped,
    )

    left = spark.createDataFrame([(7, 1.0), (7, 2.0), (7, 3.0)], "user_id long, value double")
    right = spark.createDataFrame([(7, 2.0), (7, 4.0)], "user_id long, value double")
    rows = ks_statistic_cogrouped(left, right).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["ks_num"], r["n"], r["m"]) == (7, 3, 3, 2)
    # identical distributions -> numerator 0 (fresh frame: cogrouping a
    # DataFrame with ITSELF hits Spark's self-join ambiguity, as usual)
    left2 = spark.createDataFrame(
        [(7, 1.0), (7, 2.0), (7, 3.0)], "user_id long, value double"
    )
    same = ks_statistic_cogrouped(left, left2).collect()[0]
    assert same["ks_num"] == 0


def test_two_phase_row_number_matches_global_rank(spark):
    """two_phase_row_number must equal the single-partition
    row_number() OVER (ORDER BY k) for a gappy, shuffled key set, with
    buckets small enough that several are non-empty AND several keys
    share a bucket (both phases exercised)."""
    from pyspark.sql import Window

    from agentic_workflow_for_data_transformation_spark.operators.windows import (
        two_phase_row_number,
    )

    ks = [1, 2, 5, 9, 10, 11, 40, 41, 97, 98, 99, 250, 251, 1000, 1001]
    import random

    rnd = random.Random(7)
    rnd.shuffle(ks)
    df = spark.createDataFrame([(k,) for k in ks], "k long").repartition(4)
    got = {
        r["k"]: r["rn"]
        for r in two_phase_row_number(df, "k", bucket_width=16).collect()
    }
    want = {
        r["k"]: r["rn"]
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("rn")
        ).collect()
    }
    assert got == want
    # negative keys: floor() keeps the bucket monotone below zero too
    df2 = spark.createDataFrame([(-33,), (-1,), (0,), (7,)], "k long")
    got2 = {
        r["k"]: r["rn"]
        for r in two_phase_row_number(df2, "k", bucket_width=8).collect()
    }
    assert got2 == {-33: 1, -1: 2, 0: 3, 7: 4}


def test_documents_corpus_is_pure_ascii(spark, sf_dir):
    """The audio-branch oracles equate utf-8 payload BYTES with
    per-character CODE POINTS (ord(substr(text, ...))), which only
    holds when every character is ASCII — one multi-byte character
    would shift every later frame boundary. Make the assumption an
    asserted fact over the corpus instead of an implicit one."""
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    bad = docs.filter(
        F.length(F.col("text")) != F.octet_length(F.col("text"))
    ).count()
    assert bad == 0, f"{bad} documents contain non-ASCII characters"


def test_audio_frame_zcr_hand_computed(spark):
    """int16 little-endian decode + per-frame sign-flip counting on a
    byte-exact fixture; the trailing odd byte must be ignored."""
    import struct

    samples = [100, -5, 3, -2, 0, 0, -7]  # neg pattern F T F T F F T
    payload = struct.pack("<7h", *samples) + b"\x01"  # + odd stray byte
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"\x02"))],  # doc 2: <1 sample
        "doc_id long, payload binary",
    )
    rows = multimodal.audio_frame_zcr(df, frame_size=4).collect()
    got = {(r["doc_id"], r["frame"]): (r["n_samples"], r["n_crossings"])
           for r in rows}
    # frame 0: [100,-5,3,-2] -> 3 flips; frame 1: [0,0,-7] -> 1 flip
    assert got == {(1, 0): (4, 3), (1, 1): (3, 1)}


def test_two_phase_row_number_partitioned(spark):
    """partition_by restarts numbering per group and matches the
    partitioned row_number() window exactly."""
    from pyspark.sql import Window

    from agentic_workflow_for_data_transformation_spark.operators.windows import (
        two_phase_row_number,
    )

    rows = [("a", k) for k in (3, 9, 100, 4097)] + [("b", k) for k in (1, 8000)]
    df = spark.createDataFrame(rows, "g string, k long").repartition(3)
    got = {
        (r["g"], r["k"]): r["rn"]
        for r in two_phase_row_number(
            df, "k", bucket_width=64, partition_by=["g"]
        ).collect()
    }
    want = {
        (r["g"], r["k"]): r["rn"]
        for r in df.select(
            "g", "k",
            F.row_number().over(Window.partitionBy("g").orderBy("k")).alias("rn"),
        ).collect()
    }
    assert got == want


def test_cached_count_refreshes_on_rewritten_input(spark, tmp_path):
    """The cardinality memo keys on an input-file fingerprint as well
    as the plan hash: rewriting a table in place (same path, same
    plan) must produce a fresh count, not a stale memo hit — a stale
    count would silently mis-size auto_bits buckets."""
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        cached_count,
    )

    p = str(tmp_path / "t")
    spark.range(10).write.mode("overwrite").parquet(p)
    assert cached_count(spark.read.parquet(p)) == 10
    spark.range(25).write.mode("overwrite").parquet(p)
    assert cached_count(spark.read.parquet(p)) == 25


def test_two_phase_row_number_desc_and_nulls(spark):
    """Descending ranks and NULL order keys must match the plain
    row_number window exactly: desc numbers from the largest key, and
    nulls rank first under ASC (NULLS FIRST) / last under DESC (NULLS
    LAST) — and the null rows must not be dropped by the offsets
    join."""
    from pyspark.sql import Window

    from agentic_workflow_for_data_transformation_spark.operators.windows import (
        two_phase_row_number,
    )

    rows = [(1,), (None,), (500,), (9000,), (None,), (42,)]
    df = spark.createDataFrame(rows, "k long").repartition(3)
    for asc in (True, False):
        got = sorted(
            [
                (r["k"], r["rn"])
                for r in two_phase_row_number(
                    df, "k", bucket_width=128, ascending=asc
                ).collect()
            ],
            key=lambda t: (t[1],),
        )
        w = Window.orderBy(F.col("k").asc() if asc else F.col("k").desc())
        want = sorted(
            ((r["k"], r["rn"]) for r in df.select(
                "k", F.row_number().over(w).alias("rn")).collect()),
            key=lambda t: (t[1],),
        )
        # ties between the two NULLs make rn 1/2 (or 5/6) arbitrary —
        # compare the multiset of (key, rank) pairs with nulls grouped
        def norm(pairs):
            return sorted((str("N" if k is None else k).rjust(8, "0"), rn) for k, rn in pairs)
        assert norm(got) == norm(want), (asc, got, want)


def test_jaccard_prefix_pairs_matches_quadratic_harness(docs, spark, sf_dir):
    """The prefix-filtered join must return EXACTLY the quadratic
    inverted-index harness's answer (completeness lemma: any pair with
    J >= t shares a rarest-first prefix token), on both the planted
    fixture and the real corpus."""
    for frame, t in ((docs, 0.2), (docs, 0.5)):
        want = sorted(map(tuple, dedup.ngram_jaccard_pairs(frame, threshold=t).collect()))
        got = sorted(map(tuple, dedup.jaccard_prefix_pairs(frame, threshold=t).collect()))
        assert got == want
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table
    corpus = read_parquet_table(spark, sf_dir, "documents")
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs(corpus, threshold=0.2).collect()))
    got = sorted(map(tuple, dedup.jaccard_prefix_pairs(corpus, threshold=0.2).collect()))
    assert got == want and len(got) > 0


def test_jaccard_prefix_prunes_candidate_space(spark, sf_dir):
    """The point of prefix filtering: the candidate-pair space (join on
    rare-prefix tokens + length filter) must be far smaller than the
    naive inverted-index pair space (join on ANY shared token). The
    prefix is (1-t)|x|+1 tokens, so pruning strengthens with t:
    measured sf0.01 candidates vs 11533 naive pairs are ~5000 at
    t=0.2, 773 at t=0.5, 26 at t=0.7."""
    from pyspark.sql import Window
    from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table

    corpus = read_parquet_table(spark, sf_dir, "documents")
    e = dedup.shingle_index(corpus).select(
        F.col("doc_id").alias("d"), dedup._hash60(F.col("s")).alias("s")
    )
    naive = (
        e.alias("a")
        .join(e.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.d") < F.col("b.d")))
        .select("a.d", "b.d").distinct().count()
    )
    freq = e.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = (
        e.join(freq, "s")
        .withColumn("rn", F.row_number().over(Window.partitionBy("d").orderBy(F.asc("cnt"), F.asc("s"))))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("d")))
    )

    def pruned_count(t):
        prefix = ranked.filter(F.col("rn") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
        return (
            prefix.alias("a")
            .join(
                prefix.alias("b"),
                (F.col("a.s") == F.col("b.s")) & (F.col("a.d") < F.col("b.d"))
                & (F.least(F.col("a.sz"), F.col("b.sz")) >= t * F.greatest(F.col("a.sz"), F.col("b.sz"))),
            )
            .select("a.d", "b.d").distinct().count()
        )

    p2, p5, p7 = pruned_count(0.2), pruned_count(0.5), pruned_count(0.7)
    assert p2 * 2 < naive, (p2, naive)
    assert p5 * 10 < naive, (p5, naive)
    assert p7 * 100 < naive, (p7, naive)


def test_boilerplate_ratio_planted(docs):
    out = {r["doc_id"]: r for r in text.boilerplate_ratio(docs, min_docs=2).collect()}
    # docs 1 and 2 are identical: every shingle appears in >= 2 docs
    assert out[1]["boilerplate_ratio"] == 1.0 and out[2]["boilerplate_ratio"] == 1.0
    # doc 4 shares no shingle with anything
    assert out[4]["boilerplate_ratio"] == 0.0
    # doc 3 differs by one word: shares some but not all shingles with 1/2
    assert 0.0 < out[3]["boilerplate_ratio"] < 1.0
    assert 5 not in out  # shorter than one shingle -> omitted


def test_token_label_pmi_planted(spark):
    rows = [(i, "aa bb", "x") for i in range(5)] + [(i + 10, "cc bb", "y") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {(r["label"], r["rn"]): r for r in
           text.token_label_pmi(df, label_col="lang", k=2, min_count=1).collect()}
    # 'aa' is exclusive to x, 'cc' exclusive to y -> top-PMI token of each label
    assert out[("x", 1)]["word"] == "aa" and out[("y", 1)]["word"] == "cc"
    # 'bb' occurs everywhere -> pmi 0 (p(w,l) = p(w)p(l)), ranked below
    assert out[("x", 2)]["word"] == "bb" and out[("x", 2)]["pmi"] == 0.0
    # exclusive token: pmi = ln(N / c_l) = ln(20/10)
    assert out[("x", 1)]["pmi"] == round(math.log(2), 6)


def test_weighted_sample_per_group(spark):
    from agentic_workflow_for_data_transformation_spark.operators import sampling

    rows = [(i, "g", 1 + (i % 7) * 100) for i in range(200)] + [(900, "tiny", 5)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "wt"])
    pick = sampling.weighted_sample_per_group(df, "grp", "wt", k=20, key_col="doc_id")
    got = sorted(r["doc_id"] for r in pick.collect())
    # deterministic: same selection on a second run
    again = sorted(r["doc_id"] for r in
                   sampling.weighted_sample_per_group(df, "grp", "wt", k=20, key_col="doc_id").collect())
    assert got == again
    # exactly k from the large group, the whole tiny group
    assert sum(1 for d in got if d < 900) == 20 and 900 in got
    # weight-proportional bias: heavy rows (wt >= 401) are 3/7 of the
    # population (~8.6 of 20 under uniform sampling) but carry ~2/3 of
    # the total weight — the fixed hash draw picks 11 of them
    heavy = sum(1 for d in got if d < 900 and (d % 7) * 100 + 1 >= 401)
    assert heavy >= 10, heavy


def test_pagerank_integer_star_and_symmetry(spark):
    from agentic_workflow_for_data_transformation_spark.operators import graph

    # undirected star: center 0 <-> leaves 1..4, plus an isolated pair 8-9
    und = [(0, i) for i in (1, 2, 3, 4)] + [(8, 9)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    r = {row["node"]: row["rank_scaled"] for row in graph.pagerank_integer(edges).collect()}
    # center of the star outranks every leaf; leaves are symmetric -> equal
    assert r[0] > r[1] and len({r[i] for i in (1, 2, 3, 4)}) == 1
    # the isolated pair is internally symmetric
    assert r[8] == r[9]
    # integer mass is conserved up to quantization (1 unit per edge per round)
    assert abs(sum(r.values()) - 10**12) < 1000
    # determinism: a rerun is bit-identical
    again = {row["node"]: row["rank_scaled"] for row in graph.pagerank_integer(edges).collect()}
    assert r == again


def test_check_expectations_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import quality

    rows = [
        (1, "a", "en", 10),
        (1, "b", "en", 20),      # duplicate id
        (2, None, "de", 30),     # null text
        (3, "c", "xx", -5),      # bad lang, out-of-range
        (None, "d", "en", 400),  # null id, out-of-range
        (None, "e", "en", 50),   # second null id -> one more dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    exps = [
        {"kind": "not_null", "col": "text"},
        {"kind": "unique", "col": "doc_id"},
        {"kind": "accepted_values", "col": "lang", "values": ["en", "de"]},
        {"kind": "range", "col": "n_chars", "lo": 0, "hi": 100},
        {"kind": "min_rows", "n": 10},
    ]
    out = {r["expectation"]: r for r in quality.check_expectations(df, exps).collect()}
    assert out["0_not_null_text"]["n_violations"] == 1
    # values {1,1,2,3,N,N}: distinct non-null = 3, null group present
    # -> 6 - 3 - 1 = 2 rows beyond first occurrences
    assert out["1_unique_doc_id"]["n_violations"] == 2
    assert out["2_accepted_values_lang"]["n_violations"] == 1
    assert out["3_range_n_chars"]["n_violations"] == 2
    assert out["4_min_rows_*"]["n_violations"] == 4 and not out["4_min_rows_*"]["passed"]
    assert out["0_not_null_text"]["n_rows"] == 6
    # single-scan claim: exactly one Aggregate pass over the data, no join
    plan = quality.check_expectations(df, exps)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_groupwise_ols_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import stats

    rows = (
        [("line", float(x), 2.0 * x + 3.0) for x in range(1, 6)]     # exact fit
        + [("noisy", 1.0, 1.0), ("noisy", 2.0, 3.0), ("noisy", 3.0, 2.0)]
        + [("flatx", 5.0, 1.0), ("flatx", 5.0, 9.0)]                 # zero x-variance
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in stats.groupwise_ols(df, "g", "x", "y").collect()}
    assert out["line"]["slope"] == 2.0 and out["line"]["intercept"] == 3.0
    assert out["line"]["r2"] == 1.0
    assert 0.0 < out["noisy"]["r2"] < 1.0
    assert out["flatx"]["slope"] is None and out["flatx"]["intercept"] is None


def test_chi_square_cells_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import stats

    # perfectly independent 2x2 -> every contribution exactly 0
    rows = [("a", "x")] * 10 + [("a", "y")] * 30 + [("b", "x")] * 5 + [("b", "y")] * 15
    df = spark.createDataFrame(rows, "g string, h string")
    out = {(r["g"], r["h"]): r for r in stats.chi_square_cells(df, "g", "h").collect()}
    assert all(r["contrib"] == 0.0 and r["contrib_micro"] == 0 for r in out.values())
    assert out[("a", "x")]["expected"] == 10.0

    # fully dependent 2x2 (diagonal) -> chi2 = n; per cell n/4
    rows2 = [("a", "x")] * 10 + [("b", "y")] * 10
    df2 = spark.createDataFrame(rows2, "g string, h string")
    out2 = {(r["g"], r["h"]): r for r in stats.chi_square_cells(df2, "g", "h").collect()}
    # sparse: only observed cells appear; each diagonal cell contributes
    # (10-5)^2/5 = 5; off-diagonal cells (o=0) are absent by design
    assert out2[("a", "x")]["contrib"] == 5.0 and out2[("b", "y")]["contrib"] == 5.0
    total_micro = sum(r["contrib_micro"] for r in out2.values())
    assert total_micro == 10_000_000  # exact integer sum of the observed cells


def test_interpolate_gaps_planted(spark):
    import datetime as dt

    from agentic_workflow_for_data_transformation_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        ("a", m(0), None),     # leading gap -> stays NULL
        ("a", m(5), 10.0),
        ("a", m(10), None),    # 1/3 of the way -> 20
        ("a", m(15), None),    # 2/3 -> 30
        ("a", m(20), 40.0),
        ("a", m(25), None),    # trailing gap -> NULL
        ("b", m(0), 7.0),      # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {(r["k"], r["ts"]): r["filled"] for r in
           windows.interpolate_gaps(df, "k", "ts", "v").collect()}
    assert got[("a", m(0))] is None and got[("a", m(25))] is None
    assert got[("a", m(5))] == 10.0 and got[("a", m(20))] == 40.0
    assert got[("a", m(10))] == 20.0 and got[("a", m(15))] == 30.0
    assert got[("b", m(0))] == 7.0
    # both window passes share one partition sort: a single exchange
    plan = windows.interpolate_gaps(df, "k", "ts", "v")._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:1500]
    # and both frames are RUNNING (unboundedpreceding..currentrow): a
    # currentrow..unboundedfollowing frame re-scans the tail per row,
    # O(n^2) per partition (17.7 s vs 0.8 s on the sf0.1 spine)
    assert "unboundedfollowing" not in plan.lower(), plan[:1500]


def test_key_skew_profile_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import stats

    # one hot key with 8 rows, four singleton keys
    rows = [(1,)] * 8 + [(2,), (3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    out = {r["bucket"]: r for r in stats.key_skew_profile(df, "k").collect()}
    assert out[0]["n_keys"] == 4 and out[0]["n_rows"] == 4
    assert out[3]["n_keys"] == 1 and out[3]["max_key_rows"] == 8
    assert out[3]["row_share"] == round(8 / 12, 6)


def test_robust_outliers_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import stats

    # tight cluster around 10 plus one wild value; mean/std would be
    # dragged, median/MAD is not
    vals = [9.0, 9.5, 10.0, 10.5, 11.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = stats.robust_outliers(df, "g", "v").collect()[0]
    assert r["median"] == 10.25  # midpoint of 10.0, 10.5
    assert r["n_outliers"] == 1  # only the 1000.0
    # a constant group has MAD 0 -> nothing flagged by the strict >
    df2 = spark.createDataFrame([("c", 5.0)] * 4, "g string, v double")
    r2 = stats.robust_outliers(df2, "g", "v").collect()[0]
    assert r2["mad"] == 0.0 and r2["n_outliers"] == 0


def test_duplicated_span_stats_planted(spark):
    from agentic_workflow_for_data_transformation_spark.operators import dedup

    shared = "X" * 60  # one 50-char window at p=1 and p=11 both inside
    rows = [
        (1, shared + "unique tail one is here padding padding"),
        (2, shared + "completely different ending text padding"),
        (3, "no overlap with anyone " * 4),
        (4, "short"),  # < span -> 0 spans, ratio 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.duplicated_span_stats(df, span=50, stride=10).collect()}
    assert got[4]["n_spans"] == 0 and got[4]["dup_ratio"] == 0.0
    # docs 1 and 2 share the all-X spans at positions 1 and 11
    assert got[1]["n_dup_spans"] == 2 and got[2]["n_dup_spans"] == 2
    assert got[3]["n_dup_spans"] == 0 and got[3]["n_spans"] > 0
    assert 0 < got[1]["dup_ratio"] <= 1.0


def test_gram_upper_and_pca_match_numpy(spark):
    import numpy as np

    from agentic_workflow_for_data_transformation_spark.operators import linalg

    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant direction along (1, 1, 0)/sqrt(2)
    base = rng.randn(200, 3) * np.array([3.0, 0.5, 0.1])
    rot = np.array([
        [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0],
        [-1 / np.sqrt(2), 1 / np.sqrt(2), 0.0],
        [0.0, 0.0, 1.0],
    ])
    data = np.round(base @ rot, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    # gram sums are exactly the numpy integer sums
    q = np.round(np.round(data.astype(np.float32).astype(np.float64), 12) * 1e6)
    got = {(r["i"], r["j"]): r["dot"]
           for r in linalg.gram_upper(df, "embedding").collect()}
    want = q.T @ q
    for (i, j), dot in got.items():
        assert dot == int(round(want[i, j])), (i, j, dot, want[i, j])
    # top component matches numpy eigh on the exact covariance
    comps, vals = linalg.pca_components(df, "embedding", k=2)
    cov = np.cov(q / 1e6, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argmax(evals)]
    cos = abs(float(np.dot(comps[0], top)))
    assert cos > 0.9999, cos
    assert vals[0] >= vals[1] > 0


def test_two_phase_row_number_nan_keys(spark):
    """NaN double keys sort AFTER every real under ASC (first under
    DESC) in Spark; the bucket sentinel must match, not the non-ANSI
    NaN->0 long cast that lands NaN rows mid-range."""
    from pyspark.sql import Window

    from agentic_workflow_for_data_transformation_spark.operators.windows import (
        two_phase_row_number,
    )

    rows = [(float("nan"),), (1.5,), (None,), (9000.25,), (float("nan"),), (-3.0,)]
    df = spark.createDataFrame(rows, "k double").repartition(3)
    for asc in (True, False):
        got = [
            (r["k"], r["rn"])
            for r in two_phase_row_number(
                df, "k", bucket_width=64, ascending=asc
            ).collect()
        ]
        w = Window.orderBy(F.col("k").asc() if asc else F.col("k").desc())
        want = [
            (r["k"], r["rn"])
            for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
        ]

        def norm(pairs):  # ties among the two NaNs / the NULL are arbitrary
            return sorted(
                ("U" if k is None else "N" if k != k else repr(k), rn)
                for k, rn in pairs
            )

        assert norm(got) == norm(want), (asc, sorted(got, key=lambda t: t[1]))


def test_duplicated_span_ranges_merges_islands(spark):
    from agentic_workflow_for_data_transformation_spark.operators import dedup

    # two docs share an 80-char prefix (duplicated spans at p=1..31)
    # AND a separate shared block far enough into doc 1 that the two
    # duplicated regions can NOT merge (gap > span)
    shared_a = "A" * 80
    shared_b = "B" * 60
    filler = "x y z unique middle section with no repeats at all " * 4
    rows = [
        (1, shared_a + filler + shared_b),
        (2, shared_a + "totally different tail of text here padding padding"),
        (3, shared_b + "another unrelated continuation of words padding pad"),
        (4, "no overlap with anyone at all " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ranges = {}
    for r in dedup.duplicated_span_ranges(df, span=50, stride=10).collect():
        ranges.setdefault(r["doc_id"], []).append(
            (r["range_start"], r["range_end"], r["n_dup_spans"])
        )
    for v in ranges.values():
        v.sort()
    # doc 1: two maximal islands — the A-prefix and the B-block
    assert len(ranges[1]) == 2
    a0, a1 = ranges[1]
    assert a0[0] == 1 and a0[1] >= 50  # A-region starts at char 1
    assert a1[0] > a0[1] + 50 - 49     # disjoint islands
    # doc 2: one island at the start (the shared A prefix)
    assert len(ranges[2]) == 1 and ranges[2][0][0] == 1
    # doc 3: one island at the start (the shared B block)
    assert len(ranges[3]) == 1 and ranges[3][0][0] == 1
    # doc 4: no duplicated spans -> no rows
    assert 4 not in ranges
    # island invariant: each island's span count fits its width
    for doc, vs in ranges.items():
        for s, e, n in vs:
            assert e - s + 1 >= 50 and n >= 1


def test_audio_voiced_segments_merges_frames(spark):
    """Planted waveform: loud-quiet-loud-loud-quiet-loud frame pattern
    must produce exactly the maximal voiced segments [0,0], [2,3],
    [5,5] with correct peaks; an all-quiet doc yields no rows."""
    from agentic_workflow_for_data_transformation_spark.operators import multimodal

    loud = bytes([200]) * 256   # rms 200.0 -> 200_000_000 micro
    quiet = bytes([10]) * 256   # rms 10.0  -> 10_000_000 micro
    louder = bytes([250]) * 256
    rows = [
        (1, loud + quiet + loud + louder + quiet + loud),
        (2, quiet + quiet),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(
        (r["doc_id"], r["seg_start"], r["seg_end"], r["n_frames"],
         r["peak_rms_micro"])
        for r in multimodal.audio_voiced_segments(
            df, threshold_micro=100_000_000
        ).collect()
    )
    assert got == [
        (1, 0, 0, 1, 200_000_000),
        (1, 2, 3, 2, 250_000_000),
        (1, 5, 5, 1, 200_000_000),
    ]


def test_welch_ttest_degenerate_sides(spark):
    """Groups where one parity side has <2 rows (or variance collapses
    entirely) must report NULL t/df, never a division error."""
    from agentic_workflow_for_data_transformation_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 2, 2.0), ("a", 1, 3.0), ("a", 3, 4.0),
         ("b", 0, 5.0), ("b", 1, 6.0),      # one row per side
         ("c", 0, 7.0), ("c", 2, 7.0), ("c", 1, 7.0), ("c", 3, 7.0)],  # zero var
        "g string, id int, v double",
    )
    rows = {r["g"]: r for r in welch_ttest(df, "g", "v", "id").collect()}
    assert rows["a"]["t_stat"] is not None
    assert rows["b"]["t_stat"] is None and rows["b"]["df_welch"] is None
    assert rows["c"]["t_stat"] is None  # se2 == 0
    assert rows["a"]["n_a"] == 2 and rows["a"]["n_b"] == 2


def test_bm25_zero_match_docs_absent(spark):
    """Documents containing none of the query terms must not appear
    (BM25 scores only matching docs); scores are positive and the
    doc with more matching terms outranks the single-term doc."""
    from agentic_workflow_for_data_transformation_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta"),
         (3, "epsilon zeta"), (4, "beta alpha")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in
           bm25_topk(df, ["alpha", "beta"], k=10).collect()}
    assert 3 not in out
    assert set(out) == {1, 2, 4}
    assert all(v > 0 for v in out.values())
    assert out[4] > out[2]  # two query terms beat repeated one


def test_product_quantize_exemplars_self_assign(spark):
    """Codebook vectors must assign to THEMSELVES with distance 0 in
    every subspace (the seeded-exemplar invariant)."""
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        product_quantize,
    )

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = product_quantize(df, m=4, k=8, dim=16)
    own = out.filter("vec_id < 8").collect()
    assert len(own) == 8 * 4
    assert all(r["cent"] == r["vec_id"] and r["dist"] == 0.0 for r in own)
    rest = out.filter("vec_id >= 8")
    assert rest.count() == 12 * 4


def test_select_token_budget_hard_cap(spark):
    """The first overflowing doc is excluded: per-group token sums
    never exceed the budget, and a doc longer than the whole budget
    can only be taken if it drew first AND fits."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        select_token_budget,
    )

    df = spark.createDataFrame(
        [(i, "g", "tok " * (i + 1)) for i in range(30)],
        "doc_id long, lang string, text string",
    )
    out = select_token_budget(df, budget_tokens=50).collect()
    assert sum(r["n_tokens"] for r in out) <= 50
    assert max(r["running_tokens"] for r in out) <= 50


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant chain: every K4 node is in C(3,2)=3 triangles,
    chain nodes in none; direction and duplicate edges are normalized
    away before orientation."""
    from agentic_workflow_for_data_transformation_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 4), (4, 5), (1, 0), (2, 1)]  # dupes reversed + chain
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_welch_ttest_null_values_not_counted(spark):
    """Round-8 advisor finding: n must count NON-NULL values per side,
    not rows — a NULL-bearing value column otherwise inflates n,
    skewing the mean and making the variance (possibly negative) and
    Welch df statistically wrong. With the NULLs ignored, group 'a'
    here is identical to the same data with the NULL rows deleted."""
    from agentic_workflow_for_data_transformation_spark.operators.stats import welch_ttest

    with_nulls = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 2, 2.0), ("a", 4, None), ("a", 6, None),
         ("a", 1, 3.0), ("a", 3, 4.0), ("a", 5, None)],
        "g string, id int, v double",
    )
    clean = with_nulls.filter("v IS NOT NULL")
    got = welch_ttest(with_nulls, "g", "v", "id").collect()[0]
    want = welch_ttest(clean, "g", "v", "id").collect()[0]
    assert got["n_a"] == want["n_a"] == 2
    assert got["n_b"] == want["n_b"] == 2
    assert got["t_stat"] == want["t_stat"]
    assert got["df_welch"] == want["df_welch"]


def test_train_pq_codebook_beats_exemplar_and_is_deterministic(spark):
    """The round-8 trained codebook must (a) produce strictly lower
    total quantization distortion than the seeded-exemplar baseline
    on the same data and (b) be bit-reproducible run-to-run (fixed
    init, fixed iterations, decimal-exact means) — the property that
    keeps the unrolled SQL oracle exact."""
    import random

    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        product_quantize,
        train_pq_codebook,
    )

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def distortion(codebook):
        out = product_quantize(df, m=4, k=8, dim=16, codebook=codebook)
        return out.agg({"dist": "sum"}).collect()[0][0]

    cb = train_pq_codebook(df, m=4, k=8, n_iter=3, dim=16)
    assert distortion(cb) < distortion(None)
    again = train_pq_codebook(df, m=4, k=8, n_iter=3, dim=16)
    a = sorted(map(tuple, cb.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_train_pq_codebook_sample_bound(spark):
    """sample_n caps the trainer's input (the 100 TB discipline:
    training cost decouples from corpus size) — the codebook trained
    on the full set of low ids equals the sample_n codebook when they
    select the same rows."""
    import random

    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        train_pq_codebook,
    )

    rnd = random.Random(13)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full_low = train_pq_codebook(
        df.filter("vec_id < 20"), m=2, k=4, n_iter=2, dim=8
    )
    sampled = train_pq_codebook(df, m=2, k=4, n_iter=2, dim=8, sample_n=20)
    assert sorted(map(tuple, full_low.collect())) == sorted(
        map(tuple, sampled.collect())
    )


def test_trained_pq_recall_clears_serving_bar(spark):
    """The round-7 verdict's gate for trained codebooks: the PQ/ADC
    path with the registered m=32 x k=128 x 2-iteration codebook must
    reach recall@10 >= 0.7 on the sf0.01 fixture (the seeded-exemplar
    codebook measured 0.1). Checked on the registered query id plus a
    second probe so a lucky single query can't pass alone."""
    import agentic_workflow_for_data_transformation_spark.benchqueries  # noqa: F401 (full registry first: nsqueries3 alone is a partial circular import)
    from agentic_workflow_for_data_transformation_spark.nsqueries3 import (
        _pq_codebook_cached,
    )
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        pq_recall_vs_exact,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = _pq_codebook_cached(spark, sf_dir)
    for q in (42, 314):
        r = pq_recall_vs_exact(
            df, query_id=q, k=10, m=32, n_cents=128, dim=64, codebook=cb
        ).collect()[0]
        assert r["recall"] >= 0.7, (q, r)


def test_ivfpq_scores_only_probed_cells(spark):
    """IVFADC pruning invariant: every scored candidate's cell is one
    of the n_probe cells nearest the query — vectors in unprobed
    inverted lists are never scored (that's the scan saving). Also
    pins the residual invariant: a coarse-centroid vector's residual
    is all zeros."""
    import random

    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        ivf_residuals,
        topk_ivfpq_adc,
    )

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = ivf_residuals(df, n_cells=4, dim=8)
    own = {r["vec_id"]: r for r in res.filter("vec_id < 4").collect()}
    for i in range(4):
        assert own[i]["cell"] == i
        assert all(x == 0.0 for x in own[i]["rv"])
    out = topk_ivfpq_adc(df, query_id=9, k=5, n_cells=4, n_probe=2, m=4,
                         n_cents=8, dim=8)
    got = out.collect()
    assert 1 <= len(got) <= 5
    assert len({r["cell"] for r in got}) <= 2
    dists = [r["adc_dist"] for r in got]
    assert dists == sorted(dists)


def test_line_dedup_rebuild(spark):
    # 4-word segments: doc 1 = [A B], doc 2 repeats A (dropped) and
    # adds C; doc 3 is ALL already-seen segments -> vanishes entirely
    seg_a = "alpha beta gamma delta"
    seg_b = "epsilon zeta eta theta"
    seg_c = "iota kappa lambda mu"
    df = spark.createDataFrame(
        [
            (1, f"{seg_a} {seg_b}"),
            (2, f"{seg_a} {seg_c}"),
            (3, f"{seg_b} {seg_a}"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in dedup.line_dedup(df, seg_words=4).collect()
    }
    assert out[1] == (f"{seg_a} {seg_b}", 2)
    assert out[2] == (seg_c, 1)  # repeated seg_a excised, order kept
    assert 3 not in out  # every segment already seen corpus-wide


def test_line_dedup_keeps_first_occurrence_position_order(spark):
    # within one doc a repeated segment survives only at its FIRST
    # position, and the rebuild preserves original segment order
    df = spark.createDataFrame(
        [(7, "a b c d x y z w a b c d")], ["doc_id", "text"]
    )
    row = dedup.line_dedup(df, seg_words=4).collect()[0]
    assert row["text_dedup"] == "a b c d x y z w"
    assert row["n_kept"] == 2


def test_resample_interpolate_fills_gaps_linearly(spark):
    from datetime import datetime

    from agentic_workflow_for_data_transformation_spark.operators.timeseries import (
        resample_interpolate,
    )

    # key 1: observations at hours 0 and 3 (step=1h) -> hours 1, 2
    # interpolate at 1/3 and 2/3 of the way; two events share hour 0
    # and the EARLIEST (event_id 1) wins the bucket
    rows = [
        (1, datetime(2024, 1, 1, 0, 5), 1, 0.0),
        (2, datetime(2024, 1, 1, 0, 50), 1, 99.0),  # same bucket, later id
        (3, datetime(2024, 1, 1, 3, 10), 1, 3.0),
        (4, datetime(2024, 1, 1, 5, 0), 2, 7.0),  # single-point key
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = {
        (r["user_id"], r["epoch_s"]): (r["value_interp"], r["is_observed"])
        for r in resample_interpolate(df, step_s=3600).collect()
    }
    base = int(datetime(2024, 1, 1).timestamp())
    assert out[(1, base)] == (0.0, True)
    assert out[(1, base + 3600)] == (1.0, False)
    assert out[(1, base + 7200)] == (2.0, False)
    assert out[(1, base + 10800)] == (3.0, True)
    assert len([k for k in out if k[0] == 2]) == 1  # no gaps, no fills


def test_bpe_merge_table_hand_corpus(spark):
    # words: low x2, lower x1. Round 1 pairs: 'l o':3, 'o w':3,
    # 'w e':1, 'e r':1 -> tie at 3 breaks to 'l o'. Round 2: 'lo w':3.
    # Round 3: 'low e':1 vs 'e r':1 -> tie breaks to 'e r'.
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        bpe_merge_table,
    )

    df = spark.createDataFrame([("low low lower",)], ["text"])
    rows = [tuple(r) for r in bpe_merge_table(df, n_merges=3).collect()]
    assert rows == [
        (1, "l o", "lo", 3),
        (2, "lo w", "low", 3),
        (3, "e r", "er", 1),
    ]


def test_bpe_merge_table_overlap_greedy(spark):
    # 'aaa': pairs 'a a' x2 -> merge greedy left-to-right: 'aa a'
    # (not 'a aa'); round 2 then sees 'aa a' once
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        bpe_merge_table,
    )

    df = spark.createDataFrame([("aaa",)], ["text"])
    rows = [tuple(r) for r in bpe_merge_table(df, n_merges=2).collect()]
    assert rows == [(1, "a a", "aa", 2), (2, "aa a", "aaa", 1)]


def test_winnowing_guarantee_and_density(spark):
    # Two docs sharing a (k+w-1)=8-word run MUST share >= 1 fingerprint
    # (the winnowing guarantee); a doc with disjoint vocabulary shares
    # none. Fingerprint count is at most the full-window count.
    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_shared_pairs,
    )

    shared_run = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, "one two three " + shared_run + " four five six"),
        (2, shared_run + " seven eight nine ten eleven twelve"),
        (3, "red green blue cyan magenta yellow black white pink gray"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps = winnow_fingerprints(df, k=4, w=5)
    by_doc = {
        r["doc_id"]: set()
        for r in fps.select("doc_id").distinct().collect()
    }
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # density: a doc with n words has n-k+1 grams and n-k-w+2 full
    # windows; distinct fps can never exceed that
    n_words = len(docs[0][1].split())
    assert 0 < len(by_doc[1]) <= n_words - 4 - 5 + 2

    pairs = winnow_shared_pairs(df, k=4, w=5, max_df=100, threshold=0.0)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got


def test_winnowing_max_df_drops_boilerplate(spark):
    # A fingerprint present in every doc (shared banner) is dropped by
    # the max_df guard, so no pair is produced from it.
    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        winnow_shared_pairs,
    )

    banner = "this page is served by example corp all rights reserved"
    docs = [(i, banner + f" unique{i} tail{i} words{i} here{i}") for i in range(5)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    with_guard = winnow_shared_pairs(df, k=4, w=5, max_df=4, threshold=0.0)
    without = winnow_shared_pairs(df, k=4, w=5, max_df=100, threshold=0.0)
    assert without.count() > 0
    # banner fps are in all 5 docs > max_df=4 -> dropped; unique tails
    # share nothing, so the guarded report is empty
    assert with_guard.count() == 0


def test_nearest_centroid_separable_labels(spark):
    # Well-separated clusters: held-out slice classifies perfectly and
    # the output carries both slices.
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        nearest_centroid_classifier,
    )

    rows = []
    for i in range(40):
        lab = i % 2
        base = [10.0, 0.0] if lab == 0 else [0.0, 10.0]
        jitter = [((i * 7 + d) % 5) * 0.01 for d in range(2)]
        rows.append((i, lab, [base[0] + jitter[0], base[1] + jitter[1]]))
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = nearest_centroid_classifier(df, test_fraction=0.3, salt="t")
    recs = [tuple(r) for r in out.collect()]
    assert {r[0] for r in recs} == {"train", "test"}
    assert all(lab == pred for _, lab, pred, _ in recs)
    assert sum(n for _, _, _, n in recs) == 40


def test_nearest_centroid_tie_breaks_to_lowest_label(spark):
    # A vector equidistant from two centroids goes to the lower label.
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        nearest_centroid_classifier,
    )

    # centroids land at (+2/3, 0) and (-2/3, 0): equal norms, and the
    # origin vector has zero dot with both -> d2 exactly tied in
    # DECIMAL, so the row must go to the LOWER label (3).
    rows = [
        (100, 7, [1.0, 0.0]),
        (101, 7, [1.0, 0.0]),
        (102, 7, [0.0, 0.0]),  # the tied vector (pulls c7 to 2/3)
        (200, 3, [-(2.0 / 3.0), 0.0]),
        (201, 3, [-(2.0 / 3.0), 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = nearest_centroid_classifier(df, test_fraction=0.0, salt="t")
    recs = [tuple(r) for r in out.collect()]
    mid = sum(n for _, lab, pred, n in recs if lab == 7 and pred == 3)
    # the origin row predicted 3 (lower label on the tie); the two
    # [1,0] rows stay with 7
    assert mid == 1
    assert sum(n for _, lab, pred, n in recs if lab == 7 and pred == 7) == 2


def test_js_divergence_bounds_and_symmetry(spark):
    # Identical distributions -> 0; disjoint vocabularies never join
    # (pair absent = ln 2 by the documented convention); mixed pair
    # lands strictly between.
    import math

    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        js_divergence_by_group,
    )

    df = spark.createDataFrame(
        [
            ("a", "x y z x y z"),
            ("b", "x y z x y z"),
            ("c", "p q r p q r"),
            ("d", "x y p q z r"),
        ],
        ["source", "text"],
    )
    out = {
        (r["source_a"], r["source_b"]): r["js_divergence"]
        for r in js_divergence_by_group(df).collect()
    }
    assert out[("a", "b")] == 0.0
    assert ("a", "c") not in out  # disjoint vocab: no shared word rows
    assert 0.0 < out[("a", "d")] < math.log(2.0)
    assert out[("a", "d")] == out[("b", "d")]  # same distribution vs d


def test_cluster_exemplars_rank_and_tiebreak(spark):
    # label 0 centroid is (2,0): ids 10,11 at (2,0) tie on d2 -> both
    # rank by id; id 12 at (5,0) is farther. label 1 has one row.
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        cluster_exemplars,
    )

    rows = [
        (10, 0, [2.0, 0.0]),
        (11, 0, [2.0, 0.0]),
        (12, 0, [5.0, 0.0]),
        (20, 1, [0.0, 7.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = [
        (r["label"], r["rank"], r["vec_id"])
        for r in cluster_exemplars(df, k=2).orderBy("label", "rank").collect()
    ]
    assert got == [(0, 1, 10), (0, 2, 11), (1, 1, 20)]


def test_label_margin_audit_flags_planted_mislabel(spark):
    # Two tight clusters; one row of label 0 planted inside label 1's
    # cluster must surface with the LARGEST positive margin; correctly
    # labeled rows have negative margins.
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        label_margin_audit,
    )

    rows = [(i, 0, [10.0, 0.0]) for i in range(4)]
    rows += [(10 + i, 1, [0.0, 10.0]) for i in range(4)]
    rows.append((99, 0, [0.0, 10.0]))  # mislabeled: sits in cluster 1
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = label_margin_audit(df, k_flag=3).collect()
    top = out[0]
    assert top["vec_id"] == 99 and top["label"] == 0
    assert top["nearest_other"] == 1 and top["margin"] > 0
    assert all(r["margin"] < top["margin"] for r in out[1:])


def test_dedup_savings_by_source_charges_dup_holder(spark):
    # doc 1 (s1) is the keeper; its copy doc 3 lives in s2 -> s2 is
    # charged the duplicate chars, s1 saves nothing.
    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        dedup_savings_by_source,
    )

    rows = [
        (1, "same text here", "s1", 14),
        (2, "unique one", "s1", 10),
        (3, "same text here", "s2", 14),
        (4, "unique two", "s2", 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "n_chars"])
    got = {r["source"]: r for r in dedup_savings_by_source(df).collect()}
    assert got["s1"]["n_dup_docs"] == 0 and got["s1"]["chars_saved"] == 0
    assert got["s2"]["n_dup_docs"] == 1 and got["s2"]["chars_saved"] == 14
    assert got["s2"]["savings_ratio"] == round(14 / 24, 6)


def test_simplified_silhouette_separated_clusters(spark):
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        simplified_silhouette,
    )

    # two tight, well-separated clusters -> silhouette near 1, no
    # negatives; one planted mislabeled row -> exactly one negative
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.01 * i, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [-10.0 - 0.01 * i, 0.0], 1))
    rows.append((12, [10.0, 0.0], 1))  # lives in cluster 0, labeled 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in simplified_silhouette(df).collect()}
    assert out[0]["n_vecs"] == 6 and out[1]["n_vecs"] == 7
    assert out[0]["mean_silhouette"] > 0.9
    assert out[0]["n_negative"] == 0
    assert out[1]["n_negative"] == 1  # the planted row


def test_k_anonymity_audit_counts(spark):
    from agentic_workflow_for_data_transformation_spark.operators.quality import (
        k_anonymity_audit,
    )

    rows = (
        [("a", "x")] * 5      # group of 5: safe at k=5
        + [("a", "y")] * 2    # group of 2: at risk
        + [("b", "x")] * 1    # group of 1: at risk
    )
    df = spark.createDataFrame(rows, ["u", "t"])
    (r,) = k_anonymity_audit(df, ["u", "t"], k=5).collect()
    assert r["quasi"] == "u+t" and r["k"] == 5
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["n_violating_groups"] == 2
    assert r["n_rows_at_risk"] == 3
    assert r["min_group_size"] == 1
    assert abs(r["risk_ratio"] - 3 / 8) < 1e-9


def test_ndcg_perfect_and_partial_ranking(spark):
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        ndcg_per_query,
    )

    # query 0 (label 0): its 3 label-mates are the 3 nearest -> with
    # only 3 relevant in the corpus, ideal_n = 3 and NDCG@10 = 1.0
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),
        (2, [0.98, 0.02], 0),
        (3, [0.97, 0.03], 0),
        (4, [-1.0, 0.0], 1),
        (5, [-0.99, 0.01], 1),
        (6, [-0.98, 0.02], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["query_id"]: r for r in
           ndcg_per_query(df, query_ids=[0], k=10).collect()}
    assert out[0]["ideal_n"] == 3
    assert out[0]["n_rel_topk"] == 3
    assert abs(out[0]["ndcg"] - 1.0) < 1e-9


def test_psi_by_split_constant_category_is_zero(spark):
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        psi_by_split,
    )

    df = spark.createDataFrame(
        [(i, "only") for i in range(200)], ["doc_id", "lang"]
    )
    (r,) = psi_by_split(df, cat_col="lang", id_col="doc_id").collect()
    # one category holds 100% of both slices -> every term is 0
    assert r["psi_term"] == 0.0 and r["psi_total"] == 0.0
    assert r["n_train"] + r["n_test"] == 200


def test_word_entropy_extremes(spark):
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        word_entropy,
    )

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b"), (3, "a b c d")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in word_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["evenness"] == 0.0
    assert out[2]["entropy"] == 1.0 and out[2]["evenness"] == 1.0
    assert out[3]["entropy"] == 2.0 and out[3]["evenness"] == 1.0
    assert out[3]["n_distinct"] == 4


def test_distinct_ngram_stats_by_hand(spark):
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        distinct_ngram_stats,
    )

    df = spark.createDataFrame(
        [("s", "a b a b"), ("s", "a")], ["source", "text"]
    )
    out = {r["n"]: r for r in distinct_ngram_stats(df).collect()}
    # unigrams: a,b,a,b,a -> 5 total, 2 distinct
    assert out[1]["n_total"] == 5 and out[1]["n_distinct"] == 2
    # bigrams: 'a b','b a','a b' (doc2 too short) -> 3 total, 2 distinct
    assert out[2]["n_total"] == 3 and out[2]["n_distinct"] == 2
    # trigrams: 'a b a','b a b' -> 2 total, 2 distinct
    assert out[3]["n_total"] == 2 and out[3]["n_distinct"] == 2
    assert abs(out[2]["distinct_ratio"] - 2 / 3) < 1e-6


def test_cluster_purity_pure_clusters(spark):
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        cluster_purity,
    )

    # two tight clusters whose labels MATCH the geometry -> purity 1.0
    # (ids interleave so the lowest-id k-means init seeds BOTH sides)
    rows = []
    for i in range(0, 8, 2):
        rows.append((i, [5.0 + 0.01 * i, 0.0], 7))
    for i in range(1, 8, 2):
        rows.append((i, [-5.0 - 0.01 * i, 0.0], 9))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = cluster_purity(df, n_centroids=2, n_iter=1).collect()
    assert sum(r["n_vecs"] for r in out) == 8
    for r in out:
        assert r["purity"] == 1.0
        assert r["majority_label"] in (7, 9)


def test_oov_rate_by_hand(spark):
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        oov_rate_by_group,
    )

    df = spark.createDataFrame(
        [("s1", "a a a b"), ("s2", "a rare1 rare2 rare3")],
        ["source", "text"],
    )
    # v=2 vocabulary = {a (5), b (1)} -- b beats rares by word order? no:
    # counts: a=5, b=1, rare1=1, rare2=1, rare3=1 -> top2 = a, b (tie
    # broken by word order: 'b' < 'rare1')
    out = {r["source"]: r for r in
           oov_rate_by_group(df, v=2).collect()}
    assert out["s1"]["n_tokens"] == 4 and out["s1"]["n_oov"] == 0
    assert out["s2"]["n_tokens"] == 4 and out["s2"]["n_oov"] == 3
    assert abs(out["s2"]["oov_rate"] - 0.75) < 1e-9


def test_train_logreg_learns_separable_target(spark):
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        train_logreg_hashed_bow,
    )

    # two disjoint vocabularies -> hashed features separate the
    # classes, so a few gradient rounds must fit resubstitution
    # almost perfectly
    rows = [(i, "aaa aaa aaa", "en") for i in range(30)]
    rows += [(30 + i, "zzzz zzzz zzzz", "de") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["term"]: r["value"] for r in
           train_logreg_hashed_bow(df, d=8, n_iter=8, lr=0.5).collect()}
    assert set(out) == {"bias", "train_acc"} | {f"f{j}" for j in range(8)}
    assert out["train_acc"] >= 0.99


def test_train_logreg_deterministic_across_partitionings(spark):
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        train_logreg_hashed_bow,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, train_logreg_hashed_bow(df, n_iter=2).collect()))
    b = sorted(map(tuple,
                   train_logreg_hashed_bow(df.repartition(13), n_iter=2)
                   .collect()))
    assert a == b


def test_auc_report_separable_and_random(spark):
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        auc_report,
        train_logreg_hashed_bow,
    )

    # disjoint vocabularies -> near-perfect ordering -> AUC ~ 1
    rows = [(i, "aaa aaa", "en") for i in range(20)]
    rows += [(20 + i, "zzzz zzzz", "de") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    w = {
        r["term"]: float(r["value"])
        for r in train_logreg_hashed_bow(df, n_iter=6).collect()
        if r["term"] != "train_acc"
    }
    (r,) = auc_report(df, w).collect()
    assert r["n_pos"] == 20 and r["n_neg"] == 20
    assert r["auc"] >= 0.99

    # constant scores (zero weights) -> all ties -> AUC exactly 0.5
    zero = {k: 0.0 for k in w}
    (r0,) = auc_report(df, zero).collect()
    assert r0["auc"] == 0.5


def test_embedding_anisotropy_extremes(spark):
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        embedding_anisotropy,
    )

    # identical directions -> mean pairwise cosine ~ 1
    same = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(5)], ["vec_id", "embedding"]
    )
    (r,) = embedding_anisotropy(same).collect()
    assert abs(r["mean_pairwise_cosine"] - 1.0) < 1e-5
    assert abs(r["mean_norm"] - 5.0) < 1e-6

    # orthogonal pair -> mean pairwise cosine ~ 0
    ortho = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    (r2,) = embedding_anisotropy(ortho).collect()
    assert abs(r2["mean_pairwise_cosine"]) < 1e-6


def test_cdc_chunks_insertion_robust(spark):
    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        cdc_chunk_dup_stats,
    )

    # doc 2 = doc 1 with one word INSERTED at the front: content-
    # defined boundaries must still align most chunks, so both docs
    # report duplicated mass > 0 while doc 3 (disjoint text) reports 0
    base = ("w%02d " * 40) % tuple(range(40))
    df = spark.createDataFrame(
        [
            (1, base.strip()),
            (2, ("INSERTED " + base).strip()),
            (3, " ".join(f"z{i}" for i in range(40))),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           cdc_chunk_dup_stats(df, mask=8).collect()}
    assert out[1]["n_dup_words"] > 0
    assert out[2]["n_dup_words"] > 0
    assert out[3]["n_dup_chunks"] == 0
    # the inserted word can only poison its own chunk: the shared
    # mass must cover most of the original document
    assert out[1]["dup_mass_ratio"] > 0.5


def test_rrf_fusion_ranks_and_score(spark):
    # unnormalized vectors make cosine and dot DISAGREE: vec 2 points
    # almost exactly along the query (cosine rank 1) but is tiny (dot
    # rank lower); vec 1 is long but off-angle (dot rank 1). The RRF
    # winner must balance the two rankers; score = 1/(60+rc)+1/(60+rd).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # query
        (1, [8.0, 6.0, 0.0, 0.0]),          # |v|=10, cos=0.8, dot=8
        (2, [0.99, 0.01, 0.0, 0.0]),        # cos~1.0, dot~0.99
        (3, [0.5, 0.5, 0.0, 0.0]),          # cos~0.707, dot=0.5
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in
           similarity.rrf_fusion(df, query_ids=[0], k=3).collect()}
    assert out[2]["rank_cos"] == 1 and out[1]["rank_dot"] == 1
    assert out[1]["rank_cos"] == 2 and out[2]["rank_dot"] == 2
    # both split {1,2} across the rankers symmetrically -> same fused
    # score 1/61+1/62; tie broken by id
    assert out[1]["rrf_score"] == out[2]["rrf_score"]
    assert out[1]["fused_rank"] == 1 and out[2]["fused_rank"] == 2
    assert out[3]["fused_rank"] == 3
    expected = round(1.0 / 61 + 1.0 / 62, 6)
    assert abs(out[1]["rrf_score"] - expected) < 1e-9


def test_mmr_rerank_skips_near_duplicate(spark):
    # candidates 1 and 2 are near-identical and most relevant; plain
    # top-2 would take both, MMR (lam=0.5) must take 1 then jump to
    # the diverse 3 because 2's max-sim-to-selected (~1.0) kills it.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),           # query
        (1, [0.9, 0.1, 0.0, 0.0]),           # rel ~0.994
        (2, [0.89, 0.11, 0.0, 0.0]),         # near-dup of 1, rel ~0.992
        (3, [0.5, 0.0, 0.5, 0.0]),           # diverse, rel ~0.707
        (4, [0.0, 0.0, 1.0, 0.0]),           # orthogonal to query
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sorted(
        similarity.mmr_rerank(df, query_ids=[0], k=3, pool=4).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in out] == [1, 2, 3]
    assert out[0]["vec_id"] == 1 and out[0]["max_sim_prev"] == 0.0
    assert out[1]["vec_id"] == 3  # NOT the near-dup 2
    assert out[1]["max_sim_prev"] < 0.8
    # the dup is only admitted once diversity is exhausted
    assert out[2]["vec_id"] in (2, 4)


def test_fleiss_kappa_perfect_and_trim(spark):
    # items a,b: 5 unanimous ratings -> kappa = 1 exactly; item c has
    # only 4 ratings -> dropped and counted; item d has 7 -> trimmed
    # to the first 5 in order (the 2 'no' ratings at ord 6,7 ignored,
    # so d stays unanimous and kappa stays 1).
    rows = (
        [("a", "yes", i) for i in range(5)]
        + [("b", "no", i) for i in range(5)]
        + [("c", "yes", i) for i in range(4)]
        + [("d", "yes", i) for i in range(5)]
        + [("d", "no", 6), ("d", "no", 7)]
    )
    df = spark.createDataFrame(rows, ["item", "label", "ord"])
    from agentic_workflow_for_data_transformation_spark.operators.stats import fleiss_kappa

    out = fleiss_kappa(df, "item", "label", n_raters=5,
                       order_col="ord").collect()[0]
    assert out["n_items"] == 3 and out["n_items_dropped"] == 1
    assert out["n_categories"] == 2
    assert out["p_bar"] == 1.0 and out["kappa"] == 1.0


def test_fleiss_kappa_default_trim_deterministic(spark):
    # no order_col: the trim must fall back to label order, so an
    # over-rated item keeps a DETERMINISTIC label multiset (the 5
    # smallest labels), not a partition-order-dependent subset. Item e
    # has 7 ratings [no x2, maybe x2, yes x3]; label-order trim keeps
    # [maybe, maybe, no, no, yes] regardless of input row order.
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        fleiss_kappa,
    )

    base = [("a", "yes"), ("a", "yes"), ("a", "yes"), ("a", "yes"),
            ("a", "yes")]
    extra = [("e", "yes")] * 3 + [("e", "no")] * 2 + [("e", "maybe")] * 2
    for perm in (extra, extra[::-1], extra[3:] + extra[:3]):
        df = spark.createDataFrame(base + perm, ["item", "label"])
        out = fleiss_kappa(df, "item", "label", n_raters=5).collect()[0]
        assert out["n_items"] == 2 and out["n_categories"] == 3
        # item e keeps {maybe:2, no:2, yes:1}: P_e = sum 2^2+2^2+1^2=9
        # -> P_i(e) = (9-5)/20 = 0.2; P_i(a) = 1 -> p_bar = 0.6
        assert out["p_bar"] == 0.6


def test_classifier_prf_consistent_with_counts(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = similarity.classifier_prf(emb).collect()
    assert rows, "prf report is empty"
    for r in rows:
        assert 0 <= r["tp"] <= min(r["n_pred"], r["n_true"])
        if r["n_pred"]:
            assert abs(r["precision"] - round(r["tp"] / r["n_pred"], 6)) < 1e-9
        if r["n_true"]:
            assert abs(r["recall"] - round(r["tp"] / r["n_true"], 6)) < 1e-9
        if r["n_pred"] + r["n_true"]:
            assert abs(
                r["f1"] - round(2 * r["tp"] / (r["n_pred"] + r["n_true"]), 6)
            ) < 1e-9
    # per slice, predicted totals and actual totals cover the same rows
    for sl in ("train", "test"):
        part = [r for r in rows if r["slice"] == sl]
        assert sum(r["n_pred"] for r in part) == sum(r["n_true"] for r in part)


def test_quality_threshold_sweep_monotone_and_consistent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        text.quality_threshold_sweep(docs).collect(),
        key=lambda r: r["threshold"],
    )
    assert [round(r["threshold"], 1) for r in rows] == [
        round(i / 10, 1) for i in range(10)
    ]
    # threshold 0 keeps everything; kept counts and kept words are
    # non-increasing in the threshold; shares normalize to the full set
    assert rows[0]["n_docs_kept"] == docs.count()
    assert rows[0]["share_docs_kept"] == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs_kept"] <= a["n_docs_kept"]
        assert b["n_words_kept"] <= a["n_words_kept"]
    # spot-check one cutoff against a direct filter of the scored frame
    scored = text.with_quality_score(docs)
    direct = scored.filter(F.col("quality_score") >= 0.5).count()
    (row5,) = [r for r in rows if abs(r["threshold"] - 0.5) < 1e-9]
    assert row5["n_docs_kept"] == direct


def test_majority_vote_single_label_has_no_runner_up(spark):
    from agentic_workflow_for_data_transformation_spark.operators.quality import majority_vote

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], ["item", "lab"]
    )
    got = {r["item"]: r for r in majority_vote(df, "item", "lab").collect()}
    assert got[1]["margin"] == 2 and not got[1]["is_tie"]
    assert got[2]["n_ratings"] == 1 and got[2]["vote_share"] == 1.0
    assert not got[2]["is_tie"]


def test_majority_vote_null_label_tie_pinned_cross_engine(spark):
    """A NULL label tying on votes: the tiebreak is pinned ASC NULLS
    FIRST on BOTH engines (Spark's bare ASC default is NULLS FIRST,
    DuckDB's is NULLS LAST — unpinned, the two would pick different
    winners)."""
    import duckdb

    from agentic_workflow_for_data_transformation_spark.operators.quality import (
        majority_vote,
    )
    from agentic_workflow_for_data_transformation_spark.plans.sqlgen import (
        spec_to_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (1, None), (1, "b"), (1, "b")], ["item", "lab"]
    )
    (r,) = majority_vote(df, "item", "lab").collect()
    assert r["majority_label"] is None and r["is_tie"]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = spec_to_sql(
        {"ops": [{"op": "majority", "key": "item", "label": "lab"}]}, "t"
    )
    (orc,) = con.sql(sql).fetchall()
    assert orc[1] is None and orc[-1] is True


def test_conformal_thresholds_monotone_and_consistent(spark, sf_dir):
    from agentic_workflow_for_data_transformation_spark.operators.quality import (
        conformal_quality_thresholds,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = {r["coverage"]: r
            for r in conformal_quality_thresholds(docs).collect()}
    assert set(rows) == {0.8, 0.9, 0.95}
    r80, r90, r95 = rows[0.8], rows[0.9], rows[0.95]
    # higher target coverage -> LOWER threshold (keep more)
    assert r95["threshold"] <= r90["threshold"] <= r80["threshold"]
    # split covers the corpus; same split in every row
    assert r80["n_cal"] + r80["n_test"] == docs.count()
    assert r80["n_cal"] == r95["n_cal"] and r80["n_test"] == r95["n_test"]
    # more kept at lower thresholds; observed coverage tracks targets
    assert r95["n_test_kept"] >= r90["n_test_kept"] >= r80["n_test_kept"]
    for c, r in rows.items():
        assert r["observed_coverage"] >= c - 0.1  # guarantee holds in
        # expectation; 0.1 slack absorbs split noise on 500 docs
    # spot-check one level against a direct filter of the test slice
    from agentic_workflow_for_data_transformation_spark.operators.sampling import (
        DRAW_BUCKETS,
        hash_draw,
    )
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        with_quality_score,
    )

    scored = with_quality_score(docs).withColumn(
        "_cal", hash_draw(F.col("doc_id"), "conf") < DRAW_BUCKETS // 2
    )
    direct = scored.filter(
        ~F.col("_cal") & (F.col("quality_score") >= r90["threshold"])
    ).count()
    assert direct == r90["n_test_kept"]


def test_krippendorff_alpha_hand_cases(spark):
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        krippendorff_alpha,
    )

    # perfect agreement (every pairable item unanimous) -> alpha = 1;
    # the single-rating item is dropped and counted
    rows = ([("a", "x")] * 3 + [("b", "y")] * 4 + [("c", "x")])
    df = spark.createDataFrame(rows, ["item", "lab"])
    out = krippendorff_alpha(df, "item", "lab").collect()[0]
    assert out["n_items"] == 2 and out["n_items_dropped"] == 1
    assert out["n_ratings"] == 7
    assert out["d_observed"] == 0.0 and out["alpha"] == 1.0

    # Krippendorff's canonical nominal example (Content Analysis):
    # coders disagree maximally within items -> alpha < 0 is possible;
    # here two items each split 1-1 across two categories:
    # socc = 0, n = 4, D_o = 4, D_e = (16 - 8)/3 -> alpha = 1 - 4/(8/3)
    rows2 = [("i1", "x"), ("i1", "y"), ("i2", "x"), ("i2", "y")]
    out2 = krippendorff_alpha(
        spark.createDataFrame(rows2, ["item", "lab"]), "item", "lab"
    ).collect()[0]
    assert out2["d_observed"] == 4.0
    assert abs(out2["d_expected"] - 8.0 / 3.0) < 1e-6
    assert abs(out2["alpha"] - (1.0 - 4.0 / (8.0 / 3.0))) < 1e-6


def test_l_diversity_audit_planted_homogeneous_group(spark):
    from agentic_workflow_for_data_transformation_spark.operators.quality import (
        l_diversity_audit,
    )

    # group 1 is k-anonymous (4 rows) but HOMOGENEOUS (one diagnosis)
    # -> the exact leak l-diversity exists to catch; group 2 is
    # diverse; group 3 has 2 distinct < l=3 -> also violating
    rows = (
        [(1, "flu")] * 4
        + [(2, "flu"), (2, "cold"), (2, "covid")]
        + [(3, "flu"), (3, "cold")]
    )
    df = spark.createDataFrame(rows, ["zip", "diagnosis"])
    (r,) = l_diversity_audit(df, ["zip"], "diagnosis", l=3).collect()
    assert r["n_groups"] == 3 and r["n_violating_groups"] == 2
    assert r["n_rows_at_risk"] == 6 and r["min_diversity"] == 1
    assert abs(r["risk_ratio"] - round(6 / 9, 6)) < 1e-9


def test_benford_audit_planted_distribution(spark):
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        BENFORD_EXPECTED,
        benford_audit,
    )

    # magnitude-spanning values with known leading digits; zeros and
    # nulls must drop out; the sub-1 value's leading digit is its
    # first NONZERO digit (3), not 0
    vals = [123.4, 19.0, 1000.0, 0.0345, 2.5, 250.0, 0.0, None, -310.0]
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    got = {r["digit"]: r for r in benford_audit(df).collect()}
    assert set(got) == {"1", "2", "3"}
    assert got["1"]["n_obs"] == 3   # 123.4, 19, 1000
    assert got["2"]["n_obs"] == 2   # 2.5, 250
    assert got["3"]["n_obs"] == 2   # 0.0345, -310 (sign stripped)
    for d, r in got.items():
        assert r["benford_expected"] == BENFORD_EXPECTED[int(d)]
        assert abs(r["share"] - round(r["n_obs"] / 7, 6)) < 1e-9


def test_map_at_k_hand_case(spark):
    # query 0 (label 0): corpus holds two other label-0 vectors; one
    # ranks 1st, the other 3rd -> AP = (1/1 + 2/3) / 2; ideal_n = 2
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.01, 0.0, 0.0], 0),   # rank 1, relevant
        (2, [0.9, 0.3, 0.0, 0.0], 1),     # rank 2, not
        (3, [0.8, 0.3, 0.0, 0.0], 0),     # rank 3, relevant
        (4, [0.0, 1.0, 0.0, 0.0], 1),     # rank 4, not
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    (r,) = similarity.map_at_k(df, query_ids=[0], k=4).collect()
    assert r["n_rel_topk"] == 2 and r["ideal_n"] == 2
    assert abs(r["ap_at_k"] - round((1.0 + 2.0 / 3.0) / 2, 6)) < 1e-6


def test_correlation_matrix_hand_case(spark):
    from agentic_workflow_for_data_transformation_spark.operators.profile import (
        correlation_matrix,
    )

    # y = 2x exactly -> r = 1; z anti-correlates with x -> r = -1;
    # c is constant -> NULL r against everything
    rows = [(1.0, 2.0, 3.0, 5.0), (2.0, 4.0, 2.0, 5.0),
            (3.0, 6.0, 1.0, 5.0)]
    df = spark.createDataFrame(rows, ["x", "y", "z", "c"])
    got = {(r["col_a"], r["col_b"]): r["r"]
           for r in correlation_matrix(df, ["x", "y", "z", "c"]).collect()}
    assert len(got) == 6
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0
    assert got[("x", "c")] is None and got[("z", "c")] is None


def test_correlation_matrix_pairwise_complete_nulls(spark):
    """b = 2a exactly on every row where both are present; one NULL in
    b must NOT poison the pair (the global-n shortcut returned 0.848528
    here instead of 1.0). Each pair's n counts only its complete rows."""
    from agentic_workflow_for_data_transformation_spark.operators.profile import (
        correlation_matrix,
    )

    rows = [(1.0, 2.0), (2.0, None), (3.0, 6.0), (4.0, 8.0)]
    df = spark.createDataFrame(rows, ["a", "b"])
    (r,) = correlation_matrix(df, ["a", "b"]).collect()
    assert r["n"] == 3
    assert r["r"] == 1.0

    # cross-engine: the sqlgen oracle must implement the same masking
    import duckdb

    from agentic_workflow_for_data_transformation_spark.plans.sqlgen import (
        spec_to_sql,
    )

    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = spec_to_sql({"ops": [{"op": "correlate", "cols": ["a", "b"]}]}, "t")
    assert con.sql(sql).fetchall() == [("a", "b", 3, 1.0)]


def test_common_direction_audit_recovers_planted_component(spark):
    """Vectors = mu + t*u + tiny noise for a known unit direction u:
    the in-plan power iteration must recover u (the dominant
    covariance direction), so each vector's c1_proj must be ~t-mu_t
    and proj_ratio ~1 (almost all centered mass lives in u)."""
    import math

    from agentic_workflow_for_data_transformation_spark.operators.linalg import (
        common_direction_audit,
        power_iteration_top_pc,
    )

    d = 8
    u = [1.0 / math.sqrt(d)] * d
    rows = []
    for n in range(40):
        t = (n - 19.5) / 4.0
        rows.append(
            (n, [0.5 + t * u[i] + (0.001 if i == n % d else 0.0)
                 for i in range(d)])
        )
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    v = {r["i"]: r["v"] for r in power_iteration_top_pc(df, n_iter=6).collect()}
    assert len(v) == d
    # recovered component ~ u (sign pinned positive at the max entry)
    for i in range(d):
        assert abs(abs(v[i]) - u[0]) < 0.01
    out = {r["vec_id"]: r for r in common_direction_audit(df).collect()}
    assert len(out) == 40
    for n, r in out.items():
        t = (n - 19.5) / 4.0
        # centered projection is ~t (mean of t over rows is 0)
        assert abs(abs(r["c1_proj"]) - abs(t)) < 0.02
        assert r["proj_ratio"] > 0.97 or abs(t) < 0.2
        assert r["norm_centered"] >= abs(r["c1_proj"]) - 1e-9


def test_hybrid_rrf_agrees_with_rankers(spark, sf_dir):
    """Hybrid fusion invariants on real tables: every fused row keeps
    at least one source rank; source ranks respect the depth cut; a
    candidate retrieved by BOTH rankers at rank 1 would score
    2/(60+1) — and in general rrf_score must equal the recomputed
    1/(60+r) sum of its non-null ranks."""
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        hybrid_rrf_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hybrid_rrf_topk(
        docs, emb, {0: ["vector", "stream"], 7: ["window", "group"]},
        k=10, depth=50,
    ).collect()
    assert len(out) == 20  # 10 per query
    for row in out:
        assert row["rank_dense"] is not None or row["rank_lex"] is not None
        expect = 0.0
        if row["rank_dense"] is not None:
            assert 1 <= row["rank_dense"] <= 50
            expect += 1.0 / (60 + row["rank_dense"])
        if row["rank_lex"] is not None:
            assert 1 <= row["rank_lex"] <= 50
            expect += 1.0 / (60 + row["rank_lex"])
        assert abs(row["rrf_score"] - round(expect, 6)) < 1e-9
    # fused_rank is a clean 1..10 per query
    for qid in (0, 7):
        ranks = sorted(r["fused_rank"] for r in out if r["query_id"] == qid)
        assert ranks == list(range(1, 11))


def test_unimax_matches_sequential_reference(spark):
    """The window closed form must reproduce the paper's sequential
    walk exactly: ascending-capacity order, each source gets
    min(capacity, remaining/remaining_sources). Checked on a skewed
    hand corpus against a Python reimplementation, plus budget
    conservation."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        unimax_allocation,
    )

    # sources with 1, 2, 6, 6, 25 one-token docs
    rows = []
    for src, n in [("a", 1), ("b", 2), ("c", 6), ("d", 6), ("e", 25)]:
        rows += [(src, "tok")] * n
    df = spark.createDataFrame(rows, ["source", "text"])
    budget, epochs = 30, 2
    out = {r["source"]: r for r in unimax_allocation(
        df, budget_tokens=budget, max_epochs=epochs).collect()}

    # sequential reference
    caps = sorted([("a", 2), ("b", 4), ("c", 12), ("d", 12), ("e", 50)],
                  key=lambda t: (t[1], t[0]))
    b, left = float(budget), len(caps)
    ref = {}
    for src, cap in caps:
        u = b / left
        a = min(float(cap), u)
        ref[src] = a
        b -= a
        left -= 1
    for src, a in ref.items():
        assert abs(out[src]["allocated_tokens"] - a) < 1e-6, (src, a, out[src])
    assert abs(sum(r["allocated_tokens"] for r in out.values()) - budget) < 1e-5
    assert out["a"]["capped"] and out["b"]["capped"]
    assert not out["e"]["capped"]
    assert out["a"]["epochs"] == 2.0


def test_unimax_all_capped_when_budget_exceeds_capacity(spark):
    """Budget above total capacity: every source is capped at
    max_epochs and the allocation is exactly the capacity column."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        unimax_allocation,
    )

    rows = [("a", "x y"), ("b", "x"), ("b", "y z w")]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = unimax_allocation(df, budget_tokens=10_000, max_epochs=3).collect()
    for r in out:
        assert r["capped"]
        assert r["allocated_tokens"] == float(r["capacity"])
        assert r["epochs"] == 3.0


def test_poisson_bootstrap_deterministic_and_ordered(spark, sf_dir):
    """Hash-based bootstrap: two runs are identical row for row
    (never an RNG), the interval is ordered around a plausible mean,
    and every group reports the full replicate count."""
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = sorted(
        poisson_bootstrap_ci(ev, "event_type", "value", "event_id",
                             n_boot=20).collect()
    )
    b = sorted(
        poisson_bootstrap_ci(ev, "event_type", "value", "event_id",
                             n_boot=20).collect()
    )
    assert a == b
    assert len(a) > 0
    for r in a:
        assert r["n_replicates"] == 20
        assert r["boot_lo"] <= r["boot_hi"]
        # the replicate spread brackets the point mean loosely: for a
        # mean over thousands of rows the band is tight around it
        assert r["boot_lo"] <= r["mean_value"] <= r["boot_hi"] or (
            abs(r["mean_value"] - r["boot_lo"]) < 0.5
        )


def test_pca_top2_recovers_planted_components(spark):
    """Vectors = mu + a*u1 + b*u2 + tiny noise with var(a) >> var(b):
    the deflated in-plan power iteration must recover u1 then u2
    (|cos| > 0.99 each), orthogonal, unit-norm, descending
    eigenvalues close to var(a)/var(b). Planted data gives the clear
    spectral gap fixed-round power iteration needs (on a flat
    spectrum the fixed rounds return a deterministic MIXTURE — the
    documented tradeoff for having an unrolled SQL oracle at all)."""
    import math

    import numpy as np

    from agentic_workflow_for_data_transformation_spark.operators.linalg import (
        power_iteration_top2,
    )

    d, n = 8, 240
    u1 = np.array([1, 1, 1, 1, -1, -1, -1, -1]) / math.sqrt(8)
    u2 = np.array([1, -1, 1, -1, 1, -1, 1, -1]) / math.sqrt(8)
    rows = []
    for i in range(n):
        a = 3.0 * math.sin(0.7 * i)
        b = 1.1 * math.cos(1.3 * i)
        eps = np.array([0.01 * math.sin(7 * i + k) for k in range(d)])
        vec = 0.5 + a * u1 + b * u2 + eps
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = power_iteration_top2(df, n_iter=6).collect()
    v = np.zeros((2, d))
    eig = {}
    for r in out:
        v[r["component"] - 1, r["i"]] = r["v"]
        eig[r["component"]] = r["eigval"]
    assert abs(float(np.dot(v[0], u1))) > 0.99
    assert abs(float(np.dot(v[1], u2))) > 0.99
    assert abs(float(np.dot(v[0], v[1]))) < 0.02
    assert eig[1] > eig[2] > 0
    # eigenvalues ~ sample variances of a and b (loose band)
    avar = float(np.var([3.0 * math.sin(0.7 * i) for i in range(n)]))
    bvar = float(np.var([1.1 * math.cos(1.3 * i) for i in range(n)]))
    assert abs(eig[1] - avar) < 0.1 * avar
    assert abs(eig[2] - bvar) < 0.1 * bvar
    for c in (0, 1):
        assert abs(float(np.linalg.norm(v[c])) - 1.0) < 1e-6


def test_apply_unimax_sampling_respects_caps(spark):
    """Materialized UniMax: a capped source (epochs exactly the cap)
    yields exactly cap copies of every doc; an uncapped source gives
    each doc floor(e) or ceil(e) copies; two runs are identical."""
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        apply_unimax_sampling,
        unimax_allocation,
    )

    rows = []
    i = 0
    for src, n in [("a", 1), ("b", 2), ("c", 6), ("d", 6), ("e", 25)]:
        for _ in range(n):
            rows.append((i, "tok", src))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    alloc = {r["source"]: r for r in unimax_allocation(
        df, budget_tokens=30, max_epochs=2).collect()}
    out = apply_unimax_sampling(df, budget_tokens=30, max_epochs=2).collect()
    out2 = apply_unimax_sampling(df, budget_tokens=30, max_epochs=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    from collections import Counter

    per_doc = Counter((r["source"], r["doc_id"]) for r in out)
    import math

    for (src, _doc), n_copies in per_doc.items():
        e = alloc[src]["epochs"]
        assert math.floor(e) <= n_copies <= math.ceil(e), (src, e, n_copies)
    # capped sources (a, b): exactly 2 copies of every doc
    for src, n_docs in [("a", 1), ("b", 2)]:
        assert alloc[src]["capped"]
        copies = [c for (s, _), c in per_doc.items() if s == src]
        assert len(copies) == n_docs and all(c == 2 for c in copies)
    # copy indices are 1..n per doc
    seen = {}
    for r in out:
        seen.setdefault((r["source"], r["doc_id"]), []).append(r["copy"])
    for k, v in seen.items():
        assert sorted(v) == list(range(1, len(v) + 1)), k


def test_bootstrap_diff_detects_planted_shift(spark):
    """A planted +10 mean shift between cohorts must come out
    significant with the band around the true diff; an identical
    cohort pair must not."""
    from pyspark.sql import functions as F

    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        bootstrap_diff_ci,
    )

    rows = []
    for i in range(400):
        base = float(50 + (i * 13) % 7)
        # group 'shift': even keys sit 10 higher; group 'flat': no shift
        rows.append((i, "shift", base + (10.0 if i % 2 == 0 else 0.0)))
        rows.append((i + 1000, "flat", base))
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = {r["event_type"]: r for r in bootstrap_diff_ci(
        df, "event_type", "value", "event_id",
        cohort=F.col("event_id") % 2 == 0, n_boot=40,
    ).collect()}
    s = out["shift"]
    assert s["significant"]
    assert s["boot_lo"] <= s["mean_diff"] <= s["boot_hi"]
    assert 8.0 < s["mean_diff"] < 12.0
    f = out["flat"]
    assert not f["significant"]
    assert f["boot_lo"] <= 0.0 <= f["boot_hi"]


def test_poisson_bootstrap_fast_draw_mode(spark, sf_dir):
    """draw='xxhash64' (the Spark-native production path — the md5
    string draw is the op's measured bottleneck) must return the same
    schema, the same point statistics, a deterministic ordered band,
    and a CI consistent with the md5 mode's within ~the replicate
    noise; draw='bogus' must raise."""
    import pytest as _pytest

    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fast = {r["event_type"]: r for r in poisson_bootstrap_ci(
        ev, "event_type", "value", "event_id", n_boot=20,
        draw="xxhash64").collect()}
    fast2 = {r["event_type"]: r for r in poisson_bootstrap_ci(
        ev, "event_type", "value", "event_id", n_boot=20,
        draw="xxhash64").collect()}
    slow = {r["event_type"]: r for r in poisson_bootstrap_ci(
        ev, "event_type", "value", "event_id", n_boot=20).collect()}
    assert fast == fast2  # deterministic
    assert set(fast) == set(slow)
    for k in fast:
        assert fast[k]["mean_value"] == slow[k]["mean_value"]
        assert fast[k]["n_rows"] == slow[k]["n_rows"]
        assert fast[k]["boot_lo"] <= fast[k]["boot_hi"]
        # the two hash streams give different resamples but the same
        # underlying sampling distribution: bands must overlap
        assert fast[k]["boot_lo"] <= slow[k]["boot_hi"]
        assert slow[k]["boot_lo"] <= fast[k]["boot_hi"]
    with _pytest.raises(ValueError):
        poisson_bootstrap_ci(ev, "event_type", "value", "event_id",
                             draw="bogus")


def test_spearman_matrix_monotone_ties_and_nulls(spark):
    """x vs x^3 is perfectly monotone but not linear -> rho exactly 1
    where Pearson would be < 1; z descends with one tie -> midranks
    [5, 3.5, 3.5, 2, 1] against [1..5] give rho = -9.5/sqrt(95)
    = -0.974679 (the scipy.spearmanr value); a NULL row must fall out
    of the pair via the pairwise-complete mask."""
    from agentic_workflow_for_data_transformation_spark.operators.profile import (
        spearman_matrix,
    )

    rows = [(1.0, 1.0, 5.0), (2.0, 8.0, 4.0), (3.0, 27.0, 4.0),
            (4.0, 64.0, 2.0), (5.0, 125.0, 1.0)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    got = {(r["col_a"], r["col_b"]): (r["n"], r["rho"])
           for r in spearman_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == (5, 1.0)
    assert got[("x", "z")] == (5, -0.974679)
    assert got[("y", "z")] == (5, -0.974679)

    # NULL y on one row: ranks are per-column over that column's
    # non-null rows (the documented rank-once convention, NOT pandas'
    # per-pair re-rank), then the pair mask drops the incomplete row
    # from the moments. x keeps ranks [1,2,3,4]; y ranks its three
    # values [1,2,3]; the complete rows pair x-ranks [1,3,4] with
    # y-ranks [1,2,3] -> rho = 5/sqrt(2*14/...) = 0.981981, not 1
    rows2 = [(1.0, 1.0), (2.0, None), (3.0, 27.0), (4.0, 64.0)]
    df2 = spark.createDataFrame(rows2, ["x", "y"])
    (r,) = spearman_matrix(df2, ["x", "y"]).collect()
    assert r["n"] == 3
    assert r["rho"] == 0.981981


def test_mutual_information_hand_cases(spark):
    """Bijective dependence: mi = h_a = h_b = ln 2, nmi = 1.
    Independence: every cell at its product probability -> each log
    term is ln(1) = 0 exactly, so mi = 0 and nmi = 0."""
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        mutual_information,
    )

    dep = [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")]
    (r,) = mutual_information(
        spark.createDataFrame(dep, ["u", "v"]), "u", "v"
    ).collect()
    assert r["n"] == 4 and r["n_cells"] == 2
    assert r["mi"] == 0.693147 == r["h_a"] == r["h_b"]
    assert r["nmi"] == 1.0

    ind = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    (r2,) = mutual_information(
        spark.createDataFrame(ind, ["u", "v"]), "u", "v"
    ).collect()
    assert r2["n"] == 4 and r2["n_cells"] == 4
    assert r2["mi"] == 0.0 and r2["nmi"] == 0.0

    # a NULL in either column drops the row from the distribution
    (r3,) = mutual_information(
        spark.createDataFrame(dep + [("a", None)], ["u", "v"]), "u", "v"
    ).collect()
    assert r3["n"] == 4


def test_bfs_levels_chain_and_depth_cap(spark):
    """Chain 1-2-3-4-5 (symmetric) plus a disconnected pair 10-11:
    default seed is the smallest endpoint (1), levels are exact hop
    distances, the far pair never appears; max_depth cuts the search
    at that level; an explicit seeds frame runs multi-source BFS with
    min-distance-to-any-seed semantics."""
    from agentic_workflow_for_data_transformation_spark.operators.graph import (
        bfs_levels,
    )

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {r["node"]: r["level"]
           for r in bfs_levels(edges, max_depth=6).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    capped = {r["node"]: r["level"]
              for r in bfs_levels(edges, max_depth=2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2}

    seeds = spark.createDataFrame([(5,), (10,)], ["node"])
    multi = {r["node"]: r["level"]
             for r in bfs_levels(edges, max_depth=6, seeds=seeds).collect()}
    assert multi == {5: 0, 10: 0, 4: 1, 11: 1, 3: 2, 2: 3, 1: 4}


def test_kendall_tau_b_hand_cases(spark):
    """No ties: x=[1,2,3,4] vs y=[1,3,2,4] has 5 concordant / 1
    discordant row pairs -> tau = 4/6. Balanced ties: the 2x2 uniform
    grid has C = D = 1 -> tau_b = 0. scipy cross-check: the
    scipy.stats.kendalltau doc example rounds to -0.471405."""
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        kendall_tau_b,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2), (4, 4)], ["x", "y"]
    )
    (r,) = kendall_tau_b(df, ["x", "y"]).collect()
    assert (r["n"], r["concordant"], r["discordant"]) == (4, 5, 1)
    assert r["tau_b"] == 0.666667

    grid = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], ["x", "y"]
    )
    (g,) = kendall_tau_b(grid, ["x", "y"]).collect()
    assert (g["concordant"], g["discordant"], g["tau_b"]) == (1, 1, 0.0)

    sp = spark.createDataFrame(
        [(12, 1), (2, 4), (1, 7), (12, 1), (2, 0)], ["x", "y"]
    )
    (s,) = kendall_tau_b(sp, ["x", "y"]).collect()
    assert s["tau_b"] == -0.471405


def test_kneser_ney_hand_case(spark):
    """Corpus 'a b' x2, 'c b', 'a d': bigram counts (a,b)=2, (c,b)=1,
    (a,d)=1; continuation counts nb(b)=2, nb(d)=1, B=3. Interpolated
    KN with d=0.75: p(b|a) = 1.25/3 + (0.75*2/3)*(2/3) = 0.75 exactly,
    p(d|a) = 0.25/3 + 0.5*(1/3) = 0.25 (the a-row sums to 1 since a's
    mass all lands on seen types), p(b|c) = 0.25 + 0.75*(2/3) = 0.75."""
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        kneser_ney_bigrams,
    )

    docs = spark.createDataFrame(
        [("a b",), ("a b",), ("c b",), ("a d",)], ["text"]
    )
    got = {(r["w1"], r["w2"]): (r["n"], r["p_kn"])
           for r in kneser_ney_bigrams(docs, min_count=1).collect()}
    assert got == {("a", "b"): (2, 0.75), ("a", "d"): (1, 0.25),
                   ("c", "b"): (1, 0.75)}


def test_adamic_adar_hand_case(spark):
    """Path-ish graph 1-2, 2-3, 1-4, 4-3, 2-5: the non-adjacent pairs
    with two common neighbors are (1,3) through middles {2 deg 3,
    4 deg 2} -> 1/ln3 + 1/ln2 = 2.352934, and (2,4) through middles
    {1 deg 2, 3 deg 2} -> 2/ln2 = 2.88539; pairs sharing only one
    middle (e.g. (1,5)) fall under min_common and never appear."""
    from agentic_workflow_for_data_transformation_spark.operators.graph import (
        adamic_adar,
    )

    und = [(1, 2), (2, 3), (1, 4), (4, 3), (2, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {(r["node_a"], r["node_b"]): (r["common_neighbors"], r["aa_score"])
           for r in adamic_adar(edges).collect()}
    assert got == {(1, 3): (2, 2.352934), (2, 4): (2, 2.88539)}
