"""Scale-validation harness: run the headline query chains at several
scale factors of the SAME generator (tools/gen_scale.py) and report the
per-query scaling exponent, least-squares fitted over
log(t) = e * log(sf) + c.

e ~ 1.0  -> linear in data size (the 100 TB story holds)
e << 1   -> fixed overheads dominate at these sizes (fine)
e >> 1   -> super-linear; a finding unless the query is a documented
            quadratic verification harness.

Writes BENCH_SCALE.md at the repo root.

Usage:
    python tools/gen_scale.py --sf 0.1 --out scaledata/sf0.1   # etc.
    python tools/bench_scale.py \
        --dirs scaledata/sf0.1,scaledata/sf1,scaledata/sf3 \
        --sfs 0.1,1,3 [--skip name,...]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from agentic_workflow_for_data_transformation_spark import benchqueries
from agentic_workflow_for_data_transformation_spark.benchutil import time_query, warmup
from agentic_workflow_for_data_transformation_spark.session import get_spark

# headline chains (VERDICT r3 "Next round #1") plus the other families
# whose scale behavior the engine's 100 TB story leans on. Order matters
# for the dedup chain: clusters/apply reuse the session-scoped LSH
# intermediates, so their numbers are marginal cost given the chain —
# exactly how a production pipeline would run them.
QUERIES = [
    "ns_dedup_exact",
    "ns_dedup_minhash_lsh",
    "ns_dedup_lsh_verified",
    "ns_dedup_clusters",
    "ns_dedup_apply",
    "ns_dedup_simhash",
    "ns_dedup_jaccard_prefix",
    "ns_dedup_embedding_cosine",
    "ns_sim_knn_bucketed",
    "ns_sim_topk_lsh",
    "ns_ann_recall_lsh",
    "ns_text_quality",
    "ns_text_boilerplate_ratio",
    "ns_text_token_pmi",
    "ns_sample_weighted",
    "ns_graph_pagerank",
    "ns_corpus_incremental_stats",
    "ns_pack_sequences",
    "ns_dedup_embedding_apply",
    "ns_dedup_substring_spans",
    "ns_dedup_span_ranges",
    "ns_embed_gram",
    "x_listagg",
    "x_mode_per_group",
    "x_join_asof_nearest",
    "x_window_count_distinct",
    "x_markov_transitions",
    "x_sessionize_batch",
    "x_join_interval_bucketed",
    "x_time_bucket_agg",
    "x_join_asof",
    "p20_tpch_q1",
    "x_tpch_q3",
    "x_tpch_q5",
    "x_tpch_q18",
    # round-7 additions (VERDICT r6 #4): the round-6 operators that had
    # no scale row, the rewritten mix-sampling chain, and the two new
    # NL window-vocabulary shapes that add plan nodes (ntile bucket
    # window; sliding first_value frame)
    "ns_multimodal_audio_segments",
    "p46_nl_asof_tolerance",
    "p47_nl_median",
    "ns_corpus_mix_apply",
    "p48_nl_ntile",
    "p51_nl_first_value",
    # the Bloom screen's fixed build jobs dominate at sf0.1 (3.8s solo
    # vs 1.3s for the exact join it screens for); the sweep is where
    # its flat-probe advantage over the join's growing shuffle shows
    "ns_decontaminate_bloom",
    "ns_dedup_incremental_bucketed",
    "p52_nl_moving_median",
    "p54_nl_wordcount",
    "p55_nl_dedup_keep",
    "ns_text_bm25",
    "ns_stats_welch_ttest",
    "ns_embed_pq",
    "ns_stats_count_min",
    "ns_corpus_token_budget",
    "p59_nl_search",
    "ns_graph_triangles",
    "ns_sim_topk_pq",
    # round-8 additions: trained-codebook / composed ANN serving, the
    # NL corpus-op chains (the LSH chain behind p63 is the heaviest NL
    # plan in the registry), segment-level line dedup (two keyed
    # shuffles), the grid-join resample, and the broadcast-clamp
    # winsorize
    "ns_sim_topk_ivfpq",
    "p63_nl_neardup",
    "p65_nl_pack",
    "ns_dedup_lines",
    # round-8 fourth-session additions: the Gopher rule battery (pure
    # projection), DSIR weighting (two exploded passes + broadcast
    # scoring join), token fertility (one aggregate), and the JSONL
    # round trip (write fixture + evolving read + aggregate)
    "ns_quality_gopher",
    "ns_corpus_dsir_weights",
    "ns_text_token_fertility",
    "x_source_jsonl_evolving",
    "ns_corpus_dsir_sample",
    "x_source_orc_partitioned",
    "x_frequent_items",
    "ns_quality_gopher_rep",
    "x_resample_interpolate",
    "x_winsorize_group",
    "p69_nl_langid",
    "p71_nl_quality",
    "x_merge_upsert",
    "ns_sample_negatives",
    "ns_text_bpe_merges",
    # round-8 third-session additions: SemDeDup (auto-sized cells keep
    # the within-cell prune linear), the broadcast-anchor retrieval
    # harnesses, the regex-heavy NL redact, and the reference-slice
    # perplexity bucketing (token join + broadcast percentile cutoffs)
    "ns_dedup_semantic",
    "ns_sim_mrr",
    "ns_sim_hard_negatives",
    "p78_nl_redact",
    "ns_text_perplexity_buckets",
    "ns_dedup_incremental_lsh",
    "ns_text_bpe_encode",
    # round-8 fifth-session additions: the per-source duplication
    # audit (one shingle explode, digest-keyed window totals) and the
    # CSV twin of the evolving-source round trip
    "ns_corpus_dup_by_source",
    "x_source_csv_evolving",
    # ... plus the snapshot diff (full-outer digest join) and the
    # centroid-pairs map (one posexplode aggregate + tiny self-join)
    "ns_corpus_snapshot_diff",
    "ns_sim_centroid_pairs",
    # ... plus winnowing fingerprint pairs (window-min per doc, max_df
    # guard before the fp self-join), the nearest-centroid
    # separability audit (labels x dim broadcast model, fan-out join
    # bounded by label count), and the pairwise JS source-divergence
    # map (vocab x groups aggregate, join fan-out bounded by group
    # count squared)
    "ns_dedup_winnowing",
    "ns_classify_nearest_centroid",
    "ns_corpus_js_divergence",
    # ... plus the corpus datacard (single-scan aggregates + one
    # checkpointed (lang, word) count table) and the per-label cluster
    # exemplars (broadcast model, fan-out-1 own-centroid join)
    "ns_corpus_datacard",
    "ns_sim_cluster_exemplars",
    "ns_classify_label_margin",
    "ns_dedup_savings_by_source",
    "ns_dedup_cluster_sizes",
    # round-8 sixth-session additions: the evaluation layer —
    # silhouette + NDCG (broadcast-model scoring shapes), the
    # k-anonymity and PSI audits (aggregate folds), word entropy
    # (explode + two aggregates), distinct-n (single tagged explode,
    # triple gram mass), packing efficiency (bounded windows +
    # rollup), and the NL blocklist filter (pure per-row screen)
    "ns_sim_silhouette",
    "ns_sim_ndcg",
    "x_kanonymity",
    "x_split_psi",
    "ns_text_word_entropy",
    "ns_text_distinct_n",
    "ns_corpus_pack_efficiency",
    "p87_nl_blocklist",
    # ... plus the classifier-evaluation family (trainer: two
    # aggregate rounds over the checkpointed feature table;
    # calibration/AUC: 8 rounds then one binned/two-phase-cumulative
    # aggregate), cluster purity (kmeans chain + cell argmax), the
    # OOV coverage audit (TakeOrdered vocab + broadcast membership
    # join), and the anisotropy closed form (one posexplode into
    # dim-sized sums)
    "ns_quality_train_logreg",
    "ns_quality_calibration",
    "ns_quality_auc",
    "ns_sim_cluster_purity",
    "ns_text_oov_rate",
    "ns_embed_anisotropy",
    # round-8 seventh session: the retrieval-serving / label-trust
    # layer (broadcast-query scoring scans + per-query windows; the
    # MMR greedy is bounded per query inside applyInPandas) and the
    # one-scan majority/kappa/threshold aggregates
    "ns_sim_rrf_fusion",
    "ns_sim_mmr_rerank",
    "ns_quality_fleiss_kappa",
    "ns_classify_prf",
    "ns_quality_majority_vote",
    "ns_quality_threshold_sweep",
    "p91_nl_majority",
    "p92_nl_quality_dedup",
    "ns_quality_conformal",
    "ns_quality_kripp_alpha",
    "p94_nl_ewma",
    "p95_nl_anomaly",
    "ns_sim_map",
    "x_benford",
    "x_ldiversity",
    "x_corr_matrix",
    # round-9 additions: the in-plan power-iteration ABTT audit (two
    # corpus scans + d*d-frame iteration) and the NL BPE trainer (5
    # merges vs the measured ns_text_bpe_merges' 3 — the other round-9
    # NL queries p97/p98/p100 compile to the already-measured
    # ns_sim_ndcg / ns_sim_silhouette / ns_text_perplexity_buckets
    # plans and carry no separate scale row)
    "ns_embed_common_direction",
    "p99_nl_bpe",
    # round-9 session additions: hybrid BM25+cosine RRF, UniMax
    # allocation, Poisson bootstrap, deflated top-2 PCA (the NL twins
    # p102/p103 compile to the ns_corpus_unimax /
    # ns_stats_poisson_bootstrap plans and carry no separate row)
    "ns_sim_hybrid_rrf",
    "ns_corpus_unimax",
    "ns_stats_poisson_bootstrap",
    "ns_embed_pca_top2",
    "ns_corpus_unimax_apply",
    "ns_stats_bootstrap_diff",
    # round-9 late additions (p104/p105 NL twins share these plans)
    "ns_stats_mutual_info",
    "x_spearman_matrix",
    "ns_graph_bfs_levels",
    # round-9 analysis-layer additions (p106/p107/p108 NL twins share
    # the anova / funnel / novelty plans and carry no separate row):
    # one-scan grouped-sufficient-stats ANOVA, contingency-frame
    # Cramér's V, the group-partitioned rank window + rank-keyed mean
    # join of quantile normalization, 3-round label propagation over
    # the co-order graph, the shingle-keyed novelty aggregate, the
    # broadcast-cutoff curriculum keys, the one-scan epoch audit, and
    # the user-keyed funnel chain
    "ns_stats_anova",
    "ns_stats_cramers_v",
    "ns_stats_quantile_norm",
    "ns_graph_label_prop",
    "ns_text_novelty",
    "ns_corpus_curriculum",
    "ns_corpus_epoch_audit",
    "x_funnel_conversion",
    "ns_corpus_concentration",
    "ns_text_hapax",
]

# documented super-linear cases where e > 1 is inherent, not a plan flaw
EXPECTED_SUPERLINEAR: dict[str, str] = {
    "ns_dedup_winnowing": (
        "OUTPUT-bound at the top end: the generated corpus has whole "
        "near-dup clusters, so the shared-fingerprint pair LISTING grows "
        "~n^2 within them (33k pairs at sf3 -> 342k at sf10, a 10.4x "
        "output growth for 3.3x data; fitted e stays < 1 because small "
        "SFs are overhead-bound). The linear 100 TB path is the "
        "keep-first APPLY (p84_nl_winnow_dedup drops the doc_b side), "
        "and the max_df guard bounds per-fingerprint join fan-out; the "
        "residual growth is genuinely duplicated content"
    ),
    "ns_dedup_embedding_cosine": (
        "OUTPUT-bound: at threshold 0.4 on label-clustered vectors, whole "
        "clusters are mutual near-dups, so the pair LISTING itself grows "
        "~n^2 (measured 129k pairs at sf0.1 -> 8.3M at sf1). The linear "
        "100 TB path is representative selection (dedup-apply), not pair "
        "enumeration; time per emitted pair is flat"
    ),
    "ns_dedup_jaccard_prefix": (
        "DATA-DEPENDENT: AllPairs/PPJoin candidate bounds come from "
        "token-frequency SKEW — a rare prefix token caps the join "
        "fan-out. The generated corpus draws from a ~30-word vocabulary, "
        "so no shingle is selective and the prefix self-join degrades "
        "toward the naive inverted-index join (2.1s at sf0.1 -> 66s at "
        "sf1). On Zipfian real text the prefix IS the rare tail; on "
        "low-entropy corpora the LSH chain (minhash_lsh -> lsh_verified, "
        "linear here) is the dedup scale path and this operator is the "
        "exact-threshold fallback. Capped at sf1 in this sweep"
    ),
}

# per-query scale cap: don't run the query at sf above the cap (the
# exponent fits over the points that did run). For documented
# data-dependent degradations where larger points only burn hours
# re-measuring a known quadratic.
MAX_SF: dict[str, float] = {
    "ns_dedup_jaccard_prefix": 1.0,
    # output-bound pair listing: 1.9s/35s/240s at sf0.1/1/3 (e=1.40,
    # time per emitted pair flat) — re-measuring the documented n^2
    # at sf3/sf10 adds ~20 sweep-minutes for no new information
    "ns_dedup_embedding_cosine": 1.0,
}


def dormant_interval_time(spark, sf: float) -> float:
    """Adversarial dataset for the interval-containment join: ALL keys
    are dormant (activity confined to the first 3 days) while the
    dataset SPAN grows with sf (one heartbeat key keeps max(ts)
    advancing). Under the old global max-ts horizon every key's final
    period fans out into |keys| x |span-days| bucket rows (~sf^2 here);
    the per-key horizon keeps the fanout at each key's own 3-day
    activity (~sf). Everything is generated JVM-side (spark.range +
    hash expressions), no driver loops."""
    import time as _time

    from pyspark.sql import functions as F

    from agentic_workflow_for_data_transformation_spark.operators.joins import (
        interval_containment_join,
    )

    n_keys = int(50_000 * sf)
    span_days = max(30, int(300 * sf))
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    ev = (
        spark.range(n_keys * 10)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % n_keys).alias("user_id"),
            F.timestamp_add(
                "SECOND",
                (F.abs(F.xxhash64("id")) % (3 * 86400)).cast("int"),
                base,
            ).alias("ts"),
        )
    )
    heartbeat = spark.range(span_days).select(
        (F.col("id") + n_keys * 10).alias("event_id"),
        F.lit(n_keys).cast("long").alias("user_id"),
        F.timestamp_add("DAY", F.col("id").cast("int"), base).alias("ts"),
    )
    ev = ev.unionByName(heartbeat)
    bounds = spark.range(n_keys + 1).select(
        F.col("id").alias("user_id"),
        F.timestamp_add(
            "SECOND", (F.abs(F.xxhash64("id", F.lit("b"))) % 3600).cast("int"), base
        ).alias("period_start"),
    )
    t0 = _time.perf_counter()
    interval_containment_join(ev, bounds).count()
    return _time.perf_counter() - t0


def zipf_prefix_time(spark, sf: float) -> float:
    """Adjudication dataset for the prefix-filtered Jaccard join: the
    registry corpus draws from a ~30-word vocabulary, where NO shingle
    is selective and AllPairs/PPJoin degrades toward the naive join
    (documented e=1.52 cap). Real text is Zipfian — most shingles are
    rare — and THAT is the regime the operator claims linearity in. So
    measure it: docs of 30-70 tokens drawn log-uniformly (density
    1/rank, i.e. Zipf s=1) from a 50k-token vocabulary, all generated
    JVM-side (spark.range + hash expressions, no driver loops), then
    the same jaccard_prefix_pairs(t=0.5) the registry runs."""
    import time as _time

    from pyspark.sql import functions as F

    from agentic_workflow_for_data_transformation_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    n_docs = int(50_000 * sf)
    vocab = 50_000
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    # 30-70 tokens per doc; token rank is log-uniform in
                    # [1, vocab] => P(rank) ~ 1/rank (Zipf s=1)
                    F.sequence(
                        F.lit(0),
                        (F.abs(F.xxhash64("id", F.lit("len"))) % 41 + 29).cast("int"),
                    ),
                    lambda j: F.concat(
                        F.lit("t"),
                        F.floor(
                            F.exp(
                                (F.abs(F.xxhash64(F.col("id"), j, F.lit("tok")))
                                 % 1_000_000)
                                / F.lit(1_000_000.0)
                                * F.lit(math.log(float(vocab)))
                            )
                        ).cast("long"),
                    ),
                ),
            ).alias("text"),
        )
    )
    t0 = _time.perf_counter()
    jaccard_prefix_pairs(docs, threshold=0.5).count()
    t1 = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    jaccard_prefix_pairs(docs, threshold=0.5).count()
    return min(t1, _time.perf_counter() - t0)


def run_dir(sf_dir: str, sf: float, names: list[str],
            synthetics: bool = True) -> dict[str, float]:
    spark = get_spark(app_name=f"bench_scale_{Path(sf_dir).name}")
    warmup(spark)
    reg = benchqueries.queries()
    out: dict[str, float] = {}
    for name in names:
        if sf > MAX_SF.get(name, float("inf")):
            print(f"  {name}: skipped (capped at sf{MAX_SF[name]:g})", flush=True)
            continue
        cold, steady = time_query(spark, reg[name], sf_dir)
        out[name] = round(steady, 3)
        print(f"  {name}: {out[name]:.2f}s (cold {cold:.2f}s)", flush=True)
    if not synthetics:
        spark.stop()
        return out
    # synthetic adversarial row (not a registry query): dormant-key
    # interval join — min of 2 runs, same pause discipline as benchutil
    t = min(dormant_interval_time(spark, sf), dormant_interval_time(spark, sf))
    out["x_join_interval_dormant (synthetic)"] = round(t, 3)
    print(f"  x_join_interval_dormant: {t:.2f}s", flush=True)
    # capped at sf3 (500k Zipf docs): the exact prefix join's candidate
    # set at sf10 outgrows this box's 12g driver even with the
    # shuffle-hash pin (r7 finding) — 0.1/1/3 fit the exponent
    if sf <= 3:
        t = zipf_prefix_time(spark, sf)
        out["ns_dedup_jaccard_prefix_zipf (synthetic)"] = round(t, 3)
        print(f"  ns_dedup_jaccard_prefix_zipf: {t:.2f}s", flush=True)
    else:
        print("  ns_dedup_jaccard_prefix_zipf: skipped (capped at sf3)", flush=True)
    spark.stop()
    return out


def fit_exponent(sfs: list[float], ts: list[float]) -> float:
    """Least-squares slope of log(t) on log(sf)."""
    xs = [math.log(s) for s in sfs]
    ys = [math.log(max(t, 1e-9)) for t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="scaledata/sf0.1,scaledata/sf1")
    ap.add_argument("--sfs", default="0.1,1")
    ap.add_argument("--skip", default="")
    ap.add_argument(
        "--only", default="",
        help="measure ONLY these queries and MERGE their rows into the "
        "committed BENCH_SCALE.json, re-rendering the markdown from the "
        "merged timings — the incremental path when registering new "
        "queries (the full sweep is hours; new rows shouldn't cost that)",
    )
    args = ap.parse_args()

    dirs = args.dirs.split(",")
    sfs = [float(s) for s in args.sfs.split(",")]
    assert len(dirs) == len(sfs) >= 2
    skip = set(filter(None, args.skip.split(",")))
    only = [n for n in args.only.split(",") if n]
    names = [n for n in QUERIES if n not in skip and (not only or n in only)]

    prev: dict = {}
    if only:
        prev = json.loads((ROOT / "BENCH_SCALE.json").read_text())
        assert prev["sfs"] == sfs and prev["dirs"] == dirs, (
            "--only merges into the committed sweep: sfs/dirs must match "
            f"({prev['sfs']}/{prev['dirs']})"
        )

    per_dir: list[dict[str, float]] = []
    for i, (d, sf) in enumerate(zip(dirs, sfs)):
        print(f"== {d} ==", flush=True)
        new = run_dir(d, sf, names, synthetics=not only)
        if only:
            merged = dict(prev["timings"][i])
            merged.update(new)
            new = merged
        per_dir.append(new)
    names = [n for n in QUERIES if n not in skip] + [
        "x_join_interval_dormant (synthetic)",
        "ns_dedup_jaccard_prefix_zipf (synthetic)",
    ]

    sf_heads = " | ".join(f"sf{s:g} (s)" for s in sfs)
    lines = [
        "# BENCH_SCALE — scaling validation (generated data, same generator all points)",
        "",
        f"Data: `tools/gen_scale.py` at {', '.join(f'sf{s:g}' for s in sfs)}"
        " (rows scale linearly with sf;",
        "lineitem 6M, documents 50k, embeddings 20k, events 1M at sf1).",
        "Steady-state seconds (shared benchutil protocol), local[32].",
        "Exponent e = least-squares slope of log(t) on log(sf):",
        "~1 linear, <1 overhead-bound, >1 super-linear (flagged unless documented).",
        "",
        "Chain note: `ns_dedup_clusters` / `ns_dedup_apply` reuse the session-scoped",
        "LSH intermediates built by the minhash/verified steps, so their cost is the",
        "marginal chain cost, as in a production pipeline run. The PQ/IVFADC serving",
        "queries (`ns_sim_topk_pq`, `ns_sim_recall_pq`, `ns_sim_topk_ivfpq`) likewise",
        "serve from session-built offline artifacts (trained codebook + encoded code",
        "table; the IVFADC index persisted partitioned by cell): the COLD column pays",
        "the one-time index build (train + the n*(m*k) encode join — 173 s at sf10),",
        "the steady column is the per-query serve cost a deployment actually pays",
        "(code-table scan + broadcast LUT join; 1.8-4.4 s at sf10, was 66-155 s when",
        "the round-8 queries re-encoded the corpus per query). The co-order graph",
        "reads (`ns_graph_bfs_levels`, `ns_graph_label_prop`, adamic-adar) likewise",
        "share one session-scoped checkpointed edge list (the lineitem self-join is",
        "the dominant cost; it materializes once, as a pipeline would run it), and",
        "the classifier evaluations (`ns_quality_calibration` / `ns_quality_auc`)",
        "evaluate one session-trained weight set instead of retraining per query.",
        "",
        f"| query | {sf_heads} | exponent | max-seg slope | verdict |",
        "|---|" + "---|" * (len(sfs) + 3),
    ]
    findings: list[str] = []
    for name in names:
        pts = [(s, d[name]) for s, d in zip(sfs, per_dir) if name in d]
        ts = [t for _, t in pts]
        e = fit_exponent([s for s, _ in pts], ts)
        # max SEGMENT slope (judge finding, round 8): the least-squares
        # exponent over all points lets a flat overhead-bound start mask
        # a tail that is blowing up — winnowing fit e=0.66 while its
        # sf3->sf10 segment ran at slope 2.13. Flag the worst consecutive
        # segment too, ignoring segments whose endpoint is under 1s
        # (sub-second deltas are session noise, not scaling signal).
        segs = [
            math.log(ts[k + 1] / max(ts[k], 1e-9))
            / math.log(pts[k + 1][0] / pts[k][0])
            for k in range(len(pts) - 1)
            if ts[k + 1] >= 1.0
        ]
        max_seg = max(segs, default=0.0)
        if (e <= 1.15 and max_seg < 1.3) or ts[-1] < 1.0:
            verdict = "linear/overhead-bound"
        elif name in EXPECTED_SUPERLINEAR:
            verdict = f"super-linear BY DESIGN — {EXPECTED_SUPERLINEAR[name]}"
        else:
            verdict = "**SUPER-LINEAR — finding**"
            findings.append(name)
        by_sf = dict(pts)
        cells = " | ".join(
            f"{by_sf[s]:.2f}" if s in by_sf else "— (capped)" for s in sfs
        )
        lines.append(
            f"| {name} | {cells} | {e:.2f} | {max_seg:.2f} | {verdict} |"
        )
    if skip:
        lines.append("")
        lines.append(f"Skipped at this run (adjudicated separately): {sorted(skip)}")

    lines += [
        "",
        f"Super-linear findings: {findings if findings else 'none'}",
        "",
        "Raw JSON: see BENCH_SCALE.json",
    ]
    (ROOT / "BENCH_SCALE.md").write_text("\n".join(lines) + "\n")
    (ROOT / "BENCH_SCALE.json").write_text(
        json.dumps({"sfs": sfs, "dirs": dirs, "timings": per_dir}, indent=1) + "\n"
    )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
