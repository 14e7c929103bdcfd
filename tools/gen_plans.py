"""Generate PLANS.md: the formatted physical plan for each headline
query, with a one-paragraph annotation of WHY that plan is the one
you'd want at 100 TB — scan pushdown, exchange count, join strategy,
codegen coverage. The plan-quality assertions live in
tests/test_plans.py; this file is the human-auditable rendering.

Usage: python tools/gen_plans.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from agentic_workflow_for_data_transformation_spark import benchqueries
from agentic_workflow_for_data_transformation_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

# (query, what to look for in the plan — the 100 TB argument)
HEADLINE: list[tuple[str, str]] = [
    (
        "p20_tpch_q1",
        "Scan-filter-aggregate: the shipdate filter reaches the parquet scan "
        "(PushedFilters) and ReadSchema carries only the 7 needed columns; "
        "one partial+final HashAggregate pair around a single exchange on the "
        "two low-cardinality group keys; the whole map side is one "
        "WholeStageCodegen span.",
    ),
    (
        "x_tpch_q3",
        "Star-ish join: both dimension filters push into their scans; the "
        "small sides broadcast (BroadcastHashJoin), so the lineitem fact "
        "never shuffles for the joins — its only exchange is the final "
        "aggregate's; top-10 plans as TakeOrderedAndProject, not a global "
        "sort.",
    ),
    (
        "x_tpch_q18",
        "Join-heaviest TPC-H in the corpus: the high-quantity aggregate "
        "semi-joins orders BEFORE the 3-way join (the selective filter runs "
        "first), and the top-100 is TakeOrderedAndProject.",
    ),
    (
        "x_join_asof",
        "As-of join WITHOUT a non-equi join: union + running-last over one "
        "per-key window — exactly one exchange on the key, zero pair "
        "explosion; the window sort is the only sort.",
    ),
    (
        "x_join_interval_bucketed",
        "Point-in-interval containment as a (key, day-bucket) HASH join — "
        "no BroadcastNestedLoopJoin anywhere except the designed 1-row "
        "horizon attach; the per-key horizon keeps dormant keys from "
        "fanning out.",
    ),
    (
        "x_join_interval_overlap",
        "Interval x interval overlap as three two-tier (key, calendar-"
        "bucket) hash joins (day for short spans, month for long) — the "
        "naive plan is a per-key theta BNLJ; here every join is an "
        "equi-join and the exact predicate filters after.",
    ),
    (
        "x_join_salted_skew",
        "Skew-safe join: the hot key is salted across N buckets (the dim "
        "side replicates per salt), so no single reducer owns the hot key's "
        "whole partition.",
    ),
    (
        "ns_dedup_exact",
        "Exact dedup groups on md5(text): the exchange carries 16-byte "
        "digests, never documents — partial aggregation collapses "
        "duplicates map-side.",
    ),
    (
        "ns_dedup_minhash_lsh",
        "LSH banding: signature aggregate + band-key self-join — cost is "
        "O(candidate pairs), never O(n^2); the only joins key on band "
        "hashes.",
    ),
    (
        "ns_sim_knn_bucketed",
        "Bucketed kNN: per-label residual sign buckets block the pair "
        "space; centers broadcast; the bucket join is an equi-join, not a "
        "cross product.",
    ),
    (
        "ns_corpus_build_e2e",
        "Four pipeline stages (quality gate -> exact dedup -> "
        "decontamination -> packing) composed as ONE declarative plan: "
        "Catalyst collapses the stage boundaries; the corpus is scanned "
        "once per independent subtree, not once per stage.",
    ),
    (
        "x_groupwise_ols",
        "Five regression moments in one partial+final aggregate; the only "
        "exchanges are the dimension broadcast and the group-key "
        "aggregate.",
    ),
    (
        "x_time_interpolate",
        "Backward-last and forward-first window passes share ONE exchange + "
        "sort (same partition spec); the spine explode never touches the "
        "fact table again. The only BroadcastNestedLoopJoin is the designed "
        "crossJoin of the 1-ROW bounds frame that sizes the spine.",
    ),
    (
        "ns_quality_expectations",
        "Six declared expectations -> ONE global aggregate (conditional "
        "sums + exact count-distincts) over one scan; the per-expectation "
        "report rows explode from the 1-row result. No join, no second "
        "scan.",
    ),
    (
        "ns_dedup_incremental_bucketed",
        "Recurring-pipeline dedup layout: the archive digest set is read "
        "back from a bucketBy(32, _h).sortBy(_h) table, so the anti join "
        "plans NO Exchange above the archive scan — the bucket files ARE "
        "the hash partitioning; only the (small) new batch shuffles. The "
        "per-session twin (ns_dedup_incremental) re-hashes and re-shuffles "
        "the archive under every batch; this plan pays that shuffle once "
        "at archive-build time and never again "
        "(tests/test_layout.py pins the archive-side exchange absence).",
    ),
    (
        "ns_decontaminate_bloom",
        "Bloom-screen decontamination: the benchmark gram set folds into "
        "ONE natively-built bitset (xxhash64 double hashing -> bit_or "
        "word merge, an order-independent monoid; Spark's own "
        "bloom_filter_agg is Catalyst-internal and unregistered) that "
        "ships as a binary literal; the corpus probes it with pure JVM "
        "byte-extraction expressions — no join against the gram set, so "
        "the 100 TB side is never shuffled and the probe cost is "
        "independent of benchmark size. One-sided error: "
        "screen-then-verify with the exact operator over the flagged "
        "sliver.",
    ),
    (
        "ns_text_bm25",
        "BM25 retrieval: the query-term isin filters the token stream "
        "INSIDE the scan stage (before the tf shuffle), df/N/avgdl are "
        "term- or 1-row-cardinality broadcasts, and the top-k is "
        "TakeOrderedAndProject — the corpus-sized exchanges carry only "
        "(doc_id, dl) and the query-term sliver.",
    ),
    (
        "ns_stats_count_min",
        "Count-min sketch: tokens reduce map-side to (token, count); "
        "the sketch aggregate exchanges at most depth*width fixed rows "
        "regardless of corpus size; the top-k probe joins against the "
        "BROADCAST 1024-row sketch — no corpus-sized join anywhere.",
    ),
    (
        "ns_embed_pq",
        "Product quantization: subvectors are sliced BEFORE the explode "
        "(full-width vectors never leave the scan), the k*m codebook "
        "broadcasts, and the per-(vector, subspace) argmin is a "
        "min(struct) aggregate — one corpus-sized exchange, no window, "
        "no quadratic join.",
    ),
    (
        "ns_dedup_lines",
        "C4-style line dedup with rebuild: exactly TWO keyed exchanges — "
        "hash(segment) for the global first-occurrence rank, hash(doc_id) "
        "for the ordered reassembly — and no join at all; the rebuild is "
        "an array_sort(collect_list) aggregate, so the corpus text crosses "
        "the wire once per shuffle and never fans out.",
    ),
    (
        "x_resample_interpolate",
        "Grid resample + linear interpolation: the observed buckets join "
        "into the generated epoch grid as a BROADCAST, and all four "
        "prev/next fill expressions share ONE Window node over one "
        "(key, epoch) sort — the naive plan is four windows = four sorts; "
        "grid size is bounded by wall-clock span, not event count.",
    ),
    (
        "x_merge_upsert",
        "MERGE upsert: one full-outer SortMergeJoin on the key and "
        "per-column coalesce — no second pass, no driver state; with a "
        "bucketed base table the base side's exchange disappears "
        "entirely (the digest-archive layout trick).",
    ),
    (
        "ns_sample_negatives",
        "Negative sampling: the fixed 64-row candidate pool broadcasts, "
        "so the corpus side does anchor x constant work in its own scan "
        "stage — the per-anchor ranking window is the only exchange; a "
        "per-anchor corpus sample would have been a self-join.",
    ),
    (
        "ns_dedup_semantic",
        "SemDeDup: centroids broadcast into the assignment (corpus "
        "scanned, never repartitioned by anything data-sized); the "
        "within-cluster prune is an equi-join on the cell id, so pair "
        "work is sum(cell^2) with auto-sized cells — ~n * cell, not "
        "n^2; survivors leave through a left-anti join keyed on id.",
    ),
    (
        "ns_sim_hard_negatives",
        "Hard-negative mining: the anchor set broadcasts, the corpus "
        "is scanned once scoring every anchor per row, and the only "
        "exchange is the per-anchor top-k window partitioned by "
        "anchor_id — the same single-scan shape as the MRR harness.",
    ),
    (
        "ns_quality_gopher",
        "Gopher rule battery: a single Project over the scan — every "
        "signal (split/translate/replace/list-lambda) and every rule "
        "boolean is a per-row expression inside one WholeStageCodegen "
        "span; zero exchanges, so at 100 TB the filter costs exactly "
        "the ingest scan you were already paying.",
    ),
    (
        "ns_corpus_dsir_weights",
        "DSIR importance weights: the estimate pass partial-aggregates "
        "each partition to 16 (bucket, count) rows before its exchange; "
        "the 16-row log-ratio table BROADCASTS into the scoring pass, "
        "whose per-doc aggregate is the only data-sized exchange — and "
        "it carries (doc_id, decimal partial sum), never the words.",
    ),
    (
        "x_source_jsonl_evolving",
        "Schema-evolving JSONL union: each batch keeps its own scan "
        "(no materialized union); the missing column arrives as a "
        "null literal in the early batch's Project, and the aggregate "
        "partial-combines map-side — the union is plan-level, so "
        "adding a dump-date batch never rewrites old data.",
    ),    (
        "ns_dedup_winnowing",
        "Winnowing (MOSS) fingerprints: ONE corpus scan feeds the k-gram "
        "explode and the per-DOCUMENT window-min (partitioned by doc_id — "
        "no corpus-level sort); the checkpointed (id, fp) table is the "
        "only thing the four downstream consumers read; the max_df "
        "boilerplate guard is an aggregate + semi-join, never a window "
        "over a hot fingerprint, so a million-doc banner cannot pin one "
        "task; the pair self-join is an equi-join on the 8-byte "
        "fingerprint.",
    ),
    (
        "ns_classify_nearest_centroid",
        "Train-on-cluster classifier: the labels x dim centroid model and "
        "the labels-row norm table BROADCAST (the corpus never shuffles "
        "for the model); the scoring join fans each (row, pos) out by the "
        "label count and aggregates map-side; the argmin window "
        "partitions by row id; every decision value is DECIMAL, so the "
        "confusion matrix is bit-identical on any partitioning.",
    ),
    (
        "ns_corpus_js_divergence",
        "Distribution divergence map: one token explode collapses "
        "map-side into the (group, word) count table (vocabulary-sized, "
        "checkpointed once for its three consumers); the pairwise term is "
        "an equi-join on the word whose per-key fan-out is bounded by the "
        "group count squared — corpus size never enters the join; "
        "one-sided vocabulary never joins at all (folded closed-form).",
    ),
    (
        "ns_sim_silhouette",
        "Simplified silhouette (linear centroid form): the labels x dim "
        "model + norm table BROADCAST; scoring fans each (row, pos) out "
        "by label count and aggregates map-side; the nearest-OTHER "
        "argmin window partitions by row id; per-row s pins "
        "DECIMAL(12,6) so the per-label mean is an exact decimal sum — "
        "no all-pairs term anywhere, unlike Rousseeuw's original.",
    ),
    (
        "ns_text_distinct_n",
        "Distinct-n diversity: all three n-gram sizes are built per row "
        "from shifted-slice zip_with and exploded ONCE (struct-tagged), "
        "so the corpus is scanned a single time into one (group, n) "
        "exact count-distinct aggregate — no self-joins, no repeated "
        "scans, shuffle carries the same (key, gram) order of work the "
        "shingle index already pays.",
    ),
    (
        "x_kanonymity",
        "k-anonymity audit: one hash aggregate on the quasi-identifier "
        "key (map-side combined), then group-cardinality rows fold to "
        "ONE report row — two exchanges total, no joins, no windows; "
        "at 100 TB the cost is the quasi-key groupBy you'd pay for any "
        "cardinality profile.",
    ),
    (
        "ns_sim_rrf_fusion",
        "Hybrid-retrieval rank fusion: ONE corpus scan scores both the "
        "cosine and dot-product rankers against the broadcast query side; "
        "the three per-query rank windows share a single query_id "
        "exchange, and the fused top-k plans as WindowGroupLimit (partial "
        "per-partition top-k before the exchange), never a global sort.",
    ),
    (
        "ns_quality_threshold_sweep",
        "All ten candidate quality cutoffs as conditional SUMs inside ONE "
        "global aggregate: a single scan pruned to the text column, one "
        "1-row partial-aggregated exchange, report rows exploded with "
        "stack — sweeping thresholds costs the one scan you'd pay to "
        "apply a single guessed cutoff.",
    ),
    (
        "p95_nl_anomaly",
        "Rolling z-score anomaly flags with DECIMAL-exact sliding "
        "stats in O(1) per row: the baseline sum/sum-of-squares are "
        "CUMULATIVE decimal sums differenced through lag(cs,1) - "
        "lag(cs,n+1) — exact decimals make the difference bit-equal "
        "to a bounded frame's sum, without the O(n)-per-row "
        "re-aggregation decimal frames cost (no incremental frame "
        "processor); one exchange on the key, one sort, every window "
        "shares it.",
    ),
    (
        "ns_sim_mmr_rerank",
        "MMR diversity rerank with the right split of labor: the corpus "
        "scan, per-query top-pool window, and pool-pairwise cosines are "
        "ordinary distributed ops; the inherently-sequential greedy "
        "selection touches only the bounded per-query pool inside "
        "applyInPandas partitioned BY QUERY — a million queries rerank "
        "in parallel with no driver state.",
    ),
    (
        "ns_sim_topk_ivfpq",
        "IVFADC SERVED from the persisted index (round 9): the codes "
        "scan reads the parquet table written PARTITIONED BY CELL with "
        "a dynamicpruning PartitionFilter fed by the broadcast probe "
        "list — file-level inverted-list selection, no vector column "
        "in ReadSchema — and the only raw-embeddings reads are the "
        "pushed-filter query-row and coarse-centroid fetches. "
        "Re-encoding per query (the n x (m*k) assignment join) "
        "measured 66 s solo at sf10; this plan serves in 4.4 s.",
    ),
    (
        "ns_embed_common_direction",
        "All-but-the-top audit with the iteration OFF the corpus: one "
        "scan collapses to integer-exact Gram sums (map-side combine "
        "to d(d+1)/2 partials per task), six power-iteration rounds "
        "run as joins over the d*d covariance frame (localCheckpointed "
        "per round, so plan size is constant in n_iter), and one more "
        "scan computes both per-vector DECIMAL sums against the "
        "broadcast (mean, component) model — no corpus self-join, no "
        "numpy, the eigenvector itself is oracle-checked.",
    ),
    (
        "ns_sim_hybrid_rrf",
        "Hybrid lexical+dense retrieval (round 9): the BM25 side's "
        "query-term isin filter sits IN the documents scan stage "
        "before the (doc, term) tf shuffle, df/N/avgdl and the "
        "(query, term) map come back as BroadcastExchanges, the "
        "dense side broadcasts the query vectors over ONE embeddings "
        "scan, both rank windows partition by query_id with the "
        "depth cut applied before the FULL OUTER fuse (<= 2*depth "
        "rows per query joins, whatever the corpus size), and the "
        "fused top-k is a WindowGroupLimit, never a global sort.",
    ),
    (
        "ns_stats_poisson_bootstrap",
        "Poisson bootstrap (round 9): the explode to B=40 replicates "
        "happens INSIDE the map stage and partial HashAggregate "
        "collapses it to (group x replicate) rows BEFORE the only "
        "exchange — shuffle volume is groups*B regardless of corpus "
        "size; the rank over replicate means partitions by group, "
        "and the point-stats join is group-cardinality. The weights "
        "are md5-hash draws through shared integer CDF cutoffs: "
        "deterministic, so the CI itself is hash-checked cross-engine.",
    ),
    (
        "x_spearman_matrix",
        "Spearman rank correlation (round 9): per column the ranks come "
        "from a distinct-value count aggregate cumulated with the "
        "two-phase bucket trick — the in-bucket cumulative window "
        "partitions by the bucket key, the bounded offsets cumulative "
        "hides behind the non-foldable pmod key, and each offsets "
        "frame joins back as a BroadcastExchange — so NO step sorts "
        "the data globally. The moment pass is then ONE aggregate "
        "whose SinglePartition exchange carries one partial row per "
        "partition (never data rows), identical to x_corr_matrix.",
    ),
    (
        "ns_stats_mutual_info",
        "Mutual information (round 9): ONE FileScan builds the (lang, "
        "source) contingency aggregate (map-side combined, lazily "
        "checkpointed for its four consumers); marginals, total, and "
        "every entropy sum run on that cell frame and come back as "
        "broadcast 1-row joins — the corpus is never rescanned, and "
        "the DECIMAL(28,12)-pinned log terms make the sums "
        "partition-order exact on both engines.",
    ),
    (
        "ns_graph_label_prop",
        "Label propagation (round 9): three synchronous vote rounds, "
        "each one edge-keyed label join + one (node, label) count "
        "aggregate + one argmax window PARTITIONED BY node (ties to "
        "the smallest label — deterministic without convergence "
        "detection); the label frame is lazily checkpointed per round "
        "so the plan stays flat and per-round traffic is |E| "
        "fixed-width rows. The visible plan is the community rollup: "
        "a keyed aggregate over the final checkpointed labels, no "
        "cartesian pair listing, no single-partition funnel.",
    ),
    (
        "ns_stats_quantile_norm",
        "Quantile normalization (round 9): the rank window partitions "
        "by the group column (never a global sort), n_min arrives as "
        "a broadcast 1-row frame, and the trimmed ranked frame is "
        "lazily checkpointed so the reference-distribution aggregate "
        "and the output join consume ONE window pass instead of "
        "sorting the data twice; the rank equi-join is uniform by "
        "construction — every rank appears exactly k times, so no "
        "skew at any scale.",
    ),
    (
        "x_funnel_conversion",
        "Funnel (round 9): each stage is a filtered min-ts aggregate "
        "joined to the previous stage on the user key — three hash "
        "exchanges on user_id over per-step event subsets, no "
        "sessionization window, no global sort; the per-step count "
        "frames are 1-row aggregates assembled broadcast-side "
        "(BroadcastNestedLoopJoin of single rows), so the report "
        "never collects to the driver.",
    ),
]


def main() -> None:
    spark = get_spark(app_name="gen_plans")
    reg = benchqueries.queries()
    lines = [
        "# PLANS — physical plans of the headline queries, annotated",
        "",
        f"`df.explain('formatted')` at {SF_DIR}, local[32], AQE on. The",
        "annotation above each plan states the property that makes it the",
        "plan you'd want at 100 TB; tests/test_plans.py asserts the same",
        "properties mechanically so they can't silently regress.",
        "Regenerate: `python tools/gen_plans.py`.",
        "",
    ]
    for name, why in HEADLINE:
        df = reg[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # keep the operator tree + scan details, drop the (long) codegen
        # subtree listings after the first blank-line-separated block
        plan = re.sub(r"\n{3,}", "\n\n", plan.strip())
        lines += [
            f"## {name}",
            "",
            why,
            "",
            "```",
            plan,
            "```",
            "",
        ]
    (ROOT / "PLANS.md").write_text("\n".join(lines) + "\n")
    print(f"PLANS.md: {len(HEADLINE)} plans")


if __name__ == "__main__":
    main()
