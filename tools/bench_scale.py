"""Scale-validation harness: run the headline query chains at two scale
factors of the SAME generator (tools/gen_scale.py) and report the
per-query scaling exponent  e = log(t_big / t_small) / log(sf_ratio).

e ~ 1.0  -> linear in data size (the 100 TB story holds)
e << 1   -> fixed overheads dominate at these sizes (fine)
e >> 1   -> super-linear; a finding unless the query is a documented
            quadratic verification harness.

Writes BENCH_SCALE.md at the repo root.

Usage:
    python tools/gen_scale.py --sf 0.1 --out scaledata/sf0.1
    python tools/gen_scale.py --sf 1   --out scaledata/sf1
    python tools/bench_scale.py --small scaledata/sf0.1 --big scaledata/sf1
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
    "ns_dedup_embedding_cosine",
    "ns_sim_knn_bucketed",
    "ns_sim_topk_lsh",
    "ns_ann_recall_lsh",
    "ns_text_quality",
    "ns_pack_sequences",
    "ns_dedup_embedding_apply",
    "x_sessionize_batch",
    "x_join_interval_bucketed",
    "x_time_bucket_agg",
    "x_join_asof",
    "p20_tpch_q1",
    "x_tpch_q3",
    "x_tpch_q5",
    "x_tpch_q18",
]

# documented super-linear cases where e > 1 is inherent, not a plan flaw
EXPECTED_SUPERLINEAR: dict[str, str] = {
    "ns_dedup_embedding_cosine": (
        "OUTPUT-bound: at threshold 0.4 on label-clustered vectors, whole "
        "clusters are mutual near-dups, so the pair LISTING itself grows "
        "~n^2 (measured 129k pairs at sf0.1 -> 8.3M at sf1). The linear "
        "100 TB path is representative selection (dedup-apply), not pair "
        "enumeration; time per emitted pair is flat"
    ),
}


def run_dir(sf_dir: str, names: list[str]) -> dict[str, float]:
    spark = get_spark(app_name=f"bench_scale_{Path(sf_dir).name}")
    warmup(spark)
    reg = benchqueries.queries()
    out: dict[str, float] = {}
    for name in names:
        cold, steady = time_query(spark, reg[name], sf_dir)
        out[name] = round(steady, 3)
        print(f"  {name}: {out[name]:.2f}s (cold {cold:.2f}s)", flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="scaledata/sf0.1")
    ap.add_argument("--big", default="scaledata/sf1")
    ap.add_argument("--ratio", type=float, default=10.0)
    args = ap.parse_args()

    print(f"== {args.small} ==", flush=True)
    t_small = run_dir(args.small, QUERIES)
    print(f"== {args.big} ==", flush=True)
    t_big = run_dir(args.big, QUERIES)

    lines = [
        "# BENCH_SCALE — scaling validation (generated data, same generator both sides)",
        "",
        f"Data: `tools/gen_scale.py` at sf0.1 and sf1 ({args.ratio:.0f}x rows; lineitem",
        "600k -> 6M, documents 5k -> 50k, embeddings 2k -> 20k, events 100k -> 1M).",
        "Steady-state seconds (2nd run, min-of-2 on GC-pause suspicion), local[32].",
        "Exponent e = log(t_sf1 / t_sf0.1) / log(10): ~1 linear, <1 overhead-bound,",
        ">1 super-linear (flagged unless documented).",
        "",
        "Chain note: `ns_dedup_clusters` / `ns_dedup_apply` reuse the session-scoped",
        "LSH intermediates built by the minhash/verified steps, so their cost is the",
        "marginal chain cost, as in a production pipeline run.",
        "",
        "| query | sf0.1 (s) | sf1 (s) | ratio | exponent | verdict |",
        "|---|---|---|---|---|---|",
    ]
    findings: list[str] = []
    for name in QUERIES:
        a, b = t_small[name], t_big[name]
        ratio = b / max(a, 1e-9)
        e = math.log(max(ratio, 1e-9)) / math.log(args.ratio)
        if e <= 1.15 or b < 1.0:
            verdict = "linear/overhead-bound"
        elif name in EXPECTED_SUPERLINEAR:
            verdict = f"super-linear BY DESIGN — {EXPECTED_SUPERLINEAR[name]}"
        else:
            verdict = "**SUPER-LINEAR — finding**"
            findings.append(name)
        lines.append(f"| {name} | {a:.2f} | {b:.2f} | {ratio:.1f}x | {e:.2f} | {verdict} |")

    lines += [
        "",
        f"Super-linear findings: {findings if findings else 'none'}",
        "",
        "Raw JSON: see BENCH_SCALE.json",
    ]
    (ROOT / "BENCH_SCALE.md").write_text("\n".join(lines) + "\n")
    (ROOT / "BENCH_SCALE.json").write_text(
        json.dumps({"small": t_small, "big": t_big, "ratio": args.ratio}, indent=1) + "\n"
    )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
