"""Streaming throughput benchmark: drive the engine's streaming
operators from Spark's rate source at a fixed offered load and record
the sustained processedRowsPerSecond the pipelines actually achieve.

The batch side's scale story is measured (BENCH_SCALE.md); this is the
streaming twin — numbers, not adjectives, for the watermarked
aggregate, the stateful dedup, and the raw source->sink path. Writes
BENCH_STREAM.md at the repo root.

Method: each pipeline runs against format('rate') (monotonic
timestamps, so the watermark advances and state stays bounded) for
``--seconds`` wall-clock; the reported rate is the mean
processedRowsPerSecond over completed non-empty micro-batches after
dropping the first two (JVM/codegen warmup). The offered rate is set
high enough (default 2M rows/s) that the pipeline, not the source, is
the bottleneck — so the number measures operator throughput per core
on local[32].

Usage: python tools/bench_stream.py [--seconds 25] [--rate 2000000]

Keep --seconds moderate (default 25): the dedup pipelines run the
all-unique-id WORST case, so their state grows ~rate x seconds before
the watermark can evict anything — on a single local JVM a much longer
window (e.g. 40s at 2M/s ~ 80M heap-resident state rows plus store
maintenance copies) kills the SparkContext mid-run. On a cluster the
same state spreads across executor heaps / RocksDB instances; locally
the bound is the one JVM.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agentic_workflow_for_data_transformation_spark.session import get_spark


def rate_events(spark: SparkSession, rows_per_sec: int) -> DataFrame:
    """Rate source shaped like the events table: the same columns the
    batch/streaming operators expect, derived as pure JVM expressions."""
    et = F.array(*[F.lit(e) for e in ["view", "click", "signup", "purchase", "error"]])
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.abs(F.xxhash64("value", F.lit("u"))) % 15_000).alias("user_id"),
            F.element_at(et, (F.abs(F.xxhash64("value", F.lit("t"))) % 5 + 1).cast("int")).alias(
                "event_type"
            ),
            ((F.abs(F.xxhash64("value", F.lit("v"))) % 1_000_000) / 2000.0).alias("value"),
        )
    )


WARMUP_BATCHES = 2


def measure(name: str, out: DataFrame, mode: str, seconds: float,
            foreach=None, warmup: int = WARMUP_BATCHES) -> dict:
    """Sustained rate = total numInputRows / total triggerExecution
    time over post-warmup batches — a row-weighted aggregate, so
    short/small batches can't skew the mean the way averaging
    per-batch processedRowsPerSecond does. Warmup is dropped by
    batchId (each run starts from a fresh checkpoint, so ids count
    from 0), not by position in recentProgress — that rolling window
    caps at ~100 entries, and positional [2:] on a long run discards
    two steady-state batches instead of the actual warmup ones."""
    w = out.writeStream
    # foreachBatch rungs (the ANN server) measure their batch function;
    # everything else measures the plan itself through the noop sink
    w = w.foreachBatch(foreach) if foreach else w.outputMode(mode).format("noop")
    q = (
        w.option("checkpointLocation", f"/tmp/bench_stream_ckpt/{name}_{time.time_ns()}")
        .start()
    )
    time.sleep(seconds)
    progs = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    steady = [
        p
        for p in progs
        if p.get("numInputRows", 0) > 0 and p["batchId"] >= warmup
    ]
    rows = sum(p["numInputRows"] for p in steady)
    exec_ms = sum(p["durationMs"]["triggerExecution"] for p in steady)
    state_rows = max(
        (op.get("numRowsTotal", 0) for p in progs for op in p.get("stateOperators", [])),
        default=0,
    )
    return {
        "pipeline": name,
        "mean_rows_per_sec": round(rows / (exec_ms / 1000.0), 0) if exec_ms else None,
        "batches": len(steady),
        "mean_batch_ms": round(exec_ms / len(steady), 0) if steady else None,
        "max_state_rows": state_rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=25.0)
    ap.add_argument("--rate", type=int, default=2_000_000)
    args = ap.parse_args()

    from agentic_workflow_for_data_transformation_spark.streaming.events import (
        stream_static_enrich,
        streaming_dedup,
        windowed_event_aggregate,
    )

    spark = get_spark(app_name="bench_stream")
    ev = rate_events(spark, args.rate)

    dim = spark.createDataFrame(
        [(e, i) for i, e in enumerate(["view", "click", "signup", "purchase", "error"])],
        "event_type string, type_code int",
    )

    # count-min sketch over a synthesized token stream (8 md5-derived
    # pseudo-words per doc): the bounded-state heavy-hitter path —
    # state is exactly 4x256 cells however long the stream runs, so
    # the measured ceiling is pure explode+hash+aggregate throughput,
    # not state growth. Measured FIRST: after the 2M/s dedup rungs the
    # session carries enough state/GC debris that the first CMS
    # batches stall past the window and the row reads n/a. Offered at
    # rate/10 in DOCUMENT rows: each doc fans out 8 tokens x 4 sketch
    # rows with an md5+pmod each (32 hash ops/row).
    from agentic_workflow_for_data_transformation_spark.streaming.ingest import (
        streaming_count_min,
    )

    docs = rate_events(spark, args.rate // 10).select(
        F.concat_ws(
            " ",
            *[
                F.substring(F.md5(F.concat(F.col("event_id").cast("string"),
                                           F.lit(str(i)))), 1, 4)
                for i in range(8)
            ],
        ).alias("text")
    )
    cms_row = measure(
        "streaming_count_min (8-token docs at rate/10; bounded 4x256-cell state)",
        streaming_count_min(docs),
        "update",
        args.seconds,
    )


    # ANN serve rung (round-8): queries/s against the PERSISTED IVFADC
    # index (trained codebook, codes partitioned by cell) through the
    # same foreachBatch server production runs (streaming/serve.py).
    # Per query the work is 4 probed cells x (m x k) LUT rows plus the
    # pruned code scan — offered in QUERIES/s, far below event rates
    # by design (each query is a full ANN lookup, not a row append).
    import os

    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        load_ivfpq_index,
        topk_ivfpq_from_index,
        write_ivfpq_index,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idx_dir = f"/tmp/bench_stream_ivfpq_{time.time_ns()}"
    write_ivfpq_index(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), idx_dir,
        sample_n=500,
    )
    ivfpq_index = load_ivfpq_index(spark, idx_dir)

    def _serve(batch: DataFrame, batch_id: int) -> None:
        topk_ivfpq_from_index(
            batch, idx_dir, k=10, n_probe=4, m=32, dim=64,
            index=ivfpq_index,
        ).write.format("noop").mode("overwrite").save()

    qstream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .select(
            F.col("value").alias("query_id"),
            F.array(
                *[
                    ((F.abs(F.xxhash64("value", F.lit(f"d{i}"))) % 2001)
                     - 1000) / 1000.0
                    for i in range(64)
                ]
            ).alias("qv"),
        )
    )
    # its batches run seconds each (every row is a full ANN lookup),
    # so this rung gets a longer fixed window and a 1-batch warmup;
    # offered above capacity = backlog mode, so the sustained column
    # reads as this node's serve ceiling (like the dedup knee)
    ann_row = measure(
        "ann_serve (IVFADC top-10 vs persisted index, offered 100 q/s = backlog mode; sustained = per-node ceiling)",
        qstream,
        "append",
        max(args.seconds, 90.0),
        foreach=_serve,
        warmup=1,
    )

    # DSIR stream-scoring rung (round-8 fourth session): document
    # micro-batches scored against the PERSISTED 16-row log-ratio
    # table through the same foreachBatch server production runs
    # (streaming/serve.score_dsir_stream's batch function). Offered in
    # DOCUMENT rows at rate/10 (each doc fans out 8 tokens through the
    # hash + broadcast join + per-doc aggregate).
    from agentic_workflow_for_data_transformation_spark.operators.corpus import (
        dsir_ratio_table,
        dsir_score_against_ratios,
    )

    ref = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3 == 0).alias("is_t"),
        F.concat_ws(
            " ",
            *[
                F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                           F.lit(f"r{i}"))), 1, 4)
                for i in range(8)
            ],
        ).alias("text"),
    )
    dsir_ratios = dsir_ratio_table(ref, F.col("is_t")).persist()
    dsir_ratios.count()
    dsir_docs = rate_events(spark, args.rate // 10).select(
        F.col("event_id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(F.md5(F.concat(F.col("event_id").cast("string"),
                                           F.lit(str(i)))), 1, 4)
                for i in range(8)
            ],
        ).alias("text"),
    )

    def _dsir_score(batch: DataFrame, batch_id: int) -> None:
        dsir_score_against_ratios(batch, dsir_ratios) \
            .write.format("noop").mode("overwrite").save()

    dsir_row = measure(
        "dsir_score (8-token docs at rate/10 vs persisted ratio table; stateless)",
        dsir_docs,
        "append",
        args.seconds,
        foreach=_dsir_score,
    )

    # nearest-centroid classify rung (round-8 fifth session): vector
    # micro-batches assigned against the PERSISTED labels x dim
    # centroid model through the same foreachBatch server production
    # runs (streaming/serve.classify_stream's batch function —
    # similarity.assign_nearest_centroid). Offered in VECTOR rows at
    # rate/10 (each row fans out 64 dims x 10 labels through the
    # broadcast model join + per-row DECIMAL aggregate + argmin).
    from agentic_workflow_for_data_transformation_spark.operators.similarity import (
        assign_nearest_centroid,
        fit_centroid_model,
    )

    nc_ref = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10).cast("int").alias("label"),
        F.array(
            *[
                (F.sin(F.col("id") * (i + 1) * 0.37)
                 + (F.col("id") % 10 == i % 10).cast("double")).alias(f"d{i}")
                for i in range(64)
            ]
        ).alias("embedding"),
    )
    nc_model = fit_centroid_model(nc_ref).persist()
    nc_model.count()
    nc_vecs = rate_events(spark, args.rate // 100).select(
        F.col("event_id").alias("vec_id"),
        F.array(
            *[
                F.sin(F.col("event_id") * (i + 1) * 0.41).alias(f"d{i}")
                for i in range(64)
            ]
        ).alias("embedding"),
    )

    def _nc_assign(batch: DataFrame, batch_id: int) -> None:
        assign_nearest_centroid(batch, nc_model) \
            .write.format("noop").mode("overwrite").save()

    # each vector fans out 64 dims x 10 labels through the model join,
    # so a second of offered rate/10 data is ~128M joined rows — batches
    # outlive a 25 s window (measured 0 completed batches). Offer
    # rate/100 and use the ann-style longer window + 1-batch warmup so
    # the sustained column reads as the per-node classify ceiling.
    nc_row = measure(
        "nc_classify (64-dim vectors at rate/100 vs persisted centroid model; stateless)",
        nc_vecs,
        "append",
        max(args.seconds, 90.0),
        foreach=_nc_assign,
        warmup=1,
    )

    # logistic-scorer rung (round-8 sixth session): document
    # micro-batches scored against trained hashed-BoW weights through
    # the same per-batch plan streaming/serve.score_logreg_stream
    # runs. Offered in DOCUMENT rows at rate/10 (each doc fans out 8
    # tokens through the md5 bucket hash + per-doc pivot aggregate,
    # then the d+1-literal sigmoid projection).
    from agentic_workflow_for_data_transformation_spark.operators.stats import (
        score_logreg_hashed_bow,
        train_logreg_hashed_bow,
    )

    lr_ref = ref.withColumn(
        "lang", F.when(F.col("is_t"), "en").otherwise("de")
    )
    lr_weights = {
        r["term"]: float(r["value"])
        for r in train_logreg_hashed_bow(lr_ref, n_iter=2).collect()
        if r["term"] != "train_acc"
    }

    def _lr_score(batch: DataFrame, batch_id: int) -> None:
        score_logreg_hashed_bow(batch, lr_weights) \
            .write.format("noop").mode("overwrite").save()

    lr_row = measure(
        "logreg_score (8-token docs at rate/10 vs trained hashed-BoW weights; stateless)",
        dsir_docs,
        "append",
        args.seconds,
        foreach=_lr_score,
    )

    # conformal quality-gate rung (round-8 seventh session): document
    # micro-batches scored with the deterministic quality heuristics
    # and filtered by the threshold CALIBRATED on the reference corpus
    # — the same per-batch plan streaming/serve.quality_gate_stream
    # runs. Offered in DOCUMENT rows at rate/10 (the word-array
    # scan + stopword filter + translate residue dominate per-doc).
    from agentic_workflow_for_data_transformation_spark.operators.quality import (
        conformal_quality_thresholds,
    )
    from agentic_workflow_for_data_transformation_spark.operators.text import (
        with_quality_score,
    )

    (gate_t,) = [
        float(r["threshold"])
        for r in conformal_quality_thresholds(
            ref.select("doc_id", "text")
        ).collect()
        if abs(r["coverage"] - 0.9) < 1e-9
    ]

    def _gate(batch: DataFrame, batch_id: int) -> None:
        with_quality_score(batch).filter(
            F.col("quality_score") >= gate_t
        ).write.format("noop").mode("overwrite").save()

    gate_row = measure(
        "quality_gate (8-token docs at rate/10 vs calibrated conformal threshold; stateless)",
        dsir_docs,
        "append",
        args.seconds,
        foreach=_gate,
    )

    # stateful anomaly-monitor rung (round-8 seventh session): per-key
    # rolling z-score flags through applyInPandasWithState — state is
    # a bounded n-double ring per key (15k keys here), so the measured
    # ceiling is the python state-function throughput, not state
    # growth. Offered at rate/20: per row the work is a python
    # decimal-exact 20-value fold inside the grouped state function —
    # the honest price of the exactness contract; the batch twin runs
    # the same math as JVM decimal windows.
    from agentic_workflow_for_data_transformation_spark.streaming.events import (
        stateful_anomaly_monitor,
    )

    anom_row = measure(
        "anomaly_monitor (rolling z per 15k keys via applyInPandasWithState; n=20 ring state)",
        stateful_anomaly_monitor(rate_events(spark, args.rate // 20), n=20),
        "append",
        args.seconds,
    )

    results = [
        cms_row,
        dsir_row,
        nc_row,
        lr_row,
        gate_row,
        anom_row,
        ann_row,
        measure("source_to_sink (projection only)", ev, "append", args.seconds),
        measure(
            "windowed_aggregate (1 min tumbling, 2 min watermark)",
            windowed_event_aggregate(ev, window="1 minute", watermark="2 minutes"),
            "update",
            args.seconds,
        ),
        measure(
            "stream_static_enrich (broadcast dim join)",
            stream_static_enrich(ev, dim),
            "append",
            args.seconds,
        ),
        measure(
            "streaming_dedup (watermarked dropDuplicates on event_id)",
            streaming_dedup(ev, watermark="2 minutes"),
            "append",
            args.seconds,
        ),
    ]

    # dedup under RocksDB: the default HashMap provider keeps all state
    # on the JVM heap — at all-unique-id load its insert path is the
    # ceiling (r4: 1.04M/s vs 2M offered, 22M state rows). RocksDB
    # moves state off-heap with LSM writes, the production choice for
    # large-horizon dedup; measured here side by side, same load.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # changelog checkpointing ships per-batch deltas instead of full
    # SST snapshots — the supported way to keep RocksDB commit time
    # flat as state grows
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    results.append(
        measure(
            "streaming_dedup (same, RocksDB state store)",
            streaming_dedup(ev, watermark="2 minutes"),
            "append",
            args.seconds,
        )
    )
    # realistic-horizon configuration: a 15s redelivery window bounds
    # state to ~rate x 15s instead of growing for the whole run —
    # the knee between state size and sustained rate.
    results.append(
        measure(
            "streaming_dedup (RocksDB, 15s watermark horizon)",
            streaming_dedup(ev, watermark="15 seconds"),
            "append",
            args.seconds,
        )
    )
    # knee sweep: offered-rate ladder for the dedup pipeline at its
    # best local config (RocksDB + changelog checkpointing; 15s
    # horizon). 'keeps up' means sustained >= 95% of offered — the
    # last rung that keeps up is the per-32-core capacity; a cluster
    # scales it linearly with state-store partitions spread over
    # executors (state inserts are per-partition single-threaded).
    # 64 state partitions on 32 threads measured ~15% better than 32
    # (smaller per-store batches, two waves hide commit latency)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    knee_rows = []
    for offered in (500_000, 1_000_000, 1_500_000, 2_000_000, 3_000_000):
        r = measure(
            f"dedup knee @ {offered:,}/s",
            streaming_dedup(rate_events(spark, offered), watermark="15 seconds"),
            "append",
            args.seconds,
        )
        r["offered"] = offered
        knee_rows.append(r)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.stop()

    lines = [
        "# BENCH_STREAM — streaming operator throughput (rate source, local[32])",
        "",
        f"Offered load {args.rate:,} rows/s per pipeline, {args.seconds:.0f}s each;",
        "sustained processedRowsPerSecond averaged over non-warmup micro-batches.",
        "Monotonic rate-source timestamps keep the watermark advancing;",
        "max_state_rows is the observed state footprint: ~one row per open",
        "window for the aggregate, ~one row per distinct key inside the",
        "watermark horizon for dedup (every rate-source id is unique, so its",
        "state grows until the horizon ages keys out — size the horizon to",
        "the real redelivery window in production).",
        "",
        "| pipeline | sustained rows/s | batches | mean batch ms | max state rows |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        rate = f"{int(r['mean_rows_per_sec']):,}" if r["mean_rows_per_sec"] else "n/a"
        lines.append(
            f"| {r['pipeline']} | {rate} | {r['batches']} | "
            f"{r['mean_batch_ms']} | {r['max_state_rows']:,} |"
        )
    lines += [
        "",
        "## Dedup capacity knee (RocksDB + changelog checkpointing, 15s horizon)",
        "",
        "Sustained vs offered for the stateful dedup; the last rung that",
        "keeps up (sustained >= 95% of offered) is this 32-thread node's",
        "dedup capacity. State inserts are per-partition single-threaded,",
        "so a real cluster scales the ceiling linearly by spreading the",
        "state-store partitions across executors. Run-to-run variance on",
        "a shared box is ~20-30% around the knee (r5-r7 runs measured the",
        "1.5M rung both keeping up and not) — read the ceiling as the",
        "sustained column's plateau, not the exact keeps-up boundary.",
        "",
        "| offered rows/s | sustained rows/s | keeps up | max state rows |",
        "|---|---|---|---|",
    ]
    for r in knee_rows:
        sust = r["mean_rows_per_sec"] or 0
        lines.append(
            f"| {r['offered']:,} | {int(sust):,} | "
            f"{'yes' if sust >= 0.95 * r['offered'] else 'NO'} | "
            f"{r['max_state_rows']:,} |"
        )
    (ROOT / "BENCH_STREAM.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
