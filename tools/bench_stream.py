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


def measure(name: str, out: DataFrame, mode: str, seconds: float) -> dict:
    q = (
        out.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", f"/tmp/bench_stream_ckpt/{name}_{time.time_ns()}")
        .start()
    )
    time.sleep(seconds)
    progs = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    rates = [
        p["processedRowsPerSecond"]
        for p in progs
        if p.get("numInputRows", 0) > 0 and p.get("processedRowsPerSecond")
    ][2:]  # drop warmup batches
    batch_ms = [
        p["durationMs"]["triggerExecution"]
        for p in progs
        if p.get("numInputRows", 0) > 0
    ][2:]
    state_rows = max(
        (op.get("numRowsTotal", 0) for p in progs for op in p.get("stateOperators", [])),
        default=0,
    )
    return {
        "pipeline": name,
        "mean_rows_per_sec": round(sum(rates) / len(rates), 0) if rates else None,
        "batches": len(rates),
        "mean_batch_ms": round(sum(batch_ms) / len(batch_ms), 0) if batch_ms else None,
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

    results = [
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
    (ROOT / "BENCH_STREAM.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
