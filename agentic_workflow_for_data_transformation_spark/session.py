"""SparkSession factory tuned for the engine.

Local mode for tests/bench; the same config block is what we would ship
to a multi-executor cluster (AQE, skew-join handling, UTC timezone so
results compare bit-for-bit against external oracles).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "agentic_workflow_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
      which is what keeps the same plan viable from sf0.001 to 100 TB.
    - UTC session timezone: deterministic timestamp semantics vs oracles.
    - Arrow on: fast pandas interchange for the sample-handoff path and
      for pandas UDFs used by the multimodal/similarity operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        # long benchmark/registry sessions accumulate checkpoint and
        # shuffle blocks that only free on driver GC; with a large heap
        # GC is rare, so ask the ContextCleaner to force one periodically
        .config("spark.cleaner.periodicGC.interval", "90s")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # a long-lived engine compiles hundreds of codegen'd stages; the
        # JVM default 240m code cache fills up and the JIT silently stops
        # compiling, slowing later queries 5-10x. 512m still saturated at
        # ~200 plan executions (the 98-query bench runs each query twice),
        # re-introducing a late-session cliff — 1g holds the full corpus.
        # -Xss32m: Catalyst analysis recurses deeply on wide nested
        # expression trees (the m=32 PQ slice/fold plans); Structured
        # Streaming runs foreachBatch planning on its own execution
        # thread, which overflows the JVM default 1m stack on those
        # plans (round-8 ANN-serve rung). 32m is virtual reservation,
        # not resident memory.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing -Xss32m",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
