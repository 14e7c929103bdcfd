"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes fully (noop sink — JVM-side, no driver collect) so
the timing covers scan + shuffle + aggregation, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from agentic_workflow_for_data_transformation_spark import benchqueries
from agentic_workflow_for_data_transformation_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = 0.0  # unconventional dir name; the read path still decides existence

    spark = get_spark(app_name="bench")
    # one tiny action up front so JVM/codegen warmup isn't billed to
    # whichever query happens to run first
    spark.range(1_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in benchqueries.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total wall-clock over registered query corpus",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
