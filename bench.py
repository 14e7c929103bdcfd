"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes fully (noop sink — JVM-side, no driver collect) so
the timing covers scan + shuffle + aggregation, not result transfer.
The cold/steady/min-of-2 measurement protocol lives in
agentic_workflow_for_data_transformation_spark/benchutil.py, shared
with tools/bench_scale.py so the two harnesses can never drift.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from agentic_workflow_for_data_transformation_spark import benchqueries
from agentic_workflow_for_data_transformation_spark.benchutil import time_query, warmup
from agentic_workflow_for_data_transformation_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = 0.0  # unconventional dir name; the read path still decides existence

    spark = get_spark(app_name="bench")
    warmup(spark)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in benchqueries.queries().items():
        c, s = time_query(spark, fn, sf_dir)
        cold[name] = round(c, 4)
        timings[name] = round(s, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "steady-state wall-clock over registered query corpus (2nd run per query; cold totals under 'cold_value')",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_value": round(sum(cold.values()), 4),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
