"""Registry-wide unpartitioned-window sweep.

Walks the OPTIMIZED logical plan of every registered query and reports
any Window node whose partitionSpec is empty — the plan-level source of
Spark's "No Partition Defined for Window operation" warning and of the
Exchange SinglePartition it implies. Checking the optimized plan (not
source) matters: Catalyst constant-folds `lit(1)` partition keys (and
`col * 0` over non-nullable columns), so source-level "silencing" can
be undone by the optimizer — round 6 proved it was, in every case.

Usage: python tools/sweep_windows.py [sf_dir]
Exit 0 iff no unpartitioned Window node exists anywhere in the registry.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def walk(node):
    yield node
    cs = node.children()
    for i in range(cs.size()):
        yield from walk(cs.apply(i))


def unpartitioned_windows(df) -> list[str]:
    """Names of Window nodes with an empty partitionSpec in df's
    optimized logical plan (pre-AQE, post-constant-folding)."""
    bad = []
    plan = df._jdf.queryExecution().optimizedPlan()
    for node in walk(plan):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            bad.append(node.simpleString(120))
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as em
    from agentic_workflow_for_data_transformation_spark.session import get_spark

    spark = get_spark(app_name="sweep_windows")
    spark.sparkContext.setLogLevel("ERROR")
    failures = {}
    for name, fn in em.queries().items():
        try:
            bad = unpartitioned_windows(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"ERROR {type(e).__name__}: {e}"]
            continue
        if bad:
            failures[name] = bad
    for name, bad in failures.items():
        print(f"UNPARTITIONED  {name}")
        for b in bad:
            print(f"    {b}")
    print(f"\n{len(failures)} of {len(em.queries())} queries have "
          "unpartitioned Window nodes")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
