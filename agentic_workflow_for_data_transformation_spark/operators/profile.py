"""Table profiling: per-column stats in ONE scan (SURVEY.md section
2.9 extension surface — the data-quality snapshot every ingest job
records before promoting a batch).

The naive profiler scans once per column; at 100 TB that's a full
table read multiplied by the column count. This one computes every
column's metrics as parallel aggregates in a single pass (map-side
combined, one shuffle of a single tiny row), then unpivots the result
driver-side — the scan count is 1 regardless of how many columns are
profiled. Min/max stringify so heterogeneous column types share one
output schema; distinct counts are exact here (count(DISTINCT) in one
aggregate) — swap approx_count_distinct per column when cardinality
itself is the scale problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Emit (column, n_rows, n_non_null, n_distinct, min_value,
    max_value) per profiled column, computed in a single aggregate and
    unpivoted with stack() — fully lazy, no driver round-trip."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_ndv_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    branches = ", ".join(
        f"'{c}', _n, _nn_{c}, _ndv_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return df.agg(*aggs).selectExpr(
        f"stack({len(cols)}, {branches}) AS "
        "(column, n_rows, n_non_null, n_distinct, min_value, max_value)"
    )
