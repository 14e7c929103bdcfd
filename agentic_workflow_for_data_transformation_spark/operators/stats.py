"""Distribution statistics for pipeline monitoring (two-sample drift
tests). The reference has nothing comparable (SURVEY.md section 2.9
extension surface); at 100 TB these are the checks a training-data
pipeline runs between snapshots — "did the quality-score / length /
value distribution move?" — before a bad crawl poisons a mix.

Exactness policy: the Kolmogorov-Smirnov statistic is computed as an
INTEGER numerator max|k*m - j*n| over the pooled sample (with n, m the
side sizes), not as a float max|k/n - j/m| — integer arithmetic is
bit-identical in every engine, so the operator hash-matches a plain
SQL oracle; callers divide by n*m when they want the classical D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ks_statistic_cogrouped(left: DataFrame, right: DataFrame,
                           key_col: str = "user_id",
                           value_col: str = "value") -> DataFrame:
    """Per-key two-sample KS via ``cogroup().applyInPandas``: for each
    key, D_num = max over pooled values v of |#left<=v * m - #right<=v
    * n| with n=|left|, m=|right| for that key. Emits
    (key, ks_num, n, m) for keys present on both sides.

    This is the cogrouped-map escape hatch (two keyed inputs, one
    Arrow-batched pandas computation per key) — the API tier between
    a single-input grouped map and a full join. Each side shuffles once
    on the key; group payloads are the per-key samples, so state per
    task is one key's data, never a table. The same statistic is
    SQL-expressible (running counts over the pooled union — see the
    registered oracle), which is what keeps this exact and checkable;
    the pandas form exists to cover the cogroup surface and to scale to
    statistics SQL can't express (weighted variants, permutation
    tests)."""
    import pandas as pd  # noqa: F401  (executor-side dependency)

    def ks(lpdf, rpdf):
        import numpy as np
        import pandas as pd

        lv = np.sort(lpdf[value_col].to_numpy())
        rv = np.sort(rpdf[value_col].to_numpy())
        n, m = len(lv), len(rv)
        if n == 0 or m == 0:
            return pd.DataFrame(
                {"key": pd.Series(dtype="int64"), "ks_num": [], "n": [], "m": []}
            )
        pooled = np.unique(np.concatenate([lv, rv]))
        k = np.searchsorted(lv, pooled, side="right").astype("int64")
        j = np.searchsorted(rv, pooled, side="right").astype("int64")
        d = int(np.max(np.abs(k * m - j * n)))
        key = lpdf[key_col].iloc[0] if n else rpdf[key_col].iloc[0]
        return pd.DataFrame({"key": [key], "ks_num": [d], "n": [n], "m": [m]})

    out = (
        left.select(key_col, value_col)
        .groupBy(key_col)
        .cogroup(right.select(key_col, value_col).groupBy(key_col))
        .applyInPandas(ks, schema="key long, ks_num long, n long, m long")
    )
    return out.withColumnRenamed("key", key_col)
