"""Distributed linear algebra over embedding columns: the one-pass
sufficient-statistics pattern (Gram matrix / per-dimension sums via a
single aggregation) with the tiny d x d solve done driver-side.

This is THE scalable shape for PCA/whitening/covariance at 100 TB: the
cluster never materializes anything bigger than d(d+1)/2 running sums
per task (partial aggregation collapses the exploded products before
the exchange), and the eigendecomposition happens on a d x d matrix on
the driver — never on the data. Compare Spark MLlib's
RowMatrix.computeGramianMatrix, which does the same reduction RDD-side.

Cross-engine exactness: components are quantized to scaled BIGINTs
(round(x * 10^6)) BEFORE any arithmetic, so sums are integer-exact and
independent of partition order — the same discipline as the decimal
money sums and the integer PageRank (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6


def quantized(vec_col: str, scale: int = SCALE) -> F.Column:
    """array<long> of round(x * scale) — the exact integer domain all
    downstream sums run in. At scale=10^6 with unit-norm-ish inputs,
    a pairwise product is <= 10^12, so ~9 million rows per (i, j) cell
    fit in a BIGINT partial sum per task before any precision concern;
    the merged total tolerates ~9e6 * #tasks rows."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long"),
    )


def gram_upper(df: DataFrame, vec_col: str = "embedding",
               scale: int = SCALE) -> DataFrame:
    """Upper-triangle Gram matrix sum_rows(q_i * q_j), i <= j, over the
    quantized components, plus the row count and per-dimension sums
    needed to turn it into a covariance matrix driver-side
    (cov_ij = (G_ij - s_i*s_j/n) / n in the scaled domain).

    Plan: posexplode the vector once (x d rows), slice the tail from
    each position and posexplode again (x (d-i) rows) — exactly the
    upper triangle, no self-join, no d^2 blowup below i <= j. The
    groupBy(i, j) has d(d+1)/2 groups, so map-side partial aggregation
    collapses each task's explosion to <= d(d+1)/2 partial sums before
    the exchange: shuffle volume is O(tasks * d^2), independent of row
    count.

    Output: (i, j, dot, n, si, sj) with 0-based dimension indices —
    dot/si/sj in the scaled-integer domain.
    """
    q = df.select(quantized(vec_col, scale).alias("q"))
    # per-dimension sums + count, one tiny aggregate pass
    sums = (
        q.select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.sum("qi").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    e = q.select(F.posexplode("q").alias("i", "qi"), F.col("q"))
    tri = e.select(
        "i",
        "qi",
        F.posexplode(
            F.slice(F.col("q"), F.col("i") + 1, F.size("q") - F.col("i"))
        ).alias("dj", "qj"),
    ).select(
        "i",
        (F.col("i") + F.col("dj")).alias("j"),
        (F.col("qi") * F.col("qj")).alias("p"),
    )
    g = tri.groupBy("i", "j").agg(F.sum("p").alias("dot"))
    si = sums.select(F.col("i"), F.col("s").alias("si"), "n")
    sj = sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    return (
        g.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select("i", "j", "dot", "n", "si", "sj")
    )


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 2,
                   scale: int = SCALE):
    """Top-k principal components from the distributed sufficient
    statistics (gram_upper — the only thing ever collected is
    d(d+1)/2 sums), then a d x d eigendecomposition on the driver. Returns (components, variances)
    as numpy arrays — components rows are unit eigenvectors sorted by
    descending eigenvalue, sign-fixed so each row's
    largest-magnitude entry is positive (eigenvectors are only defined
    up to sign; fixing it makes results comparable across runs).
    """
    import numpy as np

    rows = gram_upper(df, vec_col, scale).collect()
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    g = np.zeros((d, d), dtype=np.float64)
    s = np.zeros(d, dtype=np.float64)
    for r in rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = float(r["dot"])
        s[r["i"]] = float(r["si"])
    cov = (g - np.outer(s, s) / n) / n / (scale * scale)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    flips = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    return comps * flips[:, None], vals[order]
