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


def covariance_full(df: DataFrame, vec_col: str = "embedding",
                    scale: int = SCALE) -> DataFrame:
    """Full (mirrored) covariance matrix as a d*d-row frame
    (i, j, c), c = (G_ij - s_i s_j / n) / n in the original units,
    rounded to 12 — derived from gram_upper's integer-exact
    sufficient statistics, so every c is partition-order-independent
    and the SQL oracle reproduces it digit for digit. d*d rows for
    d=64 is 4096 — broadcast-sized; nothing here touches the corpus
    after the one gram scan."""
    g = gram_upper(df, vec_col, scale)
    c = F.round(
        (
            F.col("dot").cast("double")
            - F.col("si").cast("double") * F.col("sj").cast("double")
            / F.col("n").cast("double")
        )
        / F.col("n").cast("double")
        / F.lit(float(scale * scale)),
        12,
    ).alias("c")
    upper = g.select("i", "j", c)
    lower = (
        g.filter(F.col("i") != F.col("j"))
        .select(F.col("j").alias("i"), F.col("i").alias("j"), c)
    )
    return upper.unionByName(lower)


def power_iteration_top_pc(df: DataFrame, vec_col: str = "embedding",
                           n_iter: int = 6, scale: int = SCALE) -> DataFrame:
    """Top principal component by FIXED-ROUND power iteration run
    entirely in the plan over the covariance frame — the eigh-free
    path with an exact SQL oracle (pca_components does a driver-side
    numpy eigh; fine operationally, but numpy's LAPACK result cannot
    be hash-checked cross-engine; this can).

    Determinism engineering (the Lloyd/logreg discipline): the matvec
    w = C v sums DECIMAL products of the 12-rounded covariances and
    the 9-rounded iterate, so each round's sums are exact under any
    partition order; the normalization divides in doubles and rounds
    the next iterate to 9 BEFORE the following round; iterations are
    FIXED at n_iter (no convergence test), so the unrolled oracle is
    finite. Start vector is all-ones (its scale cancels in the first
    normalize). Sign is fixed after the last round: if the
    largest-|v_i| entry (ties to the lowest i) is negative, the whole
    vector flips — eigenvectors are defined up to sign, pinning it
    makes the result comparable across engines and runs.

    Output: (i, v) — d rows, the unit top component. Everything after
    the one gram scan is joins over a <= d*d-row frame; each round
    localCheckpoints so plan size stays constant in n_iter."""
    cov = covariance_full(df, vec_col, scale).localCheckpoint()
    return _power_rounds(cov, n_iter)


def _power_rounds(cov: DataFrame, n_iter: int) -> DataFrame:
    """Fixed-round power iteration + sign pin over an (i, j, c)
    covariance frame — the shared core of the top-component and the
    deflated second-component paths (identical expression shapes, so
    one unrolled-SQL renderer oracles both)."""
    v = cov.select("i").distinct().select(
        "i", F.lit(1.0).alias("v")
    ).localCheckpoint()
    for _ in range(n_iter):
        w = (
            cov.join(
                F.broadcast(v.select(F.col("i").alias("j"),
                                     F.col("v").alias("vj"))),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    (
                        F.col("c").cast("decimal(20,12)")
                        * F.col("vj").cast("decimal(12,9)")
                    ).cast("decimal(38,21)")
                ).cast("double").alias("w")
            )
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(
                    (
                        F.round(F.col("w"), 9).cast("decimal(18,9)")
                        * F.round(F.col("w"), 9).cast("decimal(18,9)")
                    ).cast("decimal(38,18)")
                ).cast("double")
            ).alias("nrm")
        )
        v = (
            w.crossJoin(F.broadcast(nrm))
            .select(
                "i",
                F.round(
                    F.round(F.col("w"), 9) / F.col("nrm"), 9
                ).alias("v"),
            )
            .localCheckpoint()
        )
    # sign pin: flip so the largest-|v| entry (ties -> lowest i) is > 0
    top = v.orderBy(F.abs(F.col("v")).desc(), F.col("i")).limit(1).select(
        F.when(F.col("v") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sgn")
    )
    return v.crossJoin(F.broadcast(top)).select(
        "i", F.round(F.col("v") * F.col("sgn"), 9).alias("v")
    )


def common_direction_audit(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding", n_iter: int = 6,
                           scale: int = SCALE) -> DataFrame:
    """All-but-the-top audit (Mu & Viswanath, ICLR 2018): embedding
    corpora concentrate mass in a handful of common directions (the
    anisotropy ns_embed_anisotropy measures); the standard
    post-processing subtracts the projection onto the TOP component
    of the centered corpus. This operator emits, per vector, exactly
    what that step needs to be audited and applied: the projection
    onto the corpus top component and the centered norm —
    (id, c1_proj, norm_centered, proj_ratio), proj_ratio =
    |proj| / norm (0 for zero vectors).

    Scale shape: ONE corpus scan for the Gram statistics (the power
    iteration then runs on the d*d frame), one broadcast of d
    (mean_i, v_i) rows back, and a second corpus scan computing both
    per-row sums in one posexplode aggregate keyed by id. No corpus
    self-joins, no driver state beyond the d-row component.

    Exactness: mean_i = s_i / n / scale rounded to 9; the per-row
    sums multiply 9-rounded decimals into DECIMAL(38,x) accumulators
    (exact under any fold order), and the two emitted measures round
    to 6 from one double sqrt/divide each."""
    cov_v = power_iteration_top_pc(df, vec_col, n_iter, scale)
    g = gram_upper(df, vec_col, scale)
    means = (
        g.filter(F.col("i") == F.col("j"))
        .select(
            "i",
            F.round(
                F.col("si").cast("double") / F.col("n").cast("double")
                / F.lit(float(scale)),
                9,
            ).alias("mu"),
        )
    )
    model = F.broadcast(
        cov_v.join(means, "i").select("i", "v", "mu")
    )
    cx = (
        df.select(F.col(id_col), F.posexplode(quantized(vec_col, scale))
                  .alias("i", "q"))
        .join(model, "i")
        .select(
            id_col,
            # centered component, exact in the decimal domain:
            # q/scale is exact at 6 dp, mu is 9-rounded
            (
                (F.col("q").cast("double") / F.lit(float(scale)))
                .cast("decimal(18,9)")
                - F.col("mu").cast("decimal(18,9)")
            ).alias("x"),
            F.col("v").cast("decimal(12,9)").alias("vv"),
        )
    )
    per = cx.groupBy(id_col).agg(
        F.sum((F.col("x") * F.col("vv")).cast("decimal(38,18)"))
        .cast("double").alias("_proj"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)"))
        .cast("double").alias("_ss"),
    )
    nrm = F.sqrt(F.col("_ss"))
    return per.select(
        id_col,
        F.round(F.col("_proj"), 6).alias("c1_proj"),
        F.round(nrm, 6).alias("norm_centered"),
        F.when(nrm > 0, F.round(F.abs(F.col("_proj")) / nrm, 6))
        .otherwise(F.lit(0.0)).alias("proj_ratio"),
    )


def _rayleigh(cov: DataFrame, v: DataFrame) -> DataFrame:
    """Rayleigh quotient lam = v' C v for a unit iterate, as two
    stages that reuse the matvec's exact expression shapes: w = C v
    (decimal-accumulated, 9-rounded), then lam = sum(round(w,9) * v)
    (decimal-exact), one double round to 12. Returns a 1-row (lam)
    frame."""
    w = (
        cov.join(
            F.broadcast(v.select(F.col("i").alias("j"),
                                 F.col("v").alias("vj"))),
            "j",
        )
        .groupBy("i")
        .agg(
            F.sum(
                (
                    F.col("c").cast("decimal(20,12)")
                    * F.col("vj").cast("decimal(12,9)")
                ).cast("decimal(38,21)")
            ).cast("double").alias("w")
        )
    )
    return (
        w.join(F.broadcast(v), "i")
        .agg(
            F.round(
                F.sum(
                    (
                        F.round(F.col("w"), 9).cast("decimal(18,9)")
                        * F.col("v").cast("decimal(12,9)")
                    ).cast("decimal(38,18)")
                ).cast("double"),
                12,
            ).alias("lam")
        )
    )


def power_iteration_top2(df: DataFrame, vec_col: str = "embedding",
                         n_iter: int = 6, scale: int = SCALE) -> DataFrame:
    """Top TWO principal components by power iteration with Hotelling
    deflation, run entirely in the plan — the distributed-PCA read
    beyond the single common direction (all-but-the-top removes D
    components, D=2-3 at 300d per Mu & Viswanath; this is the D=2
    rung with a hash-checkable oracle). Component 1 is the standard
    fixed-round iterate over the covariance frame; its eigenvalue is
    the Rayleigh quotient v1' C v1; the DEFLATED covariance
    C2 = round(C - lam1 * v1 v1', 12) removes the first axis, and the
    same fixed rounds over C2 yield component 2 (its Rayleigh
    quotient on C2 estimates eigenvalue 2 of C).

    Convergence caveat (inherent to FIXED rounds): power iteration
    separates components at a rate set by the spectral gap, so on a
    near-flat spectrum (the synthetic embeddings table: 0.0289 vs
    0.0269 at the top) 6 rounds return a deterministic, hash-stable
    MIXTURE of the leading directions — still the exact output of
    the specified procedure on both engines, but read it as "the
    dominant subspace", not a resolved eigenbasis. With a real gap
    (tests/test_operators.py plants var-3 and var-1.1 axes) it
    recovers both components to |cos| > 0.99.

    Exactness: both iterates and both Rayleigh stages reuse the
    matvec's decimal accumulators and 9-rounded iterates; the
    deflation runs in doubles over already-pinned inputs with ONE
    fixed expression shape (c - lam * vi * vj, left-associated) and
    re-rounds to 12 — the same pin covariance_full emits, so rounds
    over C2 are as engine-stable as over C.

    Scale shape: ONE corpus scan (the gram aggregate); every later
    stage joins d*d-row frames (4096 rows at d=64). Output:
    (component, i, v, eigval) — 2d rows."""
    cov = covariance_full(df, vec_col, scale).localCheckpoint()
    v1 = _power_rounds(cov, n_iter).localCheckpoint()
    lam1 = _rayleigh(cov, v1).localCheckpoint()
    cov2 = (
        cov.join(
            F.broadcast(v1.select(F.col("i").alias("_vi_i"),
                                  F.col("v").alias("vi"))),
            F.col("i") == F.col("_vi_i"),
        )
        .join(
            F.broadcast(v1.select(F.col("i").alias("_vj_i"),
                                  F.col("v").alias("vj"))),
            F.col("j") == F.col("_vj_i"),
        )
        .crossJoin(F.broadcast(lam1))
        .select(
            "i",
            "j",
            F.round(
                F.col("c") - F.col("lam") * F.col("vi") * F.col("vj"), 12
            ).alias("c"),
        )
        .localCheckpoint()
    )
    v2 = _power_rounds(cov2, n_iter).localCheckpoint()
    lam2 = _rayleigh(cov2, v2)
    c1 = v1.crossJoin(F.broadcast(lam1)).select(
        F.lit(1).cast("int").alias("component"),
        "i",
        "v",
        F.round(F.col("lam"), 9).alias("eigval"),
    )
    c2 = v2.crossJoin(F.broadcast(lam2)).select(
        F.lit(2).cast("int").alias("component"),
        "i",
        "v",
        F.round(F.col("lam"), 9).alias("eigval"),
    )
    return c1.unionByName(c2)
