"""Deterministic sampling for training-data pipelines (SURVEY.md
section 2.9 scope; the reference has no sampling at all).

Everything here is HASH-based, never RNG-based: `df.sample()` draws
from an engine-private RNG, so two runs (or two engines) disagree —
useless for reproducible corpus construction and impossible to
oracle-check. Hashing a stable key instead gives:

- the same sample on every run, engine, partitioning, and cluster size;
- sampling as a pure filter: fully pushed into the scan stage, no
  shuffle, no state — at 100 TB a 1% sample costs one codegen'd
  predicate per row;
- consistent train/test splits that survive re-partitioning and
  incremental appends (a doc's split never changes when other docs
  arrive).

The hash is the same portable 60-bit md5 prefix used by dedup
(operators/dedup.py), reduced mod 1e6 to a per-row draw in [0, 1e6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _hash60

DRAW_BUCKETS = 1_000_000


def hash_draw(key: F.Column, salt: str) -> F.Column:
    """Deterministic per-row draw in [0, 1e6): hash of salt|key. The
    salt decorrelates independent sampling decisions on the same key."""
    return _hash60(F.concat(F.lit(f"{salt}|"), key.cast("string"))) % DRAW_BUCKETS


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — a pure filter,
    reproducible anywhere."""
    return df.filter(hash_draw(F.col(key_col), salt) < int(fraction * DRAW_BUCKETS))


def with_train_test_split(df: DataFrame, key_col: str, test_fraction: float = 0.2,
                          salt: str = "split", out: str = "split") -> DataFrame:
    """Tag every row 'train' or 'test' by key hash. Stable under
    appends: a row's assignment depends only on its own key."""
    is_test = hash_draw(F.col(key_col), salt) < int(test_fraction * DRAW_BUCKETS)
    return df.withColumn(out, F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def balanced_sample_per_label(df: DataFrame, label_col: str, n_per_label: int,
                              key_col: str, salt: str = "balance") -> DataFrame:
    """Class-balanced downsample: at most ``n_per_label`` rows per
    label, chosen in deterministic hash order (not head-of-partition
    order, which would bias toward file layout). One window per label
    partition — the standard shape for balancing skewed training
    corpora; heavy labels prune early via the rank filter."""
    w = Window.partitionBy(label_col).orderBy(
        hash_draw(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_label)
        .drop("_rn")
    )
