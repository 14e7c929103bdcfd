"""Deduplication operators for LLM-scale corpora (SURVEY.md section 2.9).

The reference has no dedup at all (its whole corpus is 10 rows); these
are the operators a 100 TB training-data pipeline needs, each built
from shuffle-aware DataFrame primitives:

- exact dedup: one hash-aggregate on the dedup key (map-side partial
  aggregation, single shuffle);
- MinHash + LSH banding: signature = k independent min-hashes over word
  shingles; docs sharing any band bucket become candidate pairs. The
  only join is on band keys, so cost is O(candidates), never O(n^2) —
  this is the scale path;
- n-gram Jaccard: exact pairwise similarity via an inverted index on
  shingles (equi-join on shingle), used to verify/threshold MinHash
  candidates. At 100 TB run it only on LSH candidates;
- SimHash: per-doc 16-bit sign fingerprint of hashed words; near-dups
  collide in the same bucket — one aggregation, no join at all.

Every hash is md5 (identical across engines), so each operator has an
exact ANSI-SQL oracle; no engine-private hash functions leak into
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")  # top bit of a hex digit


def with_word_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                       out: str = "shingles") -> DataFrame:
    """Distinct word n-grams per document, computed with JVM array
    functions (no Python in the loop). Documents shorter than n words
    get an empty shingle set."""
    ws = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
    )
    shingles = F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    return df.withColumn(out, shingles)


def exact_dedup_groups(df: DataFrame, key_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct key with the minimum id as the
    canonical representative and the duplicate count. Single
    hash-aggregate; partial aggregation makes the shuffle carry only
    distinct keys per partition."""
    return df.groupBy(key_col).agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        threshold: float = 0.2, n: int = 3) -> DataFrame:
    """Exact Jaccard similarity over word n-gram shingle sets for every
    document pair sharing at least one shingle (inverted-index
    equi-join). Emits (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Scale note: the join key is the shingle, so hot shingles fan out;
    at 100 TB this runs AFTER minhash_lsh_candidates has pruned the
    pair space, not on the full corpus (see lsh_verified_pairs)."""
    sh = with_word_shingles(df, n=n).select(id_col, "shingles")
    sizes = sh.select(F.col(id_col).alias("d"), F.size("shingles").alias("sz"))
    e = sh.select(F.col(id_col).alias("d"), F.explode("shingles").alias("s"))
    a, b = e.alias("a"), e.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.d") < F.col("b.d")))
        .groupBy(F.col("a.d").alias("doc_a"), F.col("b.d").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.d"))
        .join(sb, F.col("doc_b") == F.col("sb.d"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return jac


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 16, n: int = 3) -> DataFrame:
    """MinHash signature: h_i(doc) = min over shingles of
    md5(i || '|' || shingle). One explode + one grouped aggregate with
    num_hashes min() columns — a single shuffle regardless of k."""
    sh = with_word_shingles(df, n=n).select(id_col, "shingles")
    e = sh.select(id_col, F.explode("shingles").alias("s"))
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return e.groupBy(id_col).agg(*mins)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           num_hashes: int = 16, bands: int = 4,
                           n: int = 3) -> DataFrame:
    """LSH banding over MinHash signatures: split the k-hash signature
    into `bands` bands, hash each band, and emit every distinct pair of
    documents sharing a band bucket as (doc_a, doc_b), doc_a < doc_b.

    With k=16, b=4 (r=4 rows/band) the match probability is
    1-(1-j^4)^4 — ~0.97 for jaccard 0.8, ~0.02 for jaccard 0.2 — the
    classic near-dup filter curve. Cost is one self-join on band keys:
    candidates only, never the full cross product."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col=id_col, num_hashes=num_hashes, n=n)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b*rows + r}") for r in range(rows)])).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    stack_expr = ", ".join(f"'{b}', band{b}" for b in range(bands))
    buckets = banded.selectExpr(
        id_col, f"stack({bands}, {stack_expr}) AS (band_idx, band_key)"
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def lsh_verified_pairs(df: DataFrame, id_col: str = "doc_id",
                       threshold: float = 0.5, num_hashes: int = 16,
                       bands: int = 4, n: int = 3) -> DataFrame:
    """The full scale-path pipeline: LSH candidates -> exact Jaccard on
    candidates only -> threshold. This is how fuzzy dedup runs at
    100 TB: the exact O(pairs) step touches only LSH survivors."""
    cand = minhash_lsh_candidates(df, id_col=id_col, num_hashes=num_hashes,
                                  bands=bands, n=n)
    jac = ngram_jaccard_pairs(df, id_col=id_col, threshold=0.0, n=n)
    return (
        cand.join(jac, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash: for bit j, sum +-1 over the document's distinct words
    according to bit j of md5(word); the sign vector is the
    fingerprint (emitted as a bit-string column ``simhash``).
    Near-duplicates share fingerprints -> dedup is a groupBy on the
    fingerprint, no pairwise work at all."""
    words = F.array_distinct(F.split(F.col(text_col), " "))
    e = df.select(id_col, F.explode(words).alias("w")).withColumn("h", F.md5("w"))
    sums = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin(*HEX_HIGH), 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = e.groupBy(id_col).agg(*sums)
    fingerprint = F.concat(
        *[F.when(F.col(f"b{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)]
    )
    return agg.select(id_col, fingerprint.alias("simhash"))
