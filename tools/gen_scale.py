"""Distributed synthetic-data generator for scale validation.

Generates the same table family as /root/testdata (TPC-H-ish star
schema + events/documents/embeddings) at an arbitrary scale factor,
entirely JVM-side: every table is `spark.range(n)` + deterministic
column expressions (xxhash64-seeded), so generation itself scales to
any SF on a cluster — no driver-side loops, no Python UDFs.

The driver's own testdata is read-only and capped at sf0.1; this tool
exists to measure how the engine's plans *scale* (sf0.1 -> sf1 -> ...)
using data with the same schema and similar distributions. Values are
NOT identical to the driver's (different PRNG) — scaling runs compare
this generator's sf0.1 against this generator's sf1, apples to apples.

Usage:
    python tools/gen_scale.py --sf 1 --out scaledata/sf1
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agentic_workflow_for_data_transformation_spark.session import get_spark

# word salad vocabulary mirroring the driver documents' register
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join shuffle plan stage task broadcast skew codegen "
    "parquet schema index bucket salt probe"
).split()

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]


def _h(*cols, salt: str = "") -> F.Column:
    """Deterministic non-negative 64-bit hash of the given columns."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def _uniform(*cols, salt: str) -> F.Column:
    """Deterministic uniform double in [0, 1)."""
    return (_h(*cols, salt=salt) % 1_000_000) / 1_000_000.0


def _rng(spark: SparkSession, n: int, parts: int) -> DataFrame:
    return spark.range(0, n, 1, parts)


def gen_region(spark: SparkSession) -> DataFrame:
    names = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "r_regionkey int, r_name string"
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    return (
        _rng(spark, 25, 1)
        .select(
            F.col("id").cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
            (F.col("id") % 5).cast("int").alias("n_regionkey"),
        )
    )


def gen_supplier(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    n = max(1, int(10_000 * sf))
    return _rng(spark, n, parts).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        (_h(F.col("id"), salt="snat") % 25).cast("int").alias("s_nationkey"),
        F.round(_uniform(F.col("id"), salt="sbal") * 11_000 - 1_000, 2).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    n = max(1, int(200_000 * sf))
    w = F.array(*[F.lit(x) for x in VOCAB])
    word = lambda s: F.element_at(w, (_h(F.col("id"), salt=s) % len(VOCAB) + 1).cast("int"))
    return _rng(spark, n, parts).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", word("pn1"), word("pn2"), word("pn3")).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h(F.col("id"), salt="pb") % 50)).alias("p_brand"),
        F.concat_ws(
            " ", word("pt1"), word("pt2"),
            F.element_at(
                F.array(F.lit("STEEL"), F.lit("BRASS"), F.lit("TIN"), F.lit("NICKEL"), F.lit("COPPER")),
                (_h(F.col("id"), salt="ptm") % 5 + 1).cast("int"),
            ),
        ).alias("p_type"),
        (_h(F.col("id"), salt="psz") % 50 + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + (F.col("id") % 1000) + _uniform(F.col("id"), salt="pp") * 100, 2).alias("p_retailprice"),
    )


def gen_customer(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    n = max(1, int(150_000 * sf))
    seg = F.array(*[F.lit(s) for s in SEGMENTS])
    return _rng(spark, n, parts).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        (_h(F.col("id"), salt="cnat") % 25).cast("int").alias("c_nationkey"),
        F.round(_uniform(F.col("id"), salt="cbal") * 11_000 - 1_000, 2).alias("c_acctbal"),
        F.element_at(seg, (_h(F.col("id"), salt="cseg") % 5 + 1).cast("int")).alias("c_mktsegment"),
    )


def gen_orders(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    n = max(1, int(1_500_000 * sf))
    ncust = max(1, int(150_000 * sf))
    pri = F.array(*[F.lit(p) for p in PRIORITIES])
    base = F.to_timestamp(F.lit("1995-01-01"))
    return _rng(spark, n, parts).select(
        F.col("id").alias("o_orderkey"),
        (_h(F.col("id"), salt="ocust") % ncust).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")),
            (_h(F.col("id"), salt="ost") % 3 + 1).cast("int"),
        ).alias("o_orderstatus"),
        F.round(_uniform(F.col("id"), salt="otp") * 400_000 + 1_000, 2).alias("o_totalprice"),
        F.timestamp_add("DAY", (_h(F.col("id"), salt="odt") % 2405).cast("int"), base).alias("o_orderdate"),
        F.element_at(pri, (_h(F.col("id"), salt="opr") % 5 + 1).cast("int")).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    n = max(1, int(6_000_000 * sf))
    npart = max(1, int(200_000 * sf))
    nsupp = max(1, int(10_000 * sf))
    norders = max(1, int(1_500_000 * sf))
    base = F.to_timestamp(F.lit("1995-01-01"))
    okey = (F.col("id") % norders).alias("l_orderkey")
    qty = (_h(F.col("id"), salt="lq") % 50 + 1).cast("double")
    price = F.round(qty * (F.lit(900.0) + _h(F.col("id"), salt="lep") % 1100), 2)
    return _rng(spark, n, parts).select(
        okey,
        (_h(F.col("id"), salt="lpk") % npart).alias("l_partkey"),
        (_h(F.col("id"), salt="lsk") % nsupp).alias("l_suppkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        price.alias("l_extendedprice"),
        (F.round((_h(F.col("id"), salt="ld") % 11) * 0.01, 2)).alias("l_discount"),
        (F.round((_h(F.col("id"), salt="lt") % 9) * 0.01, 2)).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (_h(F.col("id"), salt="lrf") % 3 + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            (_h(F.col("id"), salt="lls") % 2 + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_add("DAY", (_h(F.col("id"), salt="lsd") % 2500).cast("int"), base).alias("l_shipdate"),
    )


def gen_events(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    n = max(1, int(1_000_000 * sf))
    nusers = max(1, int(15_000 * sf))
    et = F.array(*[F.lit(e) for e in EVENT_TYPES])
    base = F.to_timestamp(F.lit("2024-01-01"))
    secs = (_h(F.col("id"), salt="ets") % (30 * 86_400)).cast("int")
    return _rng(spark, n, parts).select(
        F.col("id").alias("event_id"),
        F.timestamp_add("SECOND", secs, base).alias("ts"),
        (_h(F.col("id"), salt="eu") % nusers).alias("user_id"),
        F.element_at(et, (_h(F.col("id"), salt="eet") % 5 + 1).cast("int")).alias("event_type"),
        F.round(_uniform(F.col("id"), salt="ev") * 500, 3).alias("value"),
        F.concat(F.lit('{"k": '), (_h(F.col("id"), salt="ek") % 100), F.lit("}")).alias("props"),
    )


def gen_documents(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    """Word-salad documents with a deterministic exact-dup and near-dup tail.

    ~0.4%% of rows copy another row's text verbatim (exact dups) and a
    further ~1%% regenerate from another row's seed minus the final word
    (high-Jaccard near dups) so the dedup chain has real work at any SF.
    """
    n = max(1, int(50_000 * sf))
    w = F.array(*[F.lit(x) for x in VOCAB])
    src = F.concat(F.lit("src"), (_h(F.col("id"), salt="dsrc") % 20))
    # weighted langs: en 40%, others 15% each
    lang_pick = _h(F.col("id"), salt="dlang") % 20
    lang = (
        F.when(lang_pick < 8, "en")
        .when(lang_pick < 11, "zh")
        .when(lang_pick < 14, "es")
        .when(lang_pick < 17, "fr")
        .otherwise("de")
    )
    dup_base = max(1, n // 20)
    kind = _h(F.col("id"), salt="dkind") % 1000  # 0-3 exact dup, 4-13 near dup
    seed = F.when(kind < 14, _h(F.col("id"), salt="dmap") % dup_base).otherwise(F.col("id"))
    base_len = _h(seed, salt="dlen") % 93 + 8
    eff_len = F.when((kind >= 4) & (kind < 14), base_len - 1).otherwise(base_len)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), eff_len.cast("int")),
            lambda i: F.element_at(w, (F.abs(F.xxhash64(F.lit("dw"), seed, i)) % len(VOCAB) + 1).cast("int")),
        ),
        " ",
    )
    return _rng(spark, n, parts).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        src.alias("source"),
        F.length(text).alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, sf: float, parts: int) -> DataFrame:
    """64-dim float vectors with 10 label-anchored clusters.

    vector = cluster_center(label) + 0.35 * noise, both uniform in
    [-1, 1), so kNN/ANN recall measurements see genuine label structure.
    """
    n = max(1, int(20_000 * sf))
    label = (_h(F.col("id"), salt="elab") % 10).cast("int")

    def unit(*cols, salt: str) -> F.Column:
        return (F.abs(F.xxhash64(F.lit(salt), *cols)) % 2_000_001) / 1_000_000.0 - 1.0

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: (unit(label, d, salt="ec") + unit(F.col("id"), d, salt="en") * 0.35).cast("float"),
    )
    return _rng(spark, n, parts).select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        label.alias("label"),
    )


GENERATORS = {
    "region": lambda spark, sf, parts: gen_region(spark),
    "nation": lambda spark, sf, parts: gen_nation(spark),
    "supplier": gen_supplier,
    "part": gen_part,
    "customer": gen_customer,
    "orders": gen_orders,
    "lineitem": gen_lineitem,
    "events": gen_events,
    "documents": gen_documents,
    "embeddings": gen_embeddings,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tables", default=",".join(GENERATORS))
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"gen_scale_sf{args.sf}")
    # file count scales with SF so downstream scans parallelize the same
    # way the driver's data does (sf0.1 ~= a handful of files per table)
    parts = max(4, int(32 * args.sf))
    for name in args.tables.split(","):
        t0 = time.perf_counter()
        df = GENERATORS[name](spark, args.sf, parts)
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
