"""Z-order layout: measure the actual row-group pruning win on real
parquet min/max statistics (not a plan string — the physical stats a
100 TB reader would prune with).

Layout A sorts by x only (the classic single-column sort); layout B
sorts by the interleaved Z-order key of (x, y). A reader prunes a row
group when the predicate range misses the group's [min, max] on the
filtered column. The single-column sort cannot prune on y at all —
every group spans the full y range — while the Z-order sort bounds
BOTH dimensions per group."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from agentic_workflow_for_data_transformation_spark.functions.layout import zorder_key_2d
from agentic_workflow_for_data_transformation_spark.sources import read_parquet_table


def _write_sorted(df, sort_cols, path):
    (
        df.coalesce(1)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        # small row groups so a 60k-row test table has enough groups
        # for pruning to be measurable
        .option("parquet.block.size", 64 * 1024)
        .parquet(str(path))
    )


def _overlapping_groups(path, col, lo, hi):
    """(overlapping, total) row groups for predicate col BETWEEN lo AND hi."""
    total = overlapping = 0
    for f in path.glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                overlapping += 1
    return overlapping, total


# pinned: the pruning measurement needs enough rows for >= 8 row
# groups, which the smallest test scale factor doesn't produce
LAYOUT_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = read_parquet_table(spark, LAYOUT_SF_DIR, "lineitem").select(
        (F.col("l_orderkey") % 256).cast("long").alias("xb"),
        (F.col("l_partkey") % 256).cast("long").alias("yb"),
        "l_quantity",
    )
    li = li.withColumn("zkey", zorder_key_2d("xb", "yb", bits=8))
    x_path, z_path = base / "by_x", base / "by_zkey"
    _write_sorted(li, ["xb", "yb"], x_path)
    _write_sorted(li, ["zkey"], z_path)
    return x_path, z_path


def test_single_column_sort_cannot_prune_other_dim(layouts):
    x_path, z_path = layouts
    x_hit, x_total = _overlapping_groups(x_path, "yb", 16, 31)
    assert x_total >= 8, "need enough row groups for the comparison"
    # sorted by x: every group spans ~the full y range -> zero pruning
    assert x_hit == x_total


def test_zorder_prunes_both_dims(layouts):
    x_path, z_path = layouts
    _, z_total = _overlapping_groups(z_path, "yb", 16, 31)
    z_y_hit, _ = _overlapping_groups(z_path, "yb", 16, 31)
    z_x_hit, _ = _overlapping_groups(z_path, "xb", 16, 31)
    assert z_total >= 8
    # a 1/16-of-range predicate on EITHER dimension must prune most
    # groups under the Z-order layout
    assert z_y_hit <= z_total / 2, (z_y_hit, z_total)
    assert z_x_hit <= z_total / 2, (z_x_hit, z_total)


def test_zorder_key_matches_python_reference(spark):
    """Bit-interleave correctness against a pure-Python reference."""
    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 2, 9, 128, 255)]
    df = spark.createDataFrame(rows, "xb long, yb long")
    got = {
        (r["xb"], r["yb"]): r["z"]
        for r in df.select("xb", "yb", zorder_key_2d("xb", "yb", bits=8).alias("z")).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y)


def test_write_parquet_zordered_sink(spark, tmp_path):
    """The z-ordered sink must produce a readable table with the same
    rows, and its multi-file form range-partitions by the key (files
    cover disjoint z-ranges)."""
    from agentic_workflow_for_data_transformation_spark.sources import (
        read_parquet_table,
        write_parquet_zordered,
    )

    li = read_parquet_table(spark, LAYOUT_SF_DIR, "lineitem").select(
        (F.col("l_orderkey") % 256).cast("long").alias("xb"),
        (F.col("l_partkey") % 256).cast("long").alias("yb"),
    )
    out = tmp_path / "zsink"
    write_parquet_zordered(li, out, x="xb", y="yb", bits=8, files=4)
    back = spark.read.parquet(str(out))
    assert back.count() == li.count()
    assert set(back.columns) == {"xb", "yb"}
    files = sorted(out.glob("part-*.parquet"))
    assert len(files) == 4


def test_digest_archive_bucketed_join_skips_archive_exchange(spark, tmp_path):
    """The recurring-pipeline dedup layout (VERDICT r6 #8): with the
    archive digest set materialized via bucketBy(_h).sortBy(_h), the
    incremental anti join must plan NO shuffle above the archive scan
    — the bucket files ARE the hash partitioning — while the
    per-session path (re-hash the raw archive every batch) shuffles
    it every time. Rows must be identical between the two paths."""
    from agentic_workflow_for_data_transformation_spark.operators import dedup
    from agentic_workflow_for_data_transformation_spark.sources import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, LAYOUT_SF_DIR, "documents")
    arch = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    table = "digest_archive_layout_test"
    dedup.write_digest_archive(arch, table, str(tmp_path / "arch"))

    def shuffles_above_archive(df) -> bool:
        def walk(node):
            yield node
            cs = node.children()
            for i in range(cs.size()):
                yield from walk(cs.apply(i))

        plan = df._jdf.queryExecution().executedPlan()
        return any(
            node.nodeName() == "Exchange" and table in node.toString()
            for node in walk(plan)
        )

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bucketed = dedup.incremental_new_docs(
            new, existing_digests=spark.table(table)
        )
        baseline = dedup.incremental_new_docs(new, existing=arch)
        assert not shuffles_above_archive(bucketed)
        # the same anti join against the RAW archive must shuffle the
        # archive side (otherwise this test asserts nothing)
        base_plan = baseline._jdf.queryExecution().executedPlan().toString()
        assert base_plan.count("Exchange hashpartitioning") > 0
        got = {r["doc_id"] for r in bucketed.collect()}
        want = {r["doc_id"] for r in baseline.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_lsh_archive_parity_and_bucketed_layout(spark, tmp_path):
    """Incremental NEAR-dup dedup (the fuzzy twin of the digest-archive
    rung): the persisted bucketBy(band_key) archive must (a) produce
    IDENTICAL survivors to re-hashing the raw archive per batch, and
    (b) plan no Exchange above the archive-bucket scan in the
    candidate join — band keys arrive pre-partitioned from the bucket
    files."""
    from agentic_workflow_for_data_transformation_spark.operators import dedup
    from agentic_workflow_for_data_transformation_spark.sources import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, LAYOUT_SF_DIR, "documents")
    arch = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    table = "lsh_archive_layout_test"
    dedup.write_lsh_archive(arch, table, str(tmp_path / "lsharch"))

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        archived = dedup.incremental_neardup_new_docs(
            new, arch, archive_buckets=spark.table(table)
        )
        baseline = dedup.incremental_neardup_new_docs(new, arch)
        # bucket scan feeds the band-key join without re-partitioning:
        # no Exchange node mentions the archive table
        plan = archived._jdf.queryExecution().executedPlan()

        def walk(node):
            yield node
            cs = node.children()
            for i in range(cs.size()):
                yield from walk(cs.apply(i))

        assert not any(
            n.nodeName() == "Exchange" and table in n.toString()
            for n in walk(plan)
        )
        got = {r["doc_id"] for r in archived.collect()}
        want = {r["doc_id"] for r in baseline.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
