"""Sink threshold behavior: write_csv_single must never collect a
result larger than small_threshold onto the driver (ADVICE round 1)."""

from __future__ import annotations

import pyspark.sql

from agentic_workflow_for_data_transformation_spark.sources.io import write_csv_single


def test_small_result_single_file(spark, people, tmp_path):
    p = write_csv_single(people, tmp_path / "out.csv", small_threshold=100)
    assert p.is_file()
    assert open(p).readline().strip() == "name,age,city"


def test_large_result_never_collects(spark, monkeypatch, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "n")

    def boom(self):
        raise AssertionError("toPandas must not be called above the threshold")

    monkeypatch.setattr(pyspark.sql.DataFrame, "toPandas", boom)
    p = write_csv_single(df, tmp_path / "out.csv", small_threshold=50)
    assert p.is_dir()  # parallel directory sink, not a driver collect
    back = spark.read.option("header", True).csv(str(p))
    assert back.count() == 100


def test_empty_result_still_header_only(spark, people, tmp_path):
    p = write_csv_single(people.filter("age > 100"), tmp_path / "empty.csv")
    assert p.is_file()
    assert open(p).read().strip() == "name,age,city"
