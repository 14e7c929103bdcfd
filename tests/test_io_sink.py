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


def test_json_roundtrip(spark, people, tmp_path):
    from pyspark.sql import functions as F

    from agentic_workflow_for_data_transformation_spark.sources.io import (
        read_json,
        write_json_dir,
    )

    out = write_json_dir(people, tmp_path / "people_json")
    back = read_json(spark, str(out), schema="name string, age long, city string")
    assert back.count() == 10
    assert {r["name"] for r in back.collect()} == {
        r["name"] for r in people.collect()
    }
    # explicit schema path must not trigger an inference pass
    assert back.schema.simpleString() == "struct<name:string,age:bigint,city:string>"
    # inferred path agrees on the data
    inferred = read_json(spark, str(out))
    assert inferred.count() == 10
    assert inferred.filter(F.col("age") > 30).count() == 7
