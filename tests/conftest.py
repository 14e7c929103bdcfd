from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from agentic_workflow_for_data_transformation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The reference's canonical 10-row table (reference input.csv:1-11).
PEOPLE_ROWS = [
    ("Alice", 25, "New York"),
    ("Bob", 35, "Los Angeles"),
    ("Charlie", 32, "Chicago"),
    ("Diana", 45, "Seattle"),
    ("Ethan", 29, "Boston"),
    ("Fiona", 41, "San Francisco"),
    ("George", 38, "Denver"),
    ("Hannah", 22, "Miami"),
    ("Ian", 50, "Austin"),
    ("Jasmine", 31, "Portland"),
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def people(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.LongType(), False),
            T.StructField("city", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(PEOPLE_ROWS, schema)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
