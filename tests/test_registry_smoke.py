"""Registration-time smoke gate: every registered query must BUILD
(pass Spark analysis) against the real testdata.

This exists because a testdata schema drift (the events table's ts
column changing dtype between rounds) once reached the driver bench
before any local check caught it — every query here constructs its
DataFrame against the same parquet the driver uses, so an
analysis-time break (missing column, dtype mismatch, bad cast) fails
pytest before it can crash the bench. Construction only: no
``.collect()``/``.count()`` — iterative operators (dedup clusters,
k-means) do run their bounded driver loops at build time, which is
the behavior the driver sees too.
"""

from __future__ import annotations

import os

import pytest

from agentic_workflow_for_data_transformation_spark import benchqueries

# the driver runs check_oracle at sf0.01 and the bench at sf0.1 —
# smoke against sf0.01 (same schema family, cheap build)
SMOKE_SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.01")

_NAMES = list(benchqueries.queries())


def test_registry_is_nonempty_and_unique():
    assert len(_NAMES) == len(set(_NAMES))
    assert len(_NAMES) >= 100


@pytest.mark.parametrize("name", _NAMES)
def test_query_builds_against_testdata(spark, name):
    df = benchqueries.queries()[name](spark, SMOKE_SF_DIR)
    # touching the schema forces full analysis/resolution of the plan
    assert df.schema.fields, f"{name} produced an empty schema"


def test_every_oracle_has_a_query():
    dangling = set(benchqueries.oracle_sql()) - set(_NAMES)
    assert not dangling, f"oracle_sql entries without a query: {sorted(dangling)}"
