"""Golden end-to-end tests: the reference's 20-description eval corpus
(reference agentic_workflow_transformation.py:339-362) parsed by the
rule-based planner, compiled to DataFrames, and checked against
expectations computed in plain Python over the same 10 rows.

The reference judges these with an LLM critic (tolerant YES/NO,
:179-193); here every query has a deterministic golden answer.
"""

from __future__ import annotations

import pytest

from agentic_workflow_for_data_transformation_spark.plans import parse_description, compile_spec

from conftest import PEOPLE_ROWS

ROWS = [dict(zip(("name", "age", "city"), r)) for r in PEOPLE_ROWS]

# (description, expected rows as list-of-dicts, expected columns)
CASES = [
    (
        "Filter rows where age > 30 and select columns name and age.",
        [{"name": r["name"], "age": r["age"]} for r in ROWS if r["age"] > 30],
        ["name", "age"],
    ),
    (
        "Filter rows where city == 'New York' and select name, city.",
        [{"name": r["name"], "city": r["city"]} for r in ROWS if r["city"] == "New York"],
        ["name", "city"],
    ),
    (
        "Filter rows where age <= 30 and select name and age.",
        [{"name": r["name"], "age": r["age"]} for r in ROWS if r["age"] <= 30],
        ["name", "age"],
    ),
    (
        "Sort by age descending and keep top 3 rows.",
        sorted(ROWS, key=lambda r: -r["age"])[:3],
        ["name", "age", "city"],
    ),
    (
        "Group by city and count names.",
        [{"city": r["city"], "name_count": 1} for r in ROWS],  # all cities unique
        ["city", "name_count"],
    ),
    (
        "Add is_adult column where is_adult = age >= 18.",
        [{**r, "is_adult": r["age"] >= 18} for r in ROWS],
        ["name", "age", "city", "is_adult"],
    ),
    (
        "Select rows where name starts with 'J' and select name, city.",
        [{"name": r["name"], "city": r["city"]} for r in ROWS if r["name"].startswith("J")],
        ["name", "city"],
    ),
    (
        "Rename name to full_name.",
        [{"full_name": r["name"], "age": r["age"], "city": r["city"]} for r in ROWS],
        ["full_name", "age", "city"],
    ),
    (
        "Drop city column.",
        [{"name": r["name"], "age": r["age"]} for r in ROWS],
        ["name", "age"],
    ),
    (
        "Filter rows where age > 100",
        [],
        ["name", "age", "city"],
    ),
    (
        "Filter rows where age > 30 AND city == 'New York' and select name, age, city.",
        [r for r in ROWS if r["age"] > 30 and r["city"] == "New York"],
        ["name", "age", "city"],
    ),
    (
        "Filter rows where age > 30 OR city == 'New York' and select name, age.",
        [
            {"name": r["name"], "age": r["age"]}
            for r in ROWS
            if r["age"] > 30 or r["city"] == "New York"
        ],
        ["name", "age"],
    ),
    (
        "Filter rows where age between 30 and 45 and name starts with 'J'.",
        [r for r in ROWS if 30 <= r["age"] <= 45 and r["name"].startswith("J")],
        ["name", "age", "city"],
    ),
    (
        "Select rows where (age > 30 AND city == 'Chicago') OR (age <= 25 AND city == 'New York').",
        [
            r
            for r in ROWS
            if (r["age"] > 30 and r["city"] == "Chicago")
            or (r["age"] <= 25 and r["city"] == "New York")
        ],
        ["name", "age", "city"],
    ),
    (
        "Select rows where name starts with 'J' and age <= 35.",
        [r for r in ROWS if r["name"].startswith("J") and r["age"] <= 35],
        ["name", "age", "city"],
    ),
    (
        "Filter rows where age > 30 and city in ('Chicago', 'Boston').",
        [r for r in ROWS if r["age"] > 30 and r["city"] in ("Chicago", "Boston")],
        ["name", "age", "city"],
    ),
    (
        "Filter rows where age > 30 and not city == 'Los Angeles'.",
        [r for r in ROWS if r["age"] > 30 and not r["city"] == "Los Angeles"],
        ["name", "age", "city"],
    ),
    (
        "Sort by age desc and then filter age > 30 and keep top 2.",
        sorted((r for r in ROWS if r["age"] > 30), key=lambda r: -r["age"])[:2],
        ["name", "age", "city"],
    ),
    (
        "Group by city and show average age where average_age > 30.",
        [
            {"city": r["city"], "average_age": float(r["age"])}
            for r in ROWS
            if r["age"] > 30  # cities unique -> avg == age
        ],
        ["city", "average_age"],
    ),
    (
        "Filter where name contains 'an' and age between 30 and 50.",
        [r for r in ROWS if "an" in r["name"] and 30 <= r["age"] <= 50],
        ["name", "age", "city"],
    ),
]


def _as_sorted(rows: list[dict]) -> list[tuple]:
    return sorted(tuple(sorted(r.items())) for r in rows)


@pytest.mark.parametrize(
    "description,expected,columns",
    CASES,
    ids=[f"eval{i:02d}" for i in range(1, len(CASES) + 1)],
)
def test_eval_description(spark, people, description, expected, columns):
    spec = parse_description(description, columns=["name", "age", "city"])
    out = compile_spec(people, spec)
    assert out.columns == columns
    got = [r.asDict() for r in out.collect()]
    if "sort" in description.lower():
        # ordered comparison for sort queries (no ties in the fixture)
        assert [tuple(sorted(r.items())) for r in got] == [
            tuple(sorted(r.items())) for r in expected
        ]
    else:
        assert _as_sorted(got) == _as_sorted(expected)


def test_empty_result_keeps_schema(spark, people, tmp_path):
    """S5 contract: empty result still writes a header-only CSV."""
    from agentic_workflow_for_data_transformation_spark.sources import write_csv_single

    spec = parse_description("Filter rows where age > 100")
    out = compile_spec(people, spec)
    path = write_csv_single(out, tmp_path / "empty.csv")
    text = path.read_text().strip()
    assert text == "name,age,city"
