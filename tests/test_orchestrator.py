"""Tests for the agentic orchestration layer: planner/executor/critic,
retry loop, LLM fallback path (with a fake LLM), and the eval harness."""

from __future__ import annotations

import json

import pytest

from agentic_workflow_for_data_transformation_spark.agents import (
    critic_agent,
    planner_agent,
    run_eval,
    run_transform,
)
from agentic_workflow_for_data_transformation_spark.plans.parser import ParseError


def test_run_transform_deterministic(spark, people, tmp_path):
    st = run_transform(
        spark, people, "Filter rows where age > 30 and select columns name and age.",
        out_dir=tmp_path,
    )
    assert st.valid and st.row_count == 7 and st.attempts == 1
    header = open(st.output_path).readline().strip()
    assert header == "name,age"


def test_run_transform_empty_result(spark, people, tmp_path):
    st = run_transform(spark, people, "Filter rows where age > 100", out_dir=tmp_path)
    assert st.valid and st.row_count == 0
    assert open(st.output_path).read().strip() == "name,age,city"


def test_planner_llm_fallback(spark, people):
    spec_json = json.dumps(
        {"ops": [{"op": "filter", "expr": {"gt": ["age", 40]}}]}
    )
    calls = []

    def fake_llm(prompt: str) -> str:
        calls.append(prompt)
        return f"```json\n{spec_json}\n```"

    spec = planner_agent("keep only the elderly people", columns=people.columns, llm=fake_llm)
    assert spec["ops"][0]["expr"] == {"gt": ["age", 40]}
    assert len(calls) == 1 and "keep only the elderly" in calls[0]


def test_planner_offline_raises_outside_grammar(people):
    with pytest.raises(ParseError):
        planner_agent("summon a dashboard", columns=people.columns)


def test_critic_catches_wrong_output(spark, people, tmp_path):
    from agentic_workflow_for_data_transformation_spark.plans import parse_description

    spec = parse_description("Filter rows where age > 30")
    bad = tmp_path / "bad.csv"
    bad.write_text("name,age,city\nAlice,25,New York\n")  # violates age > 30
    ok, reason = critic_agent(spark, people, spec, str(bad))
    assert not ok
    assert "mismatch" in reason or "violate" in reason


def test_llm_critic_can_veto_but_not_override(spark, people, tmp_path):
    naysayer = lambda prompt: "NO\nbecause I said so"  # noqa: E731
    st = run_transform(
        spark, people, "Filter rows where age > 30", out_dir=tmp_path,
        llm=None, max_retries=0,
    )
    assert st.valid  # deterministic path unaffected by any LLM
    from agentic_workflow_for_data_transformation_spark.plans import parse_description

    spec = parse_description("Filter rows where age > 30")
    ok, reason = critic_agent(spark, people, spec, st.output_path, llm=naysayer)
    assert not ok and "llm critic rejected" in reason


def test_run_eval_full_corpus(spark, people, tmp_path):
    from agentic_workflow_for_data_transformation_spark.cli import EVAL_DESCRIPTIONS

    results = run_eval(spark, people, EVAL_DESCRIPTIONS, out_dir=tmp_path)
    assert len(results) == 20
    assert all(r["pass"] for r in results), [r for r in results if not r["pass"]]
    assert (tmp_path / "eval_results.csv").exists()


def test_cli_sql_escape_hatch(spark, tmp_path, capsys):
    """--sql bypasses the NL pipeline: testdata tables register as
    views, the result lands in the CSV sink."""
    from agentic_workflow_for_data_transformation_spark import cli

    rc = cli.main([
        "--sql",
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    lines = (tmp_path / "sql_result.csv").read_text().strip().splitlines()
    assert lines[0] == "l_returnflag,n"
    assert len(lines) == 4  # header + A/N/R


def test_cli_sql_requires_a_source(tmp_path, capsys):
    from agentic_workflow_for_data_transformation_spark import cli

    rc = cli.main(["--sql", "SELECT 1", "--out-dir", str(tmp_path)])
    assert rc == 2


def test_cli_sql_explain(spark, tmp_path, capsys):
    """--explain prints the formatted physical plan without executing."""
    from agentic_workflow_for_data_transformation_spark import cli

    rc = cli.main([
        "--sql", "SELECT count(*) AS n FROM region",
        "--sf-dir", "/root/testdata/sf0.001",
        "--explain", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan and "HashAggregate" in plan
    assert not (tmp_path / "sql_result.csv").exists()  # no execution


def test_filter_exprs_invalidated_by_schema_replacing_ops():
    """A filter BEFORE a schema-replacing op (pack/pivot/...) must not
    be re-applied to the replaced output schema; a filter AFTER it
    must; with_column overwriting a filtered column invalidates that
    filter (live-LLM finding, round 8)."""
    from agentic_workflow_for_data_transformation_spark.agents.orchestrator import (
        _filter_exprs_on_output,
    )

    pre = {"gt": ["n_chars", 100]}
    post = {"gt": ["seq_tokens", 0]}
    spec = {"ops": [
        {"op": "filter", "expr": pre},
        {"op": "pack", "budget": 512},
        {"op": "filter", "expr": post},
    ]}
    assert _filter_exprs_on_output(spec) == [post]

    spec = {"ops": [
        {"op": "filter", "expr": {"gt": ["age", 30]}},
        {"op": "with_column", "name": "age", "expr": {"lit": 0},
         "replace": True},
    ]}
    assert _filter_exprs_on_output(spec) == []

    # a groupby keeps key-only filters checkable (regression guard)
    spec = {"ops": [
        {"op": "filter", "expr": {"eq": ["city", {"lit": "x"}]}},
        {"op": "groupby_agg", "keys": ["city"],
         "aggs": [{"fn": "count", "col": "*", "alias": "n"}]},
    ]}
    assert len(_filter_exprs_on_output(spec)) == 1
