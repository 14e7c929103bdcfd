"""U1 escape hatch (plans/escape.py): sandbox validation + mapInPandas
execution + the orchestrator path that reaches it when both the grammar
and the LLM-spec path fail (reference
agentic_workflow_transformation.py:123-150, re-expressed sandboxed and
partition-parallel)."""

from __future__ import annotations

import json

import pytest

from agentic_workflow_for_data_transformation_spark.plans.escape import (
    EscapeHatchError,
    apply_snippet,
    validate_snippet,
)


GOOD = (
    "kept = pdf[pdf['age'] > 30]\n"
    "result_df = kept[['name', 'age']].assign(age_next=kept['age'] + 1)\n"
)


def test_good_snippet_validates():
    validate_snippet(GOOD)


@pytest.mark.parametrize(
    "code",
    [
        "import os\nresult_df = pdf",                       # import statement
        "result_df = __import__('os').system('id')",        # dunder-free but name not allowed
        "result_df = open('/etc/passwd')",                  # builtin open not in sandbox
        "pdf.to_csv('/tmp/x.csv')\nresult_df = pdf",        # file I/O method
        "result_df = pd.read_csv('/etc/passwd')",           # file read method
        "result_df = pd.eval('1+1')",                       # inner eval
        "result_df = pdf.query('age > 30')",                # string-eval query
        "result_df = pdf.__class__",                        # dunder attribute
        "result_df = getattr(pdf, 'to_csv')('/tmp/x')",     # getattr laundering
        "for i in range(3):\n    x = i\nresult_df = pdf",   # loop statement
        "def f():\n    return 1\nresult_df = pdf",          # function def
        "while True:\n    pass",                            # while
        "x = pdf",                                          # no result_df
        "result_df = eval('1')",                            # eval name
        "result_df = exec('1')",                            # exec name
        "result_df = pdf.pipe(print)",                      # pipe to arbitrary fn
    ],
)
def test_malicious_or_invalid_snippets_rejected(code):
    with pytest.raises(EscapeHatchError):
        validate_snippet(code)


def test_apply_snippet_runs_per_batch(people):
    out = apply_snippet(people, GOOD, "name string, age bigint, age_next bigint")
    rows = {(r["name"], r["age"], r["age_next"]) for r in out.collect()}
    assert rows == {
        ("Bob", 35, 36), ("Charlie", 32, 33), ("Diana", 45, 46),
        ("Fiona", 41, 42), ("George", 38, 39), ("Ian", 50, 51),
        ("Jasmine", 31, 32),
    }


def test_apply_snippet_is_mapinpandas_not_collect(people):
    plan = apply_snippet(
        people, GOOD, "name string, age bigint, age_next bigint"
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_apply_snippet_rejects_before_running(people):
    with pytest.raises(EscapeHatchError):
        apply_snippet(people, "result_df = open('/tmp/x')", "name string")


def test_lambda_and_safe_builtins_allowed(people):
    code = (
        "result_df = pdf.assign(n=pdf['name'].map(lambda s: len(s)))"
        "[['name', 'n']]\n"
    )
    out = apply_snippet(people, code, "name string, n bigint")
    got = dict((r["name"], r["n"]) for r in out.collect())
    assert got["Alice"] == 5 and got["Jasmine"] == 7


def test_orchestrator_escape_hatch_path(spark, people, tmp_path):
    """Grammar can't parse the description; the fake LLM fails the spec
    prompt (invalid JSON) and answers the pandas prompt with a snippet:
    the orchestrator must land on the escape hatch and validate."""
    from agentic_workflow_for_data_transformation_spark.agents.orchestrator import run_transform

    def fake_llm(prompt: str) -> str:
        if "pandas snippet" in prompt or "pandas DataFrame batch" in prompt:
            return json.dumps({
                "schema": "name string, age bigint",
                "code": "result_df = pdf[pdf['age'] >= 40][['name', 'age']]",
            })
        return "this is not json"  # spec path fails -> escape hatch

    st = run_transform(
        spark, people,
        "Apply a custom transformation keeping seniors only.",
        out_dir=tmp_path, llm=fake_llm,
    )
    assert st.valid
    assert st.code is not None and "result_df" in st.code
    out = spark.read.option("header", True).csv(st.output_path)
    assert out.count() == 3  # Diana 45, Fiona 41, Ian 50
    assert st.row_count == 3


def test_orchestrator_escape_hatch_rejects_malicious(spark, people, tmp_path):
    """A hostile snippet from the LLM must be rejected by validation,
    never executed, and the transform must come back invalid."""
    from agentic_workflow_for_data_transformation_spark.agents.orchestrator import run_transform

    def evil_llm(prompt: str) -> str:
        if "pandas snippet" in prompt or "pandas DataFrame batch" in prompt:
            return json.dumps({
                "schema": "name string",
                "code": "result_df = __import__('os').popen('id').read()",
            })
        return "not json either"

    st = run_transform(
        spark, people, "Apply a custom transformation nobody can parse.",
        out_dir=tmp_path, llm=evil_llm,
    )
    assert not st.valid
    assert any("escape hatch failed" in m for m in st.messages)


def test_orchestrator_escape_hatch_runtime_error_recovers(spark, people, tmp_path):
    """A snippet that VALIDATES but fails at runtime (unknown column)
    must not crash the orchestrator: the attempt is recorded as an
    escape-hatch failure and the state comes back invalid after the
    retry budget."""
    from agentic_workflow_for_data_transformation_spark.agents.orchestrator import run_transform

    def brittle_llm(prompt: str) -> str:
        if "pandas snippet" in prompt or "pandas DataFrame batch" in prompt:
            return json.dumps({
                "schema": "name string",
                "code": "result_df = pdf[pdf['no_such_column'] > 1][['name']]",
            })
        return "still not json"

    st = run_transform(
        spark, people, "Apply an unparseable custom transformation.",
        out_dir=tmp_path, llm=brittle_llm,
    )
    assert not st.valid
    assert any("escape hatch failed" in m for m in st.messages)
    assert st.attempts == 3  # initial + MAX_RETRIES
