"""Recorded-response (cassette) tests for the LLM-assisted
orchestration loop (VERDICT r5 #5): the reference's core flow is three
LLM round-trips per query (planner :45, codegen :76, critic :189) —
the env-gated live tests skip without a key, so these drive the SAME
run_transform branches with canned completions: LLM spec fallback,
fence stripping, the U1 escape hatch, the advisory critic veto, and
the MAX_RETRIES budget. No network anywhere."""

from __future__ import annotations

import json

import pytest

from agentic_workflow_for_data_transformation_spark.agents.orchestrator import (
    MAX_RETRIES,
    run_transform,
)


class Cassette:
    """Prompt-dispatched fake LLM: routes each prompt to a canned
    response by which orchestrator template produced it, and records
    the call sequence for assertions."""

    def __init__(self, spec_responses=(), pandas_responses=(), verdicts=()):
        self.spec_responses = list(spec_responses)
        self.pandas_responses = list(pandas_responses)
        self.verdicts = list(verdicts)
        self.calls: list[str] = []

    def __call__(self, prompt: str) -> str:
        if prompt.startswith("You translate a natural-language"):
            self.calls.append("spec")
            return self.spec_responses.pop(0)
        if prompt.startswith("The transformation could not be expressed"):
            self.calls.append("pandas")
            return self.pandas_responses.pop(0)
        if prompt.startswith("You will judge whether a transformation"):
            self.calls.append("critic")
            return self.verdicts.pop(0) if self.verdicts else "YES"
        raise AssertionError(f"unexpected prompt: {prompt[:80]}")


@pytest.fixture()
def people(spark):
    rows = [("Alice", 34, "Boston"), ("Bob", 28, "Denver"),
            ("Cara", 41, "Austin"), ("Dan", 19, "Boston")]
    return spark.createDataFrame(rows, "name string, age long, city string")


# a description NO grammar rule matches -> planner must fall through
# to the LLM spec path
_OFF_GRAMMAR = "Please fetch me the records of the senior people only."

_SPEC_JSON = json.dumps(
    {"ops": [{"op": "filter", "expr": {"gt": [{"col": "age"}, {"lit": 30}]}}]}
)


def test_llm_spec_fallback_with_fences(spark, people, tmp_path):
    """Grammar miss -> ONE spec call -> fenced JSON accepted -> executed
    -> deterministic critic + advisory LLM verdict -> valid."""
    llm = Cassette(
        spec_responses=["```json\n" + _SPEC_JSON + "\n```"], verdicts=["YES"]
    )
    st = run_transform(spark, people, _OFF_GRAMMAR, out_dir=tmp_path, llm=llm)
    assert st.valid and st.row_count == 2  # Alice, Cara
    assert llm.calls == ["spec", "critic"]
    assert st.spec["ops"][0]["op"] == "filter"


def test_llm_bad_spec_falls_to_escape_hatch(spark, people, tmp_path):
    """LLM emits an invalid spec -> SpecError -> U1 escape hatch runs a
    sandboxed row-local pandas snippet via mapInPandas instead."""
    snippet = json.dumps({
        "schema": "name string, age bigint",
        "code": "result_df = pdf[pdf['age'] > 30][['name', 'age']]",
    })
    llm = Cassette(
        spec_responses=[json.dumps({"ops": [{"op": "no_such_op"}]})],
        pandas_responses=[snippet],
    )
    st = run_transform(spark, people, _OFF_GRAMMAR, out_dir=tmp_path, llm=llm)
    assert st.valid and st.row_count == 2
    assert st.code is not None and st.schema == "name string, age bigint"
    assert llm.calls == ["spec", "pandas"]


def test_llm_critic_veto_retries_then_passes(spark, people, tmp_path):
    """Advisory critic veto on attempt 1 -> re-plan (with feedback
    appended, so the grammar misses again) -> attempt 2 passes. The
    veto can only ever REJECT — deterministic checks already passed."""
    llm = Cassette(
        spec_responses=[_SPEC_JSON, _SPEC_JSON],
        verdicts=["NO — wrong rows", "YES"],
    )
    st = run_transform(spark, people, _OFF_GRAMMAR, out_dir=tmp_path, llm=llm)
    assert st.valid and st.attempts == 2
    assert llm.calls == ["spec", "critic", "spec", "critic"]
    assert any("llm critic rejected" in m for m in st.messages)


def test_llm_retry_budget_exhausts(spark, people, tmp_path):
    """A critic that always vetoes exhausts the reference's
    MAX_RETRIES=2 budget (:159): exactly 1+2 attempts, state invalid."""
    n = 1 + MAX_RETRIES
    llm = Cassette(
        spec_responses=[_SPEC_JSON] * n, verdicts=["NO — still wrong"] * n
    )
    st = run_transform(spark, people, _OFF_GRAMMAR, out_dir=tmp_path, llm=llm)
    assert not st.valid and st.attempts == n
    assert llm.calls == ["spec", "critic"] * n


def test_llm_sandbox_rejects_malicious_snippet(spark, people, tmp_path):
    """Escape-hatch snippet with an import is rejected by the AST
    sandbox BEFORE running; the loop records the failure and retries
    until a clean snippet arrives."""
    bad = json.dumps({
        "schema": "name string",
        "code": "import os\nresult_df = pdf[['name']]",
    })
    good = json.dumps({
        "schema": "name string",
        "code": "result_df = pdf[['name']]",
    })
    llm = Cassette(
        spec_responses=[json.dumps({"ops": [{"op": "nope"}]})] * 2,
        pandas_responses=[bad, good],
    )
    st = run_transform(spark, people, _OFF_GRAMMAR, out_dir=tmp_path, llm=llm)
    assert st.valid and st.row_count == 4
    assert any("escape hatch failed" in m for m in st.messages)
    assert llm.calls == ["spec", "pandas", "spec", "pandas"]
