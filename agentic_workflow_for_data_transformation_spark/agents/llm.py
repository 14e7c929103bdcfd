"""Optional live LLM binding for the orchestrator's ``LLMClient``
contract (``Callable[[str], str]``).

The reference hard-wires langchain + OpenAI ``gpt-4o-mini`` and
silently degrades when the import or key is missing (reference
agentic_workflow_transformation.py:9-12, :45, :76). Here the binding is
stdlib-only (urllib against any OpenAI-compatible chat-completions
endpoint) and strictly opt-in via environment variables, so offline
runs never touch the network and the deterministic grammar path stays
the default:

    OPENAI_API_KEY    — enables the OpenAI-compatible client
    OPENAI_BASE_URL   — endpoint root (default https://api.openai.com/v1)
    ANTHROPIC_API_KEY — enables the Anthropic Messages client instead
                        (checked when no OpenAI key is set)
    ANTHROPIC_BASE_URL — Anthropic endpoint root (default
                        https://api.anthropic.com)
    SPARK_GRAFT_LLM_MODEL — model name (defaults: gpt-4o-mini for the
                            OpenAI binding, matching the reference's
                            choice at :10; claude-haiku-4-5 for the
                            Anthropic binding)

Everything the LLM returns passes through the same validation gates as
any other input (spec JSON validation, escape-hatch AST sandbox) — a
live model gets no extra trust.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Callable

DEFAULT_BASE_URL = "https://api.openai.com/v1"
DEFAULT_MODEL = "gpt-4o-mini"  # same model the reference pins (:10)


def openai_chat_client(
    model: str | None = None,
    base_url: str | None = None,
    api_key: str | None = None,
    temperature: float = 0.0,
    timeout: float = 60.0,
) -> Callable[[str], str]:
    """Build an LLMClient over an OpenAI-compatible /chat/completions
    endpoint. Temperature 0 mirrors the reference (:10)."""
    base_url = (base_url or os.environ.get("OPENAI_BASE_URL") or DEFAULT_BASE_URL).rstrip("/")
    api_key = api_key or os.environ.get("OPENAI_API_KEY")
    model_name = model or os.environ.get("SPARK_GRAFT_LLM_MODEL") or DEFAULT_MODEL
    if not api_key:
        raise RuntimeError("no API key: set OPENAI_API_KEY to enable the LLM client")

    def client(prompt: str) -> str:
        payload = {
            "model": model_name,
            "temperature": temperature,
            "messages": [{"role": "user", "content": prompt}],
        }
        req = urllib.request.Request(
            f"{base_url}/chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {api_key}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            data = json.load(resp)
        return data["choices"][0]["message"]["content"]

    return client


DEFAULT_ANTHROPIC_BASE_URL = "https://api.anthropic.com"
DEFAULT_ANTHROPIC_MODEL = "claude-haiku-4-5"


def anthropic_chat_client(
    model: str | None = None,
    base_url: str | None = None,
    api_key: str | None = None,
    temperature: float = 0.0,
    timeout: float = 60.0,
    max_tokens: int = 1024,
) -> Callable[[str], str]:
    """Build an LLMClient over the public Anthropic Messages API
    (POST {base}/v1/messages, x-api-key + anthropic-version headers) —
    the second stdlib-only binding for the same LLMClient contract.
    Temperature 0, like the OpenAI binding, to keep planner output as
    reproducible as the API allows."""
    base_url = (
        base_url or os.environ.get("ANTHROPIC_BASE_URL")
        or DEFAULT_ANTHROPIC_BASE_URL
    ).rstrip("/")
    api_key = api_key or os.environ.get("ANTHROPIC_API_KEY")
    model_name = (
        model or os.environ.get("SPARK_GRAFT_LLM_MODEL")
        or DEFAULT_ANTHROPIC_MODEL
    )
    if not api_key:
        raise RuntimeError(
            "no API key: set ANTHROPIC_API_KEY to enable the LLM client"
        )

    def client(prompt: str) -> str:
        payload = {
            "model": model_name,
            "temperature": temperature,
            "max_tokens": max_tokens,
            "messages": [{"role": "user", "content": prompt}],
        }
        req = urllib.request.Request(
            f"{base_url}/v1/messages",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "x-api-key": api_key,
                "anthropic-version": "2023-06-01",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            data = json.load(resp)
        return "".join(
            block.get("text", "")
            for block in data["content"]
            if block.get("type") == "text"
        )

    return client


def client_from_env() -> Callable[[str], str] | None:
    """None when no key is configured — callers fall back to the
    deterministic grammar path (G8: full corpus with no LLM). The
    OpenAI-compatible binding wins when both keys are present (it is
    the reference's choice); otherwise the Anthropic binding."""
    if os.environ.get("OPENAI_API_KEY"):
        return openai_chat_client()
    if os.environ.get("ANTHROPIC_API_KEY"):
        return anthropic_chat_client()
    return None
