"""Optional live LLM binding for the orchestrator's ``LLMClient``
contract (``Callable[[str], str]``).

The reference hard-wires langchain + OpenAI ``gpt-4o-mini`` and
silently degrades when the import or key is missing (reference
agentic_workflow_transformation.py:9-12, :45, :76). Here the binding is
stdlib-only (urllib against any OpenAI-compatible chat-completions
endpoint) and strictly opt-in via environment variables, so offline
runs never touch the network and the deterministic grammar path stays
the default:

    OPENAI_API_KEY    — required to enable the client
    OPENAI_BASE_URL   — endpoint root (default https://api.openai.com/v1)
    SPARK_GRAFT_LLM_MODEL — model name (default gpt-4o-mini, matching
                            the reference's choice at :10)

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


def client_from_env() -> Callable[[str], str] | None:
    """None when no key is configured — callers fall back to the
    deterministic grammar path (G8: full corpus with no LLM)."""
    if not os.environ.get("OPENAI_API_KEY"):
        return None
    return openai_chat_client()
