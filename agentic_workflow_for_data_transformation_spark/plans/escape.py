"""Sandboxed free-form pandas escape hatch (SURVEY.md section 2.7, U1).

The reference exec's arbitrary LLM-generated pandas on the driver with
only ``pd`` + ``sample_data`` bound (reference
agentic_workflow_transformation.py:123-129). Here the same capability is
re-expressed scale-safely:

- the snippet is **AST-validated** before anything is compiled: only
  assignment/expression statements over a closed name set (``pdf``,
  ``pd``, a few safe builtins, and names the snippet itself binds), no
  imports, no dunder access, no file/network I/O methods;
- execution happens **per Arrow batch inside executors** via
  ``DataFrame.mapInPandas`` with a declared result schema — never a
  driver-side collect, so the hatch works on a 1000-executor cluster
  exactly like any other operator.

Semantics contract: because the snippet runs once per partition batch,
it must be **row-local** (filter / project / computed columns — exactly
the surface the reference's eval corpus exercises). Cross-row
aggregation belongs in the spec compiler (plans/compile.py), not here;
``validate_snippet`` cannot see intent, so the docstring contract is the
boundary and the orchestrator's critic re-checks row counts.
"""

from __future__ import annotations

import ast

from pyspark.sql import DataFrame


class EscapeHatchError(ValueError):
    """Raised when a snippet fails sandbox validation."""


# Statements: straight-line code only. No defs, loops, imports, with,
# try, del, global — a transform is a dataflow, not a program.
_ALLOWED_STMT = (ast.Assign, ast.AugAssign, ast.AnnAssign, ast.Expr)

_ALLOWED_EXPR = (
    ast.Name, ast.Attribute, ast.Subscript, ast.Call, ast.Constant,
    ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare, ast.IfExp,
    ast.Lambda, ast.List, ast.Tuple, ast.Dict, ast.Set, ast.Slice,
    ast.ListComp, ast.GeneratorExp, ast.comprehension, ast.Starred,
    ast.keyword, ast.arguments, ast.arg, ast.operator, ast.unaryop,
    ast.boolop, ast.cmpop, ast.expr_context, ast.FormattedValue,
    ast.JoinedStr,
)

# Builtins re-exposed inside the sandbox (the exec env strips
# __builtins__ entirely; these are rebound explicitly).
_SAFE_BUILTINS = {
    "len": len, "abs": abs, "min": min, "max": max, "sum": sum,
    "round": round, "range": range, "sorted": sorted, "zip": zip,
    "enumerate": enumerate, "float": float, "int": int, "str": str,
    "bool": bool, "list": list, "tuple": tuple, "dict": dict, "set": set,
}

_INPUT_NAMES = {"pdf", "pd"}

# Attribute names that reach the filesystem, network, or an inner
# eval/exec no matter the receiver. Dunders are blocked wholesale below.
_BLOCKED_ATTRS = {
    "to_csv", "to_parquet", "to_pickle", "to_sql", "to_hdf", "to_excel",
    "to_json", "to_clipboard", "to_feather", "to_orc", "to_stata",
    "to_latex", "to_html", "to_xml", "to_markdown",
    "read_csv", "read_parquet", "read_pickle", "read_sql", "read_hdf",
    "read_excel", "read_json", "read_clipboard", "read_feather",
    "read_orc", "read_stata", "read_html", "read_xml", "read_fwf",
    "read_table", "read_sas", "read_spss", "read_gbq",
    "eval", "query", "pipe",
}


def validate_snippet(code: str) -> ast.Module:
    """Parse + whitelist-check a pandas snippet. Returns the parsed AST
    on success; raises EscapeHatchError with the offending construct
    otherwise. The snippet must assign ``result_df`` at top level."""
    try:
        tree = ast.parse(code, mode="exec")
    except SyntaxError as e:
        raise EscapeHatchError(f"syntax error: {e}") from None

    bound: set[str] = set(_INPUT_NAMES) | set(_SAFE_BUILTINS)
    assigns_result = False

    for stmt in tree.body:
        if not isinstance(stmt, _ALLOWED_STMT):
            raise EscapeHatchError(
                f"statement {type(stmt).__name__} is not allowed "
                "(only assignments and expressions)"
            )

    for node in ast.walk(tree):
        if isinstance(node, ast.stmt) and not isinstance(node, _ALLOWED_STMT):
            raise EscapeHatchError(f"nested statement {type(node).__name__} is not allowed")
        if isinstance(node, ast.expr) and not isinstance(node, _ALLOWED_EXPR):
            raise EscapeHatchError(f"expression {type(node).__name__} is not allowed")
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise EscapeHatchError(f"underscore attribute {node.attr!r} is not allowed")
            if node.attr in _BLOCKED_ATTRS:
                raise EscapeHatchError(f"attribute {node.attr!r} is not allowed (I/O or eval)")

    # Names must resolve to the inputs, safe builtins, or something the
    # snippet itself binds *before* use (top-to-bottom; lambda and
    # comprehension parameters are scoped but validated permissively by
    # adding them to the bound set).
    for node in ast.walk(tree):
        if isinstance(node, ast.Lambda):
            for a in node.args.args + node.args.kwonlyargs:
                bound.add(a.arg)
        if isinstance(node, ast.comprehension):
            for n in ast.walk(node.target):
                if isinstance(n, ast.Name):
                    bound.add(n.id)

    class _NameCheck(ast.NodeVisitor):
        def visit_Name(self, node: ast.Name) -> None:
            if isinstance(node.ctx, ast.Store):
                bound.add(node.id)
            elif node.id not in bound:
                raise EscapeHatchError(f"name {node.id!r} is not allowed")
            self.generic_visit(node)

    _NameCheck().visit(tree)

    for stmt in tree.body:
        if isinstance(stmt, ast.Assign):
            for t in stmt.targets:
                if isinstance(t, ast.Name) and t.id == "result_df":
                    assigns_result = True
    if not assigns_result:
        raise EscapeHatchError("snippet must assign result_df")
    return tree


def apply_snippet(df: DataFrame, code: str, schema: str) -> DataFrame:
    """Run a validated row-local pandas snippet over ``df`` per Arrow
    batch (mapInPandas), producing the declared ``schema`` (DDL string,
    e.g. ``"c_custkey bigint, flag boolean"``).

    The snippet sees each batch as ``pdf`` and must assign
    ``result_df``; output columns are aligned to the declared schema by
    name. Validation runs on the driver; executors re-compile the
    already-validated source (strings ship cheaply to workers)."""
    validate_snippet(code)
    out_cols = [f.split()[0].strip("`") for f in _split_ddl(schema)]

    def _run(batches):
        import pandas as pd  # local import: runs inside the executor

        compiled = compile(code, "<escape-hatch>", "exec")
        for pdf in batches:
            env = {"pd": pd, "pdf": pdf, "__builtins__": _SAFE_BUILTINS}
            exec(compiled, env)  # noqa: S102 — source AST-whitelisted above
            out = env["result_df"]
            if not isinstance(out, pd.DataFrame):
                out = pd.DataFrame(out)
            yield out[out_cols]

    return df.mapInPandas(_run, schema=schema)


def _split_ddl(schema: str) -> list[str]:
    """Split a DDL schema string on top-level commas (respects
    ``struct<a int, b int>`` nesting)."""
    fields, depth, cur = [], 0, []
    for ch in schema:
        if ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
        else:
            depth += ch in "<("
            depth -= ch in ">)"
            cur.append(ch)
    if cur:
        fields.append("".join(cur).strip())
    return [f for f in fields if f]
