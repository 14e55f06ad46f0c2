"""Lint-style structural checks (no external linter in this container).

Born from a real round-6 bug: two back-to-back ``def streaming_dedup``
in one module, the second silently shadowing the first (ruff's F811).
Redefinitions must fail loudly.
"""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / \
    "spark_df_profiling_spark"


def _toplevel_redefs(tree):
    seen, dups = {}, []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                dups.append((node.name, seen[node.name], node.lineno))
            seen[node.name] = node.lineno
    return dups


def test_no_duplicate_toplevel_definitions():
    offenders = {}
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text(), filename=str(py))
        dups = _toplevel_redefs(tree)
        if dups:
            offenders[str(py.relative_to(PKG.parent))] = dups
    assert not offenders, (
        f"duplicate top-level definitions (F811 shadowing): {offenders}")
