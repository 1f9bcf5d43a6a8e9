"""Guard against within-module shadowing (round-8 incident): a
duplicate top-level ``def`` or a repeated ``ORACLE[...]`` assignment
inside one module silently replaces the earlier definition — Python
raises nothing and the registry's cross-module duplicate guard never
sees it. AST-audit every engine module."""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "mapreduce_rust_spark"


def _module_issues(path: Path) -> list[str]:
    tree = ast.parse(path.read_text())
    issues: list[str] = []
    seen_defs: set[str] = set()
    seen_oracle: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen_defs:
                issues.append(f"{path.name}: duplicate top-level def {node.name}")
            seen_defs.add(node.name)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if (
                    isinstance(tgt, ast.Subscript)
                    and isinstance(tgt.value, ast.Name)
                    and tgt.value.id == "ORACLE"
                    and isinstance(tgt.slice, ast.Constant)
                ):
                    if tgt.slice.value in seen_oracle:
                        issues.append(
                            f"{path.name}: ORACLE[{tgt.slice.value!r}] assigned twice"
                        )
                    seen_oracle.add(tgt.slice.value)
            # duplicate keys inside the QUERIES dict literal
            t0 = node.targets[0]
            if (
                isinstance(t0, ast.Name)
                and t0.id == "QUERIES"
                and isinstance(node.value, ast.Dict)
            ):
                keys = [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, ast.Constant)
                ]
                dupes = {k for k in keys if keys.count(k) > 1}
                if dupes:
                    issues.append(
                        f"{path.name}: duplicate QUERIES keys {sorted(dupes)}"
                    )
    return issues


def test_no_shadowed_definitions():
    issues: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        issues.extend(_module_issues(path))
    assert not issues, "\n".join(issues)
