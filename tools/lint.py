#!/usr/bin/env python3
"""Dependency-free lint: byte-compile everything, flag unused imports,
`== None` comparisons, and bare excepts.

The CI workflow runs ruff for the full rule set; this script is the
no-network fallback (the dev image has no linter installed) and runs as the
first CI step so syntax errors fail fast. Usage: python tools/lint.py [paths]
"""
from __future__ import annotations

import ast
import pathlib
import sys

DEFAULT_PATHS = ["directdemod_tpu", "tests", "examples", "tutorial",
                 "main.py", "bench.py", "__graft_entry__.py"]


def iter_py(paths):
    for p in paths:
        path = pathlib.Path(p)
        if path.is_dir():
            yield from sorted(path.rglob("*.py"))
        elif path.suffix == ".py":
            yield path


class Visitor(ast.NodeVisitor):
    def __init__(self):
        self.imported: dict[str, ast.stmt] = {}
        self.used: set[str] = set()
        self.problems: list[tuple[int, str]] = []

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported.setdefault(name, node)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imported.setdefault(a.asname or a.name, node)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    def visit_Compare(self, node):
        for op, cmp_ in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                    isinstance(cmp_, ast.Constant) and cmp_.value is None):
                self.problems.append(
                    (node.lineno, "comparison to None with ==/!="))
        self.generic_visit(node)

    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.problems.append((node.lineno, "bare except"))
        self.generic_visit(node)


def lint_file(path: pathlib.Path) -> list[str]:
    errs = []
    try:
        compile(path.read_text(), str(path), "exec")
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    tree = ast.parse(path.read_text(), filename=str(path))
    v = Visitor()
    v.visit(tree)
    # names used in __all__ / docstring doctests are rare here; a trailing
    # "# noqa" on the import line suppresses
    lines = path.read_text().splitlines()
    for name, node in v.imported.items():
        if name in v.used or name == "annotations":
            continue
        line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
        if "noqa" in line:
            continue
        errs.append(f"{path}:{node.lineno}: unused import '{name}'")
    for lineno, msg in v.problems:
        line = lines[lineno - 1] if lineno <= len(lines) else ""
        if "noqa" in line:
            continue
        errs.append(f"{path}:{lineno}: {msg}")
    return errs


def main(argv):
    paths = argv[1:] or DEFAULT_PATHS
    all_errs = []
    n = 0
    for f in iter_py(paths):
        n += 1
        all_errs += lint_file(f)
    for e in all_errs:
        print(e)
    print(f"lint: {n} files, {len(all_errs)} problem(s)")
    return 1 if all_errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
