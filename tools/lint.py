#!/usr/bin/env python3
"""Dependency-free lint: byte-compile everything, flag unused imports,
undefined names, `== None` comparisons, and bare excepts.

The undefined-name pass is flat-scope: it collects every name bound anywhere
in the module (imports, assignments, defs, args, comprehension/loop/with
targets, except/match captures) and flags loads of names bound nowhere — the
F821 class that shipped a NameError in rounds 1 and 2 (`log.warning` with no
`log` anywhere in the module). Flow-insensitive by design: no false positives
from forward references, at the cost of missing use-before-def, which
byte-compilation plus the test suite cover.

The CI workflow runs ruff for the full rule set; this script is the
no-network fallback (the dev image has no linter installed) and runs as the
first CI step so syntax errors fail fast. Usage: python tools/lint.py [paths]
"""
from __future__ import annotations

import ast
import builtins
import pathlib
import sys

_BUILTIN_NAMES = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__builtins__", "__debug__", "__loader__", "__path__", "__class__",
}

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


class Bindings(ast.NodeVisitor):
    """Collect every name bound anywhere in the module (flat, scope-blind)."""

    def __init__(self):
        self.bound: set[str] = set()

    def visit_Name(self, node):
        if isinstance(node.ctx, (ast.Store, ast.Del)):
            self.bound.add(node.id)

    def visit_FunctionDef(self, node):
        self.bound.add(node.name)
        a = node.args
        for arg in (a.posonlyargs + a.args + a.kwonlyargs
                    + ([a.vararg] if a.vararg else [])
                    + ([a.kwarg] if a.kwarg else [])):
            self.bound.add(arg.arg)
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_Lambda(self, node):
        a = node.args
        for arg in (a.posonlyargs + a.args + a.kwonlyargs
                    + ([a.vararg] if a.vararg else [])
                    + ([a.kwarg] if a.kwarg else [])):
            self.bound.add(arg.arg)
        self.generic_visit(node)

    def visit_ClassDef(self, node):
        self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Import(self, node):
        for a in node.names:
            self.bound.add((a.asname or a.name).split(".")[0])

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name != "*":
                self.bound.add(a.asname or a.name)

    def visit_ExceptHandler(self, node):
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Global(self, node):
        self.bound.update(node.names)

    visit_Nonlocal = visit_Global

    def visit_MatchAs(self, node):
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)

    def visit_MatchStar(self, node):
        if node.name:
            self.bound.add(node.name)

    def visit_MatchMapping(self, node):
        if node.rest:
            self.bound.add(node.rest)
        self.generic_visit(node)


class Loads(ast.NodeVisitor):
    """Collect loaded names outside annotation position (with lineno)."""

    def __init__(self):
        self.loads: list[tuple[str, int]] = []
        self.has_star_import = False

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.loads.append((node.id, node.lineno))

    def visit_ImportFrom(self, node):
        if any(a.name == "*" for a in node.names):
            self.has_star_import = True

    def _skip_annotations(self, node):
        for child in ast.iter_child_nodes(node):
            if child is getattr(node, "returns", None):
                continue
            if child is getattr(node, "annotation", None):
                continue
            self.visit(child)

    def visit_FunctionDef(self, node):
        self._skip_annotations(node)

    visit_AsyncFunctionDef = visit_FunctionDef
    visit_AnnAssign = _skip_annotations
    visit_arg = _skip_annotations


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
    # undefined names (flat scope; skipped entirely under `from x import *`)
    b = Bindings()
    b.visit(tree)
    ld = Loads()
    ld.visit(tree)
    if not ld.has_star_import:
        seen = set()
        for name, lineno in ld.loads:
            if name in b.bound or name in _BUILTIN_NAMES or name in seen:
                continue
            line = lines[lineno - 1] if lineno <= len(lines) else ""
            if "noqa" in line:
                continue
            seen.add(name)
            errs.append(f"{path}:{lineno}: undefined name '{name}'")
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
