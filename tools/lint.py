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


_SCOPE_NODES = (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda,
                ast.ClassDef)


def _arg_names(args: ast.arguments) -> list[str]:
    return [a.arg for a in (args.posonlyargs + args.args + args.kwonlyargs
                            + ([args.vararg] if args.vararg else [])
                            + ([args.kwarg] if args.kwarg else []))]


def _local_bindings(body_nodes) -> set[str]:
    """Names bound directly in a scope given its body statements: every
    Store/Del target, def/class name, import, except/match capture, and
    comprehension target — WITHOUT descending into nested function/class
    bodies (those bind in their own scope). Flow-insensitive: a name bound
    anywhere in the scope counts as bound throughout (no use-before-def
    detection — byte-compile + tests cover that), which keeps this pass
    false-positive-free."""
    bound: set[str] = set()

    def walk(node):
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, (ast.Store, ast.Del)):
                bound.add(node.id)
            return
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            bound.add(node.name)
            for d in node.decorator_list:
                walk(d)
            return                        # body binds in the nested scope
        if isinstance(node, ast.Lambda):
            return
        if isinstance(node, ast.Import):
            for a in node.names:
                bound.add((a.asname or a.name).split(".")[0])
            return
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name != "*":
                    bound.add(a.asname or a.name)
            return
        if isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        if isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)
            return
        if isinstance(node, ast.MatchAs) and node.name:
            bound.add(node.name)
        if isinstance(node, ast.MatchStar) and node.name:
            bound.add(node.name)
        if isinstance(node, ast.MatchMapping) and node.rest:
            bound.add(node.rest)
        # comprehension targets formally live in their own scope, but
        # treating them as enclosing-scope bindings only loosens the check
        for child in ast.iter_child_nodes(node):
            walk(child)

    for n in body_nodes:
        walk(n)
    return bound


class ScopedUndefined:
    """pyflakes-style F821: resolve every loaded name against its scope
    chain (function locals -> enclosing functions -> module -> builtins).
    This is the check that would have caught rounds 1-3's NameErrors-in-
    fallback-paths: a name bound only inside ANOTHER function no longer
    satisfies a load here. Annotation subtrees are skipped (string/forward
    annotations are never evaluated under `from __future__ import
    annotations`)."""

    def __init__(self):
        self.problems: list[tuple[int, str]] = []
        self.has_star_import = False

    def check_module(self, tree: ast.Module):
        for n in ast.walk(tree):
            if isinstance(n, ast.ImportFrom) and any(
                    a.name == "*" for a in n.names):
                self.has_star_import = True
                return
        self._check_body(tree.body, [_local_bindings(tree.body)])

    def _check_body(self, body, chain):
        for stmt in body:
            self._visit(stmt, chain)

    def _visit(self, node, chain):
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load):
                name = node.id
                if (name not in _BUILTIN_NAMES
                        and not any(name in s for s in chain)):
                    self.problems.append(
                        (node.lineno, f"undefined name '{name}'"))
            return
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.decorator_list:
                self._visit(d, chain)
            for default in node.args.defaults + [
                    d for d in node.args.kw_defaults if d is not None]:
                self._visit(default, chain)
            local = _local_bindings(node.body) | set(_arg_names(node.args))
            self._check_body(node.body, [local] + chain)
            return
        if isinstance(node, ast.Lambda):
            for default in node.args.defaults + [
                    d for d in node.args.kw_defaults if d is not None]:
                self._visit(default, chain)
            local = (set(_arg_names(node.args))
                     | _local_bindings([node.body]))
            self._visit(node.body, [local] + chain)
            return
        if isinstance(node, ast.ClassDef):
            for d in node.decorator_list:
                self._visit(d, chain)
            for b in node.bases + node.keywords:
                self._visit(b, chain)
            # class scope IS visible to loads directly in the class body;
            # it is NOT visible inside methods — but methods get the class
            # body's bindings dropped because we push a fresh chain entry
            # only for the class body itself
            local = _local_bindings(node.body)
            self._check_body(node.body, [local] + chain)
            return
        if isinstance(node, (ast.GeneratorExp, ast.ListComp, ast.SetComp,
                             ast.DictComp)):
            # comprehension targets already live in the enclosing binding
            # set (see _local_bindings); just recurse
            for child in ast.iter_child_nodes(node):
                self._visit(child, chain)
            return
        returns = getattr(node, "returns", None)
        annotation = getattr(node, "annotation", None)
        for child in ast.iter_child_nodes(node):
            if child is returns or child is annotation:
                continue               # annotations never evaluate
            self._visit(child, chain)


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
    # undefined names (scope-aware; skipped entirely under `from x import *`)
    sc = ScopedUndefined()
    sc.check_module(tree)
    seen = set()
    for lineno, msg in sc.problems:
        line = lines[lineno - 1] if lineno <= len(lines) else ""
        if "noqa" in line or (lineno, msg) in seen:
            continue
        seen.add((lineno, msg))
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
