#!/usr/bin/env python3
"""Snapshot gate: lint + full test suite; nonzero exit on any failure.

Rounds 2 and 3 each shipped a red suite in the end-of-round snapshot
(an undefined name in an untested fallback path both times). This script is
the gate: run it before committing a milestone or cutting a snapshot —

    python tools/preflight.py            # lint + full suite
    python tools/preflight.py --fast     # lint + non-slow tests

It runs the scope-aware undefined-name lint first (fails fast on the exact
bug class that shipped), then pytest on the CPU mesh harness.
"""
import subprocess
import sys


def run(cmd: list) -> int:
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd)


def main(argv) -> int:
    fast = "--fast" in argv
    rc = run([sys.executable, "tools/lint.py"])
    if rc:
        print("preflight: LINT FAILED", flush=True)
        return rc
    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if fast:
        pytest_cmd += ["-m", "not slow"]
    rc = run(pytest_cmd)
    if rc:
        print("preflight: TESTS FAILED", flush=True)
        return rc
    print("preflight: green", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
