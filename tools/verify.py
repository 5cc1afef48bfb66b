"""One-command verification gate — run every correctness layer, exit
nonzero if ANY fails (VERDICT r4 task #7: a next session must not be
able to skip a layer).

  python tools/verify.py [--fast] [--bench]

Layers, in order (each already exits nonzero on failure):
  1. full differential sweep vs the DuckDB oracle at sf0.01
     (tools/sweep.py), executed from a cwd OUTSIDE the repo so
     pickle-by-reference UDF bugs can't hide behind the repo root
     being importable on workers;
  2. empty-input sweep — every registered query on zero-row tables
     (tools/empty_sweep.py);
  3. physical-plan pins (pytest tests/test_plans.py);
  4. full pytest (skipped with --fast — layers 1-3 still run);
  5. bench.py smoke (only with --bench; timing runs must be SOLO, so
     it runs after everything else has finished).

Layer 1 is the driver contract; layers 2-4 are the regression net.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, argv: list[str], cwd: str) -> bool:
    print(f"\n=== verify: {label} (cwd={cwd}) ===", flush=True)
    rc = subprocess.call(argv, cwd=cwd)
    print(f"=== verify: {label} -> {'OK' if rc == 0 else f'FAIL rc={rc}'} ===", flush=True)
    return rc == 0


def main() -> int:
    fast = "--fast" in sys.argv
    bench = "--bench" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
    py = sys.executable
    failures: list[str] = []

    with tempfile.TemporaryDirectory(prefix="mis_verify_") as outside:
        steps: list[tuple[str, list[str], str]] = [
            ("oracle sweep (sf0.01, external cwd)",
             [py, os.path.join(REPO, "tools", "sweep.py"), sf_dir], outside),
            ("empty-input sweep",
             [py, os.path.join(REPO, "tools", "empty_sweep.py")], outside),
            ("plan pins",
             [py, "-m", "pytest", "tests/test_plans.py", "-q"], REPO),
        ]
        if not fast:
            steps.append(("full pytest", [py, "-m", "pytest", "tests/", "-q"], REPO))
        for label, argv, cwd in steps:
            if not _run(label, argv, cwd):
                failures.append(label)
        if bench and not failures:
            _run("bench smoke", [py, os.path.join(REPO, "bench.py")], REPO) or failures.append("bench")

    if failures:
        print(f"\nverify: FAILED layers: {failures}", flush=True)
        return 1
    print("\nverify: all layers green", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
