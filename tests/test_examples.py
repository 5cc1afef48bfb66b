"""The runnable examples must stay runnable — they are the repo's
human-facing tour and rot silently otherwise. Each runs in a
subprocess at the smallest SF."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_lakehouse_maintenance_example(tmp_path):
    r = _run(["examples/lakehouse_maintenance.py", str(tmp_path / "lake")])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "OK" in r.stdout


def test_analyst_reporting_example():
    r = _run(["examples/analyst_reporting.py", "/root/testdata/sf0.001"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "OK" in r.stdout
