"""Dev tool: mimic the driver's correctness sweep with per-query timing.

Runs every registered query at the given SF dir (default sf0.01), runs
the DuckDB oracle side-by-side, and prints per-query wall time + status.
Use this to keep the full 77-query sweep inside the driver's budget.

  python tools/sweep.py [sf_dir] [--only name1,name2] [--families f1,f2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from mongodb_iceberg_sync_spark import registry
from mongodb_iceberg_sync_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = None
    families = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--families="):
            families = set(a.split("=", 1)[1].split(","))

    from parity import compare_frames, duck_connection

    spark = get_spark(app_name="mis-sweep")
    con = duck_connection(sf_dir)
    specs = registry.all_specs()

    t_total = time.time()
    results = {}
    failures = 0
    for name, spec in specs.items():  # registration order == driver order
        if only and name not in only:
            continue
        if families and spec.family not in families:
            continue
        t0 = time.time()
        status = "ok"
        problems: list[str] = []
        try:
            sdf = spec.func(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            if spec.oracle:
                duck_pdf = con.execute(spec.oracle).fetchdf()
                problems = compare_frames(spark_pdf, duck_pdf, name)
                if problems:
                    status = "MISMATCH"
                    failures += 1
            else:
                status = f"rows-only({len(spark_pdf)})"
        except Exception as e:  # noqa: BLE001
            status = f"ERROR: {type(e).__name__}: {e}"
            failures += 1
        dt = time.time() - t0
        results[name] = dt
        print(f"{dt:7.2f}s  {name:32s} {status}")
        for p in problems[:4]:
            print(f"         | {p}")
    total = time.time() - t_total
    print(f"\nTOTAL {total:.1f}s for {len(results)} queries, {failures} MISMATCH/ERROR")
    slow = sorted(results.items(), key=lambda kv: -kv[1])[:10]
    print("slowest:", json.dumps({k: round(v, 2) for k, v in slow}))
    # Nonzero exit on any broken query so CI / the verify recipe fail loudly.
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
