"""Dev tool: solo-time named queries at a given SF dir (guide §1).

Times each query through the same noop sink bench.py uses (min of
--runs), after the same warm-up, and optionally dumps
.explain("formatted") to a directory — the per-query measurement loop
for optimization rounds, without paying for a full 289-query capture.

  python tools/solo_time.py q_a q_b [--sf-dir=/root/testdata/sf0.1]
      [--runs=2] [--plan-dir=plans/r11] [--suffix=_before]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_iceberg_sync_spark.registry import all_specs
from mongodb_iceberg_sync_spark.session import get_spark


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    plan_dir = None
    suffix = ""
    known = ("--sf-dir=", "--runs=", "--plan-dir=", "--suffix=")
    for a in sys.argv[1:]:
        if a.startswith("--") and not a.startswith(known):
            print(f"unknown flag: {a} (known: {', '.join(known)})", file=sys.stderr)
            return 2
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--plan-dir="):
            plan_dir = a.split("=", 1)[1]
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="mis-solo")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].func(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    for _ in range(2):
        for warm in ("q_agg_groupby", "q_join_shuffle", "q_udf_map_arrow"):
            run_once(warm)
    canary = min(run_once("q_agg_groupby") for _ in range(2))
    print(f"canary q_agg_groupby {canary:.3f}s")
    for name in names:
        spark.sparkContext.setJobDescription(name)
        best = min(run_once(name) for _ in range(runs))
        print(f"{best:8.3f}s  {name}")
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = specs[name].func(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(plan)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
