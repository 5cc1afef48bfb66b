"""Analyst reporting walkthrough, runnable standalone:

    python examples/analyst_reporting.py [sf_dir=/root/testdata/sf0.01]

Runs the composite reporting surface an analyst would point at the
synced lake — the TPC-H-style suite plus the statistics operators —
and prints each result. Every query here is oracle-checked in the
driver gate (see OPERATORS.md); this script is the human-readable
tour of the same registry entries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_iceberg_sync_spark.registry import all_specs
from mongodb_iceberg_sync_spark.session import get_spark

TOUR = [
    ("q_tpch_q3", "Top unshipped orders by revenue (shipping priority)"),
    ("q_tpch_q5", "Revenue by nation for local suppliers in ASIA"),
    ("q_tpch_q10", "Top customers by returned-item revenue"),
    ("q_tpch_q14", "Promotional revenue share for one month"),
    ("q_tpch_q18", "Large-volume customers"),
    ("q_tpch_q19", "Discounted revenue across brand/size/qty bands"),
    ("q_agg_weighted_median", "Quantity-weighted median price per flag"),
    ("q_agg_gini", "Order-value concentration (Gini) per priority"),
    ("q_agg_benford", "Benford first-digit audit of order values"),
    ("q_agg_ttest", "Welch t-test: click vs purchase values"),
    ("q_agg_ols", "OLS: price ~ quantity + discount (one aggregation)"),
    ("q_events_attribution", "Linear multi-touch click attribution"),
    ("q_window_rolling_features", "Trailing 24h/7d per-user features"),
    # round-4 causal / feature / forecasting additions
    ("q_events_did", "Difference-in-differences over the hash-assigned A/B"),
    ("q_events_decay", "Half-life-decayed engagement score (exact 2^-k)"),
    ("q_timeseries_backtest", "Seasonal-naive forecast backtest (MAE)"),
    ("q_graph_common_neighbors", "Supplier similarity by shared customers"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="mis-analyst-demo")
    specs = all_specs()
    for name, blurb in TOUR:
        df = specs[name].func(spark, sf_dir)
        print(f"\n== {name}: {blurb}")
        df.show(5, truncate=100)
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
