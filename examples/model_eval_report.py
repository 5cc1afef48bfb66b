"""Nightly model-evaluation report, runnable standalone:

    python examples/model_eval_report.py [sf_dir=/root/testdata/sf0.001]

The closing loop of the training-data engine: the same cluster that
prepares the corpus scores the model it produced. Composes the mleval
family the way an ML-platform nightly job would — one SparkSession,
every readout a registered operator (so each line of this report is
also differentially verified against the DuckDB oracle in the sweep):

  ranking      — AUC + KS separation (does the score order examples?)
  operating pt — confusion matrix, precision/recall/F1
  calibration  — 10-bin reliability table (is 0.7 really 70%?)
  targeting    — cumulative gains/lift walked from the top bin
  drift        — PSI between weekday and weekend traffic
  retrieval    — NDCG@10 + nearest-centroid accuracy over embeddings
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_iceberg_sync_spark.registry import all_specs
from mongodb_iceberg_sync_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="model-eval-report", master="local[8]", shuffle_partitions=8
    )
    q = all_specs()

    auc = q["q_ml_auc"].func(spark, sf_dir).head()
    ks = q["q_ml_ks_separation"].func(spark, sf_dir).head()
    conf = q["q_ml_confusion"].func(spark, sf_dir).head()
    cal = q["q_ml_calibration"].func(spark, sf_dir).collect()
    lift = q["q_ml_lift"].func(spark, sf_dir).collect()
    psi_rows = q["q_ml_psi"].func(spark, sf_dir).collect()
    ndcg = q["q_ml_ndcg"].func(spark, sf_dir).collect()
    ncc = q["q_ml_centroid_classify"].func(spark, sf_dir).collect()

    print("== ranking ==")
    print(f"AUC {auc.auc:.4f} over {auc.n_pos} pos / {auc.n_neg} neg; "
          f"KS {ks.ks:.4f}")
    print("== operating point ==")
    print(f"tp={conf.tp} fp={conf.fp} fn={conf.fn} tn={conf.tn} "
          f"precision={conf.precision_:.4f} recall={conf.recall_:.4f} "
          f"f1={conf.f1:.4f}")
    print("== calibration (bin, n, mean_pred, pos_rate) ==")
    for r in cal:
        print(f"  {r.bin:2d} {r.n:5d} {r.mean_pred:8.4f} {r.pos_rate:8.4f}")
    print("== gains/lift from top bin ==")
    for r in lift[:3]:
        print(f"  bin {r.bin}: gain {r.gain:.4f} lift {r.lift:.4f}")
    psi_total = sum(r.psi_term for r in psi_rows)
    print(f"== drift == PSI(weekday vs weekend) = {psi_total:.6f} "
          f"({'stable' if psi_total < 0.1 else 'investigate'})")
    mean_ndcg = sum(r.ndcg for r in ndcg) / len(ndcg) if ndcg else 0.0
    acc = (
        sum(r.n_correct for r in ncc) / sum(r.n_test for r in ncc) if ncc else 0.0
    )
    print(f"== retrieval == mean NDCG@10 {mean_ndcg:.4f}; "
          f"nearest-centroid accuracy {acc:.4f}")

    # sanity gates so the example fails loudly if the readouts degrade
    assert auc.n_pos > 0 and auc.n_neg > 0
    assert 0.0 <= auc.auc <= 1.0 and 0.0 <= ks.ks <= 1.0
    assert len(cal) >= 3 and len(lift) >= 3
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
