"""PySpark-native analytics + CDC/sync engine.

A brand-new engine with the capabilities of the reference
(luketn/mongodb-iceberg-sync — a MongoDB→Iceberg CDC daemon, spec at
reference docs/design.md) re-expressed Spark-first, plus a full batch /
streaming relational query surface and LLM-data-pipeline operators.

Layout:
  session.py   — SparkSession construction/tuning (AQE, shuffle sizing)
  tables.py    — test-table loaders (handles the ns-timestamp parquet quirk)
  registry.py  — query registry powering the driver contract
  operators/   — pure DataFrame→DataFrame operator library (SURVEY.md §2B)
  functions/   — reusable column expression builders (vector math, text)
  sources/     — batch/streaming sources incl. a synthetic CDC feed
  streaming/   — Structured Streaming operators (windows, dedup, state, sink)
  sync/        — the CDC sync engine (config, checkpoint, backfill, apply,
                 state machine) mirroring reference docs/design.md semantics
"""

__version__ = "0.1.0"
