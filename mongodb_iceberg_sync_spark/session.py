"""SparkSession construction and tuning.

Scale rationale (100 TB target, tested on local[32]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join conversion replace hand-tuned partition counts.
- shuffle.partitions is a *starting* value; AQE coalesces down. On a real
  cluster this should be ~2-3x total cores; locally we default to the
  local parallelism.
- maxPartitionBytes 128MB aligns scan splits with the reference's flush
  target (reference BatchConfig.java:9 — 128 MB files).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session handed to us (the driver
# owns its own SparkSession; these must all be settable post-creation).
RUNTIME_CONFS: dict[str, str] = {
    # testdata events.parquet stores INT64 TIMESTAMP(NANOS); Spark refuses
    # it unless read as long (converted in tables.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle (naive µs).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # InferFiltersFromGenerate turns every explode(f(x)) into a pushed
    # filter size(f(x))>0 — duplicating the generator expression below
    # the repartition barrier, where it runs serially on the raw input
    # split. For compute-heavy array builders (shingling, minhash) that
    # doubles the dominant cost (observed 27.7s -> 9.8s on
    # q_dedup_ngram_jaccard at sf0.1); our exploded arrays are almost
    # never empty, so the inferred filter saves nothing.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by a real cluster
            pass
    return spark


def get_spark(
    app_name: str = "mis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # local mode: the driver JVM IS the executor — size it for all
        # local[N] task slots, not for a cluster driver's coordination
        # role (8g across 32 slots GC-thrashes on wide shuffles)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    # Integration lane: point SPARK_GRAFT_ICEBERG_JAR at an Iceberg Spark
    # runtime jar to light up the real-catalog tests
    # (tests/test_catalog.py::test_iceberg_live_catalog_roundtrip) — the
    # sandbox ships no jar, so this is a no-op here and the tests skip.
    iceberg_jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if iceberg_jar:
        builder = builder.config("spark.jars", iceberg_jar).config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
    return apply_runtime_confs(builder.getOrCreate())
