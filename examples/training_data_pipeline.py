"""End-to-end training-data pipeline, runnable standalone:

    python examples/training_data_pipeline.py \
        [sf_dir=/root/testdata/sf0.01] [out_dir=/tmp/mis_training_out]

Composes the engine's operators the way a real corpus build would:

  1. quality filter     — C4-style thresholds (map-side predicate)
  1b. PII redaction     — email/phone/IPv4 masking (map-only regex)
  1c. LM-score filter   — char-trigram log-prob; drop the lowest decile
  2. exact dedup        — sha256 groupBy, keep smallest doc_id
  3. near-dup clusters  — n-gram Jaccard pairs -> connected components;
                          keep one representative per cluster
  4. sequence packing   — docs -> ~2048-token shards (prefix-sum)
  5. shard write        — parquet partitioned by shard_id

Every step is a pure DataFrame transform from the registered operator
library, so the same chain runs inside foreachBatch for a continuously
updated corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.operators.dedup import _ngram_jaccard_pairs
from mongodb_iceberg_sync_spark.session import get_spark
from mongodb_iceberg_sync_spark.tables import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mis_training_out"
    spark = get_spark(app_name="mis-training-pipeline")

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality filter (see operators.text / q_text_quality_filter)
    toks = F.split("text", " ")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    clean = docs.filter((F.size(toks) >= 20) & (ttr > 0.3))

    # 1b. PII redaction (see operators.text / q_text_pii_redact):
    # map-only regexes, applied before anything downstream sees text
    from mongodb_iceberg_sync_spark.operators.text import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
    )

    clean = clean.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", _PII_EMAIL, "[EMAIL]"),
                _PII_PHONE,
                "[PHONE]",
            ),
            _PII_IP,
            "[IP]",
        ),
    )

    # 1c. LM-score gate (see q_text_lm_score): train trigram stats on
    # the surviving corpus, drop the lowest-scoring decile (gibberish)
    grams = clean.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(lower(text)) - 2),"
                " i -> substring(lower(text), i, 3))"
            )
        ).alias("gram"),
    ).localCheckpoint(eager=False)
    model = grams.groupBy("gram").agg(F.count("*").alias("c"))
    total = model.agg(F.sum("c")).head()[0]
    scores = (
        grams.join(F.broadcast(model), "gram")
        .groupBy("doc_id")
        .agg((F.sum(F.log(F.col("c") / F.lit(total))) / F.count("*")).alias("lm"))
    )
    cutoff = scores.approxQuantile("lm", [0.1], 0.01)[0]
    clean = clean.join(
        scores.filter(F.col("lm") >= cutoff).select("doc_id"), "doc_id"
    )

    # 2. exact dedup: keep smallest doc_id per content hash
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    uniq = clean.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    # 3. near-dup clusters: jaccard pairs -> hash-min components ->
    #    keep the cluster representative (min doc_id)
    pairs = _ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionAll(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    labels = uniq.select("doc_id", F.col("doc_id").alias("cluster_id")).localCheckpoint(eager=True)
    # pointer-doubling (label-of-label) keeps rounds O(log diameter);
    # a non-converged exit raises rather than returning partial labels
    for _ in range(20):
        nbr = edges.join(labels, edges.doc_a == labels.doc_id).select(
            F.col("doc_b").alias("doc_id"), "cluster_id"
        )
        hop = (
            labels.alias("l1")
            .join(labels.alias("l2"), F.col("l1.cluster_id") == F.col("l2.doc_id"))
            .select(F.col("l1.doc_id").alias("doc_id"), F.col("l2.cluster_id").alias("cluster_id"))
        )
        new_labels = (
            labels.unionAll(nbr).unionAll(hop)
            .groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("dedup clustering did not converge in 20 rounds")
    keep = uniq.join(
        labels.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"), "doc_id"
    )

    # 4. pack into ~2048-token shards (exclusive prefix sum over doc order)
    sized = keep.withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
    wp = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = sized.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(wp) - F.col("n_tokens")) / 2048).cast("long"),
    )

    # 5. write, partitioned by shard
    packed.select("doc_id", "text", "lang", "source", "n_tokens", "shard_id").write.mode(
        "overwrite"
    ).partitionBy("shard_id").parquet(out_dir)

    n_in = docs.count()
    n_out = packed.count()
    n_shards = packed.select("shard_id").distinct().count()
    print(f"input={n_in} kept={n_out} shards={n_shards} -> {out_dir}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
