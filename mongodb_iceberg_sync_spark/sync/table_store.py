"""Merge-on-read key-value table on plain parquet (reference A12-A15).

The reference targets Iceberg merge-on-read: upsert = equality-delete
old row + append new; delete = equality-delete (reference
docs/design.md:291-300). No Iceberg runtime jar ships in this
environment, so this module re-creates the same semantics on bare
parquet, structured exactly like Iceberg would:

  {table}/base/            — compacted data files ("data files")
  {table}/deltas/batch=N/  — per-commit upsert+tombstone files
                             ("equality delete files" + appended rows)

- Read  = base ∪ deltas, last-writer-wins by (key, op_seq), tombstones
  dropped — i.e. the MoR merge an Iceberg reader performs.
- Write = one delta directory per batch_id; replaying a batch
  overwrites the same directory ⇒ idempotent commits (reference A21
  at-least-once protocol, docs/design.md:339-348).
- Compact = rewrite base from the merged view, clear deltas (reference
  A24 RewriteDataFiles, docs/design.md:394-400).

Scale: the merged view is one shuffle on the key (max_by aggregation,
partial-aggregatable map-side). With Iceberg jars on a real cluster,
SparkCatalog + MERGE INTO replaces this file-level bookkeeping 1:1 —
the apply/backfill layers only depend on the upsert/delete/read
contract, so swapping backends is a constructor change.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_SEQ = "_op_seq"  # total order of applied ops (resume-token position)
OP_TYPE = "_op"  # upsert | delete
TOMBSTONE = "delete"
MANIFEST = "_manifest.json"  # per-commit key min/max stats (data skipping)


class MorTable:
    """A keyed merge-on-read table rooted at a directory."""

    def __init__(self, spark: SparkSession, path: str, key: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = key
        os.makedirs(self.base_dir, exist_ok=True)
        os.makedirs(self.delta_dir, exist_ok=True)

    @property
    def base_dir(self) -> str:
        return f"{self.path}/base"

    @property
    def delta_dir(self) -> str:
        return f"{self.path}/deltas"

    @property
    def archive_dir(self) -> str:
        return f"{self.path}/archive"

    # -- write path ---------------------------------------------------

    def append_base(self, df: DataFrame) -> None:
        """Backfill append (reference A15): rows land in base directly,
        stamped as op_seq=0 upserts."""
        (
            df.withColumn(OP_SEQ, F.lit(0).cast("long"))
            .withColumn(OP_TYPE, F.lit("upsert"))
            .write.mode("append")
            .parquet(self.base_dir)
        )

    def commit_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Apply one CDC micro-batch (upserts + deletes), idempotently.

        batch_df must carry [key, OP_SEQ, OP_TYPE, payload...]. A
        replayed batch_id overwrites its own delta directory — the
        Spark-native version of the reference's commit-ordering
        protocol (A21): state converges no matter how often the batch
        replays.
        """
        target = f"{self.delta_dir}/batch={batch_id}"
        batch_df.write.mode("overwrite").parquet(target)
        self._write_manifest(target, batch_df)

    def _write_manifest(self, target: str, df: DataFrame) -> None:
        """Iceberg-manifest analog: per-commit key min/max stats.

        Iceberg's scan planning skips data files whose column bounds
        cannot satisfy the predicate; the same contract here at
        commit-dir granularity. One tiny agg job per commit (the stats
        ride the write, not the read path). Stats are advisory — a
        missing manifest only disables skipping for that commit.
        """
        row = df.agg(
            F.min(self.key).alias("lo"), F.max(self.key).alias("hi")
        ).head()
        with open(f"{target}/{MANIFEST}", "w") as f:
            json.dump({"key": self.key, "min": row.lo, "max": row.hi}, f)

    def _manifest_bounds(self, target: str):
        try:
            with open(f"{target}/{MANIFEST}") as f:
                m = json.load(f)
            return m["min"], m["max"]
        except (OSError, ValueError, KeyError):
            return None

    def prune_batches(self, lo=None, hi=None, as_of_batch: int | None = None) -> list[str]:
        """Scan planning: delta commit dirs that can contain keys in
        [lo, hi] (either bound may be None) at or before as_of_batch.
        Dirs without a manifest are conservatively kept."""
        out = []
        for d in sorted(os.listdir(self.delta_dir)):
            if not d.startswith("batch="):
                continue
            if as_of_batch is not None and int(d.split("=", 1)[1]) > as_of_batch:
                continue
            path = f"{self.delta_dir}/{d}"
            bounds = self._manifest_bounds(path)
            if bounds is not None:
                b_lo, b_hi = bounds
                if b_lo is None:  # empty commit
                    continue
                if lo is not None and b_hi < lo:
                    continue
                if hi is not None and b_lo > hi:
                    continue
            out.append(path)
        return out

    # -- read path ----------------------------------------------------

    def _raw(
        self, lo=None, hi=None, as_of_batch: int | None = None
    ) -> DataFrame | None:
        parts = []
        if any(f.endswith(".parquet") for _, _, fs in os.walk(self.base_dir) for f in fs):
            base = self.spark.read.parquet(self.base_dir)
            if lo is not None:
                base = base.filter(F.col(self.key) >= lo)
            if hi is not None:
                base = base.filter(F.col(self.key) <= hi)
            parts.append(base)
        delta_batches = self.prune_batches(lo, hi, as_of_batch)
        if delta_batches:
            deltas = self.spark.read.option("mergeSchema", "true").parquet(
                *delta_batches
            )
            # manifests prune whole commits; the residual filter makes
            # the row-level predicate exact (and pushes to the scan)
            if lo is not None:
                deltas = deltas.filter(F.col(self.key) >= lo)
            if hi is not None:
                deltas = deltas.filter(F.col(self.key) <= hi)
            parts.append(deltas)
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return df

    def snapshot(
        self, lo=None, hi=None, as_of_batch: int | None = None
    ) -> DataFrame | None:
        """LWW state: max op_seq per key wins; tombstones drop.

        Uses max_by(struct(all), op_seq) — a hash aggregation with
        map-side partials (no sort, no window) — the shape that holds
        at 100 TB.

        ``lo``/``hi`` bound the KEY (manifest stats skip whole commit
        dirs before any file is opened — the Iceberg data-skipping
        contract). ``as_of_batch`` reads the table VERSION AS OF that
        commit (Iceberg time travel); only valid back to the last
        compact(), which folds deltas into base like ExpireSnapshots.
        """
        latest = self._latest(lo, hi, as_of_batch)
        if latest is None:
            return None
        return latest.filter(F.col(OP_TYPE) != TOMBSTONE).drop(OP_TYPE, OP_SEQ)

    def _latest(
        self, lo=None, hi=None, as_of_batch: int | None = None
    ) -> DataFrame | None:
        """Per-key winning row INCLUDING op metadata (op type + seq)."""
        raw = self._raw(lo, hi, as_of_batch)
        if raw is None:
            return None
        payload = [c for c in raw.columns if c not in (OP_SEQ, OP_TYPE)]
        row = F.struct(*[F.col(c) for c in payload], F.col(OP_TYPE), F.col(OP_SEQ))
        return (
            raw.groupBy(self.key)
            .agg(F.max_by(row, F.col(OP_SEQ)).alias("_row"))
            .select(
                *[F.col(f"_row.{c}").alias(c) for c in payload],
                F.col(f"_row.{OP_TYPE}"),
                F.col(f"_row.{OP_SEQ}"),
            )
        )

    def changes(
        self, from_batch: int, to_batch: int | None = None
    ) -> DataFrame | None:
        """Change data feed between two versions (Iceberg CDF /
        incremental-read analog): insert/update/delete rows with the
        post-image payload, diffing VERSION AS OF ``from_batch``
        against ``to_batch`` (None = current). One full-outer join on
        the key; unchanged keys (same winning op_seq) drop out."""
        new = self._latest(as_of_batch=to_batch)
        if new is None:
            return None
        old = self._latest(as_of_batch=from_batch)
        live = F.col(OP_TYPE) != TOMBSTONE
        payload = [c for c in new.columns if c not in (OP_SEQ, OP_TYPE, self.key)]
        if old is None:
            return new.filter(live).select(
                self.key,
                F.lit("insert").alias("change_type"),
                *payload,
            )
        o = old.filter(live).select(self.key, OP_SEQ).alias("o")
        n = new.filter(live).alias("n")
        j = n.join(o, F.col(f"n.{self.key}") == F.col(f"o.{self.key}"), "full")
        return j.filter(
            F.col(f"o.{self.key}").isNull()
            | F.col(f"n.{self.key}").isNull()
            | (F.col(f"o.{OP_SEQ}") != F.col(f"n.{OP_SEQ}"))
        ).select(
            F.coalesce(F.col(f"n.{self.key}"), F.col(f"o.{self.key}")).alias(self.key),
            F.when(F.col(f"o.{self.key}").isNull(), "insert")
            .when(F.col(f"n.{self.key}").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            *[F.col(f"n.{c}").alias(c) for c in payload],
        )

    # -- maintenance --------------------------------------------------

    def _generations(self) -> list[str]:
        if not os.path.isdir(self.archive_dir):
            return []
        return sorted(
            d for d in os.listdir(self.archive_dir) if d.startswith("gen=")
        )

    def compact(self) -> None:
        """Rewrite base from the merged snapshot; clear deltas
        (reference A24 RewriteDataFiles, docs/design.md:394-400).

        The superseded base generation is ARCHIVED, not deleted —
        Iceberg keeps old snapshots' files reachable until
        ExpireSnapshots runs; expire_snapshots() is that step here."""
        snap = self.snapshot()
        tmp = f"{self.path}/.compact_tmp"
        if snap is None:
            return
        (
            snap.withColumn(OP_SEQ, F.lit(0).cast("long"))
            .withColumn(OP_TYPE, F.lit("upsert"))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        gens = self._generations()
        next_gen = int(gens[-1].split("=")[1]) + 1 if gens else 0
        os.makedirs(self.archive_dir, exist_ok=True)
        os.rename(self.base_dir, f"{self.archive_dir}/gen={next_gen:06d}")
        os.rename(tmp, self.base_dir)
        shutil.rmtree(self.delta_dir, ignore_errors=True)
        os.makedirs(self.delta_dir, exist_ok=True)

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Retention-based snapshot expiry (reference A25,
        docs/design.md:399 ExpireSnapshots): drop archived base
        generations beyond the newest keep_last. Never touches the live
        base/deltas — the current snapshot is unaffected. Returns the
        number of generations removed."""
        gens = self._generations()
        doomed = gens[: max(0, len(gens) - keep_last)] if keep_last > 0 else gens
        for d in doomed:
            shutil.rmtree(f"{self.archive_dir}/{d}", ignore_errors=True)
        return len(doomed)

    def truncate(self) -> None:
        """Drop all data (used by re-initial-sync, reference A23)."""
        shutil.rmtree(self.base_dir, ignore_errors=True)
        shutil.rmtree(self.delta_dir, ignore_errors=True)
        shutil.rmtree(self.archive_dir, ignore_errors=True)
        os.makedirs(self.base_dir, exist_ok=True)
        os.makedirs(self.delta_dir, exist_ok=True)
