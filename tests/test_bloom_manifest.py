"""Bloom-filter key manifests (Iceberg puffin-blob analog): point
lookups must skip commits whose key bounds straddle the key without
containing it, with zero false negatives ever."""

from __future__ import annotations

import json

import pytest

from mongodb_iceberg_sync_spark.sync.table_store import MANIFEST, MorTable


def _mk_batch(spark, keys, seq0):
    return spark.createDataFrame(
        [(k, seq0 + i, "upsert", json.dumps({"v": k})) for i, k in enumerate(keys)],
        "doc_id string, _op_seq long, _op string, full_doc string",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "bloom_tbl"), key="doc_id")
    # overlapping [min,max] ranges: range pruning alone cannot separate
    # these commits, only the bloom can
    t.commit_batch(_mk_batch(spark, ["a", "z"], 0), 0)
    t.commit_batch(_mk_batch(spark, ["b", "y"], 10), 1)
    t.commit_batch(_mk_batch(spark, ["c", "x"], 20), 2)
    return t


def test_point_lookup_prunes_by_bloom(table):
    # key "b" is inside every commit's [min,max]; only commit 1 has it
    assert len(table.prune_batches("b", "b")) == 1
    assert table.prune_batches("b", "b")[0].endswith("batch=1")


def test_lookup_returns_correct_row_after_pruning(table):
    rows = table.lookup("x").collect()
    assert len(rows) == 1 and json.loads(rows[0].full_doc) == {"v": "x"}
    missing = table.lookup("nope")  # every commit pruned → empty table view
    assert missing is None or missing.count() == 0


def test_no_false_negatives_for_any_present_key(table):
    for k in ["a", "b", "c", "x", "y", "z"]:
        dirs = table.prune_batches(k, k)
        assert any(
            k in {"a", "z"} and d.endswith("batch=0")
            or k in {"b", "y"} and d.endswith("batch=1")
            or k in {"c", "x"} and d.endswith("batch=2")
            for d in dirs
        ), f"commit holding {k!r} was pruned"
        assert table.lookup(k).count() == 1


def test_range_scans_ignore_bloom(table):
    # lo != hi: bloom must not fire (it only answers point membership)
    assert len(table.prune_batches("a", "c")) == 3


def test_legacy_manifest_without_bloom_is_kept(spark, table):
    # strip the bloom from commit 2's manifest — planning must keep it
    # for any point key inside its [c, x] bounds, while commits 0 and 1
    # (bloom intact, key absent) are still skipped
    p = f"{table.delta_dir}/batch=2/{MANIFEST}"
    m = json.load(open(p))
    m.pop("bloom"), m.pop("bloom_bits")
    with open(p, "w") as f:
        json.dump(m, f)
    dirs = table.prune_batches("e", "e")  # in-bounds for all 3 commits
    assert {d.rsplit("=", 1)[1] for d in dirs} == {"2"}


def test_python_positions_match_spark_cast_for_supported_types(spark):
    # differential pin: for the SUPPORTED key types (str, int) the
    # Python-side renderer must agree byte-for-byte with Spark's
    # CAST(key AS STRING) that built the manifest bitmap
    from pyspark.sql import functions as F

    str_vals = ["abc", "", "True", "1.0E7"]
    int_vals = [0, -5, 123456789012345]
    rendered = {}
    for vals, typ in ((str_vals, "string"), (int_vals, "long")):
        df = spark.createDataFrame([(v,) for v in vals], f"k {typ}")
        rendered.update(
            (r.orig, r.s)
            for r in df.select(
                F.col("k").alias("orig"), F.col("k").cast("string").alias("s")
            ).collect()
        )
    vals = str_vals + int_vals
    import hashlib

    for v in vals:
        got = MorTable._bloom_positions(v)
        h = hashlib.md5(rendered[v].encode()).hexdigest()
        want = [
            int(h[s - 1 : s - 1 + ln], 16) % MorTable._BLOOM_BITS
            for s, ln in MorTable._BLOOM_SLICES
        ]
        assert got == want, v


def test_unsupported_key_types_never_skip(spark, tmp_path):
    # bool/float/decimal render differently in Python vs Spark's string
    # cast ('True' vs 'true', '10000000.0' vs '1.0E7'); the bloom must
    # refuse to hash them (None -> maybe-present) instead of risking a
    # false-negative skip
    from decimal import Decimal

    for v in (True, False, 1e7, 0.5, Decimal("1.5"), b"xx", None):
        assert MorTable._bloom_positions(v) is None

    # end-to-end: a float-keyed table still finds every key it holds
    t = MorTable(spark, str(tmp_path / "float_tbl"), key="fk")
    t.commit_batch(
        spark.createDataFrame(
            [(1e7, 1, "upsert"), (0.5, 2, "upsert")],
            "fk double, _op_seq long, _op string",
        ),
        0,
    )
    got = t.lookup(1e7)
    assert got is not None and got.count() == 1
