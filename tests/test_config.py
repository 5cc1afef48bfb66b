"""Config-layer parity with the reference's implemented test suite
(reference src/test/java/.../config/ConfigLoaderTest.java:20-139 —
the four behaviors documented in FIXTURES.md §2)."""

from __future__ import annotations

import os

import pytest

from mongodb_iceberg_sync_spark.sync.config import (
    DEFAULT_FLUSH_SECONDS,
    DEFAULT_MAX_BYTES,
    DEFAULT_MAX_RECORDS,
    ConfigError,
    load_config,
)

VALID_YAML = """
mongodb:
  uri: mongodb://localhost:27017
  database: appdb
iceberg:
  catalog:
    type: local
    warehouse: /tmp/warehouse
  properties:
    commit.retry.num-retries: "5"
collections:
  - source:
      collection: users
    target:
      namespace: lake
      table: users
    mapping:
      mode: auto
    partitioning:
      - field: created_at
        transform: month
    batch:
      maxRecords: 10
      maxBytes: 100
      flushIntervalSeconds: 5
"""


def _write(tmp_path, text):
    p = tmp_path / "config.yaml"
    p.write_text(text)
    return str(p)


def test_valid_config_parses(tmp_path):
    cfg = load_config(_write(tmp_path, VALID_YAML))
    assert cfg.mongodb.uri == "mongodb://localhost:27017"
    assert cfg.mongodb.database == "appdb"
    assert cfg.iceberg.catalog.type == "local"
    assert cfg.iceberg.catalog.warehouse == "/tmp/warehouse"
    assert cfg.iceberg.properties["commit.retry.num-retries"] == "5"
    c = cfg.collections[0]
    assert c.source_collection == "users"
    assert (c.target_namespace, c.target_table) == ("lake", "users")
    assert c.mapping.mode == "auto"
    assert c.partitioning[0].fld == "created_at"
    assert c.partitioning[0].transform == "month"
    assert (c.batch.max_records, c.batch.max_bytes, c.batch.flush_interval_seconds) == (
        10,
        100,
        5,
    )


def test_missing_required_field_path_addressed(tmp_path):
    bad = VALID_YAML.replace("  uri: mongodb://localhost:27017\n", "")
    with pytest.raises(ConfigError, match="mongodb.uri is required"):
        load_config(_write(tmp_path, bad))


def test_defaults_applied(tmp_path):
    minimal = """
mongodb:
  uri: mongodb://localhost:27017
  database: appdb
iceberg:
  catalog:
    type: local
    warehouse: /tmp/warehouse
collections:
  - source:
      collection: users
    target:
      namespace: lake
      table: users
"""
    cfg = load_config(_write(tmp_path, minimal))
    c = cfg.collections[0]
    assert c.mapping.mode == "auto"
    assert c.mapping.fields == ()
    assert c.partitioning == ()
    assert c.batch.max_records == DEFAULT_MAX_RECORDS == 50000
    assert c.batch.max_bytes == DEFAULT_MAX_BYTES == 134217728
    assert c.batch.flush_interval_seconds == DEFAULT_FLUSH_SECONDS == 60
    assert cfg.iceberg.properties == {}


def test_env_substitution(tmp_path, monkeypatch):
    monkeypatch.setenv("MIS_TEST_HOME", "/data/home")
    yaml_text = VALID_YAML.replace("/tmp/warehouse", "${MIS_TEST_HOME}/iceberg")
    cfg = load_config(_write(tmp_path, yaml_text))
    assert cfg.iceberg.catalog.warehouse == "/data/home/iceberg"

    monkeypatch.delenv("MIS_UNSET_VAR_XYZ", raising=False)
    bad = VALID_YAML.replace("/tmp/warehouse", "${MIS_UNSET_VAR_XYZ}/iceberg")
    with pytest.raises(ConfigError, match="MIS_UNSET_VAR_XYZ"):
        load_config(_write(tmp_path, bad))


def test_unknown_keys_rejected(tmp_path):
    bad = VALID_YAML + "\nsurprise: true\n"
    with pytest.raises(ConfigError, match="unknown keys"):
        load_config(_write(tmp_path, bad))


def test_explicit_mode_requires_fields(tmp_path):
    bad = VALID_YAML.replace("mode: auto", "mode: explicit")
    with pytest.raises(ConfigError, match="explicit mapping requires"):
        load_config(_write(tmp_path, bad))


def test_invalid_transform_rejected(tmp_path):
    bad = VALID_YAML.replace("transform: month", "transform: weekly")
    with pytest.raises(ConfigError, match="transform"):
        load_config(_write(tmp_path, bad))


def test_bucket_transform_accepted(tmp_path):
    ok = VALID_YAML.replace("transform: month", "transform: bucket[16]")
    cfg = load_config(_write(tmp_path, ok))
    assert cfg.collections[0].partitioning[0].transform == "bucket[16]"


def test_errors_quarantine_dir_parses(tmp_path):
    import yaml

    from mongodb_iceberg_sync_spark.sync.config import load_config

    cfg = {
        "mongodb": {"uri": "mongodb://h", "database": "db"},
        "iceberg": {"catalog": {"type": "local", "warehouse": "/tmp/w"}},
        "collections": [
            {
                "source": {"collection": "c1"},
                "target": {"namespace": "ns", "table": "t1"},
                "errors": {"quarantineDir": "/tmp/dlq/t1"},
            },
            {
                "source": {"collection": "c2"},
                "target": {"namespace": "ns", "table": "t2"},
            },
        ],
    }
    f = tmp_path / "c.yaml"
    f.write_text(yaml.safe_dump(cfg))
    parsed = load_config(str(f))
    assert parsed.collections[0].quarantine_dir == "/tmp/dlq/t1"
    assert parsed.collections[1].quarantine_dir is None


def test_errors_unknown_key_rejected(tmp_path):
    import pytest
    import yaml

    from mongodb_iceberg_sync_spark.sync.config import ConfigError, load_config

    cfg = {
        "mongodb": {"uri": "mongodb://h", "database": "db"},
        "iceberg": {"catalog": {"type": "local", "warehouse": "/tmp/w"}},
        "collections": [
            {
                "source": {"collection": "c1"},
                "target": {"namespace": "ns", "table": "t1"},
                "errors": {"quarantineDir": "/x", "retryBadEvents": True},
            }
        ],
    }
    f = tmp_path / "c.yaml"
    f.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ConfigError):
        load_config(str(f))
