"""YAML sync-config loader (reference operator A35).

Behavior parity with the reference's only fully-implemented component
(reference src/main/java/.../config/ConfigLoader.java:30-97 and
ConfigLoaderTest.java:20-139):

  - YAML → typed config tree
  - ``${VAR}`` environment substitution, error if unset
    (ConfigLoader.java:91)
  - defaults cascade: mapping.mode=auto, fields=[], partitioning=[],
    batch 50000 / 134217728 / 60s, properties={}
    (CollectionSyncConfig.java:16-28, BatchConfig.java:8-10)
  - strict unknown-key rejection (SyncConfig.java:7 ignoreUnknown=false)
  - path-addressed validation errors, e.g. "mongodb.uri is required"
    (ConfigLoaderTest.java:59-80)
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is in the base image
    yaml = None


class ConfigError(ValueError):
    pass


_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")

VALID_TRANSFORMS = {"identity", "year", "month", "day", "hour"} | {
    f"bucket[{n}]" for n in ()
}  # bucket[N] validated by regex below
_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")

DEFAULT_MAX_RECORDS = 50_000  # reference BatchConfig.java:8
DEFAULT_MAX_BYTES = 134_217_728  # reference BatchConfig.java:9
DEFAULT_FLUSH_SECONDS = 60  # reference BatchConfig.java:10


def _substitute_env(node: Any, path: str) -> Any:
    """Recursive ${VAR} substitution; unset var → path-addressed error."""
    if isinstance(node, str):

        def repl(m: re.Match) -> str:
            var = m.group(1)
            val = os.environ.get(var)
            if val is None:
                raise ConfigError(
                    f"{path}: environment variable '{var}' is not set"
                )
            return val

        return _ENV_RE.sub(repl, node)
    if isinstance(node, dict):
        return {k: _substitute_env(v, f"{path}.{k}" if path else str(k)) for k, v in node.items()}
    if isinstance(node, list):
        return [_substitute_env(v, f"{path}[{i}]") for i, v in enumerate(node)]
    return node


def _require(d: dict, key: str, path: str) -> Any:
    v = d.get(key)
    if v is None or (isinstance(v, str) and not v):
        raise ConfigError(f"{path}.{key} is required" if path else f"{key} is required")
    return v


def _reject_unknown(d: dict, allowed: set[str], path: str) -> None:
    unknown = set(d) - allowed
    if unknown:
        raise ConfigError(f"{path or 'config'}: unknown keys {sorted(unknown)}")


@dataclass(frozen=True)
class MongoConfig:
    uri: str
    database: str


@dataclass(frozen=True)
class CatalogConfig:
    type: str  # local | s3tables | rest (IcebergConfig.java:25-34)
    warehouse: str | None = None
    uri: str | None = None


@dataclass(frozen=True)
class IcebergConfig:
    catalog: CatalogConfig
    properties: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class FieldMapping:
    source: str  # dot-notation path
    target: str
    type: str | None = None  # forced cast (FieldMapping.java:6)


@dataclass(frozen=True)
class MappingConfig:
    mode: str = "auto"  # auto | explicit (MappingConfig.java:10-11)
    fields: tuple[FieldMapping, ...] = ()


@dataclass(frozen=True)
class PartitionSpec:
    fld: str
    transform: str  # identity|year|month|day|hour|bucket[N]


@dataclass(frozen=True)
class BatchConfig:
    max_records: int = DEFAULT_MAX_RECORDS
    max_bytes: int = DEFAULT_MAX_BYTES
    flush_interval_seconds: int = DEFAULT_FLUSH_SECONDS


@dataclass(frozen=True)
class CollectionSyncConfig:
    source_collection: str
    target_namespace: str
    target_table: str
    mapping: MappingConfig = field(default_factory=MappingConfig)
    partitioning: tuple[PartitionSpec, ...] = ()
    batch: BatchConfig = field(default_factory=BatchConfig)
    # errors.quarantineDir — dead-letter parquet for malformed events
    # (sync/quarantine.py); None disables the split entirely
    quarantine_dir: str | None = None


@dataclass(frozen=True)
class SyncConfig:
    mongodb: MongoConfig
    iceberg: IcebergConfig
    collections: tuple[CollectionSyncConfig, ...]


def _parse_mapping(d: dict | None, path: str) -> MappingConfig:
    if d is None:
        return MappingConfig()
    _reject_unknown(d, {"mode", "fields"}, path)
    mode = d.get("mode", "auto")
    if mode not in ("auto", "explicit"):  # MappingConfig.java:19
        raise ConfigError(f"{path}.mode must be 'auto' or 'explicit', got {mode!r}")
    fields_raw = d.get("fields") or []
    fields = []
    for i, f_ in enumerate(fields_raw):
        fp = f"{path}.fields[{i}]"
        _reject_unknown(f_, {"source", "target", "type"}, fp)
        fields.append(
            FieldMapping(
                source=_require(f_, "source", fp),
                target=_require(f_, "target", fp),
                type=f_.get("type"),
            )
        )
    if mode == "explicit" and not fields:  # MappingConfig.java:20-22
        raise ConfigError(f"{path}: explicit mapping requires non-empty fields")
    return MappingConfig(mode=mode, fields=tuple(fields))


def _parse_partitioning(lst: list | None, path: str) -> tuple[PartitionSpec, ...]:
    specs = []
    for i, p in enumerate(lst or []):
        pp = f"{path}[{i}]"
        _reject_unknown(p, {"field", "transform"}, pp)
        transform = _require(p, "transform", pp)
        if transform not in VALID_TRANSFORMS and not _BUCKET_RE.match(transform):
            raise ConfigError(
                f"{pp}.transform must be identity|year|month|day|hour|bucket[N], got {transform!r}"
            )
        specs.append(PartitionSpec(fld=_require(p, "field", pp), transform=transform))
    return tuple(specs)


def _parse_batch(d: dict | None, path: str) -> BatchConfig:
    if d is None:
        return BatchConfig()
    _reject_unknown(d, {"maxRecords", "maxBytes", "flushIntervalSeconds"}, path)
    cfg = BatchConfig(
        max_records=int(d.get("maxRecords", DEFAULT_MAX_RECORDS)),
        max_bytes=int(d.get("maxBytes", DEFAULT_MAX_BYTES)),
        flush_interval_seconds=int(d.get("flushIntervalSeconds", DEFAULT_FLUSH_SECONDS)),
    )
    for attr, label in (
        ("max_records", "maxRecords"),
        ("max_bytes", "maxBytes"),
        ("flush_interval_seconds", "flushIntervalSeconds"),
    ):  # BatchConfig.java:20-30
        if getattr(cfg, attr) <= 0:
            raise ConfigError(f"{path}.{label} must be positive")
    return cfg


def load_config_dict(raw: dict) -> SyncConfig:
    raw = _substitute_env(raw, "")
    _reject_unknown(raw, {"mongodb", "iceberg", "collections"}, "")
    mongo_raw = _require(raw, "mongodb", "")
    _reject_unknown(mongo_raw, {"uri", "database"}, "mongodb")
    mongo = MongoConfig(
        uri=_require(mongo_raw, "uri", "mongodb"),
        database=_require(mongo_raw, "database", "mongodb"),
    )
    ice_raw = _require(raw, "iceberg", "")
    _reject_unknown(ice_raw, {"catalog", "properties"}, "iceberg")
    cat_raw = _require(ice_raw, "catalog", "iceberg")
    _reject_unknown(cat_raw, {"type", "warehouse", "uri"}, "iceberg.catalog")
    cat_type = _require(cat_raw, "type", "iceberg.catalog")
    if cat_type not in ("local", "s3tables", "rest"):  # IcebergConfig.java:25-34
        raise ConfigError(
            f"iceberg.catalog.type must be local|s3tables|rest, got {cat_type!r}"
        )
    catalog = CatalogConfig(
        type=cat_type, warehouse=cat_raw.get("warehouse"), uri=cat_raw.get("uri")
    )
    iceberg = IcebergConfig(
        catalog=catalog, properties=dict(ice_raw.get("properties") or {})
    )
    colls = []
    for i, c in enumerate(raw.get("collections") or []):
        cp = f"collections[{i}]"
        _reject_unknown(
            c, {"source", "target", "mapping", "partitioning", "batch", "errors"}, cp
        )
        err_raw = c.get("errors") or {}
        _reject_unknown(err_raw, {"quarantineDir"}, f"{cp}.errors")
        src = _require(c, "source", cp)
        _reject_unknown(src, {"collection"}, f"{cp}.source")
        tgt = _require(c, "target", cp)
        _reject_unknown(tgt, {"namespace", "table"}, f"{cp}.target")
        colls.append(
            CollectionSyncConfig(
                source_collection=_require(src, "collection", f"{cp}.source"),
                target_namespace=_require(tgt, "namespace", f"{cp}.target"),
                target_table=_require(tgt, "table", f"{cp}.target"),
                mapping=_parse_mapping(c.get("mapping"), f"{cp}.mapping"),
                partitioning=_parse_partitioning(c.get("partitioning"), f"{cp}.partitioning"),
                batch=_parse_batch(c.get("batch"), f"{cp}.batch"),
                quarantine_dir=err_raw.get("quarantineDir"),
            )
        )
    if not colls:
        raise ConfigError("collections is required and must be non-empty")
    return SyncConfig(mongodb=mongo, iceberg=iceberg, collections=tuple(colls))


def load_config(path: str) -> SyncConfig:
    if yaml is None:  # pragma: no cover
        raise ConfigError("pyyaml is not available")
    with open(path) as fh:
        raw = yaml.safe_load(fh)
    if not isinstance(raw, dict):
        raise ConfigError("config root must be a mapping")
    return load_config_dict(raw)
