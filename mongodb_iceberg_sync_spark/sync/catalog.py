"""Iceberg catalog wiring (reference A27).

The reference maps catalog type → catalog implementation
(reference IcebergConfig.java:25-34: local → HadoopCatalog,
s3tables → S3TablesCatalog, rest → RESTCatalog) plus a properties
passthrough (IcebergConfig.java:8, docs/design.md:203-204). The Spark
equivalent is `spark.sql.catalog.<name>.*` session conf: this module
renders exactly those keys and applies them when the Iceberg runtime
jar is on the classpath; without the jar (this sandbox), callers fall
back to sync.table_store.MorTable, which implements the same
upsert/delete/read contract on bare parquet.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .config import ConfigError, IcebergConfig

SPARK_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
S3TABLES_CATALOG_IMPL = "software.amazon.s3tables.iceberg.S3TablesCatalog"


def catalog_spark_confs(cfg: IcebergConfig, name: str = "lake") -> dict[str, str]:
    """Render the exact `spark.sql.catalog.*` conf for a catalog config.

    local → SparkCatalog type=hadoop + warehouse path
    rest → SparkCatalog type=rest + uri (+ optional warehouse)
    s3tables → SparkCatalog catalog-impl=S3TablesCatalog + warehouse ARN
    properties → passthrough as catalog options (docs/design.md:203-204)
    """
    cat = cfg.catalog
    base = f"spark.sql.catalog.{name}"
    confs: dict[str, str] = {base: SPARK_CATALOG_IMPL}
    if cat.type == "local":
        if not cat.warehouse:
            raise ConfigError("iceberg.catalog.warehouse is required for type=local")
        confs[f"{base}.type"] = "hadoop"
        confs[f"{base}.warehouse"] = cat.warehouse
    elif cat.type == "rest":
        if not cat.uri:
            raise ConfigError("iceberg.catalog.uri is required for type=rest")
        confs[f"{base}.type"] = "rest"
        confs[f"{base}.uri"] = cat.uri
        if cat.warehouse:
            confs[f"{base}.warehouse"] = cat.warehouse
    elif cat.type == "s3tables":
        if not cat.warehouse:
            raise ConfigError(
                "iceberg.catalog.warehouse (table-bucket ARN) is required "
                "for type=s3tables"
            )
        confs[f"{base}.catalog-impl"] = S3TABLES_CATALOG_IMPL
        confs[f"{base}.warehouse"] = cat.warehouse
    else:  # pragma: no cover - config loader already validates the enum
        raise ConfigError(f"unknown catalog type {cat.type!r}")
    for k, v in cfg.properties.items():
        confs[f"{base}.{k}"] = str(v)
    return confs


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(SPARK_CATALOG_IMPL)  # noqa: SLF001
        return True
    except Exception:
        return False


def configure_catalog(
    spark: SparkSession, cfg: IcebergConfig, name: str = "lake"
) -> bool:
    """Apply the catalog conf to the session if the Iceberg runtime is
    present. Returns True when the catalog is live (writeTo/MERGE INTO
    path), False when the caller should use the MorTable fallback."""
    if not iceberg_runtime_available(spark):
        return False
    for k, v in catalog_spark_confs(cfg, name).items():
        spark.conf.set(k, v)
    return True
