"""Lakehouse table formats — import-gated (SURVEY environment note:
Delta/Iceberg/Hudi jars are not on this classpath; the API surface exists
so callers get a clear error instead of a ClassNotFoundException mid-job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class LakehouseUnavailable(RuntimeError):
    pass


def _require_jar(spark: SparkSession, provider: str, probe_class: str) -> None:
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.lang.Class.forName(probe_class)
    except Exception as exc:  # noqa: BLE001 — py4j raises opaque Py4JError
        raise LakehouseUnavailable(
            f"{provider} is not on the Spark classpath. Add the {provider} "
            f"runtime jar (e.g. --packages) and the catalog/session "
            f"extensions, then retry."
        ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _require_jar(spark, "Delta Lake", "org.apache.spark.sql.delta.DeltaLog")
    return spark.read.format("delta").load(path)


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _require_jar(df.sparkSession, "Delta Lake", "org.apache.spark.sql.delta.DeltaLog")
    df.write.format("delta").mode(mode).save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _require_jar(spark, "Apache Iceberg", "org.apache.iceberg.Table")
    return spark.read.format("iceberg").load(table)
