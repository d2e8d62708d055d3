"""Table loaders (SURVEY.md §2 A1) — the engine's scan layer.

The reference reads whole tables through the ORM
(cobradb/model_loading.py::load_model preloads existing-row dicts [P]);
here a "table" is a parquet dataset and the scan is declarative, so
Catalyst gets predicate pushdown / column pruning for free.  At 100 TB
the same loaders point at partitioned datasets; nothing here assumes
single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark import schemas
from cobradb_spark.session import apply_runtime_confs


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts canonicalized to microsecond TimestampNTZ.

    The dataset stores timestamp[ns]; Spark cannot scan INT64
    TIMESTAMP(NANOS) natively, so we surface it as long
    (nanosAsLong conf, set in apply_runtime_confs) and truncate to
    microseconds with *integer* arithmetic (ts DIV 1000 — float division
    would lose precision above 2^53 ns).  DuckDB's parquet reader
    truncates identically, so the oracle sees the same instants.
    """
    apply_runtime_confs(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn(
        "ts",
        F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table by name from an sf directory."""
    if name not in schemas.TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {schemas.TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    apply_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
