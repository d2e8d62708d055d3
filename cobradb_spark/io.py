"""Table loaders (SURVEY.md §2 A1) — the engine's scan layer.

The reference reads whole tables through the ORM
(cobradb/model_loading.py::load_model preloads existing-row dicts [P]);
here a "table" is a parquet dataset and the scan is declarative, so
Catalyst gets predicate pushdown / column pruning for free.  At 100 TB
the same loaders point at partitioned datasets; nothing here assumes
single files.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cobradb_spark import schemas
from cobradb_spark.session import apply_runtime_confs

# sf_dirs whose events.ts already passed the load-time sanity check this
# process — the check costs one tiny aggregate, so run it once per dir.
_TS_SANITY_OK: set[str] = set()


def canonical_events_ts(raw: DataFrame) -> DataFrame:
    """Canonicalize events.ts to microsecond TimestampNTZ, whatever the
    on-disk layout.

    Testdata generations have shipped two layouts:

    - INT64 TIMESTAMP(NANOS): Spark can't scan it natively, so the
      nanosAsLong conf (apply_runtime_confs) surfaces it as long and we
      truncate to microseconds with *integer* arithmetic (ts DIV 1000 —
      float division would lose precision above 2^53 ns).
    - timestamp[us] (current): arrives as TIMESTAMP_NTZ (or TIMESTAMP if
      the writer marked UTC adjustment); plain cast passthrough.

    DuckDB's parquet reader lands on the same microsecond instants either
    way, so the oracle agrees.
    """
    dtype = raw.schema["ts"].dataType
    if isinstance(dtype, T.LongType):
        ts = F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
    else:
        ts = F.col("ts").cast("timestamp_ntz")
    return raw.withColumn("ts", ts)


def _assert_events_ts_sane(events: DataFrame, sf_dir: str) -> None:
    """Fail loudly if ts decoded to garbage (e.g. a unit mismatch after a
    testdata regeneration — round 2 silently produced 1970-epoch
    timestamps this way).  Real generations span ~30 days; a unit error
    collapses or explodes that span by 1000x."""
    if sf_dir in _TS_SANITY_OK:
        return
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    if lo is None or hi is None or not (_dt.timedelta(days=1) < hi - lo < _dt.timedelta(days=365 * 20)):
        raise ValueError(
            f"events.ts in {sf_dir} decoded to implausible range [{lo}, {hi}] "
            "(expected span between 1 day and 20 years) — on-disk timestamp "
            "layout likely changed; see io.canonical_events_ts"
        )
    _TS_SANITY_OK.add(sf_dir)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts canonicalized to microsecond TimestampNTZ."""
    apply_runtime_confs(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = canonical_events_ts(raw)
    _assert_events_ts_sane(out, sf_dir)
    return out


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
