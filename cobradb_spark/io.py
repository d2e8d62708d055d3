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
import os

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
    timestamps this way).

    Gates on the unit-error SIGNATURES, not a span floor (round-3 ADVICE:
    a legitimately single-day dataset must pass):
    - us-read-as-ns divides values by 1000 -> everything collapses onto
      the 1970 epoch (max ts lands years before any real generation);
    - ns-read-as-us multiplies by 1000 -> dates blow past year 3000 or
      the span inflates ~1000x (a ~30-day corpus becomes ~80 years).
    """
    key = os.path.realpath(sf_dir)
    if key in _TS_SANITY_OK:
        return
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    bad = (
        lo is None
        or hi is None
        or hi < _dt.datetime(1985, 1, 1)  # epoch collapse (divide-by-1000)
        or lo > _dt.datetime(3000, 1, 1)  # absurd future (multiply-by-1000)
        or hi - lo > _dt.timedelta(days=365 * 50)  # span inflated ~1000x
    )
    if bad:
        raise ValueError(
            f"events.ts in {sf_dir} decoded to implausible range [{lo}, {hi}] "
            "— the signature of a timestamp-unit mismatch after a testdata "
            "regeneration; see io.canonical_events_ts"
        )
    _TS_SANITY_OK.add(key)


# On-disk schema per (realpath'd parquet path, mtime_ns, size), captured
# from the FIRST inferred read of that file in this process.  Subsequent
# loads pass it back explicitly, which skips the footer-inference step
# Spark otherwise repeats on every spark.read.parquet call (~130 ms ->
# ~27 ms per load measured at sf0.1; every bench/driver timed run
# rebuilds its DataFrames, so this is pure fixed overhead on every
# query).  Cached schemas are exactly what inference produced for the
# same file bytes, so plans and results are byte-identical; the
# schema-sanity tripwires below still run against the inferred first
# read.  The (mtime_ns, size) key components invalidate the entry when
# the file (or dataset directory) is rewritten in-process (r14 verdict
# item 7): a rewrite re-infers and re-runs the tripwires instead of
# silently applying the stale schema.  The stat costs microseconds per
# load.  At 100 TB the same discipline applies: resolve a table's
# schema once per process, not once per query (schemas.py design note).
_FILE_SCHEMA_CACHE: dict[tuple[str, int, int], T.StructType] = {}


def _read_parquet_cached_schema(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[DataFrame, bool]:
    """Read <sf_dir>/<name>.parquet, inferring the schema only on the
    first read per (path, mtime, size); returns (df, first_read)."""
    path = f"{sf_dir}/{name}.parquet"
    real = os.path.realpath(path)
    try:
        st = os.stat(real)
        key = (real, st.st_mtime_ns, st.st_size)
    except OSError:
        # missing path: let spark.read.parquet produce its own error
        key = (real, -1, -1)
    cached = _FILE_SCHEMA_CACHE.get(key)
    if cached is not None:
        return spark.read.schema(cached).parquet(path), False
    df = spark.read.parquet(path)
    _FILE_SCHEMA_CACHE[key] = df.schema
    return df, True


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts canonicalized to microsecond TimestampNTZ."""
    apply_runtime_confs(spark)
    raw, _first = _read_parquet_cached_schema(spark, sf_dir, "events")
    out = canonical_events_ts(raw)
    _assert_events_ts_sane(out, sf_dir)
    return out


def _assert_table_schema_sane(df: DataFrame, sf_dir: str, name: str) -> None:
    """Same tripwire idea as _assert_events_ts_sane, for the two tables
    whose layout a regeneration could plausibly drift (r3 verdict item 7):
    documents (text must still be a string column) and embeddings
    (embedding must still be an array of floats).  Runs on every fresh
    schema inference (first read per (path, mtime, size) — so a
    rewritten file is re-checked); no data scan, metadata only.
    """
    if name not in ("documents", "embeddings"):
        return
    expected = schemas.TABLE_SCHEMAS[name]
    got = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in expected.fields if f.name not in got]
    if missing:
        raise ValueError(
            f"{name}.parquet in {sf_dir} is missing columns {missing} — "
            "on-disk layout changed since the schema was frozen"
        )
    if name == "documents" and not isinstance(got["text"], T.StringType):
        raise ValueError(
            f"documents.text in {sf_dir} is {got['text']} (expected string) — "
            "on-disk layout changed"
        )
    if name == "embeddings" and not (
        isinstance(got["embedding"], T.ArrayType)
        and isinstance(got["embedding"].elementType, (T.FloatType, T.DoubleType))
    ):
        raise ValueError(
            f"embeddings.embedding in {sf_dir} is {got['embedding']} (expected "
            "array<float>) — on-disk layout changed"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table by name from an sf directory."""
    if name not in schemas.TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {schemas.TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    apply_runtime_confs(spark)
    df, first = _read_parquet_cached_schema(spark, sf_dir, name)
    if first:
        _assert_table_schema_sane(df, sf_dir, name)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
