"""Structured Streaming plumbing for the events table.

The reference has no streams [P] — batch ETL only; the north star adds
them over `events`.  Testdata events.parquet is a static file, so the
stream source replays it through a temp directory:

- one symlinked file  -> a single micro-batch (deterministic),
- staged batch files  -> multi-batch replay (watermark/late-data tests).

Every streaming query runs with a memory sink driven synchronously via
processAllAvailable(), so `queries()` callables stay (spark, sf_dir) ->
DataFrame.  In production the same DAGs point at a real source (Kafka /
file drop) and a real sink; nothing in the transformations changes.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark import schemas
from cobradb_spark.scratch import scratch_dir
from cobradb_spark.session import apply_runtime_confs

_SINK_IDS = itertools.count()


def events_stream_dir(sf_dir: str) -> str:
    """Stage events.parquet into a temp dir (file streaming sources read
    directories)."""
    tmp = scratch_dir("cobradb_stream_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), f"{tmp}/events.parquet")
    return tmp


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan with the canonical ts conversion (io.load_events
    semantics: ns-as-long -> microsecond timestamp)."""
    apply_runtime_confs(spark)
    raw = spark.readStream.schema(schemas.EVENTS_RAW).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def run_to_memory(
    sdf: DataFrame, output_mode: str, process_batches: list | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion against a memory sink and
    return the result table.

    process_batches: optional list of callables; each is invoked (e.g. to
    drop another file into the source dir) followed by
    processAllAvailable(), giving deterministic multi-micro-batch replay.
    """
    spark = sdf.sparkSession
    name = f"stream_sink_{next(_SINK_IDS)}"
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        for hook in process_batches or []:
            hook()
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
