"""Stream-batch parity + watermark semantics on micro fixtures."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from cobradb_spark import registry


def test_session_window_streaming_matches_batch(spark, sf_dir):
    """I3 parity: the streaming session_window run (append + watermark) must
    produce a subset of batch sessions, equal on all finalized sessions."""
    from cobradb_spark.operators.streams import (
        events_stream_dir,
        read_events_stream,
        run_to_memory,
    )

    batch = registry.get_query("stream_session_window").fn(spark, sf_dir)
    batch_rows = {
        (r.user_id, r.session_start, r.n_events) for r in batch.collect()
    }
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    stream = (
        ev.withWatermark("ts", "1 minute")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in run_to_memory(stream, "append").collect()
    }
    assert got  # at least the early sessions finalize
    assert got <= batch_rows


def test_watermark_drops_late_row(spark):
    """mini_late_events (FIXTURES §3): one row > watermark behind max(ts)
    must be dropped, on-time rows kept."""
    from cobradb_spark.operators.streams import read_events_stream, run_to_memory

    tmp = tempfile.mkdtemp(prefix="late_micro_")
    os.makedirs(f"{tmp}/src")

    def ns(s: str) -> int:
        return int(datetime.fromisoformat(s).timestamp() * 1_000_000_000)

    def write_batch(rows, name):
        df = spark.createDataFrame(
            [(i, ns(t), u, "x", 1.0, "{}") for i, t, u in rows],
            "event_id long, ts long, user_id long, event_type string, value double, props string",
        ).coalesce(1)
        df.write.mode("overwrite").parquet(f"{tmp}/stage")
        part = [f for f in os.listdir(f"{tmp}/stage") if f.endswith(".parquet")][0]
        os.rename(f"{tmp}/stage/{part}", f"{tmp}/src/{name}.parquet")

    write_batch(
        [(1, "2024-01-01 10:00:00", 1), (2, "2024-01-01 12:00:00", 1)], "b1"
    )  # watermark after b1: 12:00 - 10min = 11:50

    def add_batch2():
        write_batch(
            [(3, "2024-01-01 10:30:00", 1),   # late: < 11:50 -> dropped
             (4, "2024-01-01 12:30:00", 1)],  # on time
            "b2",
        )

    ev = read_events_stream(spark, f"{tmp}/src")
    dedup = ev.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    ).select("event_id")
    out = run_to_memory(dedup, "append", process_batches=[add_batch2])
    ids = {r.event_id for r in out.collect()}
    assert 4 in ids and 1 in ids and 2 in ids
    assert 3 not in ids  # the late row was dropped
