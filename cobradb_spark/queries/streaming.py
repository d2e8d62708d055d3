"""§2 I — Structured Streaming over the events table.

The reference is batch-only [P]; these are the north-star stream ops.
Verification model (SURVEY §2-I): run the streaming DAG to completion on
a deterministic replay of events.parquet, oracle = batch SQL over the
same parquet — stream-batch parity.

Scale notes: all aggregations here are keyed by (window/session, small
key) so streaming state is bounded by #windows x #keys; watermarks bound
it in time.  applyInPandasWithState keeps per-user state as Arrow
batches.  The memory sink is verification-only plumbing.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.operators.merge import merge_upsert
from cobradb_spark.operators.streams import (
    ephemeral_replay_confs,
    events_stream_dir,
    read_events_stream,
    run_to_memory,
    stage_parquet_batch,
    unload_state_stores,
)
from cobradb_spark.registry import register
from cobradb_spark.scratch import scratch_dir


@register(
    "stream_tumbling_agg",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v_sum
FROM events GROUP BY 1, 2
""",
    doc="I1 tumbling 1h window counts/sums per event_type (complete mode; state = "
    "#hours x #types). Stream-batch parity oracle.",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v_sum")
    )
    out = run_to_memory(
        agg.select(F.col("window.start").alias("hour_start"), "event_type", "n", "v_sum"),
        "complete",
    )
    return out


@register(
    "stream_sliding_agg",
    oracle="""
WITH x AS (
  SELECT event_type, value, epoch_us(ts) AS us FROM events
), exp AS (
  SELECT event_type, value, (us // 900000000) * 900 - k * 900 AS win_s, us
  FROM x, UNNEST([0, 1, 2, 3]) AS t(k)
  WHERE (us // 900000000) * 900 - k * 900 > us / 1000000.0 - 3600
)
SELECT make_timestamp(win_s * 1000000) AS win_start, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v_sum
FROM exp GROUP BY 1, 2
""",
    doc="I2 sliding window (1h length / 15min slide): each event lands in 4 windows. "
    "Oracle expands windows arithmetically (epoch-aligned starts, [start, start+1h)).",
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    agg = ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v_sum")
    )
    return run_to_memory(
        agg.select(F.col("window.start").alias("win_start"), "event_type", "n", "v_sum"),
        "complete",
    )


@register(
    "stream_session_window",
    oracle="""
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
)
SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS v_sum
FROM s GROUP BY user_id, sess_id
""",
    doc="I3 session windows (30min gap) per user — session_window() in the engine, "
    "gaps-and-islands (lag + cumulative flag) as the batch oracle. Sessions close "
    "when the gap >= 30min, matching session_window's [start, last+gap) semantics. "
    "Batch-mode session_window here; the streaming variant (watermark + append) is "
    "exercised in tests.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("v_sum"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "v_sum",
        )
    )


@register(
    "stream_watermark_late",
    oracle="""
WITH on_time AS (SELECT * FROM events WHERE event_id % 10 <> 0),
wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM on_time)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       CAST(count(*) AS BIGINT) AS n
FROM on_time GROUP BY 1
HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
""",
    doc="I4 watermark late-row dropping: batch 1 = on-time events (advances the "
    "watermark to max(ts) - 10min), batch 2 replays events older than the "
    "watermark — append-mode tumbling agg must not re-emit their windows. "
    "Oracle = hourly counts over on-time rows only, restricted to windows the "
    "final watermark finalized (window end <= max(on_time ts) - 10min): late "
    "rows all fall in finalized windows, so a correct engine drops every one.",
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_batch = load_table(spark, sf_dir, "events")
    tmp = scratch_dir("cobradb_late_")
    on_time = ev_batch.filter(F.col("event_id") % 10 != 0)
    late_src = ev_batch.filter(F.col("event_id") % 10 == 0).filter(
        F.col("ts") < F.lit(
            ev_batch.agg(F.max("ts")).collect()[0][0] - pd.Timedelta(minutes=90)
        )
    )
    raw = load_table(spark, sf_dir, "events")  # schema donor for writes
    on_time_raw = on_time.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
    late_raw = late_src.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
    stage_parquet_batch(on_time_raw, f"{tmp}/src", "batch1")

    def add_late():
        stage_parquet_batch(late_raw, f"{tmp}/src", "batch2", atomic=True)

    ev = read_events_stream(spark, f"{tmp}/src")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    out = run_to_memory(
        agg.select(F.col("window.start").alias("hour_start"), "n"),
        "append",
        process_batches=[add_late],
    )
    return out


@register(
    "stream_dedup",
    oracle="""
SELECT event_id, user_id, event_type FROM events
""",
    doc="I5 streaming dedup: the source replays events plus exact duplicates of every "
    "10th event in one micro-batch; dropDuplicatesWithinWatermark(event_id) must "
    "restore the original set. State is bounded by the watermark horizon — the "
    "100 TB-stream answer to unbounded dedup state.",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)  # nanosAsLong before the raw read
    tmp = scratch_dir("cobradb_dedup_")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")  # ts stays long
    dups = raw.filter(F.col("event_id") % 10 == 0)
    raw.unionByName(dups).repartition(1).write.parquet(f"{tmp}/src")
    ev = read_events_stream(spark, f"{tmp}/src")
    deduped = (
        ev.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_to_memory(deduped, "append")


@register(
    "stream_stateful_counts",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS v_sum
FROM events GROUP BY user_id
""",
    doc="I6 custom stateful operator via applyInPandasWithState: per-user running "
    "(count, sum) state updated per micro-batch; single-batch replay emits the "
    "final state per user, which must equal the batch groupBy.",
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "v_sum": [round(v, 6)]}
        )

    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, v_sum double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "update")


@register(
    "stream_static_join",
    oracle="""
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_events
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name
""",
    doc="I7 stream-static join: the static dim (nation) is broadcast into every "
    "micro-batch — no stream-side shuffle for the join itself.",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    nation = load_table(spark, sf_dir, "nation")
    joined = ev.join(
        F.broadcast(nation), ev.user_id % 25 == nation.n_nationkey
    )
    agg = joined.groupBy("n_name").agg(F.count("*").alias("n_events"))
    return run_to_memory(agg, "complete")


@register(
    "stream_foreachBatch_sink",
    oracle="""
SELECT event_id, user_id, event_type, value FROM events
""",
    doc="I8 foreachBatch idempotent sink: each micro-batch merge-upserts (A6 "
    "semantics, operators/merge.py) into a parquet target keyed by event_id; "
    "batch retries overwrite the same keys, so the sink is exactly-once in "
    "effect. Read-back must equal the source.",
)
def stream_foreachBatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = scratch_dir("cobradb_febs_")
    target = f"{tmp}/target"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.select("event_id", "user_id", "event_type", "value")
        if os.path.exists(target):
            existing = batch_df.sparkSession.read.parquet(target)
            merged = merge_upsert(existing, incoming, keys=["event_id"])
            merged.write.mode("overwrite").parquet(f"{tmp}/staging")
            shutil.rmtree(target)
            shutil.move(f"{tmp}/staging", target)
        else:
            incoming.write.parquet(target)

    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    with ephemeral_replay_confs(spark):
        q = ev.writeStream.outputMode("append").foreachBatch(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            unload_state_stores(spark)
    return spark.read.parquet(target)


@register(
    "rollup_hypertable",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v_sum
FROM events GROUP BY 1, 2
""",
    doc="Hypertable-style continuous aggregate: events roll up into an hourly "
    "materialization, and the daily query is answered FROM the rollup "
    "(sum-of-counts / sum-of-sums composability) — the timeseries pattern "
    "where raw data is compacted once and every coarser granularity reads "
    "the rollup, never the raw table. Oracle computes daily directly from "
    "raw events, proving the two-level path is lossless.",
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    daily = hourly.groupBy(
        F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("v"), 6).alias("v_sum"),
    )
    return daily


@register(
    "stream_stream_join",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       round(p.value, 6) AS p_value
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = v.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
""",
    doc="I-ext stream-stream interval join: purchases within 30 minutes after a "
    "view by the same user. Both sides carry watermarks so the join state is "
    "bounded (views older than watermark - 30min are evicted); append mode "
    "emits each match exactly once. Stream-batch parity oracle = the same "
    "time-range join in batch SQL.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = events_stream_dir(sf_dir)
    views = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    j = views.join(
        purchases,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return run_to_memory(
        j.select("user_id", "view_id", "purchase_id", F.round("p_value", 6).alias("p_value")),
        "append",
    )


@register(
    "stream_python_source",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v_sum
FROM events GROUP BY event_type
""",
    doc="I-ext custom Python STREAMING source (sources/pyevents_stream.py): "
    "a SimpleDataSourceStreamReader replaying events in 2000-row micro-batches "
    "with driver-tracked {row: n} offsets — the Kafka-shaped contract "
    "(initialOffset / read / readBetweenOffsets) that gives exact failure "
    "replay, vs the file-drop replay used by the other stream queries. "
    "Stream-batch parity oracle over the full replay.",
)
def stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.session import apply_runtime_confs
    from cobradb_spark.sources.pyevents_stream import EventsStreamDataSource

    apply_runtime_confs(spark)
    spark.dataSource.register(EventsStreamDataSource)
    # Micro-batch size follows source volume (the maxOffsetsPerTrigger
    # discipline, r14): a replay-to-completion pays full micro-batch
    # machinery per batch, so an unconditional 2000-row batch turned the
    # sf0.1 file into 50 batches (~59 s of per-batch overhead).  ~8
    # batches bound the replay at any SF; the 2000-row floor keeps the
    # multi-batch offset contract genuinely exercised (the point of this
    # key) even on the smallest fixtures.  The final complete-mode
    # aggregate is batching-invariant, so results are unchanged.
    import pyarrow.parquet as pq

    try:
        n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    except Exception:
        # metadata probe is a sizing hint only (r14 ADVICE): a missing/
        # unreadable path must surface through the source's own error
        # path when the stream starts, not as a pyarrow error at
        # plan-build time
        n_rows = 0
    batch_rows = max(2000, -(-n_rows // 8))
    ev = (
        spark.readStream.format("cobradb_pyevents")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", str(batch_rows))
        .load()
    )
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v_sum")
    )
    return run_to_memory(agg, "complete")


@register(
    "stream_sessionize_stateful",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
                 THEN 1 ELSE 0 END AS is_new
  FROM o
), sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
), per AS (
  SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
         min(ts) AS session_start, max(ts) AS session_end,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM sess GROUP BY user_id, session_no
), mx AS (
  SELECT user_id, max(session_no) AS last_sess FROM per GROUP BY user_id
)
SELECT p.user_id, p.session_no, p.session_start, p.session_end,
       p.n_events, p.total_cents
FROM per p JOIN mx ON p.user_id = mx.user_id AND p.session_no < mx.last_sess
""",
    doc="I-ext streaming gap sessionization via applyInPandasWithState: "
    "per-user state carries the OPEN session (last ts, bounds, count, cent "
    "sum); a >30-min gap closes and emits it. The oracle is the batch "
    "sessionization (sessionize_events) minus each user's still-open last "
    "session — exactly what a correct streaming sessionizer may emit "
    "before end-of-stream. Values accumulate as integer cents so stream "
    "(ordered) and batch (unordered) sums are bit-identical. State is one "
    "tuple per user — bounded regardless of stream length.",
)
def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cobradb_spark.operators.streams import (
        events_stream_dir,
        read_events_stream,
        run_to_memory,
    )

    GAP_US = 30 * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1).tolist()
        # pandas may hand us ns or us resolution; normalize to us
        if ts_us and ts_us[0] > 10**16:
            ts_us = [t // 1000 for t in ts_us]
        cents = [int(round(v * 100)) for v in rows["value"]]
        if state.exists:
            sess_no, start_us, last_us, n, tot = state.get
        else:
            sess_no, start_us, last_us, n, tot = 0, None, None, 0, 0
        out = []
        for t, c in zip(ts_us, cents):
            if start_us is None:
                sess_no, start_us, last_us, n, tot = 1, t, t, 1, c
            elif t - last_us > GAP_US:
                out.append((sess_no, start_us, last_us, n, tot))
                sess_no, start_us, last_us, n, tot = sess_no + 1, t, t, 1, c
            else:
                last_us, n, tot = t, n + 1, tot + c
        state.update((sess_no, start_us, last_us, n, tot))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "session_no": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                "n_events": [o[3] for o in out],
                "total_cents": [o[4] for o in out],
            }
        )

    path = events_stream_dir(sf_dir)
    ev = read_events_stream(spark, path).select("user_id", "ts", "event_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, session_no long, session_start timestamp, "
        "session_end timestamp, n_events long, total_cents long",
        stateStructType="sess_no long, start_us long, last_us long, n long, tot long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "append")


@register(
    "stream_trending_topk",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY win_start
                               ORDER BY n DESC, event_type) AS rnk
  FROM hourly
)
SELECT win_start, event_type, n, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
    doc="I-ext trending top-k: the stream maintains watermarked tumbling "
    "hourly counts per event_type (the only state the stream needs — "
    "bounded by types x open windows); the top-3 ranking runs at serve "
    "time over the emitted aggregates (rank is not a streaming-supported "
    "window, and does not need to be: the pre-agg output is tiny). This "
    "is the standard lambda shape — heavy distributed pre-agg in the "
    "stream, cheap ranking on the serving read. Hash-exact vs the "
    "all-batch oracle; ties fully broken by event_type.",
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.operators.streams import (
        events_stream_dir,
        read_events_stream,
        run_to_memory,
    )

    path = events_stream_dir(sf_dir)
    ev = read_events_stream(spark, path)
    counts = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    agg_table = run_to_memory(counts, "complete")
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("win_start").orderBy(F.col("n").desc(), "event_type")
    )
    return (
        agg_table.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("win_start", "event_type", "n", "rnk")
    )


@register(
    "stream_chained_stateful_agg",
    oracle="""
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS wm FROM events),
lvl1 AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, user_id,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT l.hour_start,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(sum(l.n_events) AS BIGINT) AS total_events
FROM lvl1 l, wm
WHERE l.hour_start + INTERVAL 1 HOUR < wm.wm
GROUP BY l.hour_start
""",
    doc="CHAINED stateful streaming aggregation (Spark 4 multiple-stateful-"
    "operator support): per-(hour, user) event counts feed a SECOND "
    "stateful aggregate (active users + totals per hour) in ONE streaming "
    "query — pre-4.x this required two jobs with an intermediate sink. "
    "Append mode + 2h watermark bounds both operators' state; emitted "
    "rows are exactly the hours closed by the final watermark, which the "
    "batch oracle replicates (window_end < max(ts) - 2h). State scales "
    "with |users x open hours| for level 1 and |open hours| for level 2.",
    tags=("streaming",),
)
def stream_chained_stateful_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    lvl1 = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    lvl2 = lvl1.groupBy("window").agg(
        F.count("*").alias("active_users"),
        F.sum("n_events").cast("long").alias("total_events"),
    )
    return run_to_memory(
        lvl2.select(
            F.col("window.start").alias("hour_start"), "active_users", "total_events"
        ),
        "append",
    )


@register(
    "stream_python_sink",
    oracle="""
SELECT event_id, user_id, event_type, round(value, 6) AS value FROM events
""",
    doc="I-ext custom Python STREAMING sink (sources/pysink.py "
    "_JsonlStreamWriter): per-micro-batch two-phase commit — tasks write "
    "uncoordinated part files, the driver publishes _MANIFEST-{batchId} "
    "only after the whole batch succeeds, batch retries overwrite the same "
    "manifest — the sink half of the exactly-once contract.  Events are "
    "replayed in two staged micro-batches so two manifests are committed; "
    "the manifest-honoring read-back must equal the source exactly (JSON "
    "shortest-repr doubles round-trip binary64 losslessly).",
    tags=("streaming",),
)
def stream_python_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.session import apply_runtime_confs
    from cobradb_spark.sources.pysink import JsonlSinkDataSource, read_manifested_jsonl

    apply_runtime_confs(spark)
    spark.dataSource.register(JsonlSinkDataSource)
    tmp = scratch_dir("cobradb_pysink_")
    src, out = f"{tmp}/src", f"{tmp}/out"
    os.makedirs(src)

    ev_batch = load_table(spark, sf_dir, "events")
    half1 = ev_batch.filter(F.col("event_id") % 2 == 0)
    half2 = ev_batch.filter(F.col("event_id") % 2 == 1)

    stage_parquet_batch(half1, src, "b1")
    ev = read_events_stream(spark, src).select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    )
    with ephemeral_replay_confs(spark):
        q = (
            ev.writeStream.outputMode("append")
            .format("cobradb_pyjsonl")
            .option("path", out)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            stage_parquet_batch(half2, src, "b2", atomic=True)
            q.processAllAvailable()
        finally:
            q.stop()
            unload_state_stores(spark)
    return read_manifested_jsonl(
        spark, out, "event_id long, user_id long, event_type string, value double"
    )


@register(
    "stream_cdc_upsert_view",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END, 2) AS o_totalprice
FROM orders WHERE o_orderkey % 13 <> 0
""",
    doc="I-ext streaming CDC-maintained snapshot: a change stream of "
    "I(nsert)/U(pdate)/D(elete) rows replays in two micro-batches "
    "(batch 1 = initial inserts, batch 2 = updates for keys %7 and "
    "deletes for keys %13), and foreachBatch applies each batch to a "
    "versioned parquet snapshot — previous keys not in the batch "
    "survive, non-D rows upsert, D wins over U inside one batch "
    "(standard CDC precedence for a key that is updated then dropped). "
    "The final view must equal the oracle's batch-applied state — the "
    "streaming half of etl_cdc_apply, and the materialized-view "
    "maintenance loop a 100 TB warehouse runs continuously (each batch "
    "touches |batch| + |snapshot| rows, never the raw history).",
    tags=("streaming",),
)
def stream_cdc_upsert_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    tmp = scratch_dir("cobradb_cdc_stream_")
    src = f"{tmp}/src"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    inserts = o.select(F.lit("I").alias("op"), "o_orderkey", "o_orderstatus", "o_totalprice")
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.lit("U").alias("op"),
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),  # *2 is exact in binary
    )
    deletes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        F.lit("D").alias("op"),
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    stage_parquet_batch(inserts, src, "b1")

    versions: list[str] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        keys = batch_df.select("o_orderkey").distinct()
        dele = batch_df.filter(F.col("op") == "D").select("o_orderkey").distinct()
        upserts = (
            batch_df.filter(F.col("op") != "D")
            .join(dele, "o_orderkey", "left_anti")  # D wins inside the batch
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
        )
        if versions:
            prev = sp.read.parquet(versions[-1]).join(keys, "o_orderkey", "left_anti")
            new = prev.unionByName(upserts)
        else:
            new = upserts
        vdir = f"{tmp}/snap_v{batch_id}"
        new.write.mode("overwrite").parquet(vdir)
        versions.append(vdir)

    cdc = (
        spark.readStream.schema(
            "op string, o_orderkey long, o_orderstatus string, o_totalprice double"
        ).parquet(src)
    )
    with ephemeral_replay_confs(spark):
        q = cdc.writeStream.outputMode("append").foreachBatch(apply_batch).start()
        try:
            q.processAllAvailable()
            stage_parquet_batch(updates.unionByName(deletes), src, "b2", atomic=True)
            q.processAllAvailable()
        finally:
            q.stop()
            unload_state_stores(spark)
    return spark.read.parquet(versions[-1]).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@register(
    "stream_track_accumulate",
    oracle="""
WITH pts AS (
  SELECT user_id, ts, event_id,
         CAST(((event_id % 1000003) * 9973) % 1800000 AS DOUBLE)
             / 10000.0 - 90.0 AS lat,
         CAST(((event_id % 1000003) * 7919) % 3600000 AS DOUBLE)
             / 10000.0 - 180.0 AS lon
  FROM events
), seg AS (
  SELECT user_id, ts, event_id, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), stepped AS (
  SELECT user_id, ts, event_id,
         CASE WHEN plat IS NULL THEN 0
              ELSE CAST(floor(sqrt((lat - plat) * (lat - plat)
                                   + (lon - plon) * (lon - plon))
                              * 1000000000.0) AS BIGINT) END AS step_nano
  FROM seg
)
SELECT user_id, event_id,
       CAST(row_number() OVER w AS BIGINT) AS n_points,
       CAST(sum(step_nano) OVER w AS BIGINT) AS track_nano
FROM stepped
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
""",
    doc="Streaming stateful geo-track accumulation "
    "(applyInPandasWithState): per-user state carries the last point "
    "and running totals; every arriving event emits its running "
    "(n_points, track_nano) — a per-event CDC of the state, so the "
    "output is independent of micro-batch boundaries (unlike "
    "batch-scoped snapshots). Segments quantize to BIGINT nanos via "
    "floor(dist * 1e9) — the same exact-integer discipline as the batch "
    "geo_track_length — so stream (incremental) and batch (window-sum) "
    "computations are bit-identical; the oracle is the batch running "
    "sum over (ts, event_id) order. State is one (event_id, totals) "
    "tuple per user — bounded regardless of stream length. The "
    "coordinates re-derive from the stored last event_id (exact "
    "integers), never from accumulated floats. Caveat (inherent to any "
    "path accumulation): the track is the path in ARRIVAL order — the "
    "file source delivers in-order here; an out-of-order production "
    "source would need watermarked reordering upstream (the "
    "stream_watermark_late pattern) before this operator.",
)
def stream_track_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cobradb_spark.operators.streams import (
        events_stream_dir,
        read_events_stream,
        run_to_memory,
    )

    def _pos(event_id: int):
        lat = ((event_id % 1000003) * 9973) % 1800000 / 10000.0 - 90.0
        lon = ((event_id % 1000003) * 7919) % 3600000 / 10000.0 - 180.0
        return lat, lon

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            last_id, n, tot = state.get
        else:
            last_id, n, tot = None, 0, 0
        out_ids, out_n, out_tot = [], [], []
        for eid in rows["event_id"].astype("int64").tolist():
            if last_id is not None:
                plat, plon = _pos(last_id)
                lat, lon = _pos(eid)
                d = math.sqrt((lat - plat) ** 2 + (lon - plon) ** 2)
                tot += math.floor(d * 1e9)
            n += 1
            last_id = eid
            out_ids.append(eid)
            out_n.append(n)
            out_tot.append(tot)
        state.update((last_id, n, tot))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_ids),
                "event_id": out_ids,
                "n_points": out_n,
                "track_nano": out_tot,
            }
        )

    path = events_stream_dir(sf_dir)
    ev = read_events_stream(spark, path).select("user_id", "ts", "event_id")
    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, n_points long, "
        "track_nano long",
        stateStructType="last_id long, n long, tot long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "append")


@register(
    "stream_stream_outer_join",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       round(p.value, 6) AS p_value
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = v.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
""",
    doc="I-ext stream-stream LEFT OUTER interval join: every view emits, "
    "paired with purchases by the same user within the next 30 minutes "
    "or with NULLs once the watermark proves no match can arrive.  The "
    "outer side is the hard half of streaming joins — NULL rows may "
    "only emit on state EVICTION (watermark passes view_ts + 30min), "
    "never eagerly, or re-deliveries would contradict them.  The "
    "replay stages all events as batch 1, then ONE sentinel round 3h+ "
    "past max(ts) on non-matchable user_ids (one row per side, so BOTH "
    "per-stream watermarks — and hence the min-of-inputs global "
    "watermark — advance past every real view's expiry; eviction "
    "applies the watermark learned from the previous batch, and the "
    "engine's no-data micro-batch — pinned on in RUNTIME_CONFS — is "
    "the final batch that flushes under the advanced one); sentinels "
    "are filtered from the output.  Oracle "
    "= the same interval join as batch LEFT JOIN over all real events "
    "(the sentinel construction makes stream and batch agree exactly). "
    "State at 100 TB: bounded to the watermark horizon per key on both "
    "sides — eviction is what makes an infinite outer join runnable at "
    "all.",
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    tmp = scratch_dir("cobradb_sso_")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage_parquet_batch(raw, f"{tmp}/src", "batch1")
    ts_is_long = dict(raw.dtypes)["ts"] == "bigint"
    max_ts = raw.agg(F.max("ts")).collect()[0][0]
    flush_ns = (
        (int(max_ts) + 3 * 3600 * 10**9)
        if ts_is_long
        else (int(max_ts.timestamp() * 10**6) + 3 * 3600 * 10**6)
    )
    step = 3 * 3600 * (10**9 if ts_is_long else 10**6)

    def sentinel_batch(n: int):
        # eviction applies the watermark learned from the PREVIOUS batch;
        # the sentinel round advances the watermark past every real
        # view's expiry, and the engine's no-data micro-batch (pinned on
        # in RUNTIME_CONFS) flushes under it.
        # One explicit slice: the default createDataFrame spreads these 2
        # rows over defaultParallelism pickled partitions, and the
        # atomic coalesce(1) write then opens all 32 Python iterators
        # SEQUENTIALLY in one task (measured 4 s per sentinel staging vs
        # 0.15 s single-slice — r14).
        s = spark.createDataFrame(
            spark.sparkContext.parallelize(
                [
                    (-(2 * n - 1), flush_ns + (n - 1) * step, -1, "view", 0.0, "{}"),
                    (-(2 * n), flush_ns + (n - 1) * step, -2, "purchase", 0.0, "{}"),
                ],
                numSlices=1,
            ),
            schema="event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        )
        if not ts_is_long:
            s = s.withColumn("ts", F.timestamp_micros(F.col("ts")))
        # The staged file MUST carry the exact on-disk schema of batch 1
        # (e.g. TIMESTAMP_NTZ ts): the file source reads every file with
        # one fixed schema, and a mismatched sentinel file decodes as
        # ZERO rows — silently freezing the watermark.
        s = s.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in raw.schema.fields]
        )

        def hook():
            stage_parquet_batch(s, f"{tmp}/src", f"batch{n + 1}", atomic=True)

        return hook

    views = (
        read_events_stream(spark, f"{tmp}/src")
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, f"{tmp}/src")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    j = views.join(
        purchases,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    # NO sentinel filter inside the streaming query: any deterministic
    # predicate on left-side columns is pushed down to the parquet scan,
    # where it would drop the sentinel rows BEFORE the watermark node and
    # freeze the watermark (observed: 8 trailing views never flushed).
    # Sentinels are constructed to emit nothing within the replayed
    # batches (non-matching user_ids; their own expiry stays above the
    # final watermark), and the memory-sink result is batch data, so the
    # guard filter applies there, after the stream completes.
    out = j.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.round("p_value", 6).alias("p_value"),
    )
    # ONE sentinel round suffices: the sentinel batch advances both
    # per-stream watermarks, and Spark's no-data micro-batch (pinned on
    # in RUNTIME_CONFS) then re-runs eviction under the NEW watermark —
    # exactly what a second sentinel round used to provide.  Each
    # stateful micro-batch costs a full 32-partition state commit on
    # both join sides, so dropping the round removes two of six batches
    # (r14: 14.7 -> 8.4 s at sf0.1; results proven identical at sf0.01
    # and sf0.1).
    return run_to_memory(
        out, "append", process_batches=[sentinel_batch(1)]
    ).filter(F.col("user_id") >= 0)


@register(
    "stream_transform_with_state",
    oracle="""
WITH c AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
), per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS cents_sum,
         CAST(max(cents) AS BIGINT) AS cents_max
  FROM c GROUP BY 1
), tc AS (
  SELECT user_id, event_type, count(*) AS n FROM c GROUP BY 1, 2
), top AS (
  SELECT user_id, event_type AS top_type,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type)
           AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_types
  FROM tc
)
SELECT p.user_id, p.n_events, p.cents_sum, p.cents_max, t.n_types,
       t.top_type
FROM per p JOIN top t ON t.user_id = p.user_id AND t.rn = 1
""",
    doc="I-ext rich stateful processing, preferring the "
    "transformWithStateInPandas API (Spark 4's successor to "
    "applyInPandasWithState): a StatefulProcessor holding TWO typed "
    "state variables per user — a ValueState (count, cents sum, cents "
    "max) and a MapState of per-event-type counts — updates both per "
    "micro-batch and emits the user profile with the plurality event "
    "type (ties by type name, the LPA tie discipline).  The "
    "transformWithState Python worker protocol requires protobuf, "
    "which this container does not ship (no pip install allowed), so "
    "the op is import-gated: without google.protobuf it runs the SAME "
    "processor semantics on applyInPandasWithState, carrying the type "
    "map inside the state tuple as a delimited string — identical "
    "output, verified by the same oracle; with protobuf present the "
    "new API engages unchanged.  Amounts quantize to BIGINT cents "
    "before state ever updates, so the running aggregate is exact "
    "regardless of batch slicing.  Single-batch replay => emitted "
    "profiles equal the batch groupBy/window oracle.  At 100 TB-stream "
    "scale the state store holds one value row + one small map per "
    "user (RocksDB-backed, key-partitioned); map iteration cost is "
    "bounded by the 5-type domain, not the stream length.",
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    try:
        from google.protobuf import descriptor  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    def fold(pdfs, n, s, m, counts):
        for pdf in pdfs:
            cents = (pdf["value"] * 100.0 + 0.5).apply(lambda x: int(x // 1))
            n += len(pdf)
            if len(cents):
                s += int(cents.sum())
                mx = int(cents.max())
                m = mx if m is None else max(m, mx)
            for t, c in pdf["event_type"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
        return n, s, m, counts

    def profile_row(key, n, s, m, counts):
        pairs = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cents_sum": [s],
                "cents_max": [m],
                "n_types": [len(pairs)],
                "top_type": [pairs[0][0]],
            }
        )

    out_schema = (
        "user_id long, n_events long, cents_sum long, "
        "cents_max long, n_types long, top_type string"
    )
    ev = read_events_stream(spark, events_stream_dir(sf_dir))

    if have_protobuf:
        from pyspark.sql.streaming import StatefulProcessor

        class RunningProfile(StatefulProcessor):
            def init(self, handle):
                self._agg = handle.getValueState("agg", "n long, s long, m long")
                self._types = handle.getMapState("types", "t string", "c long")

            def handleInputRows(self, key, rows, timer_values):
                n, s, m = (
                    self._agg.get() if self._agg.exists() else (0, 0, None)
                )
                n, s, m, counts = fold(rows, n, s, m, {})
                self._agg.update((n, s, m))
                for t, c in counts.items():
                    prior = (
                        self._types.getValue((t,))[0]
                        if self._types.containsKey((t,))
                        else 0
                    )
                    self._types.updateValue((t,), (prior + c,))
                full = {k[0]: v[0] for k, v in self._types.iterator()}
                yield profile_row(key, n, s, m, full)

            def close(self):
                pass

        out = ev.groupBy("user_id").transformWithStateInPandas(
            RunningProfile(),
            outputStructType=out_schema,
            outputMode="update",
            timeMode="none",
        )
    else:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def update(key, pdfs, state: GroupState):
            if state.exists:
                n, s, m, enc = state.get
                counts = dict(
                    (kv.split(":")[0], int(kv.split(":")[1]))
                    for kv in enc.split(",")
                    if kv
                )
            else:
                n, s, m, counts = 0, 0, None, {}
            n, s, m, counts = fold(pdfs, n, s, m, counts)
            enc = ",".join(f"{t}:{c}" for t, c in sorted(counts.items()))
            state.update((n, s, m, enc))
            yield profile_row(key, n, s, m, counts)

        out = ev.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="n long, s long, m long, enc string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return run_to_memory(out, "update")


@register(
    "stream_temporal_dim_enrich",
    oracle="""
WITH dim AS (
  SELECT n_nationkey AS k, n_name, 1 AS version,
         TIMESTAMP '1900-01-01' AS valid_from,
         TIMESTAMP '2024-01-16' AS valid_to
  FROM nation
  UNION ALL
  SELECT n_nationkey, n_name, 2,
         TIMESTAMP '2024-01-16', TIMESTAMP '9999-01-01'
  FROM nation
)
SELECT d.n_name, CAST(d.version AS BIGINT) AS version,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM events e
JOIN dim d ON e.user_id % 25 = d.k
          AND e.ts >= d.valid_from AND e.ts < d.valid_to
GROUP BY d.n_name, d.version
""",
    doc="Temporal dimension enrich on a STREAM — the streaming half of "
    "point-in-time correctness (mlprep_pit_training_set is the batch "
    "half): each streamed event joins the dim VERSION whose validity "
    "interval contains its event time (stream-static inner join with a "
    "range conjunct on a broadcast versioned dim — Spark re-reads the "
    "static side per micro-batch, which is exactly how slowly-changing "
    "enrichment tables behave in production), so events before the "
    "2024-01-16 version cut land on version 1 and later ones on "
    "version 2 of the SAME nation row. Counts and exact cents per "
    "(name, version) in complete mode; oracle = the batch equivalent "
    "over the identical UNION-ALL versioned dim, so stream-batch "
    "parity is value-hashed. Scale: the dim broadcasts (it is the "
    "small side by construction); the stream never shuffles before "
    "the keyed rollup.",
    tags=("streaming",),
)
def stream_temporal_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    nation = load_table(spark, sf_dir, "nation")
    cut = F.lit("2024-01-16").cast("timestamp")
    v1 = nation.select(
        F.col("n_nationkey").alias("k"),
        "n_name",
        F.lit(1).alias("version"),
        F.lit("1900-01-01").cast("timestamp").alias("valid_from"),
        cut.alias("valid_to"),
    )
    v2 = nation.select(
        F.col("n_nationkey").alias("k"),
        "n_name",
        F.lit(2).alias("version"),
        cut.alias("valid_from"),
        F.lit("9999-01-01").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    joined = ev.join(
        F.broadcast(dim),
        (ev.user_id % 25 == dim.k)
        & (ev.ts >= dim.valid_from)
        & (ev.ts < dim.valid_to),
    )
    agg = joined.groupBy("n_name", "version").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    return run_to_memory(
        agg.select(
            "n_name",
            F.col("version").cast("bigint").alias("version"),
            "n_events",
            "cents",
        ),
        "complete",
    )


@register(
    "stream_tumbling_ohlc",
    oracle="""
WITH b AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
  FROM events
)
SELECT hour,
       CAST(min_by(cents, ord_key) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max_by(cents, ord_key) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM b GROUP BY hour
""",
    doc="Hourly OHLC candles on a STREAM — the market-data/telemetry "
    "shape rollup_ohlc serves in batch, here as a watermarked tumbling "
    "window so candles finalize incrementally. Determinism rule: "
    "open/close are NOT first()/last() (arrival-order-dependent under "
    "any parallelism) but min_by/max_by over a zero-padded "
    "(epoch-micros, event_id) string key (a scalar total order both "
    "engines accept) — the same tiebreaker discipline as batch, which is "
    "what makes stream-batch parity value-hashable. Exact cents "
    "everywhere. Scale: one keyed windowed aggregation, state bounded "
    "by open windows x series (RocksDB-backed beyond memory, verified "
    "elsewhere in the suite).",
    tags=("streaming",),
)
def stream_tumbling_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    b = (
        ev.withColumn(
            "cents", F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
        )
        # composite total-order key as a zero-padded string: DuckDB's
        # min_by/max_by take only scalar keys, and lexicographic order
        # on the padding equals (ts, event_id) order on both engines
        .withColumn(
            "ord_key",
            F.concat(
                F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ),
        )
        .withWatermark("ts", "1 hour")
    )
    agg = b.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.expr("min_by(cents, ord_key)").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.expr("max_by(cents, ord_key)").alias("close_cents"),
        F.count("*").cast("bigint").alias("n_ticks"),
    )
    out = agg.select(
        F.col("w.start").alias("hour"),
        F.col("open_cents").cast("bigint").alias("open_cents"),
        F.col("high_cents").cast("bigint").alias("high_cents"),
        F.col("low_cents").cast("bigint").alias("low_cents"),
        F.col("close_cents").cast("bigint").alias("close_cents"),
        "n_ticks",
    )
    return run_to_memory(out, "complete")


@register(
    "stream_state_store_read",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY user_id
""",
    doc="Streaming STATE-STORE introspection (Spark 4 `statestore` batch "
    "read format): run a checkpointed streaming aggregation to "
    "completion (availableNow), then read the operator's state files "
    "DIRECTLY from the checkpoint — no replay, no sink — and verify the "
    "per-key state (count + integer-cent sum per user) equals the batch "
    "truth over the same input.  This is the ops capability every "
    "large-scale streaming deployment eventually needs: inspecting a "
    "production job's keyed state in place (find the skewed key bloating "
    "a state partition, audit state after an upgrade, debug a stuck "
    "watermark) without touching the running query.  Scale posture: the "
    "state read is partition-parallel over the store's own files (state "
    "partition count is decoupled from the job's shuffle partitions), "
    "and the verification join is the driver's ordinary hash compare.  "
    "The value struct's field names are the engine's positional "
    "aggregate slots (count, sum) — pinned here, exercised end-to-end.",
)
def stream_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, events_stream_dir(sf_dir))
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    ckpt = scratch_dir("cobradb_ssread_")
    with ephemeral_replay_confs(spark):
        q = (
            agg.writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        unload_state_stores(spark)
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").cast("long").alias("n"),
        F.col("value.sum").cast("long").alias("cents"),
    )
