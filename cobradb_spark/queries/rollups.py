"""Mergeable-state rollups: OHLC time-series downsampling, histogram
quantile sketches, and incremental (base + delta) aggregation.

The shared scale pattern (the TimescaleDB continuous-aggregate /
materialized-rollup design, public knowledge [P] — cobradb itself has
no rollup engine): reduce raw events to a small
per-bucket state that MERGES — so coarser windows, late backfills, and
incremental refreshes combine existing state instead of rescanning the
fact table.  min/max/sum/count merge trivially; quantiles need a sketch
(fixed-bin histogram here — deterministic, so the oracle reproduces it
bit-for-bit, unlike t-digest); first/last (OHLC open/close) merge by
carrying the boundary timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.registry import register

# value is bounded [0, 500) in the fixture; constants are part of the
# sketch spec (like HLL's register count), NOT data-derived.
_BIN_W = 5
_N_BINS = 100


@register(
    "rollup_ohlc",
    oracle="""
WITH o AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour,
       round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM o GROUP BY event_type, hour
""",
    doc="OHLC downsample to hourly bars per event_type: open/close via "
    "row_number from either end (event_id tiebreak), high/low/count as plain "
    "aggregates. One shuffle on (type, hour) serves both window directions "
    "and the rollup. At 100 TB this is the continuous-aggregate build; bars "
    "re-merge to coarser frames (daily from hourly) without touching ticks.",
)
def rollup_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hour"), "ts", "event_id", "value"
    )
    wa = Window.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    o = e.select(
        "event_type",
        "hour",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return o.groupBy("event_type", "hour").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
        F.count("*").alias("n_ticks"),
    )


@register(
    "agg_histogram_quantile_merge",
    oracle=f"""
WITH daily AS (
  -- the persisted per-day sketch: counts per fixed value bin
  SELECT date_trunc('day', ts) AS day,
         CAST(least(floor(value / {_BIN_W}), {_N_BINS - 1}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), weekly AS (
  -- rollup = merge sketches: vector-sum the bins, never rescan events
  SELECT date_trunc('week', day) AS week, bin, CAST(sum(n) AS BIGINT) AS n
  FROM daily GROUP BY 1, 2
), cum AS (
  SELECT week, bin, n,
         sum(n) OVER (PARTITION BY week ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c,
         sum(n) OVER (PARTITION BY week) AS total
  FROM weekly
)
SELECT week, CAST(max(total) AS BIGINT) AS total,
       CAST(min(CASE WHEN c >= ceil(0.50 * total) THEN bin * {_BIN_W} END) AS BIGINT) AS p50_lo,
       CAST(min(CASE WHEN c >= ceil(0.95 * total) THEN bin * {_BIN_W} END) AS BIGINT) AS p95_lo,
       CAST(min(CASE WHEN c >= ceil(0.99 * total) THEN bin * {_BIN_W} END) AS BIGINT) AS p99_lo
FROM cum GROUP BY week
""",
    doc="Mergeable quantile sketch: per-day fixed-bin histograms (bin width "
    f"{_BIN_W}, {_N_BINS} bins — spec constants, not data-derived) vector-sum "
    "into weekly sketches, then p50/p95/p99 read off the cumulative counts "
    "(lower bin edge). Unlike percentile_approx, the state is deterministic "
    "and mergeable, so weekly quantiles come from daily state with NO event "
    "rescan — the continuous-aggregate pattern for percentile dashboards. "
    "Error is bounded by bin width; both engines compute it bit-identically.",
)
def agg_histogram_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.least(F.floor(F.col("value") / _BIN_W), F.lit(_N_BINS - 1))
        .cast("long")
        .alias("bin"),
    ).agg(F.count("*").alias("n"))
    weekly = daily.groupBy(
        F.date_trunc("week", "day").alias("week"), "bin"
    ).agg(F.sum("n").alias("n"))
    w = Window.partitionBy("week").orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = weekly.select(
        "week",
        "bin",
        "n",
        F.sum("n").over(w).alias("c"),
        F.sum("n").over(Window.partitionBy("week")).alias("total"),
    )

    def q_lo(p: float):
        hit = F.when(F.col("c") >= F.ceil(p * F.col("total")), F.col("bin") * _BIN_W)
        return F.min(hit).cast("long")

    return cum.groupBy("week").agg(
        F.max("total").cast("long").alias("total"),
        q_lo(0.50).alias("p50_lo"),
        q_lo(0.95).alias("p95_lo"),
        q_lo(0.99).alias("p99_lo"),
    )


@register(
    "etl_incremental_agg",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS total,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       round(sum(value) / count(*), 6) AS avg_v
FROM events GROUP BY event_type
""",
    doc="Incremental aggregation refresh: the Spark side aggregates the "
    "'already materialized' base (days before 2024-01-21) and the 'new' delta "
    "separately, then MERGES the two states (sum+sum, count+count, min/min, "
    "max/max; avg derived at read time from merged sums — never averaged "
    "averages). The oracle recomputes from scratch; equality proves the "
    "incremental path is lossless, so a 100 TB daily refresh touches one "
    "day of data, not the full history.",
)
def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-21").cast("timestamp_ntz")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )

    base = state(e.filter(F.col("ts") < cutoff))
    delta = state(e.filter(F.col("ts") >= cutoff))
    merged = base.unionAll(delta).groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    return merged.select(
        "event_type",
        "n",
        F.round("total", 6).alias("total"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
        F.round(F.col("total") / F.col("n"), 6).alias("avg_v"),
    )


@register(
    "rollup_interpolate_linear",
    oracle="""
WITH src AS (
  SELECT * FROM events WHERE date_part('day', ts) % 3 <> 0
), actual AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
         round(sum(value), 6) AS v
  FROM src GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(day_start) AS lo, max(day_start) AS hi
  FROM actual GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_start
  FROM bounds
), joined AS (
  SELECT g.event_type, g.day_start, a.v
  FROM grid g LEFT JOIN actual a
    ON a.event_type = g.event_type AND a.day_start = g.day_start
), walls AS (
  SELECT event_type, day_start, v,
    last_value(v IGNORE NULLS) OVER w_back AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN day_start END IGNORE NULLS)
      OVER w_back AS prev_d,
    first_value(v IGNORE NULLS) OVER w_fwd AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN day_start END IGNORE NULLS)
      OVER w_fwd AS next_d
  FROM joined
  WINDOW
    w_back AS (PARTITION BY event_type ORDER BY day_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY event_type ORDER BY day_start
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day_start,
  round(CASE WHEN v IS NOT NULL THEN v
        ELSE prev_v + (next_v - prev_v)
             * (CAST(date_diff('day', prev_d, day_start) AS DOUBLE)
                / CAST(date_diff('day', prev_d, next_d) AS DOUBLE)) END,
        6) AS v_filled,
  (v IS NULL) AS interpolated
FROM walls
""",
    doc="Time-series linear interpolation: per-series daily rollup with "
    "interior gaps (every 3rd calendar day withheld to create "
    "deterministic holes) completed by straight-line interpolation "
    "between the nearest present neighbors — last_value/first_value "
    "IGNORE NULLS over the dense grid, then "
    "prev + (next-prev) * gap_fraction. The grid is bounded per series "
    "by its own present endpoints, so no extrapolation is invented. "
    "Everything downstream of the first rollup operates on "
    "#series x #days rows, never raw events; both window directions and "
    "the rollup share the series-key partitioning. Identical float "
    "expression order on both engines makes the fill hash-exact.",
)
def rollup_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    src = load_events(spark, sf_dir).filter(F.dayofmonth("ts") % 3 != 0)
    actual = src.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day_start")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    bounds = actual.groupBy("event_type").agg(
        F.min("day_start").alias("lo"), F.max("day_start").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day_start"),
    )
    joined = grid.join(actual, ["event_type", "day_start"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("day_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("day_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("v").isNotNull(), F.col("day_start"))
    walls = joined.select(
        "event_type",
        "day_start",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(known_day, ignorenulls=True).over(w_back).alias("prev_d"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(known_day, ignorenulls=True).over(w_fwd).alias("next_d"),
    )
    frac = F.datediff("day_start", "prev_d").cast("double") / F.datediff(
        "next_d", "prev_d"
    ).cast("double")
    fill = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
    return walls.select(
        "event_type",
        "day_start",
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(fill), 6
        ).alias("v_filled"),
        F.col("v").isNull().alias("interpolated"),
    )


@register(
    "rollup_growth_mom_yoy",
    oracle="""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       round(revenue / lag(revenue, 1) OVER (ORDER BY month) - 1.0, 6) AS mom_growth,
       round(revenue / lag(revenue, 12) OVER (ORDER BY month) - 1.0, 6) AS yoy_growth
FROM monthly
""",
    doc="Month-over-month and year-over-year revenue growth — the BI "
    "staple every reporting layer serves. Orders reduce to the monthly "
    "grid in one partial+final pass; the lag(1)/lag(12) windows then run "
    "on |months| rows, so the unpartitioned window is bounded by the "
    "calendar, not the data (a 100-year fact table yields 1200 rows), "
    "and its single-partition execution is deliberate and safe.",
    tags=("rollups",),
)
def rollup_growth_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue", 1).over(w) - 1.0, 6).alias("mom_growth"),
        F.round(F.col("revenue") / F.lag("revenue", 12).over(w) - 1.0, 6).alias("yoy_growth"),
    )


@register(
    "rollup_rolling_median_7d",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         round(sum(value), 6) AS x
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, x,
       round(CAST(median(x) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 6) AS med7
FROM g
""",
    doc="Exact 7-day rolling MEDIAN of daily totals per event type — the "
    "robust trailing baseline (median shrugs off the single-day spikes "
    "that drag a rolling mean; pairs with events_anomaly_mad). Facts "
    "reduce to the (type, day) grid map-side FIRST, so the exact "
    "percentile-over-frame — quadratic-ish per partition — runs on "
    "calendar-bounded grid rows, never raw events; that reduction is what "
    "keeps an exact rolling median feasible at 100 TB.",
    tags=("rollups",),
)
def rollup_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return g.select(
        "event_type",
        "day",
        "x",
        F.round(F.expr("percentile(x, 0.5)").over(w), 6).alias("med7"),
    )


_LTTB_K = 20  # output points per series (first + 18 buckets + last)


@register(
    "rollup_downsample_lttb",
    oracle=f"""
WITH RECURSIVE
pts AS (
  SELECT event_type, ts, value, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
big AS (SELECT * FROM pts WHERE n > {_LTTB_K}),
mid AS (
  SELECT event_type, ts, value, event_id,
         ((r - 2) * {_LTTB_K - 2}) // (n - 2) AS b
  FROM big WHERE r >= 2 AND r <= n - 1
),
anch AS (
  SELECT event_type, b - 1 AS i, ts, value FROM (
    SELECT event_type, b, ts, value,
           row_number() OVER (PARTITION BY event_type, b
                              ORDER BY ts, event_id) AS rb,
           count(*) OVER (PARTITION BY event_type, b) AS cb
    FROM mid) t
  WHERE rb = (cb + 1) // 2 AND b >= 1
  UNION ALL
  SELECT event_type, {_LTTB_K - 3}, ts, value FROM big WHERE r = n
),
sel AS (
  SELECT event_type, CAST(0 AS BIGINT) AS i, ts, value FROM big WHERE r = 1
  UNION ALL
  SELECT event_type, i + 1, best.ts, best.value
  FROM (
    SELECT s.event_type, s.i,
           (SELECT struct_pack(ts := m.ts, value := m.value)
            FROM mid m, anch a
            WHERE m.event_type = s.event_type AND m.b = s.i
              AND a.event_type = s.event_type AND a.i = s.i
            ORDER BY abs((CAST(epoch_us(s.ts) AS DOUBLE)
                          - CAST(epoch_us(a.ts) AS DOUBLE)) * (m.value - s.value)
                       - (CAST(epoch_us(s.ts) AS DOUBLE)
                          - CAST(epoch_us(m.ts) AS DOUBLE)) * (s.value - a.value)) DESC,
                     m.ts, m.event_id
            LIMIT 1) AS best
    FROM sel s WHERE s.i <= {_LTTB_K - 3}
  ) WHERE best IS NOT NULL
)
SELECT event_type, i AS sel_idx, ts, value FROM sel
UNION ALL
SELECT event_type, CAST({_LTTB_K - 1} AS BIGINT), ts, value FROM big WHERE r = n
""",
    doc=f"Perceptual time-series downsampling to {_LTTB_K} points per series "
    "— the Largest-Triangle-Three-Buckets shape (Steinarsson 2013) that "
    "dashboard/observability stores run before rendering.  Deterministic "
    "variant: the next-bucket ANCHOR is the bucket's median-rank point "
    "rather than its mean (an aggregate mean's float summation order is "
    "engine-dependent; a ranked point is bit-identical everywhere), and "
    "the triangle-area argmax ties break on (ts, event_id).  Bucket "
    "boundaries are exact integer arithmetic ((r-2)*(K-2)) // (n-2).  "
    "Selection is sequential by construction (each pick depends on the "
    "previous), so Spark runs it per-series via applyInPandas — series "
    "are the unit of parallelism, the right grain at 100 TB where series "
    "count >> cores; the oracle replays the identical greedy recursion "
    "as a DuckDB recursive CTE (leftmost-max correlated pick per step), "
    "the BPE-apply pattern.  Series with <= K points are excluded "
    "(documented; none at test sfs).",
    tags=("rollups", "timeseries"),
)
def rollup_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    k = _LTTB_K

    def downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        if n <= k:
            return pd.DataFrame(
                {"event_type": [], "sel_idx": [], "ts": [], "value": []}
            )
        x = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy().astype(
            np.float64
        )
        v = pdf["value"].to_numpy(dtype=np.float64)
        # middle rows (0-based positions 1..n-2) -> bucket ((r-2)*(k-2))//(n-2)
        pos = np.arange(1, n - 1)
        b = ((pos - 1) * (k - 2)) // (n - 2)
        # anchors: for i < k-3 the median-rank point of bucket i+1; for
        # i = k-3 the final point
        anchor = {}
        for i in range(k - 3):
            members = pos[b == i + 1]
            anchor[i] = members[(len(members) + 1) // 2 - 1]
        out_idx = [0]
        cur = 0
        for i in range(k - 2):
            members = pos[b == i]
            if i < k - 3:
                ax, av = x[anchor[i]], v[anchor[i]]
            else:
                ax, av = x[n - 1], v[n - 1]
            areas = np.abs(
                (x[cur] - ax) * (v[members] - v[cur])
                - (x[cur] - x[members]) * (v[cur] - av)
            )
            cur = int(members[int(np.argmax(areas))])  # first max = (ts, id) tiebreak
            out_idx.append(cur)
        out_idx.append(n - 1)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[:1].repeat(k).to_numpy(),
                "sel_idx": np.arange(k, dtype=np.int64),
                "ts": pdf["ts"].iloc[out_idx].to_numpy(),
                "value": pdf["value"].iloc[out_idx].to_numpy(),
            }
        )

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value", "event_id"
    )
    return e.groupBy("event_type").applyInPandas(
        downsample, schema="event_type string, sel_idx long, ts timestamp, value double"
    )


_DAY_US = 86_400_000_000


@register(
    "rollup_state_duration",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS s_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS e_us
  FROM events
), iv AS (
  SELECT event_type, s_us, e_us FROM e WHERE e_us IS NOT NULL
), d AS (
  SELECT event_type, s_us, e_us,
         unnest(generate_series(s_us // {_DAY_US}, e_us // {_DAY_US})) AS day
  FROM iv
), o AS (
  SELECT event_type, day,
         least(e_us, (day + 1) * {_DAY_US})
           - greatest(s_us, day * {_DAY_US}) AS dur
  FROM d
)
SELECT event_type, CAST(day AS BIGINT) AS epoch_day,
       CAST(sum(dur) AS BIGINT) AS state_us,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM o WHERE dur > 0 GROUP BY event_type, day ORDER BY event_type, day
""",
    doc="Daily time-in-state accounting (interval apportionment): each "
    "user's stream defines state intervals — the user is 'in' the state "
    "of an event from that event until their next one (status-change "
    "semantics; the final open interval is excluded) — and every "
    "interval is SPLIT across the UTC day boundaries it spans, "
    "apportioning exact integer microseconds to each day "
    "(least/greatest clamp per day, [start, end) convention so "
    "boundary-aligned ends contribute zero to the next day).  Output "
    "per (state, epoch day): total occupied microseconds and the "
    "number of contributing intervals — the state-occupancy rollup "
    "behind uptime reports, SLA attribution, and billing proration, "
    "and the missing interval shape next to join_range_interval "
    "(point-in-interval) and join_interval_overlap (interval-interval). "
    "All arithmetic is BIGINT epoch micros (unix_micros == epoch_us, "
    "the events-family idiom); day identity is integer floor division "
    "— no date/timezone function whose semantics could diverge.  "
    "Scale: the lead window partitions by user_id (per-user series are "
    "the parallelism grain); the day explode fans out one row per "
    "(interval, day spanned) — bounded by the calendar retention "
    "window, linear in intervals for bounded gaps; the rollup "
    "partial-aggregates map-side to O(states x days) rows.",
    tags=("rollups", "timeseries"),
)
def rollup_state_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            us.alias("s_us"),
        )
        .withColumn("e_us", F.lead("s_us").over(w))
        .filter(F.col("e_us").isNotNull())
        .select("event_type", "s_us", "e_us")
    )
    d = iv.select(
        "event_type",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {_DAY_US}"), F.expr(f"e_us div {_DAY_US}")
            )
        ).alias("day"),
    )
    o = d.select(
        "event_type",
        "day",
        (
            F.least(F.col("e_us"), (F.col("day") + 1) * _DAY_US)
            - F.greatest(F.col("s_us"), F.col("day") * _DAY_US)
        ).alias("dur"),
    ).filter(F.col("dur") > 0)
    return (
        o.groupBy("event_type", F.col("day").cast("bigint").alias("epoch_day"))
        .agg(
            F.sum("dur").cast("bigint").alias("state_us"),
            F.count("*").cast("bigint").alias("n_intervals"),
        )
        .orderBy("event_type", "epoch_day")
    )


@register(
    "rollup_dow_hour_heatmap",
    oracle="""
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM events GROUP BY 1, 2
""",
    doc="Day-of-week x hour-of-day activity heatmap — the standard "
    "operations dashboard rollup (when is the system busy): event "
    "count, exact distinct users, exact cents per (dow, hod) cell. "
    "DuckDB dayofweek (0=Sunday..6) differs from Spark dayofweek "
    "(1=Sunday..7) by exactly one — the Spark side subtracts 1, an "
    "engine-semantics note of the kind H5 documents for months. "
    "Scale: one partial+final rollup to a fixed 168-cell grid; the "
    "exact distinct is the only shuffle-heavy term and swaps for the "
    "HLL/bitmap sketches in this family when 100-TB exactness is not "
    "required.",
    tags=("rollups",),
)
def rollup_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    e = load_events(spark, sf_dir)
    return e.groupBy(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


@register(
    "rollup_time_weighted_avg",
    oracle="""
WITH s AS (
  SELECT user_id, ts,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), seg AS (
  SELECT user_id, cents,
         date_diff('second', ts, nxt) AS dur_s
  FROM s WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(dur_s) AS BIGINT) AS total_s,
       CAST(sum(cents * dur_s) AS BIGINT) AS weighted_sum,
       CAST(sum(cents * dur_s) // sum(dur_s) AS BIGINT) AS twap_cents
FROM seg WHERE dur_s > 0
GROUP BY user_id
""",
    doc="Time-weighted average (TWAP) per user over the irregular event "
    "stream — each observation holds until the next one, so its weight "
    "is the integer-second duration of its validity segment (the "
    "step-function integral finance and sensor pipelines need where a "
    "plain AVG over-weights bursts of rapid updates). Pure integers: "
    "cents x seconds sums in BIGINT, the final TWAP as truncating "
    "division (both engines truncate toward zero, verified). "
    "Zero-duration segments (same-second updates) drop on both sides. "
    "Scale: the lead() window and the per-user rollup share ONE "
    "user_id exchange; the weighted sums combine map-side.",
    tags=("rollups", "timeseries"),
)
def rollup_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cobradb_spark.io import load_events

    e = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias(
            "dur_s"
        ),
    ).filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return s.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum("dur_s").cast("bigint").alias("total_s"),
        F.sum(F.col("cents") * F.col("dur_s")).cast("bigint").alias("weighted_sum"),
        F.expr(
            "CAST(div(sum(cents * dur_s), sum(dur_s)) AS BIGINT)"
        ).alias("twap_cents"),
    )
