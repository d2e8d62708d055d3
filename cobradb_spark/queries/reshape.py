"""Reshape + timeseries-completion operators: pivot, unpivot, gap-fill,
SCD2 history.

Reference grounding [P]: cobradb's catalog serving pivots model x
property matrices (model_reaction bounds per model), and its old-ID
lineage tables are exactly slowly-changing-dimension history (SURVEY
§1.1 cluster 4).  Gap-fill is the timeseries-completion twin of the
hypertable rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.registry import register


@register(
    "agg_pivot",
    oracle="""
SELECT o_orderpriority,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS F,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS O,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS P
FROM orders GROUP BY o_orderpriority
""",
    doc="Pivot: status columns out of rows (model x property matrix serving shape "
    "[P]). Explicit value list — never let pivot infer values at scale (that's an "
    "extra distinct scan).",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0.0)).alias("F"),
        F.coalesce("O", F.lit(0.0)).alias("O"),
        F.coalesce("P", F.lit(0.0)).alias("P"),
    )


@register(
    "reshape_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, name AS rate_kind, value AS rate
FROM (SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem)
UNPIVOT (value FOR name IN (l_discount, l_tax))
""",
    doc="Unpivot/melt: wide rate columns back to (kind, value) rows — the inverse "
    "reshape, zero-shuffle (Expand operator, no exchange).",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_discount", "l_tax").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_discount", "l_tax"],
        "rate_kind",
        "rate",
    )


@register(
    "rollup_gapfill",
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
  FROM events
), grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_start FROM bounds
), actual AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT g.day_start, coalesce(a.n, 0) AS n, (a.n IS NULL) AS gap_filled
FROM grid g LEFT JOIN actual a ON a.day_start = g.day_start
""",
    doc="Gap-fill: dense daily grid via sequence()+explode left-joined to the "
    "actual per-day counts — missing buckets appear as zeros with a gap flag "
    "(timeseries completion; the grid generation is O(#days), driver-free).",
)
def rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day_start")
    )
    actual = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day_start"))
        .agg(F.count("*").alias("n"))
    )
    return grid.join(actual, on="day_start", how="left").select(
        "day_start",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.col("n").isNull().alias("gap_filled"),
    )


@register(
    "etl_scd2_history",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0
), new AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 10.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT o.o_orderkey, o.o_totalprice, 1 AS version,
       (n.o_orderkey IS NULL) AS is_current
FROM old o LEFT JOIN new n ON n.o_orderkey = o.o_orderkey
UNION ALL
SELECT o_orderkey, o_totalprice, 2 AS version, TRUE AS is_current FROM new
""",
    doc="SCD2 history merge: the reference's old-ID lineage tables "
    "(old_id_model_synonym [P]) generalized — superseded rows keep version 1 "
    "with is_current=false, incoming rows become version 2. One left join + "
    "union; at scale both sides hash-partition on the key.",
)
def etl_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", (F.col("o_totalprice") + 10.0).alias("o_totalprice")
    )
    new_keys = new.select("o_orderkey", F.lit(True).alias("__in_new"))
    hist_old = old.join(new_keys, on="o_orderkey", how="left").select(
        "o_orderkey",
        "o_totalprice",
        F.lit(1).alias("version"),
        F.col("__in_new").isNull().alias("is_current"),
    )
    hist_new = new.select(
        "o_orderkey",
        "o_totalprice",
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return hist_old.unionByName(hist_new)
