"""§2 G — set operations.

Reference grounding [P]: version-diffs between database loads — old-vs-
new bigg_id sets, deprecated-ID detection (old_id_model_synonym).  Two
date-slices of orders stand in for two catalog versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.registry import register


# Disjoint eras split at 2000-01-01: customers active only before the
# split give EXCEPT a real (non-empty) difference to verify — the
# round-2 overlapping slices made every old customer also new, so the
# EXCEPT check compared zero rows (vacuously green).
def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderdate") < "2000-01-01").select("o_custkey")
    new = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    return old, new


_OLD = "SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'"
_NEW = "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'"


@register(
    "set_union_all",
    oracle=f"SELECT o_custkey FROM ({_OLD}) UNION ALL SELECT o_custkey FROM ({_NEW})",
    doc="G1a bag union (synonym sources merged, duplicates kept) — unionByName, "
    "a zero-shuffle concatenation of partitions.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _slices(spark, sf_dir)
    return old.unionByName(new)


@register(
    "set_union_distinct",
    oracle=f"SELECT o_custkey FROM ({_OLD}) UNION SELECT o_custkey FROM ({_NEW})",
    doc="G1b distinct union — union + hash-distinct (one shuffle on the key).",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _slices(spark, sf_dir)
    return old.unionByName(new).distinct()


@register(
    "set_intersect",
    oracle=f"SELECT o_custkey FROM ({_OLD}) INTERSECT SELECT o_custkey FROM ({_NEW})",
    doc="G2 intersection — ids present in both catalog versions; plans as an "
    "aggregate + semi join.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _slices(spark, sf_dir)
    return old.intersect(new)


@register(
    "set_except",
    oracle=f"SELECT o_custkey FROM ({_OLD}) EXCEPT SELECT o_custkey FROM ({_NEW})",
    doc="G3 difference — deprecated-ID detection (in old version, gone in new) [P]; "
    "plans as an aggregate + anti join.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _slices(spark, sf_dir)
    return old.subtract(new)  # distinct EXCEPT; exceptAll is the bag variant


@register(
    "set_intersect_except_all",
    oracle=f"""
SELECT 'intersect_all' AS op, o_custkey FROM
  (SELECT o_custkey FROM ({_OLD}) INTERSECT ALL SELECT o_custkey FROM ({_NEW}))
UNION ALL
SELECT 'except_all', o_custkey FROM
  (SELECT o_custkey FROM ({_OLD}) EXCEPT ALL SELECT o_custkey FROM ({_NEW}))
""",
    doc="G2/G3 bag variants — INTERSECT ALL / EXCEPT ALL keep "
    "multiplicities (min / truncated difference of per-key counts), the "
    "semantics that matter when the key legitimately repeats (multiple "
    "orders per customer in each era). Spark's intersectAll/exceptAll "
    "plan as count-aggregate + join + replicate — one shuffle per side, "
    "never a row-by-row comparison. Both ops are emitted in one frame "
    "with an op tag; the driver's order-insensitive hash covers the "
    "multiset equality.",
)
def set_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _slices(spark, sf_dir)
    ia = old.intersectAll(new).select(F.lit("intersect_all").alias("op"), "o_custkey")
    ea = old.exceptAll(new).select(F.lit("except_all").alias("op"), "o_custkey")
    return ia.unionByName(ea)
