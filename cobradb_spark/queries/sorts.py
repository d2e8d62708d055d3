"""§2 F — sorts / limits / top-k.

The order-insensitive value-hash can't see row order, so each sort query
*encodes* the order it produced as a row_number column — the oracle must
then produce identical positions.  F2 relies on Spark's
TakeOrderedAndProject (no global sort for a top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.registry import register


@register(
    "sort_multikey_nulls",
    oracle="""
SELECT o_orderkey, status_or_null,
       CAST(row_number() OVER (ORDER BY status_or_null DESC NULLS LAST, o_orderkey) AS BIGINT)
         AS pos
FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null FROM orders)
""",
    doc="F1 multi-key sort with NULLS LAST; position encoded via an exact global "
    "row_number so the order-insensitive hash still verifies ordering.  The "
    "rank comes from operators/rank.py global_rank (range partition + "
    "per-partition offsets), NOT a single-partition window — the same plan "
    "shape survives at 100 TB.",
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.operators.rank import global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("O")).alias("status_or_null")
    )
    order = [F.col("status_or_null").desc_nulls_last(), F.col("o_orderkey").asc()]
    return global_rank(o, order, rank_col="pos").orderBy(*order).select(
        "o_orderkey", "status_or_null", "pos"
    )


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    doc="F2 global top-k -> TakeOrderedAndProject: per-partition heaps + merge on the "
    "driver, never a full sort. Unique tiebreaker keeps the selected set stable.",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 5 OFFSET 5
""",
    doc="F3 offset+limit pagination over a unique-key order (deterministic page).",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(5).limit(5)
