"""§2 B — projection / filter / predicates.

Reference grounding [P]: every cobradb loader query filters on
bigg_id/model_id conjunctions; derived columns come from
util.py::make_reaction_copy_id; pseudoreaction classification
(util.py::check_pseudoreaction) is prefix-rule CASE/WHEN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.registry import register


@register(
    "project_compute",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS net_price, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged "
        "FROM lineitem"
    ),
    doc="B1 computed projection; ref: make_reaction_copy_id derived ids [P]. Pure "
    "row-local arithmetic stays inside whole-stage codegen.",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
    )


@register(
    "filter_conjunctive",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount "
        "FROM lineitem "
        "WHERE (l_quantity > 30 AND l_discount < 0.05) "
        "   OR (l_returnflag = 'R' AND l_tax > 0.06)"
    ),
    doc="B2 conjunctive/disjunctive predicate; ref: loader bigg_id==x AND model_id==y "
    "filters [P]. The whole predicate pushes to the parquet scan (PushedFilters).",
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)) | (
        (F.col("l_returnflag") == "R") & (F.col("l_tax") > 0.06)
    )
    return li.filter(pred).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter_in_null",
    oracle="""
SELECT o_orderkey,
       nullif(o_orderstatus, 'O') AS status_or_null,
       (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND nullif(o_orderstatus, 'P') IS NOT NULL
""",
    doc="B3 IN / IS NULL / null-safe equality; ref: Gene.mapped_to_genbank.is_(None) "
    "checks [P]. <=> is Spark's null-safe eq; DuckDB spells it IS NOT DISTINCT FROM.",
)
def filter_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull()
        ).select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("is_open"),
        )
    )


@register(
    "case_when",
    oracle="""
SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent'
            WHEN o_orderpriority LIKE '2%' THEN 'high'
            ELSE 'normal' END AS band,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
""",
    doc="B4 CASE/WHEN banding; ref: util.py::check_pseudoreaction prefix rules "
    "(EX_/DM_/SK_/ATPM/biomass) [P] — same shape: classify by prefix, aggregate.",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_orderpriority").startswith("1"), "urgent")
        .when(F.col("o_orderpriority").startswith("2"), "high")
        .otherwise("normal")
    )
    return (
        o.groupBy(band.alias("band"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "distinct_project",
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
    doc="B5 distinct projection; ref: session.query(Compartment.bigg_id).distinct() [P]. "
    "Hash-aggregate with map-side partial distinct.",
)
def distinct_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select("p_brand", "p_type").distinct()
