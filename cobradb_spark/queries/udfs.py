"""§2 K — UDF / UDAF / UDTF surface.

Reference grounding [P]: cobradb's per-row Python transforms (scrub /
convert / hash in parse.py and util.py).  Discipline (SURVEY §4.3.4):
Arrow-batched pandas UDFs everywhere Python is unavoidable; the
row-at-a-time K1 exists as the deliberately-tested slow case, its
result cross-checked against the native H1 formulation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cobradb_spark.io import load_table
from cobradb_spark.registry import register


@register(
    "udf_scalar_python",
    oracle="""
SELECT p_partkey,
       lower(trim(regexp_replace(p_name, '[^a-zA-Z0-9_]', '_', 'g'))) AS norm_id
FROM part
""",
    doc="K1 row-at-a-time Python UDF (the deliberately-tested slow path): same "
    "id-scrub as H1, so the native formulation is its self-oracle. Pickle serde "
    "per row — never on a 100 TB hot path.",
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    @F.udf(T.StringType())
    def scrub(s: str) -> str:
        return re.sub(r"[^a-zA-Z0-9_]", "_", s).strip().lower()

    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", scrub("p_name").alias("norm_id"))


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
""",
    doc="K2 vectorized pandas UDF (Arrow batches): net price. ~10-100x the K1 "
    "throughput; still slower than the pure-codegen B1 — kept for API parity.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", net("l_extendedprice", "l_discount").alias("net_price")
    )


@register(
    "udaf_pandas_grouped_agg",
    oracle="""
SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
    doc="K3 grouped-aggregate pandas UDF (GROUPED_AGG): per-group min/max via Arrow. "
    "The geometric-mean variant (no exact SQL twin) is covered in tests.",
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def pd_min(v: pd.Series) -> float:
        return float(v.min())

    @F.pandas_udf(T.DoubleType())
    def pd_max(v: pd.Series) -> float:
        return float(v.max())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        pd_min("l_quantity").alias("min_qty"), pd_max("l_quantity").alias("max_qty")
    )


@register(
    "udf_grouped_map_normalize",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round((l_quantity - avg(l_quantity) OVER w) / stddev_samp(l_quantity) OVER w, 6) AS z
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag)
""",
    doc="K4 grouped-map applyInPandas: z-normalize quantity within each return-flag "
    "group (whole group as one pandas frame in, frame out). The SQL window twin is "
    "the oracle.",
)
def udf_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["l_quantity"]
        pdf = pdf[["l_orderkey", "l_linenumber"]].copy()
        pdf["z"] = ((v - v.mean()) / v.std(ddof=1)).round(6)
        return pdf

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        znorm, schema="l_orderkey long, l_linenumber int, z double"
    )


@register(
    "udtf_expand",
    oracle="""
SELECT p_partkey,
       unnest(str_split(p_name, ' ')) AS word,
       generate_subscripts(str_split(p_name, ' '), 1) AS pos
FROM part
""",
    doc="K5 Spark 4 UDTF: explode 'gene_reaction_rule'-style strings to rows "
    "(token, position) via a lateral join.",
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos long")
    class SplitWords:
        def eval(self, name: str):
            for i, w in enumerate(name.split(" ")):
                yield w, i + 1

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        "SELECT p_partkey, t.word, t.pos FROM part_v, LATERAL split_words(p_name) t"
    )


@register(
    "udaf_pandas_gmean",
    oracle="""
SELECT l_returnflag,
       round(exp(avg(ln(l_quantity))), 6) AS gmean_qty
FROM lineitem WHERE l_quantity > 0 GROUP BY l_returnflag
""",
    doc="K3b GROUPED_AGG geometric mean via pandas UDF, hash-checked against "
    "the exp(avg(ln)) identity in SQL: both sides round to 6 decimals, and "
    "the ~1e-14 relative float difference between numpy's mean and the "
    "oracle's avg is 8 orders of magnitude inside that rounding (also "
    "asserted in tests).",
)
def udaf_pandas_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def gmean(v: pd.Series) -> float:
        return float(np.exp(np.log(v[v > 0]).mean()))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(gmean("l_quantity"), 6).alias("gmean_qty")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT vec_id AS id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
       round(CAST(embedding[1] AS DOUBLE) /
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS u0,
       round(CAST(embedding[2] AS DOUBLE) /
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS u1
FROM embeddings
""",
    doc="K-ext mapInArrow: the zero-copy sibling of mapInPandas — batches "
    "arrive as pyarrow RecordBatches, vectors are viewed as a contiguous "
    "numpy matrix (no per-row Python objects, no pandas boxing), L2 "
    "normalization is one BLAS-backed matrix op, and the result goes back "
    "as a single RecordBatch. This is the hot-path shape for 100 TB "
    "embedding jobs: per-batch amortized FFI, columnar in AND out. "
    "Oracle: the same normalization in pure SQL HOFs.",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    def normalize(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            flat = emb.flatten()  # ListArray -> contiguous values
            dim = len(flat) // len(batch)
            m = np.asarray(flat, dtype=np.float64).reshape(len(batch), dim)
            l2 = np.sqrt((m * m).sum(axis=1))
            u = m / l2[:, None]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(np.round(l2, 6)),
                    pa.array(np.round(u[:, 0], 6)),
                    pa.array(np.round(u[:, 1], 6)),
                ],
                names=["id", "l2", "u0", "u1"],
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(normalize, schema="id long, l2 double, u0 double, u1 double")


@register(
    "udf_cogrouped_map",
    oracle="""
WITH cust AS (
  SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_cust,
         round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS cust_bal
  FROM customer GROUP BY 1
), supp AS (
  SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_supp,
         round(sum(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS supp_bal
  FROM supplier GROUP BY 1
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(c.n_cust, 0) AS n_cust,
       coalesce(s.n_supp, 0) AS n_supp,
       CAST(round(coalesce(c.cust_bal, 0) - coalesce(s.supp_bal, 0), 2)
            AS DOUBLE) AS bal_gap
FROM cust c FULL JOIN supp s ON s.nationkey = c.nationkey
""",
    doc="K-ext cogrouped-map: customers and suppliers are grouped on "
    "nationkey and fed PAIRWISE into one Arrow-batched pandas function "
    "(df.groupBy(...).cogroup(other.groupBy(...)).applyInPandas) that "
    "sees both sides of a key at once — the API for custom per-key "
    "merge logic (as-of alignment, reconciliation, interleaving) that "
    "would otherwise need a join plus a grouped map. Either side may be "
    "EMPTY for a key (full-outer cogroup semantics) — exercised and "
    "matched against a full-outer-join-of-aggregates oracle. Decimal "
    "cents inside pandas keep the sums bit-stable; one shuffle per "
    "side, same as the join it replaces.",
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.round(F.col("s_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )

    def reconcile(key, cdf: pd.DataFrame, sdf: pd.DataFrame):
        return pd.DataFrame(
            {
                "nationkey": [int(key[0])],
                "n_cust": [len(cdf)],
                "n_supp": [len(sdf)],
                "bal_gap": [
                    (int(cdf["bal_cents"].sum()) - int(sdf["bal_cents"].sum()))
                    / 100.0
                ],
            }
        )

    return (
        c.groupBy("nationkey")
        .cogroup(s.groupBy("nationkey"))
        .applyInPandas(
            reconcile,
            "nationkey long, n_cust long, n_supp long, bal_gap double",
        )
    )


@register(
    "udf_sql_declarative",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
         AS charged
FROM lineitem
GROUP BY l_orderkey
""",
    doc="Declarative SQL UDF (Spark 4 CREATE FUNCTION ... RETURNS ... "
    "RETURN expr): the charge formula is registered ONCE as a catalog "
    "function and reused by name. Unlike Python UDFs, the body is "
    "inlined into the plan by Catalyst — full codegen, predicate "
    "pushdown through it, zero serialization — so shared business "
    "logic gets UDF ergonomics at built-in-function speed. The oracle "
    "applies the expanded formula directly, proving the inlining is "
    "semantically transparent.",
)
def udf_sql_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cb_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("cb_li_sqludf")
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(cb_charge(l_extendedprice, l_discount, l_tax)), 6)
                 AS charged
        FROM cb_li_sqludf
        GROUP BY l_orderkey
        """
    )


@register(
    "reshape_transpose",
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n_events,
         round(sum(value), 6) AS total_value
  FROM events GROUP BY 1
)
SELECT 'n_events' AS key,
       max(CASE WHEN event_type = 'click' THEN n_events END) AS click,
       max(CASE WHEN event_type = 'error' THEN n_events END) AS error,
       max(CASE WHEN event_type = 'purchase' THEN n_events END) AS purchase,
       max(CASE WHEN event_type = 'signup' THEN n_events END) AS signup,
       max(CASE WHEN event_type = 'view' THEN n_events END) AS view
FROM m
UNION ALL
SELECT 'total_value',
       max(CASE WHEN event_type = 'click' THEN total_value END),
       max(CASE WHEN event_type = 'error' THEN total_value END),
       max(CASE WHEN event_type = 'purchase' THEN total_value END),
       max(CASE WHEN event_type = 'signup' THEN total_value END),
       max(CASE WHEN event_type = 'view' THEN total_value END)
FROM m
""",
    doc="Spark 4 DataFrame.transpose(): a per-event-type metrics frame "
    "(5 rows x 2 metrics) flips to metrics-as-rows with event types as "
    "columns — the index column's values become column names. Transpose "
    "necessarily materializes the (small, post-aggregation) frame shape "
    "on the driver, so the idiom is: aggregate FIRST, transpose the "
    "tiny summary — never raw data. Oracle is the explicit "
    "conditional-pivot UNION.",
)
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    m = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("double").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    return m.transpose(F.col("event_type"))


@register(
    "udf_arrow_optimized_scalar",
    oracle="""
SELECT o_orderkey,
       concat(o_orderstatus, ':', CAST(CAST(floor(o_totalprice / 10000) AS BIGINT) AS VARCHAR))
         AS price_band
FROM orders
""",
    doc="Arrow-OPTIMIZED row UDF (udf(useArrow=True), Spark 3.5+): the "
    "third Python execution tier between pickle rows (K1) and pandas "
    "batches (K2) — plain-Python per-row logic, but arguments/results "
    "move over Arrow columnar batches, typically several x faster serde "
    "than pickle with zero code change. Plan shows ArrowEvalPython "
    "instead of BatchEvalPython (plan-audited). Same rule as K1 applies: "
    "never on the 100 TB hot path when a codegen expression exists.",
    tags=("udfs",),
)
def udf_arrow_optimized_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.StringType(), useArrow=True)
    def band(status: str, total: float) -> str:
        return f"{status}:{int(total // 10000)}"

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", band("o_orderstatus", "o_totalprice").alias("price_band")
    )


@register(
    "udtf_polymorphic_analyze",
    oracle="""
SELECT o_orderkey,
       'o_orderstatus' AS col_0, o_orderstatus AS val_0,
       'o_orderpriority' AS col_1, o_orderpriority AS val_1
FROM orders
""",
    doc="K5-ext POLYMORPHIC UDTF (Spark 4 analyze()): the output schema is "
    "computed at ANALYSIS time from the incoming argument types/count — "
    "one UDTF unpivots any number of string columns without a declared "
    "schema. This is the API the reference's dynamic-SQL helpers would "
    "map to: schema flows from the call site, Catalyst sees concrete "
    "columns, and downstream pruning/pushdown still work.",
    tags=("udfs",),
)
def udtf_polymorphic_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class TagCols:
        @staticmethod
        def analyze(*args: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(len(args)):
                schema = schema.add(f"col_{i}", StringType()).add(
                    f"val_{i}", StringType()
                )
            return AnalyzeResult(schema=schema)

        def eval(self, *cols: str):
            out = []
            for i, v in enumerate(cols):
                out += [f"arg_{i}", v]
            yield tuple(out)

    spark.udtf.register("tag_cols", udtf(TagCols))
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_udtf_v")
    df = spark.sql(
        "SELECT o_orderkey, t.* FROM orders_udtf_v, "
        "LATERAL tag_cols(o_orderstatus, o_orderpriority) t"
    )
    return df.select(
        "o_orderkey",
        F.lit("o_orderstatus").alias("col_0"),
        F.col("val_0"),
        F.lit("o_orderpriority").alias("col_1"),
        F.col("val_1"),
    )


@register(
    "udf_grouped_apply_arrow",
    oracle="""
SELECT label,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1
FROM embeddings GROUP BY label
""",
    doc="K-ext grouped applyInArrow (Spark 4): each label's vectors arrive as "
    "ONE pyarrow Table (columnar, no pandas boxing), the centroid is a numpy "
    "mean over the contiguous matrix, one output row per group.  The Arrow "
    "sibling of applyInPandas for per-group kernels at 100 TB — group rows "
    "are sorted by vec_id before reduction so the float sum order (and hence "
    "the driver hash) is run-to-run deterministic.  Oracle: per-label avg of "
    "the leading dimensions in SQL.",
)
def udf_grouped_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    def centroid(table: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(table.column("vec_id"))
        table = table.take(idx)
        emb = table.column("embedding")
        flat = emb.combine_chunks().flatten()
        dim = len(flat) // len(table)
        m = np.asarray(flat, dtype=np.float64).reshape(len(table), dim)
        return pa.table(
            {
                "label": pa.array([table.column("label")[0].as_py()], pa.int32()),
                "n": pa.array([len(table)], pa.int64()),
                "c0": pa.array([round(float(m[:, 0].mean()), 6)], pa.float64()),
                "c1": pa.array([round(float(m[:, 1].mean()), 6)], pa.float64()),
            }
        )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    return e.groupBy("label").applyInArrow(
        centroid, schema="label int, n long, c0 double, c1 double"
    )


@register(
    "udf_pandas_scalar_iter",
    oracle="""
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'table', ''))) // 5
            + (length(text) - length(replace(text, 'value', ''))) // 5
            AS BIGINT) AS lexicon_hits
FROM documents
""",
    doc="K-ext iterator-form pandas UDF (Iterator[pd.Series] -> "
    "Iterator[pd.Series], SCALAR_ITER): the API whose point is "
    "per-task EXPENSIVE INITIALIZATION — here an Aho-Corasick automaton "
    "(operators/ahocorasick.py) built ONCE before the batch loop and "
    "reused across every Arrow batch in the partition, the pattern used "
    "for loading a tokenizer/model once per executor task instead of "
    "once per batch (the plain SCALAR form gives no once-per-task "
    "hook).  Counts hits of a 2-word lexicon per document; both words "
    "are border-free so the replace-count oracle is provably exact "
    "(text_dictionary_match's argument).  Plan shows ArrowEvalPython "
    "with one Python worker init per task.",
    tags=("udfs",),
)
def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def lexicon_hits(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # once-per-task init: the automaton outlives every batch below
        from cobradb_spark.operators.ahocorasick import AhoCorasick

        ac = AhoCorasick(["table", "value"])
        for s in batches:
            yield pd.Series([sum(ac.count_matches(t)) for t in s], dtype="int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", lexicon_hits(F.col("text")).alias("lexicon_hits"))
