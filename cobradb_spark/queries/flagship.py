"""Flagship end-to-end query (SURVEY §7 phase 0 / BASELINE q_join_topn).

customer ⋈ orders ⋈ lineitem ⋈ nation ⋈ region → revenue per nation →
top 10.  Exercises the whole spine: pruned parquet scans, two broadcast
joins (dims), one large shuffle join, partial+final hash aggregation,
TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobradb_spark.io import load_table, load_tables
from cobradb_spark.registry import register


@register(
    "join_topn_flagship",
    oracle="""
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY n.n_name
ORDER BY revenue DESC, n_name LIMIT 10
""",
    doc="Flagship 5-table join + agg + top-k (BASELINE q_join_topn).",
)
def join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem, nation, region = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation", "region"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
        .limit(10)
    )


@register(
    "sql_returned_revenue",
    oracle="""
SELECT c.c_custkey, n.n_name,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, n.n_name
HAVING count(*) >= 5
""",
    doc="TPC-H Q10-shaped composed workload expressed ENTIRELY as SQL text "
    "through spark.sql over registered views — proving the SQL API surface "
    "end-to-end (a reference user's Postgres query ports verbatim modulo "
    "dialect). Catalyst still broadcasts nation/customer, pushes the "
    "returnflag filter to the scan, and aggregates partial+final. Revenue "
    "accumulates as exact decimal cents (discount re-expressed as an "
    "integer percentage) so both engines sum bit-identically.",
)
def sql_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_sqlv")
    return spark.sql(
        """
SELECT c.c_custkey, n.n_name,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue,
       count(*) AS n_items
FROM customer_sqlv c
JOIN orders_sqlv o ON o.o_custkey = c.c_custkey
JOIN lineitem_sqlv l ON l.l_orderkey = o.o_orderkey
JOIN nation_sqlv n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, n.n_name
HAVING count(*) >= 5
"""
    )


@register(
    "sql_shipping_priority_q3",
    oracle="""
SELECT l.l_orderkey,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
    doc="TPC-H Q3 shape (shipping priority), pure spark.sql text: the 10 "
    "highest-revenue unshipped BUILDING-segment orders. Catalyst pushes "
    "both date predicates and the segment filter to the parquet scans, "
    "broadcasts the filtered customer side, and the top-10 compiles to a "
    "TakeOrderedAndProject heap. Revenue sums as exact decimal cents for "
    "bit parity; ties broken by orderkey.",
    tags=("flagship",),
)
def sql_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q3v")
    return spark.sql(
        """
SELECT l.l_orderkey,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer_q3v c
JOIN orders_q3v o ON o.o_custkey = c.c_custkey
JOIN lineitem_q3v l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""
    )


@register(
    "sql_local_supplier_volume_q5",
    oracle="""
SELECT n.n_name,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5 shape (local supplier volume), pure spark.sql: revenue "
    "where customer and supplier share a nation inside one region — the "
    "canonical 6-way star join. Catalyst broadcasts every dimension "
    "(supplier/customer/nation/region), keeps the fact table un-shuffled "
    "until the final 5-group rollup, and pushes the date range to the "
    "orders scan. Decimal-cent accumulation for cross-engine bit parity.",
    tags=("flagship",),
)
def sql_local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q5v")
    return spark.sql(
        """
SELECT n.n_name,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue
FROM customer_q5v c
JOIN orders_q5v o ON o.o_custkey = c.c_custkey
JOIN lineitem_q5v l ON l.l_orderkey = o.o_orderkey
JOIN supplier_q5v s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation_q5v n ON n.n_nationkey = s.s_nationkey
JOIN region_q5v r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""
    )


@register(
    "sql_order_priority_exists_q4",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
    doc="TPC-H Q4 shape (order-priority checking) as pure spark.sql with a "
    "correlated EXISTS: orders of 1997 having at least one line shipped "
    "more than 60 days after the order date. Catalyst DECORRELATES the "
    "subquery into a LEFT SEMI join on l_orderkey (plan-audited: no "
    "per-row subquery execution, no nested loop) — the reference's "
    "Postgres EXISTS queries port verbatim and still get a distributed "
    "semi-join plan.",
    tags=("flagship",),
)
def sql_order_priority_exists_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q4v")
    return spark.sql(
        """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders_q4v o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem_q4v l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
"""
    )


@register(
    "sql_small_quantity_scalar_q17",
    oracle="""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small_lines,
       round(sum(l.l_extendedprice), 2) AS small_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 10
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
""",
    doc="TPC-H Q17 shape (small-quantity-order revenue) as pure spark.sql "
    "with a CORRELATED SCALAR subquery: lines whose quantity is below "
    "half their part's average. Catalyst rewrites the per-part average "
    "into ONE aggregate over lineitem joined back on l_partkey — the "
    "fact table is scanned twice but never nested-looped (plan-audited). "
    "The per-part aggregate is partial+final, so the extra pass shuffles "
    "|parts| rows, not raw lines.",
    tags=("flagship",),
)
def sql_small_quantity_scalar_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q17v")
    return spark.sql(
        """
SELECT p.p_brand,
       count(*) AS n_small_lines,
       round(sum(l.l_extendedprice), 2) AS small_revenue
FROM lineitem_q17v l
JOIN part_q17v p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 10
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem_q17v l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
"""
    )


@register(
    "sql_large_volume_in_q18",
    oracle="""
SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM lineitem l2
                       GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 150)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
    doc="TPC-H Q18 shape (large-volume customers) as pure spark.sql with an "
    "IN + GROUP BY/HAVING subquery: orders whose total quantity exceeds "
    "150, joined back to the customer. Catalyst plans the IN as a LEFT "
    "SEMI join against the pre-aggregated orderkey set (no per-row "
    "re-aggregation), then TakeOrderedAndProject for the top-100 — the "
    "aggregate-filter-semi-join pipeline a warehouse user expects.",
    tags=("flagship",),
)
def sql_large_volume_in_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q18v")
    return spark.sql(
        """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer_q18v c
JOIN orders_q18v o ON o.o_custkey = c.c_custkey
JOIN lineitem_q18v l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l2.l_orderkey FROM lineitem_q18v l2
                       GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 150)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""
    )


@register(
    "sql_idle_rich_customers_q22",
    oracle="""
SELECT c.c_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS n_custs,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22 shape (global sales opportunity) as pure spark.sql: "
    "above-average-balance customers with no RECENT order (every testdata "
    "customer has ordered at least once, so 'idle' = nothing since "
    "2000-06-01 — non-empty at every sf). Two "
    "decorrelations in one statement — the uncorrelated scalar avg "
    "becomes a broadcast one-row subquery reused across the filter, and "
    "NOT EXISTS becomes a LEFT ANTI join on o_custkey (plan-audited: no "
    "nested loop). The anti join probes orders' custkey column only — "
    "column pruning keeps the probe side narrow at scale.",
    tags=("flagship",),
)
def sql_idle_rich_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q22v")
    return spark.sql(
        """
SELECT c.c_nationkey AS nationkey,
       count(*) AS n_custs,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer_q22v c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_q22v c2
                     WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders_q22v o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c.c_nationkey
"""
    )


@register(
    "sql_waiting_suppliers_q21",
    oracle="""
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name LIMIT 25
""",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting) as pure "
    "spark.sql — the hardest decorrelation in the suite: one correlated "
    "EXISTS (another supplier participated) AND one correlated NOT EXISTS "
    "(no OTHER supplier was late) over the same fact table. 'Late' is "
    "shipdate > orderdate + 60d (testdata carries no commit/receipt "
    "dates). Catalyst plans LEFT SEMI + LEFT ANTI joins on l_orderkey — "
    "three scans of lineitem, zero nested loops; the NOT EXISTS "
    "correlation on o_orderdate rides into the anti-join condition.",
    tags=("flagship",),
)
def sql_waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q21v")
    return spark.sql(
        """
SELECT s.s_name, count(*) AS numwait
FROM supplier_q21v s
JOIN lineitem_q21v l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders_q21v o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem_q21v l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem_q21v l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name LIMIT 25
"""
    )


@register(
    "sql_top_supplier_scalar_q15",
    oracle="""
WITH rev AS (
  SELECT l.l_suppkey,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100
           AS total_rev
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(rev.total_rev, 6) AS total_rev
FROM supplier s
JOIN rev ON rev.l_suppkey = s.s_suppkey
WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
""",
    doc="TPC-H Q15 shape (top supplier) as pure spark.sql: half-year "
    "revenue per supplier, keep the max-revenue supplier(s) via an "
    "uncorrelated scalar MAX subquery over the same CTE. Spark evaluates "
    "the CTE once per reference; the scalar max is a one-row broadcast "
    "compared in the filter — no re-aggregation per row. Decimal-cent "
    "accumulation makes the max comparison bit-exact across engines "
    "(a float sum here could disagree on the argmax itself).",
    tags=("flagship",),
)
def sql_top_supplier_scalar_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q15v")
    return spark.sql(
        """
WITH rev AS (
  SELECT l.l_suppkey,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100
           AS total_rev
  FROM lineitem_q15v l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(rev.total_rev, 6) AS total_rev
FROM supplier_q15v s
JOIN rev ON rev.l_suppkey = s.s_suppkey
WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
"""
    )


@register(
    "sql_forecast_revenue_q6",
    oracle="""
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount * 100 AS DECIMAL(18,0))) AS DOUBLE) / 100, 6)
         AS forecast_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
    doc="TPC-H Q6 shape (forecast revenue change) as pure spark.sql: a "
    "single-table filter + global aggregate. The canonical pushdown "
    "check: all three predicates and both referenced columns reach the "
    "parquet scan (PushedFilters on l_shipdate/l_discount/l_quantity; "
    "ReadSchema = 4 columns), and the whole query is one scan stage plus "
    "a 1-row final agg — at 100 TB this is bounded by I/O after pruning, "
    "nothing else.",
    tags=("flagship",),
)
def sql_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q6v")
    return spark.sql(
        """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount * 100 AS DECIMAL(18,0))) AS DOUBLE) / 100, 6)
         AS forecast_revenue,
       count(*) AS n_lines
FROM lineitem_q6v
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""
    )


@register(
    "sql_volume_shipping_q7",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
""",
    doc="TPC-H Q7 shape (volume shipping between two trading nations) as "
    "pure spark.sql: a 6-table join with a DISJUNCTIVE cross-dimension "
    "predicate (either direction of the nation pair). The two nation "
    "dims broadcast twice under different aliases; the disjunction "
    "cannot push into either scan alone but prunes after the broadcast "
    "joins, before the wide fact shuffle. Year extraction groups the "
    "fact without a separate date dim.",
    tags=("flagship",),
)
def sql_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q7v")
    return spark.sql(
        """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue
FROM lineitem_q7v l
JOIN supplier_q7v s ON s.s_suppkey = l.l_suppkey
JOIN orders_q7v o ON o.o_orderkey = l.l_orderkey
JOIN customer_q7v c ON c.c_custkey = o.o_custkey
JOIN nation_q7v sn ON sn.n_nationkey = s.s_nationkey
JOIN nation_q7v cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
"""
    )


@register(
    "sql_market_share_q8",
    oracle="""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         sum(CASE WHEN sn.n_name = 'NATION_3'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS target_vol,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS total_vol
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
  GROUP BY year(o.o_orderdate)
)
SELECT o_year,
       round(CAST(target_vol AS DOUBLE) / CAST(total_vol AS DOUBLE), 6) AS mkt_share
FROM vol
""",
    doc="TPC-H Q8 shape (national market share) as pure spark.sql: an "
    "8-table snowflake join, share = conditional sum / total sum per "
    "order year. Volumes accumulate as DECIMAL cents (the q15 trick) so "
    "the share ratio is bit-identical across engines — a double sum "
    "could disagree in the last ulp and flip the 6th decimal. All five "
    "dims broadcast; the single fact shuffle is the year rollup.",
    tags=("flagship",),
)
def sql_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "orders", "customer", "nation", "region", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q8v")
    return spark.sql(
        """
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         sum(CASE WHEN sn.n_name = 'NATION_3'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS target_vol,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS total_vol
  FROM lineitem_q8v l
  JOIN part_q8v p ON p.p_partkey = l.l_partkey
  JOIN orders_q8v o ON o.o_orderkey = l.l_orderkey
  JOIN customer_q8v c ON c.c_custkey = o.o_custkey
  JOIN nation_q8v cn ON cn.n_nationkey = c.c_nationkey
  JOIN region_q8v r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier_q8v s ON s.s_suppkey = l.l_suppkey
  JOIN nation_q8v sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
  GROUP BY year(o.o_orderdate)
)
SELECT o_year,
       round(CAST(target_vol AS DOUBLE) / CAST(total_vol AS DOUBLE), 6) AS mkt_share
FROM vol
"""
    )


@register(
    "sql_product_profit_q9",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))
                      - CAST(p.p_retailprice AS DECIMAL(18,2)) * 10
                        * CAST(l.l_quantity AS DECIMAL(18,0))) AS DOUBLE) / 100, 6)
         AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
    doc="TPC-H Q9 shape (product-type profit) as pure spark.sql, cost "
    "modeled as 10% of retail price x quantity (testdata carries no "
    "ps_supplycost); profit accumulates in DECIMAL cents (the q15 trick "
    "— a double sum disagreed with the oracle by one cent at a rounding "
    "boundary), and the output rounds at 6 decimals, NOT 2: the exact "
    "profit has up to 4 decimal digits, so a 2-decimal round creates "
    "true half-cent ties where engine rounding modes differ (caught at "
    "sf0.001), while 6 decimals is tie-free. LIKE '%widget%' cannot "
    "push as a range but prunes "
    "the part dim BEFORE its broadcast, shrinking the build side; "
    "profit rolls up per supplier nation x order year.",
    tags=("flagship",),
)
def sql_product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "supplier", "nation", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q9v")
    return spark.sql(
        """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))
                      - CAST(p.p_retailprice AS DECIMAL(18,2)) * 10
                        * CAST(l.l_quantity AS DECIMAL(18,0))) AS DOUBLE) / 100, 6)
         AS profit
FROM lineitem_q9v l
JOIN part_q9v p ON p.p_partkey = l.l_partkey
JOIN supplier_q9v s ON s.s_suppkey = l.l_suppkey
JOIN nation_q9v n ON n.n_nationkey = s.s_nationkey
JOIN orders_q9v o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
"""
    )


@register(
    "sql_promo_revenue_q14",
    oracle="""
SELECT round(CAST(100 * sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END)
         / sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE), 6)
         AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    doc="TPC-H Q14 shape (promotion effect) as pure spark.sql: one month "
    "of lineitem joined to the part dim, promo share of revenue as a "
    "conditional-sum ratio in DECIMAL cents (bit-exact across engines). "
    "The month range pushes into the fact scan; part broadcasts; the "
    "result is one row — scan-bound at any scale.",
    tags=("flagship",),
)
def sql_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q14v")
    return spark.sql(
        """
SELECT round(CAST(100 * sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END)
         / sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE), 6)
         AS promo_revenue_pct
FROM lineitem_q14v l JOIN part_q14v p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
"""
    )


@register(
    "sql_parts_supplier_count_q16",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16 shape (parts/supplier relationship count) as pure "
    "spark.sql, with lineitem as the part-supplier link (testdata has no "
    "partsupp table): distinct suppliers per (brand, type, size) for a "
    "size IN-list, excluding one brand and one type. The <> and IN "
    "predicates push into the part scan; count(DISTINCT) expands to the "
    "standard two-level aggregate (distinct pairs first, then count) — "
    "both levels partial-aggregate map-side.",
    tags=("flagship",),
)
def sql_parts_supplier_count_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q16v")
    return spark.sql(
        """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part_q16v p JOIN lineitem_q16v l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
GROUP BY p.p_brand, p.p_type, p.p_size
"""
    )


@register(
    "sql_discount_revenue_or_q19",
    oracle="""
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 shape (discounted revenue, disjunction of conjunction "
    "bands) as pure spark.sql. The OR-of-ANDs mixes columns from both "
    "tables, so no single branch pushes whole; Catalyst still extracts "
    "the COMMON implied predicates per side (brand/size bands into the "
    "part scan, quantity range into the fact scan) and evaluates the "
    "residual disjunction after the broadcast join — the pattern for "
    "complex promotional-rule filters at scale.",
    tags=("flagship",),
)
def sql_discount_revenue_or_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q19v")
    return spark.sql(
        """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (100 - CAST(l.l_discount * 100 AS DECIMAL(18,0)))) AS DOUBLE) / 100, 6)
         AS revenue,
       count(*) AS n_lines
FROM lineitem_q19v l JOIN part_q19v p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""
    )


@register(
    "sql_potential_promotion_q20",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                  THEN l_quantity ELSE 0 END) AS q97,
         sum(l_quantity) AS q_all
  FROM lineitem
  GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
JOIN part p ON p.p_partkey = sh.l_partkey
WHERE p.p_name LIKE 'small%' AND sh.q97 > 0.5 * sh.q_all
""",
    doc="TPC-H Q20 shape (potential part promotion) as pure spark.sql, "
    "'excess availability' adapted to shipped quantities (no partsupp "
    "in testdata): suppliers for whom some 'small%' part had more than "
    "half its all-time volume shipped in 1997. The conditional sum and "
    "the total ride ONE aggregation over the fact (no second scan, no "
    "correlated subquery); quantity sums are integer-valued doubles, so "
    "the > comparison is exact on both engines. The part dim prunes on "
    "the LIKE prefix (pushes as a >= / < range) before the broadcast "
    "join; DISTINCT collapses multi-part hits per supplier.",
    tags=("flagship",),
)
def sql_potential_promotion_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q20v")
    return spark.sql(
        """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                  THEN l_quantity ELSE 0 END) AS q97,
         sum(l_quantity) AS q_all
  FROM lineitem_q20v
  GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier_q20v s
JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
JOIN part_q20v p ON p.p_partkey = sh.l_partkey
WHERE p.p_name LIKE 'small%' AND sh.q97 > 0.5 * sh.q_all
"""
    )


@register(
    "sql_shipmode_priority_q12",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12 shape (shipping modes / priority split) as pure "
    "spark.sql, line status standing in for ship mode (testdata carries "
    "no l_shipmode): one year of lineitem joined to orders, split into "
    "high/low-priority conditional counts per status. Two CASE sums in "
    "one aggregation — one fact pass, no second scan per band; the date "
    "range pushes into the fact scan.",
    tags=("flagship",),
)
def sql_shipmode_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q12v")
    return spark.sql(
        """
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders_q12v o JOIN lineitem_q12v l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""
    )


@register(
    "sql_customer_distribution_q13",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
""",
    doc="TPC-H Q13 shape (customer order distribution) as pure spark.sql "
    "— the double-aggregation histogram: orders per customer (LEFT join "
    "with the filter in the JOIN CONDITION, so zero-order customers "
    "survive with count 0 — putting it in WHERE would silently drop "
    "them, the classic outer-join bug), then customers per order-count. "
    "count(o.o_orderkey) counts non-NULL matches only; both aggregates "
    "partial+final.",
    tags=("flagship",),
)
def sql_customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q13v")
    return spark.sql(
        """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer_q13v c LEFT JOIN orders_q13v o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
"""
    )


@register(
    "sql_min_cost_supplier_q2",
    oracle="""
WITH supply AS (
  SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
  FROM lineitem l
), cost AS (
  SELECT sp.partkey, sp.suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supply sp
  JOIN supplier s ON s.s_suppkey = sp.suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
)
SELECT p.p_partkey, p.p_brand, c.s_name, round(c.s_acctbal, 2) AS s_acctbal,
       c.n_name
FROM part p JOIN cost c ON c.partkey = p.p_partkey
WHERE p.p_size = 10
  AND c.s_acctbal = (SELECT min(c2.s_acctbal) FROM cost c2
                     WHERE c2.partkey = p.p_partkey)
""",
    doc="TPC-H Q2 shape (minimum-cost supplier) as pure spark.sql, the "
    "supplier relation derived from lineitem and account balance "
    "standing in for ps_supplycost (no partsupp in testdata): for "
    "size-10 parts, the ASIA supplier(s) with the minimum balance per "
    "part. The oracle keeps the reference's correlated-scalar-MIN "
    "formulation; the Spark side deliberately does NOT — Spark inlines "
    "(never materializes) CTEs, so `cost` referenced twice ran its "
    "whole join tree twice (r6 verdict: 9 parquet scans, zero "
    "ReusedExchange — the lineitem DISTINCT, the priciest stage, "
    "executed twice). Instead: ONE `cost` evaluation, broadcast-joined "
    "to the p_size=10 part slice FIRST (restricting cost before the "
    "min is sound — the per-part min never crosses partkeys), then "
    "min(s_acctbal) OVER (PARTITION BY partkey) + equality filter. "
    "Balance ties keep ALL minimal suppliers, exactly like the "
    "reference query; the partkey window shuffle replaces the "
    "decorrelated aggregate's join-back shuffle, net one lineitem "
    "scan subtree. With q2 and q11 adapted, all 22 classic TPC-H "
    "query shapes have registry coverage (q1 = the pricing-summary "
    "flagship).",
    tags=("flagship",),
)
def sql_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "nation", "region", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q2v")
    return spark.sql(
        """
WITH supply AS (
  SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
  FROM lineitem_q2v l
), cost AS (
  SELECT sp.partkey, sp.suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supply sp
  JOIN supplier_q2v s ON s.s_suppkey = sp.suppkey
  JOIN nation_q2v n ON n.n_nationkey = s.s_nationkey
  JOIN region_q2v r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
)
SELECT p_partkey, p_brand, s_name, round(s_acctbal, 2) AS s_acctbal, n_name
FROM (
  SELECT p.p_partkey, p.p_brand, c.s_name, c.s_acctbal, c.n_name,
         min(c.s_acctbal) OVER (PARTITION BY c.partkey) AS min_bal
  FROM part_q2v p JOIN cost c ON c.partkey = p.p_partkey
  WHERE p.p_size = 10
) ranked
WHERE s_acctbal = min_bal
"""
    )


@register(
    "sql_important_stock_q11",
    oracle="""
WITH stock AS (
  SELECT l.l_partkey AS partkey,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,0))
             * CAST(p.p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey % 5 = 2
  GROUP BY l.l_partkey
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tot_cents,
               CAST(count(*) AS BIGINT) AS cnt FROM stock)
SELECT partkey, round(CAST(cents AS DOUBLE) / 100, 6) AS stock_value
FROM stock, tot
WHERE cents * 5 * cnt > tot_cents * 6
""",
    doc="TPC-H Q11 shape (important stock identification) as pure "
    "spark.sql, stock value modeled as quantity x retail price over a "
    "supplier segment (s_nationkey % 5 = 2 — a single nation key can be "
    "absent at small sfs; no partsupp): parts whose value exceeds 1.2x "
    "the nation's average (a share-of-total threshold like the "
    "reference's 0.0001 fraction empties as the part universe grows — "
    "the avg multiple stays populated at every sf). The threshold is "
    "evaluated in exact integer-cent arithmetic on BOTH engines: "
    "stock_value > 1.2*avg rewrites to cents*5*cnt > tot_cents*6, which "
    "sidesteps the engines' different avg() result domains (Spark avg "
    "over DECIMAL stays DECIMAL, DuckDB's returns DOUBLE — a part within "
    "one double ulp of the threshold could flip inclusion; advisor r5). "
    "Output converts cents to DOUBLE and rounds at 6 (tie-free: the "
    "exact value has 2 decimals). The 1-row total broadcasts into the "
    "filter.",
    tags=("flagship",),
)
def sql_important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q11v")
    return spark.sql(
        """
WITH stock AS (
  SELECT l.l_partkey AS partkey,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,0))
             * CAST(p.p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM lineitem_q11v l
  JOIN part_q11v p ON p.p_partkey = l.l_partkey
  JOIN supplier_q11v s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey % 5 = 2
  GROUP BY l.l_partkey
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tot_cents,
               CAST(count(*) AS BIGINT) AS cnt FROM stock)
SELECT partkey, round(CAST(cents AS DOUBLE) / 100, 6) AS stock_value
FROM stock, tot
WHERE cents * 5 * cnt > tot_cents * 6
"""
    )
