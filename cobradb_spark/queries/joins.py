"""§2 C — joins, the heart of cobradb's linking ETL.

Reference grounding [P]: model_loading.py links model genes to genome
genes via locus_tag/synonym lookup joins, reactions to metabolites via
reaction_matrix, and detects orphans/deprecated ids via NOT-EXISTS
style checks; genome_region containment queries are interval joins.

Scale notes: small dims broadcast (C1); large-large equi-joins shuffle
on the key and AQE picks SMJ vs shuffled-hash (C2); the interval join
uses the binned composition from operators/interval.py instead of a
nested loop (C7); the as-of join is one shuffle via union+window (C8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cobradb_spark.io import load_table, load_tables
from cobradb_spark.operators.asof import asof_join_backward
from cobradb_spark.operators.interval import interval_point_join
from cobradb_spark.registry import register
from cobradb_spark.scratch import scratch_dir


@register(
    "join_broadcast_inner",
    oracle="""
SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    doc="C1 broadcast inner join; ref: compartment lookup per metabolite [P]. nation "
    "and region are catalog dims — explicitly broadcast so the big side never shuffles.",
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation, region = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_shuffle_large",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
    doc="C2 large-large shuffle join; ref: reaction_matrix ⋈ reactions bulk link [P]. "
    "Both sides shuffle on the order key; AQE picks SMJ or shuffled-hash and splits "
    "skewed partitions at scale.",
)
def join_shuffle_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_outer_left_right_full",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
       (a.o_custkey IS NOT NULL) AS has_open,
       (b.o_custkey IS NOT NULL) AS has_finished
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
""",
    doc="C3 outer joins with null-side audit; ref: genes left-joined to genome regions, "
    "unmapped kept with mapped_to_genbank=False [P]. Full-outer keeps both null sides.",
)
def join_outer_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct().alias("a")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct().alias("b")
    return a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"), "full_outer").select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("custkey"),
        F.col("a.o_custkey").isNotNull().alias("has_open"),
        F.col("b.o_custkey").isNotNull().alias("has_finished"),
    )


@register(
    "join_semi",
    oracle="""
SELECT c.c_custkey, c.c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
    doc="C4 left-semi (EXISTS); ref: 'models that have ≥1 escher map' style checks [P].",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT p.p_partkey, p.p_name FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
""",
    doc="C5 left-anti (NOT EXISTS); ref: orphan detection — metabolites appearing in no "
    "reaction_matrix row; old ids with no current synonym [P].  The probe side is "
    "restricted to bulk lines (quantity >= 45) so some parts genuinely have no "
    "match — the unrestricted anti-join was empty at every sf, so the driver "
    "check compared zero rows (vacuous, round-2 set_except lesson).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = load_tables(spark, sf_dir, "part", "lineitem")
    bulk = lineitem.filter(F.col("l_quantity") >= 45)
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@register(
    "fk_audit_anti",
    oracle="""
SELECT 'lineitem.l_orderkey->orders' AS fk, CAST(count(*) AS BIGINT) AS violations
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer.c_nationkey->nation', CAST(count(*) AS BIGINT)
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'nation.n_regionkey->region', CAST(count(*) AS BIGINT)
FROM nation n WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
UNION ALL
SELECT 'supplier.s_nationkey->nation', CAST(count(*) AS BIGINT)
FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
""",
    doc="C6 referential-integrity audit replacing Postgres FK constraints (SURVEY §1.2): "
    "anti-join every FK pair, count violations (expect 0). At 100 TB this runs as a "
    "batched audit job, one anti-join per constraint.",
)
def fk_audit_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "part", "customer", "nation", "region", "supplier")}
    pairs = [
        ("lineitem.l_orderkey->orders", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
        ("lineitem.l_partkey->part", t["lineitem"], "l_partkey", t["part"], "p_partkey"),
        ("orders.o_custkey->customer", t["orders"], "o_custkey", t["customer"], "c_custkey"),
        ("customer.c_nationkey->nation", t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
        ("nation.n_regionkey->region", t["nation"], "n_regionkey", t["region"], "r_regionkey"),
        ("supplier.s_nationkey->nation", t["supplier"], "s_nationkey", t["nation"], "n_nationkey"),
    ]
    parts = []
    for fk_name, child, ck, parent, pk in pairs:
        viol = child.join(parent, child[ck] == parent[pk], "left_anti")
        parts.append(viol.agg(F.lit(fk_name).alias("fk"), F.count("*").alias("violations")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "join_range_interval",
    oracle="""
WITH iv AS (
  SELECT o_orderkey AS iv_key,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS lo,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 30 AS hi
  FROM orders WHERE o_orderkey % 100 = 0
), pt AS (
  SELECT o_orderkey AS pt_key,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS p
  FROM orders
)
SELECT iv.iv_key, pt.pt_key
FROM iv JOIN pt ON pt.p >= iv.lo AND pt.p <= iv.hi
""",
    doc="C7 interval/range join; ref: genome_region [leftpos,rightpos] containment "
    "queries [P]. Implemented via the binned equi-join composition "
    "(operators/interval.py) — hash join on bin id, then exact re-filter; never a "
    "nested loop. Bin width = interval length (30 days) so each interval explodes "
    "to ≤2 bins.",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    iv = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("iv_key"), days.alias("lo"), (days + 30).alias("hi")
    )
    pt = orders.select(F.col("o_orderkey").alias("pt_key"), days.alias("p"))
    joined = interval_point_join(iv, pt, lo="lo", hi="hi", point="p", bin_width=30)
    return joined.select("iv_key", "pt_key")


@register(
    "join_asof",
    oracle="""
SELECT p.event_id, p.ts,
       (SELECT max(s.ts) FROM events s
        WHERE s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
       ) AS signup_ts
FROM events p WHERE p.event_type = 'purchase'
""",
    doc="C8 as-of join (latest-at-or-before); north-star events need. Implemented with "
    "the union+window composition (operators/asof.py) — one shuffle on (user_id, ts), "
    "no nested loop; PySpark's DataFrame._joinAsOf exists but is private API.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts")
    )
    out = asof_join_backward(
        purchases, signups, on="ts", by="user_id", right_value_cols=["signup_ts"]
    )
    return out.select("event_id", "ts", "signup_ts")


@register(
    "join_cross_bounded",
    oracle="""
SELECT a.label, CAST(count(*) AS BIGINT) AS n_pairs
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
GROUP BY a.label
""",
    doc="C9 bounded self cross join; ref: all-pairs reaction-hash comparison within a "
    "hash bucket (dedup candidate generation) [P]. The label acts as the bucket — the "
    "quadratic blow-up is bounded per bucket, exactly the LSH-candidate pattern.",
)
def join_cross_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .groupBy(F.col("a.label").alias("label"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_self_hierarchy",
    oracle="""
SELECT o_orderkey,
       lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS prev_orderkey
FROM orders
""",
    doc="C10 self-join hierarchy; ref: gene.alternative_transcript_of self-FK "
    "resolution [P]. On testdata: each order joined to the customer's previous order "
    "via row_number self-equi-join (the window-free formulation a catalog layer uses "
    "when the hierarchy key is an explicit FK).",
)
def join_self_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))
    a, b = seq.alias("a"), seq.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey")) & (F.col("a.rn") == F.col("b.rn") + 1),
        "left",
    ).select(
        F.col("a.o_orderkey").alias("o_orderkey"),
        F.col("b.o_orderkey").alias("prev_orderkey"),
    )


@register(
    "hierarchy_recursive_cte",
    oracle="""
WITH RECURSIVE anc(custkey, depth) AS (
  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 0
  UNION ALL
  SELECT c.c_custkey, a.depth + 1
  FROM customer c JOIN anc a ON c.c_custkey // 2 = a.custkey
  WHERE c.c_custkey > 0
)
SELECT custkey, depth FROM anc
""",
    doc="C10-ext TRUE recursion (Spark 4 WITH RECURSIVE, vs the fixed-depth "
    "self-join of join_self_hierarchy): every customer keyed into a binary-tree "
    "parent relation (parent = custkey DIV 2), walked from the root to any "
    "depth. Each recursive step is an equi-join on the parent key — "
    "shuffle-partitioned, no nested loop — and the engine stops when a level "
    "produces no rows (~log2(N) steps).",
)
def hierarchy_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
WITH RECURSIVE anc(custkey, depth) AS (
  SELECT c_custkey, 0 FROM customer_rcte WHERE c_custkey = 0
  UNION ALL
  SELECT c.c_custkey, a.depth + 1
  FROM customer_rcte c JOIN anc a ON c.c_custkey DIV 2 = a.custkey
  WHERE c.c_custkey > 0
)
SELECT custkey, CAST(depth AS INT) AS depth FROM anc
"""
    )


@register(
    "join_lateral_topk",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 6) AS total
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
""",
    doc="C-ext correlated top-k via Spark 4 DataFrame.lateralJoin: for each "
    "customer, the 3 highest-value orders (fully tiebroken). Catalyst "
    "rewrites the correlated limit into a ranked window over the equi-join "
    "key — same shuffle shape as win_rank_topk_pergroup, but expressed as "
    "the per-row subquery a reference user would write; proves the rewrite "
    "never degenerates into a per-customer nested loop.",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").alias("c")
    o = load_table(spark, sf_dir, "orders")
    top = (
        o.where(F.col("o_custkey") == F.col("c.c_custkey").outer())
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(3)
        .select("o_orderkey", "o_totalprice")
    )
    return c.lateralJoin(top).select(
        "c_custkey",
        "o_orderkey",
        F.round("o_totalprice", 6).alias("total"),
    )


@register(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey % 50 END AS k,
         o_totalprice
  FROM orders
), r AS (
  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey % 50 END AS k,
         c_acctbal
  FROM customer
)
SELECT l.k, CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(CAST(l.o_totalprice AS DECIMAL(18,2)) + CAST(r.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6) AS combined
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
GROUP BY l.k
""",
    doc="C-ext null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of vanishing. Spark plans EqualNullSafe as an "
    "ordinary hash-join key (null bucket included), so the join stays a "
    "HASH join — asserting the semantics don't force a nested loop. The "
    "pair-level rollup is computed WITHOUT materializing pairs: each side "
    "pre-aggregates per key and the per-key sums combine algebraically "
    "(sum over pairs of (o+c) = n_c*sum_o + n_o*sum_c), so the join carries "
    "|keys| rows instead of the quadratic pair blowup — measured 41s -> "
    "sub-second at sf0.1, and the only shape that survives hot NULL "
    "buckets at 100 TB. The brute-force oracle proves the algebra exact "
    "(decimal cents, no float drift).",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 10 == 0, None)
            .otherwise(F.col("o_orderkey") % 50)
            .alias("k"),
            "o_totalprice",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_o"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_o"),
        )
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.when(F.col("c_custkey") % 7 == 0, None)
            .otherwise(F.col("c_custkey") % 50)
            .alias("lk"),
            "c_acctbal",
        )
        .groupBy("lk")
        .agg(
            F.count("*").alias("n_c"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_c"),
        )
    )
    j = o.join(c, o["k"].eqNullSafe(c["lk"]))
    return j.select(
        "k",
        (F.col("n_o") * F.col("n_c")).alias("n_pairs"),
        F.round(
            (F.col("n_c") * F.col("sum_o") + F.col("n_o") * F.col("sum_c")).cast("double"),
            6,
        ).alias("combined"),
    )


@register(
    "join_skew_salted",
    oracle="""
SELECT s.s_nationkey,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS qty
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
    doc="C-ext explicit skew mitigation through the correctness gate: the "
    "lineitem->supplier join runs SALTED (operators/skew.py — dim replicated "
    "8x, fact spread by a deterministic xxhash64 salt) and must produce "
    "exactly the plain-join result. At 100 TB this is the fallback when one "
    "hot supplier key overwhelms a task and AQE's skew split can't help "
    "(e.g. the key sits in ONE unsplittable map output); the salt bounds "
    "any task's share of a hot key at 1/8. DECIMAL sums keep the rollup "
    "bit-exact.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = salted_join(li, s, "l_suppkey", "s_suppkey", salt=8)
    return j.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 6).alias(
            "qty"
        ),
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH a AS (
  SELECT user_id, event_id AS a_id,
         epoch_us(ts) AS a_lo,
         epoch_us(ts) + CAST(round(value * 60000000, 0) AS BIGINT) AS a_hi
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, event_id AS b_id,
         epoch_us(ts) AS b_lo,
         epoch_us(ts) + CAST(round(value * 60000000, 0) AS BIGINT) AS b_hi
  FROM events WHERE event_type = 'click'
)
SELECT a.user_id, a.a_id, b.b_id,
       least(a.a_hi, b.b_hi) - greatest(a.a_lo, b.b_lo) AS overlap_us
FROM a JOIN b ON a.user_id = b.user_id
              AND a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
""",
    doc="C7-ext interval-INTERVAL overlap join (vs the point-in-interval "
    "variant): view spans vs click spans per user ([ts, ts + value min]). "
    "Spark side uses operators/interval.py interval_overlap_join — both "
    "sides exploded to fixed bins, hash-join on (user_id, bin), pairs "
    "deduplicated by the first-shared-bin trick (pure arithmetic, NO "
    "distinct shuffle), then the exact overlap predicate. The oracle "
    "brute-forces the theta join, proving binning loses nothing. Cost "
    "scales with truly-overlapping bins, never |A|x|B|.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.operators.interval import interval_overlap_join

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    spans = e.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("lo"),
        # round BEFORE the long cast: DuckDB CAST(double) rounds while
        # Spark cast truncates — value*6e7 lands on .999... for some rows
        (us + F.round(F.col("value") * 60000000, 0).cast("long")).alias("hi"),
    )
    a = (
        spans.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("a_id"), F.col("lo").alias("a_lo"), F.col("hi").alias("a_hi"))
    )
    b = (
        spans.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("b_id"), F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi"))
    )
    j = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=3_600_000_000, extra_keys=["user_id"]
    )
    return j.select(
        "user_id",
        "a_id",
        "b_id",
        (F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")).alias("overlap_us"),
    )


def _fuzzy_segment_boundaries(sup, cust, tau: int, segs: int, sample: int = 512):
    """Data-adaptive PassJoin segment boundaries, per index-side length
    class.  Returns rows (ls, seg_i, st, seg_len), st 1-based.

    The PassJoin pigeonhole (lev <= tau => one of tau+1 contiguous
    segments matches exactly within index-based shift bounds) holds for
    ANY contiguous partition — boundary choice affects only candidate
    volume, never correctness or the result set.  Equal-width splitting
    degenerates on fixed-format keys: a segment falling entirely inside
    a region both sides share (zero-padding, template text) matches
    all-to-all — r4 measured 99.7% of 46M candidates coming from 13
    such segment keys at sf0.1.

    Boundary search: take a DETERMINISTIC bounded sample of each side
    (seeded-hash TakeOrdered — two metadata-scale driver pulls that
    replace nothing distributed), count, for every possible segment
    span and allowed shift, how many sampled (index, probe) name pairs
    would collide on that exact substring, and pick the tau+1-way split
    minimizing the summed sampled collision count with an
    O(L^2 * segs) interval DP.  Counting collisions on real substrings
    (not per-position char frequencies) captures the cross-position
    correlation that makes template runs degenerate — a shared
    "er#00000" region scores |sample|^2 and is never left as its own
    segment, while a span that also covers one discriminative column
    scores near zero.  Deterministic: seeded sample, exact counts, ties
    break to the earliest boundary.  Length classes shorter than
    tau+1 are skipped (callers route such strings to a brute-force
    side bucket).
    """
    from collections import Counter, defaultdict

    # the index-based shift windows inside segcost assume the PassJoin
    # relation segs == tau + 1; a mismatch would silently misalign the
    # probe-side bounds
    assert segs == tau + 1, (segs, tau)

    snames = [
        r[0]
        for r in sup.select("s_name")
        .orderBy(F.xxhash64(F.lit(42), "s_name"), "s_name")
        .limit(sample)
        .collect()
    ]
    cnames = [
        r[0]
        for r in cust.select("c_name")
        .orderBy(F.xxhash64(F.lit(42), "c_name"), "c_name")
        .limit(2 * sample)
        .collect()
    ]
    all_sup_lens = {
        r[0]
        for r in sup.select(F.length("s_name").cast("int").alias("l")).distinct().collect()
    }

    by_len = defaultdict(list)
    for n in snames:
        by_len[len(n)].append(n)
    # length classes present on the full index side but missed by the
    # sample still need boundaries — fall back to equal width for those
    for L in all_sup_lens:
        by_len.setdefault(L, [])

    rows = []
    for L, group in sorted(by_len.items()):
        if L < segs:
            continue
        if not group:
            base, rem = divmod(L, segs)
            st = 1
            for i in range(segs):
                ln = base + (1 if i < rem else 0)
                rows.append((L, i, st, ln))
                st += ln
            continue

        probe_cnt: dict = {}

        def pc(start: int, ln: int) -> Counter:
            key = (start, ln)
            ctr = probe_cnt.get(key)
            if ctr is None:
                ctr = Counter()
                for cn in cnames:
                    if 0 <= start and start + ln <= len(cn):
                        ctr[cn[start : start + ln]] += 1
                probe_cnt[key] = ctr
            return ctr

        def segcost(a: int, b: int, k: int) -> int:
            """Sampled collision count for 0-based span [a, b) as the
            k-th (1-based) segment: index substrings vs probe substrings
            over the index-based shift window (dl = 0 form — the
            dominant case; nonzero dl only translates the window)."""
            ln = b - a
            idx_ctr = Counter(sn[a:b] for sn in group)
            lo, hi = max(-(k - 1), -(segs - k)), min(k - 1, segs - k)
            tot = 0
            for sh in range(lo, hi + 1):
                ctr = pc(a + sh, ln)
                for v, n_idx in idx_ctr.items():
                    tot += n_idx * ctr.get(v, 0)
            return tot

        INF = float("inf")
        dp = [[INF] * (L + 1) for _ in range(segs + 1)]
        cut = [[-1] * (L + 1) for _ in range(segs + 1)]
        dp[0][0] = 0.0
        for k in range(1, segs + 1):
            for e in range(k, L - (segs - k) + 1):
                best, barg = INF, -1
                for a in range(k - 1, e):
                    if dp[k - 1][a] == INF:
                        continue
                    v = dp[k - 1][a] + segcost(a, e, k)
                    if v < best:
                        best, barg = v, a
                dp[k][e], cut[k][e] = best, barg
        e, bnds = L, []
        for k in range(segs, 0, -1):
            a = cut[k][e]
            bnds.append((a, e))
            e = a
        bnds.reverse()
        for i, (a, b) in enumerate(bnds):
            rows.append((L, i, a + 1, b - a))
    return rows


@register(
    "join_fuzzy_blocked",
    oracle="""
SELECT s.s_suppkey, c.c_custkey,
       CAST(levenshtein(s.s_name, c.c_name) AS BIGINT) AS dist
FROM supplier s JOIN customer c
  ON levenshtein(s.s_name, c.c_name) <= 6
""",
    doc="H3 at scale: edit-distance join with PassJoin segment blocking "
    "on DATA-ADAPTIVE boundaries. ORACLE DOMAIN NOTE: DuckDB levenshtein "
    "counts UTF-8 BYTES while Spark counts code points (fuzz-verified: "
    "'' vs '\u20ac' scores 3 vs 1) — the cross-engine contract holds on "
    "the ASCII name domain both sides run on; a unicode corpus would "
    "need a code-point oracle. Pigeonhole: if lev(a,b) <= 6, split a "
    "into 7 contiguous segments and at least one appears EXACTLY in b "
    "within index-based shift bounds — true for ANY split, so boundary "
    "choice is pure performance. The supplier side indexes its 7 "
    "segments; the customer side probes (supplier-length, segment-id, "
    "shifted substring) keys; candidates verify with banded levenshtein "
    "BEFORE the pair-distinct. The oracle is the unblocked theta join: "
    "equality proves losslessness. History of this operator's blocking: "
    "length-only blocking degenerated to one block (61x on 10x data, r2); "
    "equal-width segments left whole segments inside the names' shared "
    "zero-run — 13 hot keys carried 99.7% of 46M candidates at sf0.1 "
    "(r4 weak flag). r5: boundaries now come from a sampled-collision "
    "interval DP (_fuzzy_segment_boundaries) that pins every segment to "
    "discriminative content — candidates collapse to near the true-match "
    "count and the sf0.01->0.1 runtime ratio fell 4.0x -> ~1.4x while "
    "the true result grew 13.1x. Requires len >= 7 (always true here); "
    "shorter strings would route to a tiny brute-forced side bucket. "
    "Cost: linear index+probe rows plus output-driven verify — never "
    "|S|x|C|.",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, c = load_tables(spark, sf_dir, "supplier", "customer")
    D, SEGS = 6, 7

    # Segment boundaries are DATA-ADAPTIVE (r5 — closes the r4 weak
    # flag): _fuzzy_segment_boundaries picks, per supplier-length class,
    # the 7-way split minimizing expected candidate volume from tiny
    # per-position char-frequency stats of both sides.  Equal-width
    # splitting put segments entirely inside the template's shared
    # zero-run: 13 hot keys carried 99.7% of 46M candidates at sf0.1.
    # The adaptive split gives every segment discriminative content,
    # measured ~25x fewer candidates at sf0.1 with the identical result
    # (losslessness does not depend on the split — pigeonhole holds for
    # any contiguous partition).
    bdf = F.broadcast(
        spark.createDataFrame(
            _fuzzy_segment_boundaries(s, c, D, SEGS),
            "ls long, seg_i int, st int, seg_len int",
        )
    )

    # index side: 7 segments per supplier, one scan + a 7-row broadcast
    # join on the length class
    idx = (
        s.select("s_suppkey", "s_name", F.length("s_name").cast("long").alias("ls"))
        .join(bdf, "ls")
        .select(
            "s_suppkey", "s_name", "ls", "seg_i",
            F.substring("s_name", F.col("st"), F.col("seg_len")).alias("seg"),
        )
    )

    # probe side: the boundary table crossed with the shift range is a
    # tiny (ls, seg_i, st, seg_len, shift) spine broadcast against
    # customers — one scan, vectorized column math.  The spine keys on
    # the supplier length classes actually present on the index side:
    # a probe at a length no supplier has can never match the equi-join
    # on ls, so enumerating it is pure waste.  Shifts are pruned with
    # PassJoin's position-aware bounds (Li/Deng/Feng, multi-match-
    # aware): for 1-based segment i and length delta Δ = |probe| −
    # |indexed| = −dl, a match can only start at shift ∈
    # [max(−(i−1), Δ−(τ+1−i)), min(i−1, Δ+(τ+1−i))] — edits before
    # segment i bound the left drift, edits after bound the right.
    # The bounds depend only on the segment INDEX, so they hold
    # unchanged for the adaptive widths.  Losslessness is proven by the
    # unblocked-theta-join oracle.
    shift_spine = spark.createDataFrame(
        [(sh,) for sh in range(-D, D + 1)], "shift int"
    )
    spine = bdf.crossJoin(shift_spine)
    lc = F.length("c_name")
    dl = (F.col("ls") - lc).cast("int")
    i0, tail = F.col("seg_i"), F.lit(SEGS - 1) - F.col("seg_i")
    pos = (F.col("st") + F.col("shift")).cast("int")
    probes = (
        c.select("c_custkey", "c_name")
        .crossJoin(F.broadcast(spine))
        .filter(
            (F.abs(dl) <= D)
            & (F.col("shift") >= F.greatest(-i0, -dl - tail))
            & (F.col("shift") <= F.least(i0, -dl + tail))
        )
        .select(
            "c_custkey",
            "c_name",
            "ls",
            "seg_i",
            pos.alias("pos"),
            "seg_len",
            F.substring(F.col("c_name"), pos, F.col("seg_len")).alias("seg"),
        )
        .filter(
            (F.col("pos") >= 1)
            & (F.col("pos") + F.col("seg_len") - 1 <= F.length("c_name"))
            & (F.col("seg_len") >= 1)
        )
        .select("c_custkey", "c_name", "ls", "seg_i", "seg")
        .distinct()
        # AQE sizes partitions by INPUT bytes: the distinct's ~15 MB output
        # coalesces to ~1 partition, which then serializes the 46M-row
        # fan-out join + levenshtein verify downstream (measured 18s -> 4.4s
        # at sf0.1 from this one line).  Re-widen explicitly — partition
        # count must follow the post-join work, not the pre-join bytes.
        .repartition(spark.sparkContext.defaultParallelism)
    )

    # Verify-then-distinct (r3 verdict item 4 — the 6.7x scaling fix).
    # The synthetic names share long zero-runs, so the hot segments match
    # all-to-all and the candidate multiset degenerates to ~|S|x|C| with a
    # ~3x duplication factor; distinct-ing THAT (15M pairs at sf0.1) was
    # the dominant shuffle.  Two changes:
    #   1. levenshtein(l, r, D) — Spark 3.5+ threshold form — runs the
    #      O(D*n) banded DP (early-exit at distance > D, returns -1)
    #      instead of the full O(n^2) matrix, so verifying the raw match
    #      stream costs less than shuffling it;
    #   2. the filter runs BEFORE the pair-distinct, so the shuffle only
    #      carries true matches (38k rows at sf0.1, not 15M candidates).
    # dist is functionally determined by the pair, so distinct on
    # (keys, dist) == distinct on keys.  Result set and oracle unchanged.
    cand = idx.join(probes, ["ls", "seg_i", "seg"]).select(
        "s_suppkey", "c_custkey", "s_name", "c_name"
    )
    dist = F.levenshtein("s_name", "c_name", D)
    return (
        cand.filter(dist >= 0)
        .select("s_suppkey", "c_custkey", dist.cast("long").alias("dist"))
        .distinct()
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o.o_orderkey, o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_orderpriority
""",
    doc="Co-located join via bucketing — the at-scale answer to a fact "
    "table that is joined on the same key every day (SURVEY §4.2). Both "
    "sides are written bucketBy(16, o_orderkey).sortBy(...) as external "
    "tables; the subsequent SortMergeJoin (forced via hint('merge') so "
    "the demo is conf-independent) reads the bucket files ALREADY "
    "co-partitioned and sorted: the executed plan has NO Exchange and "
    "NO Sort at all — join and the per-order rollup both reuse the "
    "bucket partitioning (hashpartitioning(o_orderkey) satisfies the "
    "grouping's clustered distribution). At 100 TB that converts every "
    "repeat join+agg on the key from two full shuffles to zero; the "
    "one-time bucketed write amortizes across all downstream consumers. "
    "Plan-audited (tools/plan_audit.py). Bucket tables are registered "
    "in the session's in-memory catalog with explicit tmp paths, so "
    "foreign driver sessions need no warehouse or Hive setup.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    items = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    wh = scratch_dir("cobradb_bucketed_")
    spark.sql("DROP TABLE IF EXISTS cb_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS cb_lineitem_bkt")
    (
        orders.write.bucketBy(16, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(wh, "orders"))
        .mode("overwrite")
        .saveAsTable("cb_orders_bkt")
    )
    (
        items.write.bucketBy(16, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(wh, "lineitem"))
        .mode("overwrite")
        .saveAsTable("cb_lineitem_bkt")
    )
    o = spark.table("cb_orders_bkt")
    l = spark.table("cb_lineitem_bkt")
    joined = o.join(l.hint("merge"), "o_orderkey")
    return joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue"),
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
    doc="Large-large join with an explicit SHUFFLE_HASH hint: both sides "
    "exchange on the key, but the build side hashes per-partition instead "
    "of sorting BOTH sides (the SortMergeJoin default). When the per-"
    "partition build side fits executor memory, skipping two O(n log n) "
    "sorts is the right physical call at 100 TB — and if it does not fit, "
    "falling back to merge is the safe default, which is why this stays an "
    "explicit per-query hint rather than a global conf. Plan-audited: "
    "ShuffledHashJoin present, no sort-merge, aggregate partial+final.",
    tags=("joins",),
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


_NTZ_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


@register(
    "join_asof_nearest",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe,
         CASE WHEN event_type IN ('view', 'click') THEN event_id END AS cand_id,
         CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts) END
             AS cand_us
  FROM events
  WHERE event_type IN ('purchase', 'view', 'click')
), bw AS (
  SELECT *,
         last_value(cand_id IGNORE NULLS) OVER w AS b_id,
         last_value(cand_us IGNORE NULLS) OVER w AS b_us
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
               ROWS UNBOUNDED PRECEDING)
), fw AS (
  SELECT *,
         last_value(cand_id IGNORE NULLS) OVER w2 AS f_id,
         last_value(cand_us IGNORE NULLS) OVER w2 AS f_us
  FROM bw
  WINDOW w2 AS (PARTITION BY user_id
                ORDER BY ts DESC, is_probe DESC, event_id DESC
                ROWS UNBOUNDED PRECEDING)
)
SELECT user_id, event_id AS purchase_id,
       CASE WHEN f_id IS NULL THEN b_id
            WHEN b_id IS NULL THEN f_id
            WHEN epoch_us(ts) - b_us <= f_us - epoch_us(ts) THEN b_id
            ELSE f_id END AS nearest_id,
       CASE WHEN f_id IS NULL THEN epoch_us(ts) - b_us
            WHEN b_id IS NULL THEN f_us - epoch_us(ts)
            WHEN epoch_us(ts) - b_us <= f_us - epoch_us(ts)
                 THEN epoch_us(ts) - b_us
            ELSE f_us - epoch_us(ts) END AS delta_us
FROM fw
WHERE is_probe = 1 AND (b_id IS NOT NULL OR f_id IS NOT NULL)
""",
    doc="Bidirectional nearest-event join (as-of in BOTH directions): "
    "each purchase matches its temporally closest view/click by the same "
    "user — backward OR forward, whichever |delta t| is smaller, ties to "
    "the backward match (the earlier event). The classic sensor/event "
    "alignment join that plain as-of (latest-at-or-before) cannot "
    "express. Same scale shape as join_asof: the union+window trick — "
    "tag candidate rows, ONE shuffle on user_id serves an ascending and "
    "a descending last_value(IGNORE NULLS) window — never a pairwise "
    "comparison; deltas compare in exact integer microseconds. "
    "Same-timestamp candidates sort before probes ascending (delta 0 "
    "counts as backward) and after probes descending, so both windows "
    "see them.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # tz-free epoch micros: NTZ-to-NTZ diff (unix_micros would force a
    # session-timezone cast; a diff against the NTZ epoch never consults
    # the timezone, matching DuckDB's epoch_us on naive timestamps)

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view", "click")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_probe"),
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_id")
        ).alias("cand_id"),
        F.when(
            F.col("event_type").isin("view", "click"),
            F.expr(_NTZ_US),
        ).alias("cand_us"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_probe").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = tagged.select(
        "*",
        F.last("cand_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last("cand_us", ignorenulls=True).over(wb).alias("b_us"),
        F.last("cand_id", ignorenulls=True).over(wf).alias("f_id"),
        F.last("cand_us", ignorenulls=True).over(wf).alias("f_us"),
    )
    us = F.expr(_NTZ_US)
    b_delta = us - F.col("b_us")
    f_delta = F.col("f_us") - us
    nearest = (
        F.when(F.col("f_id").isNull(), F.col("b_id"))
        .when(F.col("b_id").isNull(), F.col("f_id"))
        .when(b_delta <= f_delta, F.col("b_id"))
        .otherwise(F.col("f_id"))
    )
    delta = (
        F.when(F.col("f_id").isNull(), b_delta)
        .when(F.col("b_id").isNull(), f_delta)
        .when(b_delta <= f_delta, b_delta)
        .otherwise(f_delta)
    )
    return (
        x.filter(
            (F.col("is_probe") == 1)
            & (F.col("b_id").isNotNull() | F.col("f_id").isNotNull())
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            nearest.alias("nearest_id"),
            delta.alias("delta_us"),
        )
    )


@register(
    "join_point_in_time_scd2",
    oracle="""
WITH dim AS (
  SELECT c_custkey, t.v AS version,
         t.v * (400 + c_custkey % 200) AS start_day,
         CASE WHEN t.v < c_custkey % 3
              THEN (t.v + 1) * (400 + c_custkey % 200) END AS end_day,
         (c_custkey * 7 + t.v * 13) % 5 AS segment
  FROM customer, UNNEST(range(0, 1 + c_custkey % 3)) AS t(v)),
fact AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', (SELECT min(o_orderdate) FROM orders),
                   o_orderdate) AS order_day
  FROM orders)
SELECT f.o_orderkey, f.o_custkey, CAST(f.order_day AS BIGINT) AS order_day,
       CAST(d.version AS BIGINT) AS version, CAST(d.segment AS BIGINT) AS segment
FROM fact f JOIN dim d
  ON d.c_custkey = f.o_custkey
 AND d.start_day <= f.order_day
 AND (d.end_day IS NULL OR f.order_day < d.end_day)
""",
    doc="Point-in-time join against an SCD2 dimension — the warehouse "
    "staple the plain interval join (C7) doesn't pin: each fact row must "
    "match EXACTLY the version whose half-open effective range "
    "[start_day, end_day) covers the fact's date.  The dimension is a "
    "synthesized customer-segment history (1-3 versions per customer, "
    "deterministic closed-form effective ranges — no window needed to "
    "derive end_day, and ranges partition the timeline so uniqueness is "
    "structural).  All temporal arithmetic runs on integer days since "
    "min(o_orderdate) — the epoch is DERIVED (broadcast 1-row MIN "
    "aggregate / scalar subquery), not hardcoded, so order_day is "
    "always >= 0 and no fixture's date range can silently drop facts "
    "— (datediff on both engines), no DATE-typed columns, "
    "no interval arithmetic, no timezone surface.  Scale posture: this "
    "is an EQUI-join on the dimension key with the range as a join "
    "residual — Spark hash-partitions both sides on custkey and "
    "evaluates the 1-3 candidate versions per probe inline; never a "
    "range-only join, never a broadcast of the (large) dimension "
    "history.  The per-key version fan-in is bounded (SCD2 dims change "
    "slowly), so the residual adds O(versions) work per fact row at any "
    "data size.",
    tags=("joins",),
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        F.explode(F.sequence(F.lit(0), F.col("c_custkey") % 3)).alias("version"),
    ).select(
        "c_custkey",
        "version",
        (F.col("version") * (F.lit(400) + F.col("c_custkey") % 200)).alias("start_day"),
        F.when(
            F.col("version") < F.col("c_custkey") % 3,
            (F.col("version") + 1) * (F.lit(400) + F.col("c_custkey") % 200),
        ).alias("end_day"),
        ((F.col("c_custkey") * 7 + F.col("version") * 13) % 5).alias("segment"),
    )
    orders = load_table(spark, sf_dir, "orders")
    # Epoch = min(o_orderdate), not a hardcoded date: a fixture whose
    # dates start earlier than the assumed epoch would make order_day
    # negative and silently drop facts from every SCD2 version.
    # Bounded collect: single 1-row global MIN aggregate.
    epoch = orders.agg(F.min("o_orderdate")).collect()[0][0]
    fact = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit(epoch)).alias("order_day"),
    )
    j = fact.join(
        dim,
        (dim["c_custkey"] == fact["o_custkey"])
        & (dim["start_day"] <= fact["order_day"])
        & (dim["end_day"].isNull() | (fact["order_day"] < dim["end_day"])),
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        F.col("order_day").cast("bigint").alias("order_day"),
        F.col("version").cast("bigint").alias("version"),
        F.col("segment").cast("bigint").alias("segment"),
    )


@register(
    "join_interval_self_overlap",
    oracle="""
WITH iv AS (
  SELECT o_custkey AS cust, o_orderkey AS k, o_orderdate AS s,
         o_orderdate + INTERVAL ((o_orderkey % 20) + 1) DAY AS e
  FROM orders
)
SELECT a.cust,
       CAST(count(*) AS BIGINT) AS n_conflicts,
       CAST(sum(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1)
            AS BIGINT) AS total_overlap_days
FROM iv a JOIN iv b
  ON a.cust = b.cust AND a.k < b.k
 AND a.s <= b.e AND b.s <= a.e
GROUP BY a.cust
""",
    doc="Interval self-overlap detection (the conflict-audit shape: "
    "double-booked resources, overlapping SCD validity windows): each "
    "order carries a derived validity interval [orderdate, orderdate + "
    "1..20 days]; emit, per customer, how many of their order pairs "
    "overlap in time and the total overlapping days — exact integer "
    "datediff arithmetic, half-open nothing: inclusive-day overlap = "
    "datediff(min(ends), max(starts)) + 1. Scale: the self-join is "
    "keyed on the partition key (cust), so both sides co-partition on "
    "ONE shuffle and the quadratic term is bounded by per-key group "
    "size, not table size (the C7 binned-range-join machinery is for "
    "UNKEYED interval joins; when a natural partition key exists, the "
    "keyed equi-join IS the right plan); per-key skew is AQE's "
    "skew-join case.",
    tags=("joins",),
)
def join_interval_self_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("s"),
        F.date_add(
            F.col("o_orderdate"), ((F.col("o_orderkey") % 20) + 1).cast("int")
        ).alias("e"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    j = a.join(
        b,
        (F.col("a.cust") == F.col("b.cust"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e")),
    )
    overlap = (
        F.datediff(
            F.least(F.col("a.e"), F.col("b.e")),
            F.greatest(F.col("a.s"), F.col("b.s")),
        )
        + 1
    )
    return (
        j.select(F.col("a.cust").alias("cust"), overlap.alias("d"))
        .groupBy("cust")
        .agg(
            F.count("*").cast("bigint").alias("n_conflicts"),
            F.sum("d").cast("bigint").alias("total_overlap_days"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH snap AS (
  SELECT o_custkey AS cust, o_orderdate AS snap_ts,
         CAST(o_totalprice * 100 AS DECIMAL(18,0)) AS cents,
         o_orderkey AS snap_key
  FROM orders
), probe AS (
  SELECT o_custkey AS cust, o_orderkey AS probe_key,
         o_orderdate + INTERVAL 45 DAY AS probe_ts
  FROM orders WHERE o_orderkey % 7 = 0
), matched AS (
  SELECT p.probe_key, p.cust, p.probe_ts, s.snap_ts,
         CAST(s.cents AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY p.probe_key
                            ORDER BY s.snap_ts DESC, s.snap_key DESC) AS rn
  FROM probe p JOIN snap s
    ON s.cust = p.cust AND s.snap_ts <= p.probe_ts
)
SELECT probe_key, cust,
       CASE WHEN snap_ts >= probe_ts - INTERVAL 30 DAY
            THEN cents END AS cents,
       (snap_ts < probe_ts - INTERVAL 30 DAY) AS stale
FROM matched WHERE rn = 1
""",
    doc="As-of join with a staleness tolerance (C8's bounded variant — "
    "the lookup every risk/serving system actually wants: 'latest "
    "value at-or-before T, but ONLY if it is fresher than T - 30d; "
    "otherwise surface staleness rather than silently serving ancient "
    "data'): probes (every 7th order, shifted +45 days) find their "
    "customer's latest order at-or-before probe time, and matches "
    "older than the 30-day tolerance return NULL with an explicit "
    "stale flag. Deterministic (ts, key) tie-break. Scale: the match "
    "is the keyed backward scan (one cust shuffle + per-probe argmax "
    "via WindowGroupLimit); the tolerance is a post-filter on the "
    "single surviving row, not a join-condition blow-up.",
    tags=("joins",),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    snap = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("snap_ts"),
        (F.col("o_totalprice") * 100).cast("decimal(18,0)").alias("scents"),
        F.col("o_orderkey").alias("snap_key"),
    )
    probe = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_custkey").alias("pcust"),
        F.col("o_orderkey").alias("probe_key"),
        F.date_add(F.col("o_orderdate"), 45).alias("probe_ts"),
    )
    w = Window.partitionBy("probe_key").orderBy(
        F.col("snap_ts").desc(), F.col("snap_key").desc()
    )
    matched = (
        probe.join(
            snap,
            (snap["cust"] == probe["pcust"]) & (snap["snap_ts"] <= probe["probe_ts"]),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    fresh = F.col("snap_ts") >= F.date_sub(F.col("probe_ts"), 30)
    return matched.select(
        "probe_key",
        F.col("cust"),
        F.when(fresh, F.col("scents").cast("bigint")).alias("cents"),
        (~fresh).alias("stale"),
    )


@register(
    "join_temporal_overlap_duration",
    oracle="""
WITH a AS (
  SELECT user_id, epoch_us(ts) AS lo,
         epoch_us(ts) + CAST(round(value * 60000000, 0) AS BIGINT) AS hi,
         event_id
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, epoch_us(ts) AS lo,
         epoch_us(ts) + CAST(round(value * 60000000, 0) AS BIGINT) AS hi,
         event_id
  FROM events WHERE event_type = 'error'
)
SELECT a.user_id,
       CAST(count(*) AS BIGINT) AS n_overlapping_pairs,
       CAST(sum(least(a.hi, b.hi) - greatest(a.lo, b.lo)) AS BIGINT)
         AS total_overlap_us,
       CAST(max(least(a.hi, b.hi) - greatest(a.lo, b.lo)) AS BIGINT)
         AS max_overlap_us
FROM a JOIN b ON b.user_id = a.user_id
              AND b.lo < a.hi AND a.lo < b.hi
GROUP BY a.user_id
""",
    doc="Temporal overlap ACCOUNTING between two interval sets per key — "
    "not just which intervals touch (join_range_interval / "
    "join_interval_self_overlap find pairs) but for HOW LONG: per "
    "user, view-activity windows vs error windows, total and max "
    "overlapped microseconds over all crossing pairs — the billing / "
    "incident-impact shape ('how much active time was inside an "
    "outage').  Exactness: interval bounds are exact integer epoch "
    "micros (the join_range_interval convention), each pair's overlap "
    "is least(hi)-greatest(lo) in pure BIGINT, and the per-user sums "
    "are order-free integers.  Scale posture: ONE user_id equi-join "
    "co-locates both sets (per-user series are bounded, so the "
    "per-key pair work is bounded); for unbounded-per-key interval "
    "sets the binned interval machinery (operators/interval.py) is "
    "the drop-in — the equi-key here plays the role of the bin.",
    tags=("joins",),
)
def join_temporal_overlap_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    ev = load_events(spark, sf_dir)
    us = F.expr(_NTZ_US)  # the module's one epoch-micros convention
    dur = F.expr("CAST(round(value * 60000000, 0) AS BIGINT)")

    def side(etype: str, prefix: str):
        return ev.filter(F.col("event_type") == etype).select(
            "user_id",
            us.alias(f"{prefix}_lo"),
            (us + dur).alias(f"{prefix}_hi"),
        )

    a, b = side("view", "a"), side("error", "b")
    overlap = F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")
    return (
        a.join(b, "user_id")
        .filter((F.col("b_lo") < F.col("a_hi")) & (F.col("a_lo") < F.col("b_hi")))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_overlapping_pairs"),
            F.sum(overlap).cast("bigint").alias("total_overlap_us"),
            F.max(overlap).cast("bigint").alias("max_overlap_us"),
        )
    )


@register(
    "join_asof_forward",
    oracle="""
WITH probe AS (
  SELECT p.event_id, p.ts, epoch_us(p.ts) AS p_us,
         (SELECT min(epoch_us(s.ts)) FROM events s
          WHERE s.user_id = p.user_id AND s.event_type = 'error'
            AND s.ts >= p.ts) AS e_us
  FROM events p WHERE p.event_type = 'purchase'
)
SELECT event_id, ts, e_us AS next_error_us,
       e_us - p_us AS gap_us
FROM probe
""",
    doc="FORWARD as-of join (earliest-at-or-after; pandas merge_asof "
    "direction='forward') — the incident-triage shape: for each "
    "purchase, the user's NEXT error event, answering 'did a failure "
    "follow this transaction, and how soon?'.  Completes the as-of "
    "family: join_asof (backward), join_asof_nearest (min |gap|), "
    "join_asof_tolerance (backward + staleness bound), and now "
    "forward.  Implementation mirrors the backward operator "
    "(operators/asof.py asof_join_forward): union both sides, ONE "
    "shuffle on (user_id, ts), a single window pass taking FIRST "
    "ignorenulls over [current, unbounded following] with same-ts "
    "right rows sorted after left so ties at s.ts == p.ts qualify on "
    "both engines — no nested loop, no per-key driver work.  Gaps are "
    "exact integer epoch micros.",
    tags=("joins",),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events
    from cobradb_spark.operators.asof import asof_join_forward

    ev = load_events(spark, sf_dir)
    us = F.expr(_NTZ_US)
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", us.alias("p_us")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", us.alias("e_us")
    )
    out = asof_join_forward(
        probes, errors, on="ts", by="user_id", right_value_cols=["e_us"]
    )
    return out.select(
        "event_id",
        "ts",
        F.col("e_us").cast("long").alias("next_error_us"),
        (F.col("e_us") - F.col("p_us")).cast("long").alias("gap_us"),
    )
