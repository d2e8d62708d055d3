"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) is the first line of
defense; salting is the explicit fallback for joins AQE can't split
(e.g. a skewed build side that must broadcast-fail) and for hot-key
aggregations.  Pattern [public, standard Spark practice]:

  fact side:  key -> (key, salt = hash(row) % S)
  dim side:   each row replicated S times, one per salt value
  join on (key, salt) — the hot key's rows spread over S tasks.

Two-phase agg: aggregate on (key, salt) first (partial state spreads
over S tasks), then re-aggregate on key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot fact keys: dim replicated `salt` times,
    fact rows spread uniformly via a random-free deterministic salt
    (hash of all fact columns), so results are reproducible."""
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    dim_s = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["__salt"] == dim_s["__salt"]),
        how,
    )
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame, key: str, agg_cols: dict[str, str], salt: int = 16
) -> DataFrame:
    """Hot-key aggregation: partial agg on (key, salt), final on key.
    agg_cols: output name -> 'sum:col' | 'count:*'."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial_exprs, final_exprs = [], []
    for name, spec in agg_cols.items():
        op, col = spec.split(":", 1)
        if op == "count":
            partial_exprs.append(F.count("*").alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        else:
            raise ValueError(f"unsupported agg {spec!r}")
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def fan_out(df: DataFrame, *keys: str, parts: int | None = None) -> DataFrame:
    """Hash-repartition `df` across the session's cores before a
    CPU-amplifying operator (a wide explode, per-row crypto hashing, an
    expensive expression tree).

    Why: a scan stage fuses everything up to the next exchange into the
    scan tasks, so when the input arrives in few splits (one parquet row
    group, a gzip file, a small pre-agg), ALL downstream per-row work
    runs at the input's parallelism — one straggler core while the rest
    of the machine idles (guide §2.5 "input skew": repartition right
    after the read).  Spreading 10^5-10^6 narrow rows costs a few MB of
    shuffle; serializing 10-100x that many post-explode expression
    evaluations costs seconds.  At cluster scale the same call fans a
    small hot input across the fleet and is a no-op-sized shuffle for
    already-wide inputs.

    Keyed on `keys` (deterministic hash partitioning — reproducible
    under task retry without the sort round-robin repartition needs);
    callers pass any stable, high-cardinality column such as a row id.
    `parts` defaults to the session's defaultParallelism, so the grain
    is scale-adaptive, never a constant tuned to one machine.
    """
    n = parts or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    if keys:
        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)
