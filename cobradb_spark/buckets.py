"""Shared deterministic md5-bucket — ONE formulation, both engines.

The cross-engine trick (MEMORY: oracle-parity-pitfalls): Spark
`conv(substring(md5(x),1,15),16,10)` == DuckDB
`CAST('0x'||substr(md5(x),1,15) AS UBIGINT)` — 60 bits of the digest,
fits BIGINT on both sides, so `% 100` yields the identical [0,100)
bucket for the identical input string.

This is also the RIGHT design at 100 TB: a hash-derived bucket is
stable under reruns, partition-local (no shuffle, no RNG state), and
pushes down as an ordinary filter — so a 10% sample or an 80/10/10
split never materializes membership anywhere.

Promoted from queries/mlprep.py privates (round-13, ADVICE item): the
composition key pipeline_curate_corpus reuses the exact same bucket
formulation for its deterministic split stage, and a shared public
module makes that contract explicit instead of reaching into a sibling
module's underscore names (same rationale as cobradb_spark/ngrams.py).

Consumers: queries/mlprep.py (sample_hash_deterministic,
sample_stratified, split_train_test), queries/pipeline.py
(pipeline_curate_corpus), queries/layout.py (sample_weighted_bernoulli
uses the same digest-parse idiom with its own draw scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def bucket(col_expr: str, seed: str) -> F.Column:
    """Deterministic [0,100) bucket from md5 — Spark side."""
    h = F.md5(F.concat(F.lit(seed), F.expr(col_expr).cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 100


def bucket_sql(col_expr: str, seed: str) -> str:
    """Same bucket — DuckDB side (UBIGINT parse of the same 15 hex chars)."""
    return (
        f"CAST(CAST(concat('0x', substr(md5(concat('{seed}', "
        f"CAST({col_expr} AS VARCHAR))), 1, 15)) AS UBIGINT) % 100 AS BIGINT)"
    )
