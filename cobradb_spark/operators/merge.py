"""Upsert / merge — the Spark re-expression of cobradb's get_or_create.

Reference semantics [P] (cobradb/util.py::get_or_create): look up a row
by natural key; insert if absent, return existing otherwise.  Loaders
call it per entity, so the reference's upsert is row-at-a-time against
Postgres.  Set-at-a-time on Spark: one anti-join + one union per batch.

Scale notes (100 TB): both sides shuffle on the key unless the incoming
batch is small — then the anti-join broadcasts (Catalyst decides via
AQE; callers can hint).  For repeated merges into the same table,
bucketBy(key) the stored table so the per-batch anti-join is
shuffle-free on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """Incoming-wins upsert: all incoming rows + existing rows whose key
    is absent from incoming.  Columns must align by name."""
    cols = existing.columns
    if set(cols) != set(incoming.columns):
        raise ValueError(f"column mismatch: {cols} vs {incoming.columns}")
    untouched = existing.join(incoming.select(*keys), on=keys, how="left_anti")
    return incoming.select(*cols).unionByName(untouched.select(*cols))


def insert_if_absent(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """get_or_create semantics exactly: existing wins, new keys appended.

    Duplicate keys *within* incoming are collapsed under an explicit
    total order (row_number over key, ordered by every non-key column,
    nulls last) so the surviving row is rerun-stable across runs and
    partitionings — dropDuplicates would keep whichever row a partition
    scan met first, which is not stable (round-1 ADVICE item)."""
    cols = existing.columns
    non_key = [c for c in cols if c not in keys]
    order = [F.col(c).asc_nulls_last() for c in non_key] or [F.lit(1)]
    w = Window.partitionBy(*keys).orderBy(*order)
    fresh = (
        incoming.select(*cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .join(existing.select(*keys), on=keys, how="left_anti")
    )
    return existing.unionByName(fresh)
