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
    total order (row_number over key, ordered by every *orderable*
    non-key column, nulls last) so the surviving row is rerun-stable
    across runs and partitionings — dropDuplicates would keep whichever
    row a partition scan met first, which is not stable (round-1 ADVICE
    item).  Unorderable column types (MapType, and any type Spark's sort
    rejects) are excluded from the order; if no orderable tiebreaker
    exists the choice among exact-duplicate keys is arbitrary but the
    window still collapses to one row (round-2 ADVICE item)."""
    from pyspark.sql import types as T

    cols = existing.columns
    field_types = {f.name: f.dataType for f in incoming.schema.fields}

    def _orderable(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    non_key = [c for c in cols if c not in keys and _orderable(field_types.get(c, T.NullType()))]
    order = [F.col(c).asc_nulls_last() for c in non_key] or [F.lit(1)]
    # Collision-proof temp name: suffix until absent from the frame.
    rn = "_rn"
    while rn in cols:
        rn += "_"
    w = Window.partitionBy(*keys).orderBy(*order)
    fresh = (
        incoming.select(*cols)
        .withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
        .join(existing.select(*keys), on=keys, how="left_anti")
    )
    return existing.unionByName(fresh)
