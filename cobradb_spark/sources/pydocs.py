"""Custom Python DataSource connector over the documents parquet.

The reference ships hard-wired loaders per input format (SURVEY §2 A —
its model/genbank readers are compiled-in [P]); Spark's answer is a
PLUGGABLE source: implement `pyspark.sql.datasource.DataSource` and any
`spark.read.format("cobradb_pydocs")` user gets the engine's planning
machinery on top.  This connector demonstrates the three capabilities a
source needs to be viable at 100 TB:

- **split planning**: `partitions()` returns one InputPartition per
  parquet row-group, so a large file fans out across executors instead
  of serializing through one task;
- **filter pushdown**: `pushFilters()` absorbs top-level equality
  predicates and applies them inside the scan (Spark keeps evaluating
  whatever the source declines — correctness never depends on the
  source's cooperation);
- **Arrow-batch transfer**: `read()` yields pyarrow RecordBatches, not
  Python tuples, so rows never materialize one-at-a-time in Python.

(Column pruning is NOT pushed into Python sources by Spark 4.1 — the
reader receives the full schema and Spark projects post-scan; the
`columns` plumbing below is ready for when the API gains it.)

The same class shape points at any external system (REST pages, a DB
cursor, a proprietary format) by swapping the pyarrow calls.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class _DocsReader(DataSourceReader):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns  # pruned projection, pushed by Spark
        self.eq_filters: list[tuple[str, object]] = []

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.eq_filters.append((f.attribute[0], f.value))
            else:
                yield f  # declined — Spark evaluates it post-scan

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [_RowGroupPartition(self.path, i) for i in range(max(n, 1))]

    def read(self, partition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        if partition.index >= pf.metadata.num_row_groups:
            return
        # Read filter columns too, then prune back to the projection.
        need = list(dict.fromkeys(self.columns + [c for c, _ in self.eq_filters]))
        tbl = pf.read_row_group(partition.index, columns=need)
        for col, val in self.eq_filters:
            tbl = tbl.filter(pc.equal(tbl[col], val))
        yield from tbl.select(self.columns).to_batches()


class DocsParquetDataSource(DataSource):
    """`spark.read.format("cobradb_pydocs").option("path", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "cobradb_pydocs"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema) -> _DocsReader:
        return _DocsReader(self.options["path"], [f.name for f in schema.fields])
