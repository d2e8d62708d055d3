"""Custom Python DataSource WRITER — a JSONL sink with two-phase commit.

Sink twin of sources/pydocs.py (SURVEY §2 A5: the reference's only sink
is a terminal pg_dump [P]; Spark's model is pluggable writers).  The
protocol demonstrated here is the one every distributed sink needs at
scale:

- each task writes its own part file (no coordination, no renames into
  place) and returns a WriterCommitMessage naming it;
- the driver's `commit()` publishes a `_MANIFEST` only after ALL tasks
  succeeded — readers that honor the manifest never observe a torn
  write;
- `abort()` leaves garbage part files unreferenced (cheap cleanup, no
  data corruption window).

JSON floats round-trip exactly (shortest-repr -> binary64), so the
read-back query is oracle-exact.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _PartMessage(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class _JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns

    def write(self, iterator) -> _PartMessage:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(json.dumps({c: d[c] for c in self.columns}) + "\n")
        return _PartMessage(name)

    def commit(self, messages) -> None:
        manifest = sorted(m.filename for m in messages)
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            f.write("\n".join(manifest) + "\n")

    def abort(self, messages) -> None:
        pass  # unpublished part files are unreferenced garbage, not data


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of _JsonlWriter: per-micro-batch two-phase commit.

    Tasks write uncoordinated part files; the driver publishes
    `_MANIFEST-{batchId}` only after the whole batch succeeded.  A batch
    RETRY overwrites the same manifest with the retried parts, so a
    manifest-honoring reader sees each batch exactly once — the sink-side
    half of Structured Streaming's exactly-once contract (the source side
    is checkpointed offsets)."""

    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns

    def write(self, iterator) -> _PartMessage:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(json.dumps({c: d[c] for c in self.columns}) + "\n")
        return _PartMessage(name)

    def commit(self, messages, batchId: int) -> None:
        manifest = sorted(m.filename for m in messages)
        with open(os.path.join(self.path, f"_MANIFEST-{batchId}"), "w") as f:
            f.write("\n".join(manifest) + "\n")

    def abort(self, messages, batchId: int) -> None:
        pass  # unpublished part files are unreferenced garbage, not data


class JsonlSinkDataSource(DataSource):
    """`df.write.format("cobradb_pyjsonl").option("path", ...).save()` or
    `df.writeStream.format("cobradb_pyjsonl")...` (streaming twin)."""

    @classmethod
    def name(cls) -> str:
        return "cobradb_pyjsonl"

    def writer(self, schema, overwrite: bool) -> _JsonlWriter:
        return _JsonlWriter(self.options["path"], [f.name for f in schema.fields])

    def streamWriter(self, schema, overwrite: bool) -> _JsonlStreamWriter:
        return _JsonlStreamWriter(self.options["path"], [f.name for f in schema.fields])


def read_manifested_jsonl(spark, path: str, schema: str):
    """Read back ONLY the committed part files (manifest-honoring reader).

    Honors both the batch `_MANIFEST` and streaming `_MANIFEST-{batchId}`
    publications; uncommitted part files are invisible."""
    parts: list[str] = []
    for fname in sorted(os.listdir(path)):
        if fname == "_MANIFEST" or fname.startswith("_MANIFEST-"):
            with open(os.path.join(path, fname)) as f:
                parts.extend(os.path.join(path, ln.strip()) for ln in f if ln.strip())
    return spark.read.schema(schema).json(parts)
