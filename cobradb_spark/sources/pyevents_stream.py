"""Custom Python STREAMING source — offset-managed replay of events.

Streaming twin of sources/pydocs.py: implements
`SimpleDataSourceStreamReader`, the pyspark.sql.datasource API for
sources whose offsets the driver tracks (a Kafka-shaped contract:
`initialOffset` -> `read(start)` advancing a row-cursor offset ->
`readBetweenOffsets(start, end)` for deterministic micro-batch REPLAY
after failure — exactly the piece a file-drop replay can't fake).

Each micro-batch serves `batchRows` rows from the parquet via pyarrow,
so one static file becomes a deterministic multi-batch stream; the
checkpointed offset dict {"row": n} is what makes recovery exact.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENTS_STREAM_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"
_COLS = ["event_id", "user_id", "event_type", "value"]


class _EventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, batch_rows: int):
        self.path = path
        self.batch_rows = batch_rows
        # Per-QUERY driver-side cache (r14): the reader object lives for
        # the streaming query's lifetime, and re-reading the whole file
        # plus its footer on EVERY micro-batch made a 50-batch replay
        # scan the source 50 times.  A restarted query builds a fresh
        # reader, so recovery semantics are unchanged.
        self._tbl = None
        self._nrows: int | None = None

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _table(self):
        if self._tbl is None:
            import pyarrow.parquet as pq

            self._tbl = pq.read_table(self.path, columns=_COLS)
            self._nrows = self._tbl.num_rows
        return self._tbl

    def _slice(self, start: int, end: int):
        chunk = self._table().slice(start, max(end - start, 0))
        cols = [chunk[c].to_pylist() for c in _COLS]
        return iter(list(zip(*cols))) if chunk.num_rows else iter([])

    def read(self, start: dict):
        self._table()
        n = self._nrows
        lo = start["row"]
        hi = min(lo + self.batch_rows, n)
        if lo >= n:  # caught up: no new offset, no rows
            return iter([]), {"row": lo}
        return self._slice(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._slice(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass  # source-side retention is a no-op for a static file


class EventsStreamDataSource(DataSource):
    """`spark.readStream.format("cobradb_pyevents").option("path", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "cobradb_pyevents"

    def schema(self) -> str:
        return EVENTS_STREAM_SCHEMA

    def simpleStreamReader(self, schema) -> _EventsStreamReader:
        return _EventsStreamReader(
            self.options["path"], int(self.options.get("batchrows", "2000"))
        )
