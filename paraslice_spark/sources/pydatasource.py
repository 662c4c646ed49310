"""Custom Python Data Sources (PySpark 4 `pyspark.sql.datasource` API) —
the engine's source-extensibility surface (SURVEY §2.1 S-family beyond the
built-in formats).

Two sources, both exercised in tests/test_pydatasource.py:

- ``paraslice_jsonl``: a BATCH source over a directory of JSONL shards with
  real partition planning (one input partition per shard file — Spark
  schedules them independently, exactly like file-source splits) and
  Spark-4.1 FILTER PUSHDOWN: EqualTo(event_type) prunes rows inside the
  reader, before anything reaches the JVM.  At 100 TB this is the pattern
  for ingesting a bespoke feed format without a JVM connector: schema
  declared up front, shards = partitions, predicates evaluated at the
  source.
- ``paraslice_synthetic_events``: a STREAMING micro-batch source with
  integer offsets — ``latestOffset`` advances a fixed ``rows_per_batch``
  per poll and ``read(partition)`` derives every row DETERMINISTICALLY
  from its global index (md5-free integer mixing), so replays of the same
  offset range are bit-identical — the property streaming exactly-once
  recovery depends on.

Both are plain-Python classes shipped to executors by the session's
package zip; no JVM code, no jars."""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    WriterCommitMessage,
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlEventsReader(DataSourceReader):
    """One partition per shard; EqualTo(event_type) evaluated in-reader."""

    def __init__(self, options):
        self.directory = options["path"]
        self.type_filter: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            # ColumnPath is a tuple of name parts; top-level column only
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("event_type",)
                and self.type_filter is None
            ):
                self.type_filter = f.value
            else:
                yield f  # unsupported -> Spark re-applies it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _ShardPartition(os.path.join(self.directory, n))
            for n in sorted(os.listdir(self.directory))
            if n.endswith(".jsonl")
        ]

    def read(self, partition: _ShardPartition):
        with open(partition.path) as fh:
            for line in fh:
                rec = json.loads(line)
                if (
                    self.type_filter is not None
                    and rec["event_type"] != self.type_filter
                ):
                    continue
                yield (
                    rec["event_id"],
                    rec["user_id"],
                    rec["event_type"],
                    rec["value"],
                )


class JsonlEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paraslice_jsonl"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return JsonlEventsReader(self.options)

    def writer(self, schema, overwrite: bool) -> "DataSourceWriter":
        return JsonlEventsWriter(self.options, overwrite)


_TYPES = ("view", "click", "purchase", "signup", "error")


def synthetic_event(i: int) -> tuple[int, int, str, float]:
    """Deterministic row for global index i — integer mixing only, so any
    replay of an offset range reproduces identical rows."""
    h = (i * 2654435761) % (2**32)  # Knuth multiplicative hash
    return (
        i,
        h % 97,
        _TYPES[h % len(_TYPES)],
        round((h % 10_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", "50"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._latest = getattr(self, "_latest", 0) + self.rows_per_batch
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["index"], end["index"]
        mid = (lo + hi) // 2  # two partitions per batch: planning is real
        return [p for p in (_RangePartition(lo, mid), _RangePartition(mid, hi)) if p.start < p.end]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synthetic_event(i)

    def commit(self, end: dict) -> None:
        pass  # no external offsets to release

    def stop(self) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paraslice_synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_python_sources(spark) -> None:
    spark.dataSource.register(JsonlEventsDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_path: str
    rows: int


class JsonlEventsWriter(DataSourceWriter):
    """Batch writer with the real two-phase commit protocol: every task
    writes to a uuid temp file and returns a commit message; only the
    DRIVER's commit() renames the temp shards into place, so a failed or
    speculatively-duplicated task leaves nothing visible (abort() removes
    its temps).  This is exactly the contract JVM FileCommitProtocol
    implements for the built-in sinks."""

    def __init__(self, options, overwrite: bool):
        self.directory = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _ShardCommit:
        import uuid

        os.makedirs(self.directory, exist_ok=True)
        tmp = os.path.join(self.directory, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ShardCommit(tmp_path=tmp, rows=n)

    def commit(self, messages) -> None:
        import uuid

        if self.overwrite:
            for name in os.listdir(self.directory):
                if name.endswith(".jsonl") and not name.startswith(".tmp-"):
                    os.remove(os.path.join(self.directory, name))
        # unique batch tag so an append-mode save never clobbers a prior
        # batch's shard{i} names (ADVICE r6).
        tag = uuid.uuid4().hex[:8]
        for i, m in enumerate(m for m in messages if m is not None):
            os.rename(
                m.tmp_path,
                os.path.join(self.directory, f"shard-{tag}-{i}.jsonl"),
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
