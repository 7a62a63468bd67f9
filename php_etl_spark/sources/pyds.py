"""User-defined connector via the Python DataSource API (Spark 4,
`pyspark.sql.datasource`) — the engine-native answer to the
reference's pluggable IO providers (ReadWriter implementations,
/root/reference/sdk/src/IO/ReadWriter.php:17-88): a third-party
format plugs into `spark.read.format(...)` / `df.write.format(...)`
with partition-parallel reads and a two-phase-commit write, all in
Python, no JVM code.

The demo format is JSONL-lines (newline-delimited JSON with an
explicit schema option). What the implementation demonstrates is the
CONTRACT, not the format:

- reader: `partitions()` returns one split per data file, so the scan
  parallelizes like any file source and a 1000-file table fans out to
  1000 tasks;
- writer: executors write task-private uuid-named files (no
  coordination, safe under speculative retries), return their file
  names as commit messages, and `commit()` publishes a `_MANIFEST`
  naming exactly the committed files — the reader trusts the manifest,
  so an aborted/duplicate task's orphan file is invisible (the same
  manifest-over-rename logic as sources/versioned.py, at connector
  granularity);
- `abort()` deletes whatever the failed attempt produced.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_MANIFEST = "_MANIFEST"


class _FileSplit(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _FileMessage(WriterCommitMessage):
    def __init__(self, name: str):
        self.name = name


class JsonlLinesReader(DataSourceReader):
    def __init__(self, options, schema):
        self.dir = options["path"]
        self.fields = schema.fieldNames()

    def _files(self) -> list[str]:
        manifest = os.path.join(self.dir, _MANIFEST)
        if os.path.exists(manifest):
            with open(manifest) as f:
                names = json.load(f)["files"]
            return [os.path.join(self.dir, n) for n in names]
        return [
            os.path.join(self.dir, f)
            for f in sorted(os.listdir(self.dir))
            if f.endswith((".jsonl", ".json")) and not f.startswith("_")
        ]

    def partitions(self):
        return [_FileSplit(p) for p in self._files()]

    def read(self, partition):
        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    d = json.loads(line)
                    yield tuple(d.get(k) for k in self.fields)


class JsonlLinesWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.dir = options["path"]
        self.fields = schema.fieldNames()
        self.overwrite = overwrite
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator):
        # task-private file: concurrent/speculative attempts can never
        # collide, and nothing becomes visible before commit()
        name = f"part-{uuid.uuid4().hex}.jsonl"
        with open(os.path.join(self.dir, name), "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(dict(zip(self.fields, row)), sort_keys=True)
                )
                f.write("\n")
        return _FileMessage(name)

    def commit(self, messages):
        files = sorted(m.name for m in messages if m is not None)
        tmp = os.path.join(self.dir, f".manifest-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump({"files": files}, f)
        os.replace(tmp, os.path.join(self.dir, _MANIFEST))

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.dir, m.name))
                except OSError:
                    pass


class JsonlLinesStreamReader(SimpleDataSourceStreamReader):
    """Incremental tail of a jsonl_lines directory: the OFFSET is the
    set of file names already consumed, so each micro-batch reads only
    files that appeared since the last one — the custom-connector form
    of the file-stream source's listing offsets. Exactly-once follows
    from the offset contract: the checkpoint stores the consumed set,
    and replaying a batch re-reads precisely the files between its
    offsets (immutable once written)."""

    def __init__(self, options, schema):
        self.dir = options["path"]
        self.fields = schema.fieldNames()

    def _names(self) -> list[str]:
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith((".jsonl", ".json")) and not f.startswith((".", "_"))
        )

    def _rows_of(self, names):
        for n in names:
            with open(os.path.join(self.dir, n)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        d = json.loads(line)
                        yield tuple(d.get(k) for k in self.fields)

    def initialOffset(self):
        return {"files": []}

    def read(self, start):
        # list, not generator: the engine's prefetch cache shallow-
        # copies the iterator (copy.copy), which generators don't
        # support — and the Simple API is driver-prefetch by design,
        # so the batch is already memory-resident
        names = self._names()
        new = [n for n in names if n not in set(start["files"])]
        return (iter(list(self._rows_of(new))), {"files": names})

    def readBetweenOffsets(self, start, end):
        seen = set(start["files"])
        return iter(
            list(self._rows_of([n for n in end["files"] if n not in seen]))
        )


class JsonlLinesDataSource(DataSource):
    """format("jsonl_lines") — register with
    ``spark.dataSource.register(JsonlLinesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_lines"

    def schema(self) -> str:
        return self.options.get("schema", "value string")

    def reader(self, schema):
        return JsonlLinesReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return JsonlLinesWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema):
        return JsonlLinesStreamReader(self.options, schema)


def register(spark) -> None:
    """Register the format AND mark this module pickle-by-value: the
    data source classes are cloudpickled to Spark's Python workers,
    which unpickle by importing ``php_etl_spark`` — a module the
    worker can't see unless the driver process happens to run from
    the repo root (the streaming source runner is a separate worker
    process and fails with ModuleNotFoundError under a plain
    driver-style session; caught by the round-6 plain-session
    preflight). By-value serialization ships the class bodies inside
    the pickle, so workers need nothing on sys.path. Safe here: this
    module is self-contained (stdlib + pyspark imports only, both
    importable in every worker)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(JsonlLinesDataSource)
