"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-events connector, batch AND streaming, with filter pushdown.

The reference's source surface is collections + connector tables (SURVEY
§2.1); this adds the "external system" shape those stand in for — a real
``spark.read.format(...)`` connector registered through
``spark.dataSource.register`` — while staying oracle-checkable: every row
derives from the engine-portable md5 bucket of its index, so DuckDB can
re-generate the exact relation from ``generate_series`` and hash-compare.

Row i (0-based):
  h(i)       = first 8 md5-hex digits of the DECIMAL string of i, as BIGINT
  user_id    = h(i) % 1000
  event_type = 'view' (h%10 in 0-5) | 'purchase' (6-8) | 'error' (9)
  value      = CAST(h(i) % 10000 AS DOUBLE) / 100.0
  ts         = TIMESTAMP '2024-03-01 00:00:00' + i seconds

Scale shape: the batch reader splits the index range into ``partitions``
InputPartitions — generation is embarrassingly parallel and sized by
option, not by driver memory. ``pushFilters`` accepts ``EqualTo``/``In`` on
``event_type`` and applies them AT GENERATION (the connector-side pushdown
the DSv2 contract exists for); everything else stays in Spark.

The streaming flavor exposes the same rows through
``SimpleDataSourceStreamReader`` offsets ({"i": next_index}, chunks of
``rows_per_batch``) — a bounded replay converges to the batch relation and
shares its oracle.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EPOCH = datetime(2024, 3, 1, 0, 0, 0)
SCHEMA_DDL = "ts timestamp, user_id bigint, event_type string, value double"

_TYPES = ["view"] * 6 + ["purchase"] * 3 + ["error"]


def _h(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


def gen_row(i: int):
    h = _h(i)
    return (
        EPOCH + timedelta(seconds=i),
        h % 1000,
        _TYPES[h % 10],
        float(h % 10000) / 100.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthEventsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.keep_types: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.keep_types = {f.value}
            elif isinstance(f, In) and f.attribute == ("event_type",):
                self.keep_types = set(f.values)
            else:
                yield f  # not pushed — Spark re-applies it

    def partitions(self):
        per = max(1, -(-self.n // self.n_parts))
        return [
            _RangePartition(s, min(s + per, self.n))
            for s in range(0, self.n, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            row = gen_row(i)
            if self.keep_types is None or row[2] in self.keep_types:
                yield row


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 400))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.rows_per_batch, self.n)
        return iter([gen_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([gen_row(i) for i in range(start["i"], end["i"])])


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthEventsReader:
        return SynthEventsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SynthEventsStreamReader:
        return SynthEventsStreamReader(self.options)


def register(spark) -> None:
    # a reader that implements pushFilters() requires the (runtime) flag
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthEventsDataSource)


def run_synth_batch(spark, n: int, where: str | None = None):
    """Batch read through the registered connector (UTC pinned for ts
    parity with the DuckDB twin)."""
    from flink_example_spark.session import tune

    tune(spark)
    register(spark)
    df = spark.read.format("synth_events").option("n", n).load()
    return df.filter(where) if where else df


def run_synth_stream(spark, n: int, rows_per_batch: int = 400):
    """Bounded replay through the streaming reader: micro-batches of
    ``rows_per_batch`` rows drain into a memory sink until all ``n``
    offsets commit — converges exactly to the batch relation (shared
    oracle)."""
    import time
    import uuid

    from flink_example_spark.session import tune

    tune(spark)
    register(spark)
    s = (
        spark.readStream.format("synth_events")
        .option("n", n)
        .option("rows_per_batch", rows_per_batch)
        .load()
    )
    name = f"synth_{uuid.uuid4().hex[:8]}"
    q = (
        s.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and spark.table(name).count() < n:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    return spark.table(name)


def synth_events_oracle(n: int, where: str = "TRUE") -> str:
    """DuckDB twin: regenerate the connector's rows from generate_series
    with the same md5-bucket arithmetic."""
    return f"""
        WITH src AS (
          SELECT i,
                 CAST(concat('0x', substr(md5(CAST(i AS VARCHAR)), 1, 8))
                      AS BIGINT) AS h
          FROM generate_series(0, {n - 1}) t(i)
        )
        SELECT TIMESTAMP '2024-03-01 00:00:00' + i * INTERVAL 1 SECOND AS ts,
               h % 1000 AS user_id,
               CASE WHEN h % 10 <= 5 THEN 'view'
                    WHEN h % 10 <= 8 THEN 'purchase'
                    ELSE 'error' END AS event_type,
               CAST(h % 10000 AS DOUBLE) / 100.0 AS value
        FROM src WHERE {where}
    """


# --- custom sink: manifest-committed text writer -----------------------------


class _CommitMsg:
    def __init__(self, path: str, count: int, checksum: str):
        self.path, self.count, self.checksum = path, count, checksum


def _manifest_writer_cls():
    """Build the writer class lazily (keeps module import light)."""
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class ManifestCommit(WriterCommitMessage, _CommitMsg):
        pass

    class ManifestTextWriter(DataSourceWriter):
        """Task-parallel text writer with a real two-phase commit: each
        task writes ``part-<uuid>`` and returns (path, count, md5-of-lines)
        as its commit message; ``commit()`` publishes a MANIFEST listing
        exactly the committed parts — readers that honor the manifest never
        see uncommitted/aborted task output (the same protocol file
        committers and Iceberg-style manifests use). ``abort()`` removes
        orphan parts."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("manifest_text sink requires path option")

        def write(self, rows):
            import hashlib
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.txt"
            full = os.path.join(self.path, name)
            h = hashlib.md5()
            n = 0
            with open(full, "w") as fh:
                for row in rows:
                    line = "|".join("" if v is None else str(v) for v in row)
                    fh.write(line + "\n")
                    h.update(line.encode())
                    n += 1
            return ManifestCommit(name, n, h.hexdigest())

        def commit(self, messages):
            import os

            lines = sorted(
                f"{m.path}|{m.count}|{m.checksum}" for m in messages if m.count
            )
            with open(os.path.join(self.path, "MANIFEST"), "w") as fh:
                fh.write("\n".join(lines) + "\n")

        def abort(self, messages):
            import os

            for m in messages:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except OSError:
                    pass

    return ManifestTextWriter


class ManifestTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_text"

    def schema(self) -> str:  # writer-only source; schema is the input's
        return "line string"

    def writer(self, schema: StructType, overwrite: bool):
        return _manifest_writer_cls()(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(ManifestTextDataSource)


def read_manifest(path: str) -> list[tuple[str, int, str]]:
    """Parse the committed manifest: (part_file, row_count, md5)."""
    import os

    out = []
    with open(os.path.join(path, "MANIFEST")) as fh:
        for line in fh:
            p, n, c = line.strip().split("|")
            out.append((p, int(n), c))
    return out
