"""Deterministic arrival-order stamping for staged bounded-replay chunks.

The file stream source (``readStream.parquet`` + ``maxFilesPerTrigger=1``)
orders files by modification time.  The bounded replays stage chunk
directories sequentially and previously relied on 0.05s inter-write sleeps
for distinct mtimes — fragile on filesystems with coarse mtime granularity,
where a sentinel wave sharing an mtime with a data chunk collapses into the
same micro-batch and defeats the two-wave watermark flush.

``stamp_chunk_mtimes`` makes ordering explicit: every file under
``chunk_<i>*`` gets mtime ``base + i`` seconds (whole-second spacing clears
any filesystem's resolution), so batch order equals chunk index regardless
of write timing.
"""

from __future__ import annotations

import os
import re

_CHUNK_RE = re.compile(r"^chunk_(\d+)")


def stamp_chunk_mtimes(tmpdir: str) -> None:
    """Set strictly-increasing mtimes on staged chunk files by chunk index."""
    entries = []
    for name in os.listdir(tmpdir):
        m = _CHUNK_RE.match(name)
        if m:
            entries.append((int(m.group(1)), os.path.join(tmpdir, name)))
    base = max(
        (
            os.path.getmtime(os.path.join(d, f))
            for _, d in entries
            for f in os.listdir(d)
        ),
        default=0.0,
    )
    for idx, d in sorted(entries):
        ts = base + 1.0 + idx
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (ts, ts))


_STAGE_MEMO: dict = {}


def stage_table_by_key(spark, sf_dir: str, table: str, key_col: str, chunks: int):
    """Stage any harness table as key-ordered chunk files for bounded
    replay (the generalization of ``dedup_stream._stage_by_id``, which
    predates it and stages the documents table). Range filters only —
    no row data crosses the driver. Returns (tmpdir, schema).

    Session-memoized: a sweep runs dozens of bounded-replay twins, and
    re-staging the same deterministic chunk files per twin is pure
    waste — the staged dir is immutable once stamped, so every
    identically-parameterized caller shares it."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_example_spark.tables import load_table

    memo_key = (
        spark.sparkContext.applicationId, sf_dir, table, key_col, chunks
    )
    if memo_key in _STAGE_MEMO:
        return _STAGE_MEMO[memo_key]
    df = load_table(spark, sf_dir, table)
    tmpdir = tempfile.mkdtemp(prefix=f"stream_{table}_")
    cuts = (
        df.agg(
            F.percentile_approx(
                F.col(key_col).cast("double"),
                [i / chunks for i in range(1, chunks)],
                10000,
            )
        ).first()[0]
        if chunks > 1
        else []
    )
    bounds = [None, *cuts, None]
    for i in range(chunks):
        part = df
        if bounds[i] is not None:
            part = part.filter(F.col(key_col).cast("double") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col(key_col).cast("double") < bounds[i + 1])
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmpdir, f"chunk_{i}")
        )
    stamp_chunk_mtimes(tmpdir)
    _STAGE_MEMO[memo_key] = (tmpdir, df.schema)
    return tmpdir, df.schema
