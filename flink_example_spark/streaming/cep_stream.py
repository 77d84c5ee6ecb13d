"""Streaming CEP: the greedy funnel pattern maintained over a live event
stream — Flink-CEP-on-streams parity for ``operators/cep.py::funnel``.

Per-key state is the funnel frontier (the matched step times, <= k
integers), advanced by an ``applyInPandasWithState`` automaton: events are
processed in event-time order and each one either opens the funnel (first
step-1 event), advances it (next step, strictly later, within the
horizon), or is ignored. A completion row is emitted exactly once, at the
micro-batch where the final step matches — state then pins to "done".

Ordering contract: the automaton is exact when each key's events arrive in
event-time order ACROSS micro-batches (within a batch they are sorted
here). The bounded replay below stages chunks by event id — event-time
ordered in the harness data — so the replay converges EXACTLY to the
batch ``funnel`` and shares its DuckDB oracle. An unbounded deployment
with out-of-order arrival buffers events per key until the watermark
passes them (Flink CEP's approach) — that needs per-key ListState, the
same transformWithState port gated on protobuf (streaming/stateful.py).

Scale: one shuffle on the key (the same exchange the batch frontier chain
needs, but paid once instead of k-1 times); state per key is O(k)
integers; the automaton is Arrow-batched Python (CEP step logic is not
expressible in append-mode SQL aggregates — conditional chained mins).
"""

from __future__ import annotations

import os
import pickle
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from flink_example_spark.session import shuffle_partitions, tune
from flink_example_spark.streaming.staging import stamp_chunk_mtimes

_STATE_SCHEMA = StructType([StructField("pkl", BinaryType(), True)])


def streaming_funnel(
    event_stream: DataFrame,
    steps: list[str],
    within_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Update-mode funnel completions over a stream. Output: (key,
    u_1..u_k epoch-micros BIGINT, duration_us) — one row per completed
    key, emitted in the completing micro-batch."""
    import pandas as pd

    k = len(steps)
    if k < 2:
        raise ValueError("funnel needs at least 2 steps")
    within_us = within_sec * 1_000_000
    out_fields = [StructField("key", LongType())]
    out_fields += [StructField(f"u_{i}", LongType()) for i in range(1, k + 1)]
    out_fields += [StructField("duration_us", LongType())]
    output_schema = StructType(out_fields)
    cols = [f.name for f in output_schema.fields]
    step_index = {s: i for i, s in enumerate(steps)}

    src = event_stream.select(
        F.col(key_col).alias("_k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(type_col).alias("_et"),
    ).filter(F.col("_et").isin(list(steps)))

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        # frontier: list of matched step micros (len == progress); done flag
        if state.exists:
            done, frontier = pickle.loads(state.get[0])
        else:
            done, frontier = False, []
        if done:
            # drain the iterator (contract) and keep state pinned
            for _ in pdfs:
                pass
            yield pd.DataFrame([], columns=cols)
            return
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values("_us", kind="mergesort")
        completed = None
        for us, et in zip(ev["_us"], ev["_et"]):
            us = int(us)
            j = len(frontier)
            if j == 0:
                if et == steps[0]:
                    frontier.append(us)
            elif step_index.get(et, -1) == j:
                if us > frontier[-1] and us <= frontier[0] + within_us:
                    frontier.append(us)
                    if len(frontier) == k:
                        completed = list(frontier)
                        done = True
                        break
        state.update((pickle.dumps((done, frontier)),))
        if completed is None:
            yield pd.DataFrame([], columns=cols)
        else:
            row = [key[0], *completed, completed[-1] - completed[0]]
            yield pd.DataFrame([row], columns=cols)

    return src.groupBy("_k").applyInPandasWithState(
        process,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: list[str],
    within_sec: int,
    chunks: int = 3,
) -> DataFrame:
    """Bounded replay: stage the events table as event-time-ordered chunk
    files (id ranges; ids are time-ordered in the harness data), run the
    stateful funnel to completion, and return rows shaped exactly like the
    batch ``funnel`` (timestamps reconstructed from the exact micros)."""
    from flink_example_spark.tables import load_table

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    tmpdir = tempfile.mkdtemp(prefix="stream_cep_")
    n = ev.count()
    per = (n + chunks - 1) // chunks
    for i in range(chunks):
        part = ev.filter(
            (F.col("event_id") >= i * per) & (F.col("event_id") < (i + 1) * per)
        )
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmpdir, f"chunk_{i}")
        )
    stamp_chunk_mtimes(tmpdir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(tmpdir, "chunk_*"))
    )
    out = streaming_funnel(stream, steps, within_sec)
    name = f"stream_cep_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    res = spark.table(name)
    k = len(steps)
    ts_cols = [
        F.timestamp_micros(F.col(f"u_{i}")).cast("timestamp_ntz").alias(f"t_{i}")
        for i in range(1, k + 1)
    ]
    return res.select("key", *ts_cols, "duration_us")
