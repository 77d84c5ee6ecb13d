"""Watermark-correct stateful streaming as-of join.

The foreachBatch variant (streaming/pipeline.py) evaluates each probe
micro-batch against a *static* version history. This operator handles the
harder case the reference's temporal join solves in Flink: BOTH sides
stream, events may arrive out of order within the watermark bound, and a
probe must not be answered until the watermark guarantees no earlier version
can still arrive.

Mechanics (``applyInPandasWithState``, per entity key):

- versions (tag=0) are appended to per-key state as they arrive;
- probes (tag=1) park in state until ``probe_time <= current watermark``,
  then emit the latest version at-or-before their time (inclusive ``<=``,
  LEFT semantics — same contract as operators/asof.py, App.java:200-205);
- the state store plays the role of Flink's versioned-table state
  (App.java:144-173).

End-of-stream: Flink flushes bounded streams by emitting a final
``MAX_WATERMARK``; Spark's availableNow trigger does not advance the
watermark past the last batch, so bounded replays should append a sentinel
version row later than every probe (see tests/test_stateful_asof.py) or run
one more trigger — production streams don't need either.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    StructField,
    StructType,
)

TAG_VERSION, TAG_PROBE = 0, 1
_STATE_SCHEMA = StructType([StructField("pkl", BinaryType(), True)])


def unify_streams(
    versions: DataFrame,
    probes: DataFrame,
    key: str,
    version_time: str,
    probe_time: str,
    value_cols: list[str],
    probe_cols: list[str],
) -> DataFrame:
    """Tag and union the two sides into one keyed event stream (the same
    union trick as the batch 'union' strategy, streamed)."""
    v = versions.select(
        F.col(key).alias("_k"),
        F.col(version_time).alias("_t"),
        F.lit(TAG_VERSION).alias("_tag"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_time).alias("_t"),
        F.lit(TAG_PROBE).alias("_tag"),
        *[F.lit(None).cast(versions.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in probe_cols],
    )
    return v.unionByName(p)


def stateful_asof(
    unified: DataFrame,
    value_cols: list[str],
    probe_cols: list[str],
    output_schema: StructType,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Stream-stream as-of join over a unified (tagged) keyed stream.

    NOTE: state here is pickled Python per key (applyInPandasWithState).
    For an all-JVM-state alternative with a bounded lookback horizon, see
    ``streaming/asof_stream.py`` (chained interval join + arg-max agg); the
    ``transformWithState`` port below (JVM typed state, unbounded horizon)
    stays gated on google.protobuf being available in the environment.

    ``output_schema`` must be: _k, then probe_cols, then value_cols.
    """
    import pandas as pd

    src = unified.withWatermark("_t", watermark_delay)

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            versions, pending = pickle.loads(state.get[0])
        else:
            versions, pending = [], []

        for pdf in pdfs:
            is_v = pdf["_tag"] == TAG_VERSION
            vpart, ppart = pdf[is_v], pdf[~is_v]
            versions.extend(
                zip(vpart["_t"], zip(*(vpart[c] for c in value_cols)))
                if len(vpart)
                else []
            )
            pending.extend(
                zip(ppart["_t"], zip(*(ppart[c] for c in probe_cols)))
                if len(ppart)
                else []
            )

        # Watermark guarantee is STRICT: no more data with event time < wm
        # can arrive, but a version at exactly wm still can. Emit only probes
        # strictly before wm so a same-instant version can't be missed
        # (inclusive-<= contract).
        wm_ms = state.getCurrentWatermarkMs()
        versions.sort(key=lambda v: v[0])
        ready, still_pending = [], []
        for t, pcols in pending:
            if t.value // 1_000_000 < wm_ms:
                ready.append((t, pcols))
            else:
                still_pending.append((t, pcols))

        out_rows = []
        for t, pcols in ready:
            best = None
            for vt, vvals in versions:  # versions sorted asc; keep last <= t
                if vt <= t:
                    best = vvals
                else:
                    break
            vals = best if best is not None else (None,) * len(value_cols)
            out_rows.append((key[0], *pcols, *vals))

        # Prune state: every future probe has event time >= wm, so only the
        # single latest version strictly before wm (plus everything at/after
        # wm) can ever be an answer. Without this the per-key version list —
        # re-pickled every batch — grows forever.
        if wm_ms > 0:
            cutoff = None
            for idx, (vt, _) in enumerate(versions):
                if vt.value // 1_000_000 < wm_ms:
                    cutoff = idx
                else:
                    break
            if cutoff is not None and cutoff > 0:
                versions = versions[cutoff:]

        state.update((pickle.dumps((versions, still_pending)),))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in output_schema.fields])

    return src.groupBy("_k").applyInPandasWithState(
        process,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState variant (Spark 4 typed state, JVM state store) -------


def _ns(t) -> int:
    """Epoch nanoseconds for a pandas Timestamp / datetime."""
    import pandas as pd

    return pd.Timestamp(t).value


def _build_processor_class():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class AsofProcessor(StatefulProcessor):
        """As-of join over typed ListState (versions + parked probes).

        vs applyInPandasWithState: state lives in Spark's state store as
        typed rows (RocksDB-compatible, incremental checkpoints) instead of
        one pickled Python blob re-serialized wholesale every batch, and
        event-time TIMERS flush parked probes when the watermark passes them
        even if the key receives no further input — the pandas-state variant
        only re-evaluates a key when new data arrives for it.
        """

        def __init__(self, version_schema, probe_schema, value_cols, probe_cols, out_cols):
            self._vs, self._ps = version_schema, probe_schema
            self._value_cols, self._probe_cols = value_cols, probe_cols
            self._out_cols = out_cols

        def init(self, handle) -> None:
            self._handle = handle
            self._versions = handle.getListState("versions", self._vs)
            self._pending = handle.getListState("pending", self._ps)

        def _read(self, state) -> list[tuple]:
            return [tuple(r) for r in state.get()] if state.exists() else []

        def _emit(self, key, wm_ms, new_versions=(), new_probes=()) -> list[tuple]:
            versions = self._read(self._versions) + list(new_versions)
            pending = self._read(self._pending) + list(new_probes)
            versions.sort(key=lambda v: _ns(v[0]))
            # Watermark guarantee is STRICT (see stateful_asof): emit only
            # probes strictly before wm so a same-instant version can't be
            # missed (inclusive-<= contract).
            ready = [p for p in pending if _ns(p[0]) // 1_000_000 < wm_ms]
            still = [p for p in pending if _ns(p[0]) // 1_000_000 >= wm_ms]
            out = []
            for p in ready:
                best = None
                for v in versions:  # sorted asc; keep last <= t
                    if _ns(v[0]) <= _ns(p[0]):
                        best = tuple(v[1:])
                    else:
                        break
                vals = best if best is not None else (None,) * len(self._value_cols)
                out.append((key[0], *p[1:], *vals))
            # Prune: only the latest version strictly before wm (plus
            # everything at/after wm) can ever answer a future probe.
            if wm_ms > 0:
                cutoff = None
                for idx, v in enumerate(versions):
                    if _ns(v[0]) // 1_000_000 < wm_ms:
                        cutoff = idx
                    else:
                        break
                if cutoff is not None and cutoff > 0:
                    versions = versions[cutoff:]
            self._versions.clear()
            if versions:
                self._versions.put(versions)
            self._pending.clear()
            if still:
                self._pending.put(still)
                # flush as soon as the watermark passes the earliest parked
                # probe — fires even with no further input for this key
                self._handle.registerTimer(min(_ns(p[0]) for p in still) // 1_000_000 + 1)
            return out

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            newv, newp = [], []
            for pdf in rows:
                vpart = pdf[pdf["_tag"] == TAG_VERSION]
                ppart = pdf[pdf["_tag"] == TAG_PROBE]
                newv.extend(
                    tuple(r) for r in vpart[["_t", *self._value_cols]].itertuples(index=False)
                )
                newp.extend(
                    tuple(r) for r in ppart[["_t", *self._probe_cols]].itertuples(index=False)
                )
            out = self._emit(key, timerValues.getCurrentWatermarkInMs(), newv, newp)
            if out:
                yield pd.DataFrame(out, columns=self._out_cols)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            out = self._emit(key, timerValues.getCurrentWatermarkInMs())
            if out:
                yield pd.DataFrame(out, columns=self._out_cols)

        def close(self) -> None:
            pass

    return AsofProcessor


def stateful_asof_tws(
    unified: DataFrame,
    value_cols: list[str],
    probe_cols: list[str],
    output_schema: StructType,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """``stateful_asof`` on Spark 4's ``transformWithStateInPandas``: same
    contract and output, but per-key state is TYPED ListState in the JVM
    state store (not a pickled blob), and parked probes flush via event-time
    timers when the watermark passes them.

    Runtime requirement: PySpark's transformWithState Python client speaks
    protobuf to the JVM state server — ``google.protobuf`` must be
    importable (it is not shipped in this container, so the parity test
    skips; the pandas-state variant above is the tested fallback).
    """
    src = unified.withWatermark("_t", watermark_delay)
    t_field = StructField("_t", unified.schema["_t"].dataType)
    version_schema = StructType([t_field] + [unified.schema[c] for c in value_cols])
    probe_schema = StructType([t_field] + [unified.schema[c] for c in probe_cols])
    proc = _build_processor_class()(
        version_schema,
        probe_schema,
        value_cols,
        probe_cols,
        [f.name for f in output_schema.fields],
    )
    return src.groupBy("_k").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=output_schema,
        outputMode="append",
        timeMode="eventTime",
    )
