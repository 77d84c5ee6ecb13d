"""As-of join scale probe (VERDICT-r11 task 5): wall clock + peak
stage shuffle at 1x / 4x / 8x synthetic input growth for the engine's
one custom operator, plus a salted-vs-unsalted reading on a skewed-key
variant.

Shapes probed (events table at $SPARK_GRAFT_SF_DIR, default sf0.1 —
100k events / 1.5k users, so x8 = 800k versions + ~267k probes):

- ``union`` strategy (the default): probes and versions union into ONE
  relation, one shuffle on (key), per-key ordered window carries the
  last version forward. Claim: LINEAR — a single exchange whose bytes
  grow with the input, window state one row per key.
- ``rank`` strategy: range-join + per-probe winner rank. Claim: linear
  but with a heavier exchange (the join materializes candidate pairs
  before ranking).
- skew variant: all rows remapped onto 50 keys with ~60% of BOTH sides
  on one hot key; salted union (salt=8) splits the hot key's probes
  across 8 sub-partitions at the cost of 8x version replication.

Multiplication offsets user_id (key space grows, per-key history size
constant). Inputs are localCheckpoint-ed so synthesis is excluded from
timing; peak shuffle is read from the UI REST API (the probe session
enables the UI on a fixed port — the library session keeps it off).

Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/asof_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from flink_example_spark.operators.asof import asof_join  # noqa: E402
from flink_example_spark.session import RUNTIME_CONF  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402

UI_PORT = 4049


def _spark() -> SparkSession:
    b = (
        SparkSession.builder.appName("asof-probe")
        .master("local[32]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _stages() -> list[dict]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10)
    )


class ShuffleMeter:
    """Peak per-stage shuffle-write bytes among stages newer than the
    last mark (the exchange feeding the as-of window/join)."""

    def __init__(self) -> None:
        self.mark = -1

    def start(self) -> None:
        st = _stages()
        self.mark = max((s["stageId"] for s in st), default=-1)

    def peak_mb(self) -> float:
        st = [s for s in _stages() if s["stageId"] > self.mark]
        return max(
            (s.get("shuffleWriteBytes", 0) for s in st), default=0
        ) / 1e6


def _multiply(df, mult: int, stride: int = 10_000_000):
    out = df
    for i in range(1, mult):
        out = out.unionByName(
            df.withColumn("_entity", F.col("_entity") + F.lit(i * stride))
        )
    # the harness's single-file parquet scan arrives in 1-2 partitions
    # (DESIGN.md rule) — spread like cluster input before timing
    return out.repartition(32).localCheckpoint()


def _run(probes, versions, meter: ShuffleMeter, **kw) -> tuple[float, float, int]:
    meter.start()
    t0 = time.perf_counter()
    out = asof_join(
        probes,
        versions,
        on="_entity",
        probe_time="_probe_time",
        version_time="_version_time",
        **kw,
    )
    # checksum workload: materializes every matched value (a bare
    # count() lets column pruning skip most of the join's output)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("_entity", "_probe_time", "state"),
                F.lit(1_000_000_000),
            )
        ).alias("h"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    return wall, meter.peak_mb(), int(row["n"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    meter = ShuffleMeter()
    ev = load_table(spark, sf_dir, "events")

    versions = ev.select(
        F.col("user_id").alias("_entity"),
        F.col("ts").alias("_version_time"),
        F.col("event_type").alias("state"),
    ).localCheckpoint()
    probes = (
        ev.filter(F.col("event_id") % 3 == 0)
        .select(
            F.col("user_id").alias("_entity"),
            F.expr("ts + INTERVAL 30 MINUTES").alias("_probe_time"),
        )
        .localCheckpoint()
    )

    _run(probes, versions, meter, strategy="union")  # session warmup

    for mult in (1, 4, 8):
        p, v = _multiply(probes, mult), _multiply(versions, mult)
        for strat in ("union", "rank"):
            wall, peak, n = _run(p, v, meter, strategy=strat)
            print(
                f"mult={mult} strategy={strat} probes={p.count()} "
                f"versions={v.count()} rows={n} wall={wall:.2f}s "
                f"peak_shuffle={peak:.1f}MB",
                flush=True,
            )

    # Skew variants, 50-key space. The salt's documented regime is hot
    # PROBES over a history whose TOTAL size is small next to the hot
    # key's probe volume: the salted path replicates the WHOLE version
    # relation salt times (asof.py::_asof_union_salted explodes every
    # version row), so salt x |versions| must be cheaper than the
    # serialized hot-partition work it removes. Both the winning regime
    # (probes x64 with 90% on one key, history x1) and the anti-regime
    # (history itself hot and x8) are probed, so the trade is measured,
    # not asserted.
    hot_probe = (
        "CASE WHEN pmod(xxhash64(_entity), 10) < 9 THEN 0"
        " ELSE pmod(_entity, 50) END"
    )
    uniform = "pmod(_entity, 50)"
    for name, pmult, pexpr, vmult, vexpr in (
        ("hot-probes/small-history x64", 64, hot_probe, 1, uniform),
        ("hot-both x8", 8, hot_probe, 8, hot_probe),
    ):
        ps = (
            _multiply(probes, pmult)
            .withColumn("_entity", F.expr(pexpr))
            .localCheckpoint()
        )
        vs = (
            _multiply(versions, vmult)
            .withColumn("_entity", F.expr(vexpr))
            .localCheckpoint()
        )
        for label, kw in (
            ("unsalted", {"strategy": "union"}),
            ("salt=8", {"strategy": "union", "salt": 8}),
        ):
            wall, peak, n = _run(ps, vs, meter, **kw)
            print(
                f"skew {name} {label}: rows={n} wall={wall:.2f}s "
                f"peak_shuffle={peak:.1f}MB",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
