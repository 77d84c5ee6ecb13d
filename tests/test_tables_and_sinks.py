"""EventTable data-model and sink coverage (S3-S5, §1.4)."""

from __future__ import annotations

import os
import tempfile

from flink_example_spark.sinks import serialize_row, to_console, write_text
from flink_example_spark.sources.fixtures import game_play
from flink_example_spark.tables import EventTable


def test_event_table_register_and_retime(spark):
    et = EventTable(df=game_play(spark), time_col="ts", key_col="user").register("gp_view")
    assert spark.sql("SELECT count(*) AS n FROM gp_view").collect()[0]["n"] == 10
    # event-time reassignment replaces the reference's bridge dance (T2)
    et2 = et.with_time("other_ts")
    assert et2.time_col == "other_ts" and et.time_col == "ts"


def test_watermark_declaration(spark):
    # On batch frames withWatermark is a no-op hint (the analyzed plan drops
    # it); the streaming-plan assertion lives in test_streaming.py. Here:
    # the call must succeed and preserve the relation.
    et = EventTable(df=game_play(spark), time_col="ts", watermark_delay="10 seconds")
    assert et.with_watermark().count() == 10


def test_text_sink_roundtrip(spark, capsys):
    df = game_play(spark).limit(2)
    to_console(df)  # S4: must not raise, prints a table
    assert "ts" in capsys.readouterr().out
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out")
        write_text(df, path, overwrite=True)
        lines = [r["value"] for r in spark.read.text(path).collect()]
        assert len(lines) == 2
        assert all("," in line for line in lines)
    # serialized row keeps column order
    first = serialize_row(df).collect()[0]["value"]
    assert first.startswith("2021-08-21")
