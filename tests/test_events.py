"""Session gap boundary semantics, pinned empirically: Spark's
F.session_window MERGES touching windows — an event at exactly
last_ts + gap joins the previous session, matching the lag-based strict-'>'
sessionization. Both X8 declared queries therefore share the same '>'
oracle. If a Spark upgrade ever makes the session end exclusive, this test
fails and the X8_session_window_agg oracle must switch to '>='."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),          # exactly the gap
        (1, t0 + dt.timedelta(minutes=60, seconds=1)),  # 30:01 after prev
        (2, t0),
        (2, t0 + dt.timedelta(minutes=29, seconds=59)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


class TestSessionGapBoundary:
    def test_session_window_exact_gap_merges(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ev = _events(spark)
        got = (
            ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .count()
            .groupBy("user_id")
            .count()
            .collect()
        )
        sessions = {r["user_id"]: r["count"] for r in got}
        # user 1: the event at exactly +30min lands on the previous
        # window's end boundary and MERGES (inclusive semantics); the
        # +60:01 event is past the extended gap → second session
        assert sessions[1] == 2
        # user 2: +29:59 is strictly inside → one session
        assert sessions[2] == 1

    def test_lag_based_matches_session_window_at_exact_gap(self, spark):
        from pyspark.sql import Window

        ev = _events(spark)
        w = Window.partitionBy("user_id").orderBy("ts")
        gap_us = 30 * 60 * 1_000_000
        flagged = ev.select(
            "user_id",
            F.when(F.lag("ts").over(w).isNull(), 1)
            .when(
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us, 1
            )
            .otherwise(0)
            .alias("new_session"),
        )
        counts = {
            r["user_id"]: r["s"]
            for r in flagged.groupBy("user_id")
            .agg(F.sum("new_session").alias("s"))
            .collect()
        }
        # strict > agrees with session_window: exact-gap stays, 30:01 splits
        assert counts[1] == 2
        assert counts[2] == 1


def test_events_ts_unique(spark):
    """Pins the fixture contract X6_ohlc_downsample's min_by/arg_min order
    key relies on: event timestamps are globally unique, so (ts) is a
    total order and open/close picks are deterministic on both engines."""
    from hg_data_pipelines_spark.io import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load_table(spark, sf, "events")
        assert ev.count() == ev.select("ts").distinct().count()
