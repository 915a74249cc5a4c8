"""Ordered-funnel conversion (operators/funnel.py)."""

from __future__ import annotations

from datetime import datetime

from hg_data_pipelines_spark.operators.funnel import funnel_counts

STAGES = ["signup", "view", "purchase"]


def _counts(spark, rows):
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = funnel_counts(df, STAGES)
    return {r["stage"]: r["n_users"] for r in out.collect()}


def _t(minute):
    return datetime(2024, 1, 1, 0, minute)


class TestFunnelCounts:
    def test_ordered_conversion_only(self, spark):
        rows = [
            # user 1 converts fully in order
            (1, _t(0), "signup"),
            (1, _t(1), "view"),
            (1, _t(2), "purchase"),
            # user 2 viewed BEFORE signing up -> stops at signup
            (2, _t(1), "view"),
            (2, _t(5), "signup"),
            # user 3 never signed up -> not in funnel at all
            (3, _t(0), "view"),
            (3, _t(1), "purchase"),
        ]
        got = _counts(spark, rows)
        assert got == {"signup": 2, "view": 1, "purchase": 1}

    def test_same_timestamp_counts(self, spark):
        # at-or-after: a view at the exact signup micro counts
        rows = [(1, _t(0), "signup"), (1, _t(0), "view")]
        got = _counts(spark, rows)
        assert got == {"signup": 1, "view": 1, "purchase": 0}

    def test_earliest_qualifying_time_chains(self, spark):
        # user views at t1 and t3, purchases at t2: purchase qualifies
        # because the EARLIEST post-signup view (t1) precedes it
        rows = [
            (1, _t(0), "signup"),
            (1, _t(1), "view"),
            (1, _t(2), "purchase"),
            (1, _t(3), "view"),
        ]
        got = _counts(spark, rows)
        assert got["purchase"] == 1

    def test_repeated_stage_type_rejected(self, spark):
        # the single-shuffle fold maps each event TYPE to one slot, so a
        # repeated stage could never fill its later slot — it must raise,
        # not silently stall (advisor finding, round 10)
        import pytest

        df = spark.createDataFrame(
            [(1, _t(0), "view")], ["user_id", "ts", "event_type"]
        )
        with pytest.raises(ValueError, match="distinct"):
            funnel_counts(df, ["view", "click", "view"])
