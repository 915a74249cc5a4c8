"""Incremental SCD2 maintenance (operators/scd.py)."""

from __future__ import annotations

from hg_data_pipelines_spark.operators.scd import scd2_apply, scd2_init


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestScd2Apply:
    def test_fold_equals_rebuild(self, spark):
        all_rows = [
            (1, 10, 1.0), (1, 20, 2.0), (1, 30, 3.0),
            (2, 15, 9.0),
            (3, 25, 7.0), (3, 35, 8.0),
        ]
        df = spark.createDataFrame(all_rows, "k long, ts long, v double")
        rebuild = scd2_init(df, ["k"], "ts")

        b1 = df.filter("ts < 20")
        b2 = df.filter("ts >= 20 AND ts < 30")
        b3 = df.filter("ts >= 30")
        dim = scd2_init(b1, ["k"], "ts")
        for b in (b2, b3):
            dim = scd2_apply(dim, b, ["k"], "ts")
        assert _rows(dim) == _rows(rebuild)

    def test_untouched_keys_and_history_pass_through(self, spark):
        b1 = spark.createDataFrame(
            [(1, 10, 1.0), (2, 10, 5.0)], "k long, ts long, v double"
        )
        b2 = spark.createDataFrame([(1, 20, 2.0)], "k long, ts long, v double")
        dim = scd2_apply(scd2_init(b1, ["k"], "ts"), b2, ["k"], "ts")
        got = {(r["k"], r["ts"], r["valid_to"], r["is_current"]) for r in dim.collect()}
        assert (2, 10, None, True) in got        # untouched key stays current
        assert (1, 10, 20, False) in got         # old version closed at new ts
        assert (1, 20, None, True) in got        # new version current

    def test_multi_version_batch_chains_internally(self, spark):
        b1 = spark.createDataFrame([(1, 10, 1.0)], "k long, ts long, v double")
        b2 = spark.createDataFrame(
            [(1, 20, 2.0), (1, 30, 3.0)], "k long, ts long, v double"
        )
        dim = scd2_apply(scd2_init(b1, ["k"], "ts"), b2, ["k"], "ts")
        intervals = {
            (r["ts"], r["valid_to"], r["is_current"]) for r in dim.collect()
        }
        assert intervals == {(10, 20, False), (20, 30, False), (30, None, True)}
