"""asof_join semantics (EXT-J6): inclusive <=, per-key carry, and DuckDB
ASOF JOIN null behavior — the matched right ROW's nulls are returned as-is,
never backfilled from an older right row."""

from __future__ import annotations

from hg_data_pipelines_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, lt long, lval string")
    right = spark.createDataFrame(right_rows, "k long, rt long, a string, b long")
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_time="lt",
        right_time="rt",
        value_cols=["a", "b"],
    )
    return {(r["k"], r["lt"]): (r["asof_a"], r["asof_b"]) for r in out.collect()}


class TestAsofJoin:
    def test_basic_carry_and_inclusive_match(self, spark):
        got = _run(
            spark,
            [(1, 5, "x"), (1, 10, "y"), (1, 20, "z")],
            [(1, 5, "r5", 50), (1, 15, "r15", 150)],
        )
        assert got[(1, 5)] == ("r5", 50)    # equal timestamps match (<=)
        assert got[(1, 10)] == ("r5", 50)
        assert got[(1, 20)] == ("r15", 150)

    def test_no_preceding_right_row_is_null(self, spark):
        got = _run(spark, [(1, 1, "x")], [(1, 5, "r5", 50)])
        assert got[(1, 1)] == (None, None)

    def test_null_value_columns_not_backfilled(self, spark):
        # the most recent right row at t=10 has a NULL in column a; DuckDB
        # ASOF JOIN returns that row's NULL — never the older t=1 value
        got = _run(
            spark,
            [(1, 12, "x")],
            [(1, 1, "old", 11), (1, 10, None, 22)],
        )
        assert got[(1, 12)] == (None, 22)

    def test_mixed_nulls_come_from_the_same_row(self, spark):
        got = _run(
            spark,
            [(2, 100, "x"), (2, 250, "y")],
            [(2, 50, "p", None), (2, 200, None, 7)],
        )
        assert got[(2, 100)] == ("p", None)
        assert got[(2, 250)] == (None, 7)

    def test_keys_do_not_cross(self, spark):
        got = _run(
            spark,
            [(1, 10, "x"), (2, 10, "y")],
            [(1, 5, "k1", 1)],
        )
        assert got[(1, 10)] == ("k1", 1)
        assert got[(2, 10)] == (None, None)


class TestAsofTolerance:
    def test_stale_match_nulled_fresh_kept(self, spark):
        import datetime as dt

        from hg_data_pipelines_spark.operators.asof import asof_join

        T = dt.datetime
        left = spark.createDataFrame(
            [(1, 100, T(2024, 1, 10)), (2, 100, T(2024, 3, 1))],
            "id long, k long, t timestamp",
        )
        right = spark.createDataFrame(
            [(100, T(2024, 1, 1), 7.0)], "k long, rt timestamp, v double"
        )
        out = {
            r["id"]: r["asof_v"]
            for r in asof_join(
                left, right, "k", "k", "t", "rt", ["v"],
                left_cols=["id"], tolerance="30 DAY",
            ).collect()
        }
        assert out[1] == 7.0   # 9 days stale: inside the band
        assert out[2] is None  # 60 days stale: nulled

    def test_forward_direction_band(self, spark):
        import datetime as dt

        from hg_data_pipelines_spark.operators.asof import asof_join

        T = dt.datetime
        left = spark.createDataFrame(
            [(1, 100, T(2024, 1, 1)), (2, 100, T(2023, 10, 1))],
            "id long, k long, t timestamp",
        )
        right = spark.createDataFrame(
            [(100, T(2024, 1, 5), 9.0)], "k long, rt timestamp, v double"
        )
        out = {
            r["id"]: r["asof_v"]
            for r in asof_join(
                left, right, "k", "k", "t", "rt", ["v"],
                left_cols=["id"], direction="forward", tolerance="30 DAY",
            ).collect()
        }
        assert out[1] == 9.0   # 4 days ahead: inside
        assert out[2] is None  # 96 days ahead: nulled


class TestAsofNearestTieDeterminism:
    def test_duplicate_key_time_right_rows_pick_deterministically(self, spark):
        # ADVICE r6: with duplicate (key, time) right rows, last(_vrow)
        # used to pick whichever duplicate the shuffle ordered last. The
        # xxhash64 tie-break makes the pick input-order-independent.
        from hg_data_pipelines_spark.operators.asof import asof_join_nearest

        left = spark.createDataFrame([(1, 100)], "k long, lt long")
        dup_rows = [(1, 100, "a"), (1, 100, "b"), (1, 100, "c")]

        def run(rows):
            right = spark.createDataFrame(rows, "k long, rt long, v string")
            out = asof_join_nearest(
                left,
                right,
                left_on="k",
                right_on="k",
                left_time="lt",
                right_time="rt",
                value_cols=["v"],
            )
            return [(r["k"], r["lt"], r["nearest_v"]) for r in out.collect()]

        base = run(dup_rows)
        assert len(base) == 1 and base[0][2] in {"a", "b", "c"}
        for perm in (dup_rows[::-1], [dup_rows[1], dup_rows[2], dup_rows[0]]):
            assert run(perm) == base
