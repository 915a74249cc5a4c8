"""Stream-stream LEFT OUTER join (streaming/jobs.py stream_stream_join
how="left_outer"): watermark-proven null emission.

The declared X10_streaming_left_outer_join invariant asserts the full
contract (matched ≡ batch inner join; required nulls ≡ batch anti-join
under the last-data-batch watermark). This test pins NON-VACUITY: the
sf0.001 replay has ~208 unmatched clicks, so the null path must actually
emit — an outer join that silently behaved as inner would pass a naive
"no violations" check only if the violation query were broken too.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestStreamOuterJoin:
    def test_null_side_actually_emits(self, spark):
        from hg_data_pipelines_spark.queries.streaming_q import (
            _run_available_now,
            _stage_event_batches,
        )
        from hg_data_pipelines_spark.streaming import stream_stream_join

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stage = _stage_event_batches(spark, "/root/testdata/sf0.001")
        schema = (
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double, props string"
        )

        def _side(event_type):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage + "/batch_*")
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .filter(F.col("event_type") == event_type)
            )

        out = _run_available_now(
            spark,
            stream_stream_join(
                _side("click"), _side("purchase"),
                watermark="10 minutes", within="30 minutes",
                how="left_outer",
            ),
            "append",
        )
        nulls = out.filter(F.col("r_event_id").isNull()).count()
        matched = out.filter(F.col("r_event_id").isNotNull()).count()
        # 210 clicks, 2 with a purchase inside the window; the nulls for
        # horizons closed under the last data batch's watermark must have
        # emitted (the exact required set is the declared invariant's job)
        assert matched == 2
        assert nulls >= 100
        # every null row is a click the batch join cannot match
        assert nulls + matched <= 210


class TestStreamRightOuterJoin:
    def test_null_side_actually_emits(self, spark):
        """right_outer passthrough (streaming/jobs.py passes `how`
        straight to the join): unmatched PURCHASES must emit with a null
        left side, and the left-null direction must stay closed — the
        mirror of the left-outer pin, so the one untested `how` value
        carries the same non-vacuity evidence as the other three."""
        from hg_data_pipelines_spark.queries.streaming_q import (
            _run_available_now,
            _stage_event_batches,
        )
        from hg_data_pipelines_spark.streaming import stream_stream_join

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stage = _stage_event_batches(spark, "/root/testdata/sf0.001")
        schema = (
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double, props string"
        )

        def _side(event_type):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage + "/batch_*")
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .filter(F.col("event_type") == event_type)
            )

        out = _run_available_now(
            spark,
            stream_stream_join(
                _side("click"), _side("purchase"),
                watermark="10 minutes", within="30 minutes",
                how="right_outer",
            ),
            "append",
        )
        nulls = out.filter(F.col("l_event_id").isNull()).count()
        matched = out.filter(F.col("l_event_id").isNotNull()).count()
        # same 2 matched pairs as the other direction; unmatched
        # purchases with closed horizons must actually emit
        assert matched == 2
        assert nulls >= 100
        # a right-outer must never emit unmatched LEFT rows
        assert out.filter(F.col("r_event_id").isNull()).count() == 0


class TestStreamFullOuterJoin:
    def test_both_null_directions_actually_emit(self, spark):
        """Non-vacuity for X10_streaming_full_outer_join: a full-outer
        join that silently behaved as left-outer (or inner) would pass
        the empty-violation check only if the violation query were
        broken too — so BOTH null directions must demonstrably fire."""
        from hg_data_pipelines_spark.queries.streaming_q import (
            _run_available_now,
            _stage_event_batches,
        )
        from hg_data_pipelines_spark.streaming import stream_stream_join

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stage = _stage_event_batches(spark, "/root/testdata/sf0.001")
        schema = (
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double, props string"
        )

        def _side(event_type):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage + "/batch_*")
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .filter(F.col("event_type") == event_type)
            )

        out = _run_available_now(
            spark,
            stream_stream_join(
                _side("click"), _side("purchase"),
                watermark="10 minutes", within="30 minutes",
                how="full_outer",
            ),
            "append",
        )
        left_nulls = out.filter(F.col("r_event_id").isNull()).count()
        right_nulls = out.filter(F.col("l_event_id").isNull()).count()
        matched = out.filter(
            F.col("l_event_id").isNotNull() & F.col("r_event_id").isNotNull()
        ).count()
        assert matched == 2
        assert left_nulls >= 100   # unmatched clicks
        assert right_nulls >= 100  # unmatched purchases
