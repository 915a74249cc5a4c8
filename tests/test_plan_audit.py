"""Engine-wide plan audit: every declared query's physical plan is free of
scale anti-patterns.

- ``CartesianProduct``: a non-broadcast cross join materializes |L|×|R|
  rows through a shuffle — never acceptable, even in fenced fixture
  twins (those use broadcast nested-loop or kernel shapes instead).
- ``BatchEvalPython`` / ``BatchEvalPythonUDTF``: row-pickled Python
  execution; every Python boundary must be Arrow-batched
  (ArrowEvalPython / ArrowEvalPythonUDTF / mapInPandas / applyInPandas).

Streaming queries are skipped: calling them executes a stream and their
final DataFrame is a memory-sink table scan, so there is no batch plan
to audit (their transformations are audited via the batch twins).
"""

from __future__ import annotations

import pytest

from hg_data_pipelines_spark.queries.common import QUERIES

SF = "/root/testdata/sf0.001"

_SKIP = tuple(n for n in QUERIES if "streaming" in n.lower())
_AUDITED = sorted(n for n in QUERIES if n not in _SKIP)

_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", _AUDITED)
def test_plan_has_no_scale_antipatterns(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [p for p in _FORBIDDEN if p in plan]
    assert not hits, f"{name}: forbidden plan nodes {hits}"


class TestPlanShapes:
    """Positive plan assertions: key queries carry the physical shape the
    scale design calls for, not just the absence of anti-patterns."""

    def _plan(self, spark, name):
        df = QUERIES[name](spark, SF)
        return df._jdf.queryExecution().executedPlan().toString()

    def test_project_filter_pushes_to_scan(self, spark):
        plan = self._plan(spark, "P1_P5_project_filter")
        assert "PushedFilters: [" in plan and "IsNotNull" in plan
        # column pruning: the scan reads only the 4 selected/filtered cols
        assert "l_comment" not in plan

    def test_dim_lookup_chain_broadcasts_both_dims(self, spark):
        plan = self._plan(spark, "P2_J2_dim_lookup_chain")
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan

    def test_q1_uses_partial_aggregation(self, spark):
        # map-side combine: a partial HashAggregate below the exchange
        plan = self._plan(spark, "A7_q1_pricing_summary")
        assert "partial_" in plan

    def test_skew_plain_twin_honors_merge_hint(self, spark):
        plan = self._plan(spark, "J9_skew90_join_plain")
        assert "SortMergeJoin" in plan

    def test_whole_stage_codegen_present_on_flagship(self, spark):
        # AQE rewrites to the codegen'd final plan only on execution of
        # THIS QueryExecution (a noop write spawns a fresh one) — collect
        # the 6-row result to finalize it
        df = QUERIES["A7_q1_pricing_summary"](spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # "*(n)" prefixes are the WholeStageCodegen span markers
        assert "*(" in plan


class TestObserveMetrics:
    def test_observe_collects_pipeline_telemetry(self, spark):
        """df.observe: named accumulator-style metrics ride the query —
        row counts and sums arrive with the action, no second scan. The
        cluster-friendly way to emit per-stage pipeline health metrics."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        from hg_data_pipelines_spark.queries.common import load

        obs = Observation("orders_metrics")
        orders = load(spark, SF, "orders").observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total"),
            F.max("o_orderdate").alias("max_date"),
        )
        n_out = orders.filter(F.col("o_totalprice") > 0).count()
        got = obs.get
        assert got["n_rows"] >= n_out > 0
        assert float(got["total"]) > 0
        assert got["max_date"] is not None

    def test_hinted_query_broadcasts_and_repartitions(self, spark):
        from hg_data_pipelines_spark.queries.common import QUERIES as Q

        df = Q["SQL_join_hints"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
