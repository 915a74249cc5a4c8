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
