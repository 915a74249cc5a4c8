"""Per-query shuffle-count regression fence.

tests/plan_budgets.json records, for every auditable batch query, how
many SHUFFLE exchanges (hash/range/single-partition; broadcasts and
ReusedExchange excluded) its physical plan carried when the plan was
last intentionally changed. A query exceeding its budget means a plan
regression — a lost broadcast, a dropped partial aggregation, a broken
co-location — and fails here instead of surfacing as bench drift.

Queries added since the budgets file was generated are skipped (their
budget is recorded at the next `python tools/gen_plan_budgets.py` run —
rerun it only for INTENTIONAL plan changes, and let the json diff
document the change).
"""

from __future__ import annotations

import json
import os

import pytest

from hg_data_pipelines_spark.queries.common import QUERIES
from tools.gen_plan_budgets import SF, count_shuffles

_BUDGETS = json.load(
    open(os.path.join(os.path.dirname(__file__), "plan_budgets.json"))
)
_CHECKED = sorted(n for n in QUERIES if n in _BUDGETS)


@pytest.mark.parametrize("name", _CHECKED)
def test_query_stays_within_shuffle_budget(spark, name):
    plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    got = count_shuffles(plan)
    budget = _BUDGETS[name]["shuffles"]
    assert got <= budget, (
        f"{name}: {got} shuffle exchanges, budget {budget} — plan regressed? "
        "If intentional, rerun tools/gen_plan_budgets.py and commit the diff."
    )
