"""Generate tests/plan_budgets.json: per-declared-query shuffle budgets.

For every auditable batch query, record the number of SHUFFLE exchanges
(hash/range/single-partition — broadcasts excluded: they are the cheap
substitute the budget is meant to protect) in the physical plan at
sf0.001. tests/test_plan_budget.py then asserts each query stays AT OR
UNDER its recorded budget — a plan regression (a new shuffle from a lost
broadcast, a dropped partial aggregation, a co-location break) fails CI
instead of surfacing as unexplained bench drift.

Rerun this script ONLY when a query's plan change is intentional; the
diff of plan_budgets.json then documents the regression budget change.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
_SHUFFLE = re.compile(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)")


def count_shuffles(plan: str) -> int:
    # ReusedExchange lines reference, not execute, a shuffle — excluded
    return sum(
        1
        for line in plan.splitlines()
        if _SHUFFLE.search(line) and "ReusedExchange" not in line
    )


def main() -> None:
    from hg_data_pipelines_spark.queries.common import QUERIES
    from hg_data_pipelines_spark.session import get_spark

    spark = get_spark("plan_budgets", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    budgets = {}
    for name in sorted(QUERIES):
        if "streaming" in name.lower():
            continue
        plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        budgets[name] = {"shuffles": count_shuffles(plan)}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "plan_budgets.json",
    )
    with open(out, "w") as fh:
        json.dump(budgets, fh, indent=1, sort_keys=True)
    print(f"wrote {len(budgets)} budgets to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
