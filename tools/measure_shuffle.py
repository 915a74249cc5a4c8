"""Measure per-exchange shuffle volume for declared queries.

Executes each named query (noop-equivalent: the executed plan tree is run
directly so ITS SQLMetrics populate) and reports, per query, every
shuffle Exchange's records/bytes written plus broadcast exchange data
sizes. This is the ground truth for "did that rewrite actually cut
shuffle bytes" questions that .explain() cannot answer.

Usage: python tools/measure_shuffle.py [sf_dir] query [query ...]
Prints one JSON line per query:
  {"query": name, "shuffle_bytes": N, "shuffle_records": N,
   "broadcast_bytes": N, "exchanges": [{...} per exchange]}
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def exchange_metrics(df) -> list[dict]:
    """Run df's executed plan and collect metrics from every exchange."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()  # populates this tree's SQLMetrics

    out: list[dict] = []
    seen: set[int] = set()

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if cls == "ReusedExchangeExec":
            # metrics live on the original exchange; don't double count
            walk(node.child())
            return
        if "Exchange" in node.nodeName() and node.id() not in seen:
            seen.add(node.id())
            vals = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(
                {
                    "node": node.nodeName(),
                    "records": vals.get(
                        "shuffleRecordsWritten", vals.get("numOutputRows", 0)
                    ),
                    "bytes": vals.get(
                        "shuffleBytesWritten", vals.get("dataSize", 0)
                    ),
                    "broadcast": "Broadcast" in node.nodeName(),
                }
            )
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    return out


def main() -> None:
    from hg_data_pipelines_spark.queries import QUERIES
    from hg_data_pipelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    spark = get_spark("measure-shuffle", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        ex = exchange_metrics(QUERIES[name](spark, sf_dir))
        print(
            json.dumps(
                {
                    "query": name,
                    "shuffle_bytes": sum(
                        e["bytes"] for e in ex if not e["broadcast"]
                    ),
                    "shuffle_records": sum(
                        e["records"] for e in ex if not e["broadcast"]
                    ),
                    "broadcast_bytes": sum(
                        e["bytes"] for e in ex if e["broadcast"]
                    ),
                    "exchanges": ex,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
