"""Benchmark harness: run the engine's headline queries at sf0.1.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with the `noop` sink (full plan runs, nothing is
materialized on the driver), so timings measure distributed compute, not
collect() serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one query per major operator family (scan-agg, multi-join,
# window, as-of join, dedup, MinHash LSH, ANN top-k, text stats,
# sessionization, streaming-shaped window agg).
HEADLINE = [
    "A7_q1_pricing_summary",
    "A7_q3_shipping_priority",
    "A7_q6_forecast_revenue",
    "A7_q18_large_orders",
    "J1_q5_local_supplier_revenue",
    "W1_best_order_per_customer",
    "J6_asof_latest_order",
    "X1_exact_dedup_by_content",
    "X2_minhash_lsh_pairs",
    "X3_cosine_topk_bruteforce",
    "X4_text_stats",
    "X8_session_window_agg",
    "X6_tumbling_window_agg",
    # round-2 additions (new keys — prior-round keys above stay stable)
    "J7_interval_join_followups",
    "X3_knn_graph",
    "X4_repetition_filter",
    "X2_component_representatives",
    # round-2 (cont.): iterative graph + product analytics
    "X11_pagerank_knn",
    "X12_cohort_retention",
    # round-3: measured 90%-skew join, plain (AQE) vs salted twin
    "J9_skew90_join_plain",
    "J9_skew90_join_salted",
    # round-4: distributed prefix-sum / ntile primitives (the rewritten
    # global-window queries — now range-partitioned, no single-task node)
    "X4_sequence_packing",
    "A20_equi_depth_histogram",
    # round-4 (cont.): sparse retrieval + sub-document dedup flagships
    "X3_bm25_topk",
    "X1_chunk_dedup_reassemble",
    # round-5: fixed-point semantic clustering (build time includes the
    # per-iteration centroid jobs — that IS the query's cost) + the
    # oracle-checkable portable-simhash near-dup pipeline
    "X3_kmeans_fixed_point",
    "X2_simhash_portable_pairs",
    # round-5 (cont.): ExactSubstr-style char-gram duplicate spans
    "X1_substring_dedup_spans",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from hg_data_pipelines_spark.queries import QUERIES
    from hg_data_pipelines_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup pass (untimed): JVM JIT + whole-stage-codegen compilation
    # dominate first-run latency by 5-10×; steady-state per-query time is
    # the meaningful number for a long-lived cluster.
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two timed passes, per-query min: the VM shows bursty host-level CPU
    # steal (one slow burst can inflate a single query 10×); min-of-2 is a
    # far better steady-state estimator than a single sample.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
