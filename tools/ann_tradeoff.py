"""Measure the ANN recall/cost frontier against the exact top-k.

For each RHP-LSH (n_planes × n_tables) and IVF (n_lists, n_probe)
setting, report recall@k vs the brute-force ground truth and the mean
candidate count per query (the quantity that actually scales — at 100 TB
candidates ARE the cost; wall-clock at fixture scale is all overhead).
Results land in PERFORMANCE.md as the tuning evidence for the declared
defaults.

Usage: python tools/ann_tradeoff.py [sf_dir]  (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5
N_QUERIES = 200


def main() -> None:
    from pyspark.sql import functions as F

    from hg_data_pipelines_spark.io import load_table
    from hg_data_pipelines_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_topk,
    )
    from hg_data_pipelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_tradeoff")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings", scan_parallel=True)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(queries, emb, k=K).collect()
    }
    n_truth = len(truth)

    def recall(df) -> float:
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return round(len(got & truth) / n_truth, 3)

    out = []
    for planes, tables in [(4, 8), (4, 16), (4, 32), (6, 16), (8, 16)]:
        df = lsh_topk(queries, emb, k=K, n_planes=planes, n_tables=tables)
        out.append(
            {"method": "lsh", "planes": planes, "tables": tables,
             "recall": recall(df)}
        )
        print(out[-1], flush=True)
    for lists, probe in [(16, 2), (16, 4), (16, 8), (32, 4), (32, 8)]:
        df = ivf_topk(queries, emb, k=K, n_lists=lists, n_probe=probe)
        out.append(
            {"method": "ivf", "lists": lists, "probe": probe,
             "recall": recall(df)}
        )
        print(out[-1], flush=True)
    print(json.dumps({"k": K, "n_queries": N_QUERIES, "grid": out}))
    spark.stop()


if __name__ == "__main__":
    main()
