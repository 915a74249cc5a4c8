"""End-to-end LLM corpus-curation pipeline (jobs.llm_corpus_curation):
quality gate → exact dedup → near-dup cluster removal → deterministic
split → chunking, each stage landed in the warehouse."""

from __future__ import annotations

import duckdb

from hg_data_pipelines_spark.jobs import run_pipeline

SF = "/root/testdata/sf0.001"


class TestCorpusCurationPipeline:
    def test_full_chain(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        ctx = run_pipeline(
            spark,
            "llm_corpus_curation",
            wh,
            {"sf_dir": SF, "jaccard_threshold": 0.3},
        )

        r = ctx.reports
        # monotone filtering through the gate and dedup stages
        assert r["corpus_quality"]["rows"] >= r["corpus_repetition"]["rows"]
        assert r["corpus_repetition"]["rows"] >= r["corpus_exact_dedup"]["rows"]
        assert r["corpus_repetition"]["rows"] > 0
        assert r["corpus_exact_dedup"]["rows"] >= r["corpus_neardup"]["rows"]
        assert r["corpus_neardup"]["rows"] > 0
        assert r["corpus_neardup"]["rows"] >= r["corpus_semantic_dedup"]["rows"]
        assert r["corpus_semantic_dedup"]["rows"] > 0
        # span dedup may drop docs whose every chunk repeats elsewhere,
        # never add any
        assert r["corpus_semantic_dedup"]["rows"] >= r["corpus_span_dedup"]["rows"]
        assert r["corpus_span_dedup"]["rows"] > 0

        # split covers all rows and is train-heavy
        split_counts = {
            row["split"]: row["cnt"]
            for row in ctx.tables["corpus_split"]
            .groupBy("split")
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        }
        assert sum(split_counts.values()) == r["corpus_span_dedup"]["rows"]
        assert split_counts.get("train", 0) > split_counts.get("test", 0)

        # chunks: every doc produced at least one, chunk sizes bounded
        chunks = ctx.tables["corpus_chunks"]
        assert chunks.count() >= r["corpus_span_dedup"]["rows"]
        assert chunks.filter("n_tokens < 1 OR n_tokens > 64").count() == 0

        # the chunk table landed split-partitioned and DuckDB can read it
        import os

        chunk_dir = r["corpus_chunks"]["path"]
        parts = {d for d in os.listdir(chunk_dir) if d.startswith("split=")}
        assert "split=train" in parts
        n = duckdb.connect().execute(
            f"SELECT count(*) FROM read_parquet('{chunk_dir}/*/*.parquet')"
        ).fetchone()[0]
        assert n == chunks.count()

    def test_rerun_is_deterministic(self, spark, tmp_path):
        cfg = {"sf_dir": SF, "jaccard_threshold": 0.3}
        a = run_pipeline(spark, "llm_corpus_curation", str(tmp_path / "a"), cfg)
        b = run_pipeline(spark, "llm_corpus_curation", str(tmp_path / "b"), cfg)
        assert {s: r["rows"] for s, r in a.reports.items()} == {
            s: r["rows"] for s, r in b.reports.items()
        }

    def test_prefix_method_keeps_identical_docs(self, spark, tmp_path):
        # the prefix-filtered pair generator is EXACT, so the kept-doc set
        # must equal the inverted-index method's at the same threshold
        base = {"sf_dir": SF, "jaccard_threshold": 0.5}
        a = run_pipeline(
            spark, "llm_corpus_curation", str(tmp_path / "a"), base
        )
        b = run_pipeline(
            spark,
            "llm_corpus_curation",
            str(tmp_path / "b"),
            {**base, "neardup_method": "prefix"},
        )
        kept_a = {r["doc_id"] for r in a.tables["corpus_neardup"].select("doc_id").collect()}
        kept_b = {r["doc_id"] for r in b.tables["corpus_neardup"].select("doc_id").collect()}
        assert kept_a == kept_b
