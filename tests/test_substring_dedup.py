"""ExactSubstr-style span detection/application — semantic pins.

The DuckDB oracle proves both engines agree; these constructed cases pin
WHAT they agree on: exact span bounds, island merging, and the cut.
"""

from __future__ import annotations

import hashlib


class TestSubstringSpans:
    def _spans(self, spark, tmp_path, texts):
        from hg_data_pipelines_spark.queries.dedup import (
            substring_dedup_spans,
        )

        rows = [(i, t, "x", "src0", len(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        sf = str(tmp_path / "sf")
        import os

        os.makedirs(sf, exist_ok=True)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf, "documents.parquet")
        )
        out = substring_dedup_spans(spark, sf)
        return {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
            for r in out.collect()
        }

    def test_shared_block_found_with_exact_bounds(self, spark, tmp_path):
        shared = "S" * 50  # 50 identical chars -> 11 overlapping 40-grams
        a = "a" * 10 + shared + "b" * 10
        b = "c" * 25 + shared + "d" * 5
        got = self._spans(spark, tmp_path, [a, b])
        # doc 0: span starts at 11 (1-based), covers the 50 shared chars
        assert (0, 11, 60, 50) in got
        assert (1, 26, 75, 50) in got

    def test_unique_docs_produce_no_spans(self, spark, tmp_path):
        import string

        a = string.ascii_letters + string.digits  # 62 unique chars
        b = a[::-1]
        assert self._spans(spark, tmp_path, [a, b]) == set()

    def test_disjoint_repeats_stay_separate_spans(self, spark, tmp_path):
        shared = "S" * 45
        # two occurrences 20 chars apart in doc 0: their hit intervals
        # [1,45] and [66,110] do not overlap -> two spans, not one
        # (the 11-overlapping-gram merge is covered by the first test)
        a = shared + "x" * 20 + shared
        b = shared
        got = self._spans(spark, tmp_path, [a, b])
        d0 = sorted(g for g in got if g[0] == 0)
        assert d0 == [(0, 1, 45, 45), (0, 66, 110, 45)]


class TestSubstringApply:
    def test_cut_matches_manual_redaction(self, spark, tmp_path):
        from hg_data_pipelines_spark.queries.dedup import (
            substring_dedup_apply,
        )

        shared = "S" * 50
        a = "a" * 10 + shared + "b" * 10
        b = "c" * 25 + shared + "d" * 5
        rows = [(0, a, "x", "src0", len(a)), (1, b, "x", "src0", len(b))]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        import os

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf, "documents.parquet")
        )
        out = {r["doc_id"]: r for r in substring_dedup_apply(spark, sf).collect()}
        want0 = "a" * 10 + "b" * 10
        want1 = "c" * 25 + "d" * 5
        assert out[0]["cleaned_len"] == len(want0)
        assert out[0]["cleaned_md5"] == hashlib.md5(want0.encode()).hexdigest()
        assert out[1]["cleaned_md5"] == hashlib.md5(want1.encode()).hexdigest()


class TestPortableMinhashRecall:
    def test_recall_floor_on_true_neardups(self, spark):
        """The portable 12-min/4-band family must surface the fixture's
        true near-dup pairs (exact Jaccard >= 0.5) with high recall —
        guards the hash constants against future edits that would quietly
        break candidate quality."""
        from hg_data_pipelines_spark.operators.dedup import ngram_jaccard_pairs
        from hg_data_pipelines_spark.io import load_table
        from hg_data_pipelines_spark.queries.dedup import (
            minhash_portable_pairs,
        )

        sf = "/root/testdata/sf0.01"
        docs = load_table(spark, sf, "documents")
        truth = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert truth  # fixture plants true near-dups
        got = {
            (r["id_a"], r["id_b"])
            for r in minhash_portable_pairs(spark, sf).collect()
        }
        assert len(got & truth) / len(truth) >= 0.8


class TestSubstringSpansJoinStrategy:
    def test_spans_identical_under_forced_sort_merge_join(self, spark):
        # The dup-gram join (queries/dedup.py _gram_hits) deliberately
        # does NOT force broadcast: at real scale the dup set outgrows
        # the threshold and AQE falls back to sort-merge. Force that
        # fallback here and prove the scale path is semantics-equal.
        from hg_data_pipelines_spark.queries.dedup import (
            substring_dedup_spans,
        )

        sf = "/root/testdata/sf0.001"

        def spans():
            return {
                (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
                for r in substring_dedup_spans(spark, sf).collect()
            }

        base = spans()
        assert base, "fixture must contain duplicate spans"

        keys = [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]
        prev = {c: spark.conf.get(c, None) for c in keys}
        for c in keys:
            spark.conf.set(c, "-1")
        try:
            plan = (
                substring_dedup_spans(spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "SortMergeJoin" in plan  # the forced strategy is real
            assert spans() == base
        finally:
            for c, v in prev.items():
                if v is None:
                    spark.conf.unset(c)
                else:
                    spark.conf.set(c, v)


class TestCDCChunkDedup:
    def _mini_docs(self, spark, tmp_path, texts):
        import pandas as pd

        path = str(tmp_path / "documents.parquet")
        pd.DataFrame(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ).to_parquet(path)
        return str(tmp_path)

    def test_short_docs_single_tail_chunk_matches_oracle(self, spark, tmp_path):
        """Docs shorter than the rolling window must yield exactly ONE
        whole-text chunk — Spark sequence(W, len) DESCENDS for len < W
        (DuckDB's generate_series is empty), the divergence the code-review
        fix guards. Cross-engine check on a corpus of short + long docs."""
        import duckdb

        from hg_data_pipelines_spark.queries import ORACLES, QUERIES

        texts = ["tiny", "a b", "x" * 15, "the quick brown fox " * 20, ""]
        texts = [t for t in texts if t]  # loader filters length >= 1 anyway
        sf_dir = self._mini_docs(spark, tmp_path, texts)
        got = {
            (r["chash"], r["n_copies"], r["chunk_len"], r["total_chars"])
            for r in QUERIES["X1_cdc_chunk_dedup"](spark, sf_dir).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM"
            f" read_parquet('{sf_dir}/documents.parquet')"
        )
        want = {
            (r[0], r[1], r[4], r[5])
            for r in con.execute(ORACLES["X1_cdc_chunk_dedup"]).fetchall()
        }
        assert got == want
        # the three sub-window docs appear as single whole-text chunks
        short_lens = {4, 3, 15}
        assert short_lens <= {c[2] for c in got}


class TestGridRadiusGuard:
    def test_nonpositive_radius_raises(self, spark):
        import pytest

        from hg_data_pipelines_spark.operators.rangejoin import grid_neighbor_join

        a = spark.createDataFrame([(1, 0.0, 0.0)], "id_a long, ax double, ay double")
        b = spark.createDataFrame([(2, 0.0, 0.0)], "id_b long, bx double, by double")
        with pytest.raises(ValueError, match="radius"):
            grid_neighbor_join(a, b, "ax", "ay", "bx", "by", 0.0)
