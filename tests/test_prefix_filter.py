"""Prefix-filtered set-similarity join (operators/dedup.py) — exactness:
its output must equal the inverted-index form's on any input."""

from __future__ import annotations

from hg_data_pipelines_spark.operators.dedup import (
    jaccard_prefix_filter_pairs,
    ngram_jaccard_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _pairs(df, fn, t):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in fn(df, threshold=t).collect()
    }


class TestPrefixFilterExactness:
    def test_matches_inverted_index_on_near_dups(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        texts = [
            base,
            base + " extra",                      # near-dup of base
            base.replace("quick", "slow"),        # near-dup of base
            "completely different words here that share nothing at all with it",
            "another unrelated document full of its own distinct vocabulary set",
        ]
        df = _docs(spark, texts)
        for t in (0.5, 0.8):
            assert _pairs(df, jaccard_prefix_filter_pairs, t) == _pairs(
                df, ngram_jaccard_pairs, t
            )

    def test_identical_docs_jaccard_one(self, spark):
        df = _docs(spark, ["a b c d e f g h"] * 3)
        got = _pairs(df, jaccard_prefix_filter_pairs, 0.9)
        assert got == {(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)}

    def test_short_docs_no_shingles_no_pairs(self, spark):
        # docs under 3 tokens shingle to empty sets -> never pair
        df = _docs(spark, ["one two", "one two", "x y"])
        assert _pairs(df, jaccard_prefix_filter_pairs, 0.5) == set()

    def test_length_filter_respects_threshold(self, spark):
        # a doc 2x the length of another cannot reach jaccard 0.8
        short = "alpha beta gamma delta epsilon zeta"
        long = short + " " + "eta theta iota kappa lambda mu nu xi omicron pi"
        df = _docs(spark, [short, long])
        assert _pairs(df, jaccard_prefix_filter_pairs, 0.8) == set()
        assert _pairs(df, ngram_jaccard_pairs, 0.8) == set()


def test_hamming_default_chunks_raises_beyond_16(spark):
    """max_hamming >= 16 cannot get full recall from 64-bit chunking —
    the default n_chunks derivation must refuse rather than silently cap
    at a distance-15 pigeonhole guarantee."""
    import pytest

    from hg_data_pipelines_spark.operators.dedup import hamming_near_pairs

    df = spark.createDataFrame([(1, 0), (2, -1)], "id long, h long")
    with pytest.raises(ValueError, match="at most 16"):
        hamming_near_pairs(df, "id", "h", max_hamming=16)
    # explicit n_chunks opts into the reduced guarantee
    assert hamming_near_pairs(df, "id", "h", max_hamming=16, n_chunks=16).count() == 0


class TestContainmentPairs:
    def test_subset_scores_one_on_small_side(self, spark):
        from hg_data_pipelines_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        # doc 2's shingles are a strict subset of doc 1's: containment
        # from 2 into 1 is 1.0; the reverse is |∩|/|big| < 1
        big = "a b c d e f g h i j"
        small = "a b c d e"
        docs = spark.createDataFrame(
            [(1, big), (2, small)], "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in ngram_containment_pairs(docs, threshold=0.0).collect()
        }
        assert got[(2, 1)] == 1.0
        # big side: 3 shared 3-gram shingles of its 8
        assert abs(got[(1, 2)] - 3 / 8) < 1e-12

    def test_threshold_keeps_only_qualifying_direction(self, spark):
        from hg_data_pipelines_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, "a b c d e")],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_containment_pairs(docs, threshold=0.9).collect()
        }
        assert got == {(2, 1)}  # only the contained doc passes 0.9
