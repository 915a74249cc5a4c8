"""Text fingerprint primitives: MinHash signature agreement must estimate
Jaccard similarity (the property that makes LSH banding work), and the
SQL-expression shingles must match a plain Python re-derivation."""

from __future__ import annotations

import pytest

from hg_data_pipelines_spark.functions.text import (
    minhash_signature,
    tokens,
    word_shingles,
)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.strip().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",          # near-dup of 0
    "a completely different sentence about spark engines",
    "the quick brown fox jumps over the lazy dog today",    # near-dup of 0
    "one two",                                               # < n tokens
]


class TestShingles:
    def test_match_python_reference(self, spark):
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(DOCS)], "doc_id long, text string"
        )
        rows = (
            df.select("doc_id", tokens("text").alias("toks"))
            .select("doc_id", word_shingles("toks", 3).alias("sh"))
            .collect()
        )
        for r in rows:
            assert set(r["sh"]) == _py_shingles(DOCS[r["doc_id"]]), r["doc_id"]


class TestMinHashEstimate:
    def test_signature_agreement_tracks_jaccard(self, spark):
        """With 256 hashes the agreement fraction must sit within ±0.15 of
        true Jaccard (std ≈ sqrt(J(1-J)/256) ≈ 0.03; 0.15 = 5σ)."""
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(DOCS[:4])], "doc_id long, text string"
        )
        sigs = {
            r["doc_id"]: r["sig"]
            for r in df.select(
                "doc_id", tokens("text").alias("toks")
            )
            .select("doc_id", word_shingles("toks", 3).alias("sh"))
            .select("doc_id", minhash_signature("sh", 256).alias("sig"))
            .collect()
        }
        for a in range(4):
            for b in range(a + 1, 4):
                sa, sb = _py_shingles(DOCS[a]), _py_shingles(DOCS[b])
                true_j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
                agree = sum(
                    1 for x, y in zip(sigs[a], sigs[b]) if x == y
                ) / 256
                assert agree == pytest.approx(true_j, abs=0.15), (a, b, true_j, agree)

    def test_empty_shingles_sentinel(self, spark):
        df = spark.createDataFrame([(4, DOCS[4])], "doc_id long, text string")
        sig = (
            df.select(tokens("text").alias("toks"))
            .select(word_shingles("toks", 3).alias("sh"))
            .select(minhash_signature("sh", 8).alias("sig"))
            .collect()[0]["sig"]
        )
        assert all(v == 9223372036854775807 for v in sig)
