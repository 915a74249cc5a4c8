"""MinHash LSH occupancy guard (operators/dedup.py max_bucket).

A verbatim-copy clique puts every member in ONE band bucket per band, and
all-pairs expansion is quadratic in clique size (the composed 100x fixture
measured 78 GB of spill before DNF). With ``max_bucket`` set, oversized
buckets expand via overlapping capped windows (all-pairs within each
window, adjacent windows chained by a shared element): linear candidate
volume, ~cap-1 direct neighbors per member, same connected components.
"""

from __future__ import annotations

import math

from hg_data_pipelines_spark.operators.dedup import (
    capped_window_slices_expr,
    connected_components,
    minhash_lsh_pairs,
)


def _expected_window_pairs(ids, cap):
    """Reference model of capped_window_slices_expr + pair_expansion_expr's oversized path."""
    ids = sorted(ids)
    stride = cap - 1
    pairs = set()
    for j in range(math.ceil((len(ids) - 1) / stride)):
        chunk = ids[j * stride : j * stride + cap]
        for a in range(len(chunk)):
            for b in range(a + 1, len(chunk)):
                pairs.add((chunk[a], chunk[b]))
    return pairs

_CLIQUE = 10
_TEXT = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark):
    rows = [(i, _TEXT) for i in range(_CLIQUE)] + [
        (100, "completely different text about spark shuffle partitions"),
        (101, "another unrelated document mentioning parquet row groups"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMinhashOccupancyGuard:
    def test_uncapped_emits_all_clique_pairs(self, spark):
        pairs = minhash_lsh_pairs(_docs(spark), threshold=0.2).collect()
        clique = [p for p in pairs if p["id_a"] < _CLIQUE]
        assert len(clique) == _CLIQUE * (_CLIQUE - 1) // 2
        assert all(p["jaccard"] == 1.0 for p in clique)

    def test_capped_clique_expands_in_chained_windows(self, spark):
        pairs = minhash_lsh_pairs(
            _docs(spark), threshold=0.2, max_bucket=4
        ).collect()
        clique = [p for p in pairs if p["id_a"] < _CLIQUE]
        # overlapping cap-4 windows over sorted ids 0..9:
        # {0,1,2,3} {3,4,5,6} {6,7,8,9} — all-pairs within each
        expected = _expected_window_pairs(range(_CLIQUE), 4)
        assert sorted((p["id_a"], p["id_b"]) for p in clique) == sorted(expected)
        # every member has >1 direct neighbor (the star-expansion flaw)
        from collections import Counter

        deg = Counter()
        for a, b in expected:
            deg[a] += 1
            deg[b] += 1
        assert min(deg.values()) >= 2
        assert all(p["jaccard"] == 1.0 for p in clique)
        # no cross-contamination with the distinct docs
        assert all(p["id_a"] < _CLIQUE and p["id_b"] < _CLIQUE for p in clique)

    def test_expansion_expr_rejects_degenerate_cap(self):
        import pytest

        with pytest.raises(ValueError):
            capped_window_slices_expr(1)

    def test_capped_pairs_recover_full_clique_component(self, spark):
        pairs = minhash_lsh_pairs(_docs(spark), threshold=0.2, max_bucket=4)
        comp = connected_components(pairs.select("id_a", "id_b")).collect()
        label = {r["node"]: r["comp"] for r in comp}
        assert {label[i] for i in range(_CLIQUE)} == {0}

    def test_cap_above_bucket_size_is_identity(self, spark):
        base = {
            (p["id_a"], p["id_b"])
            for p in minhash_lsh_pairs(_docs(spark), threshold=0.2).collect()
        }
        capped = {
            (p["id_a"], p["id_b"])
            for p in minhash_lsh_pairs(
                _docs(spark), threshold=0.2, max_bucket=_CLIQUE
            ).collect()
        }
        assert capped == base
