"""Distributed BPE merge training vs the pure-Python reference."""

from __future__ import annotations

from hg_data_pipelines_spark.operators.bpe import bpe_train, bpe_train_reference


def _spark_merges(spark, texts, n_merges=8):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["n"])
        for r in bpe_train(df, n_merges=n_merges).orderBy("rank").collect()
    ]


class TestBpeTrain:
    def test_matches_reference_on_synthetic_corpus(self, spark):
        texts = [
            "low lower lowest low low",
            "new newer newest new",
            "wide wider widest wide wide wide",
        ]
        assert _spark_merges(spark, texts) == bpe_train_reference(texts, 8)

    def test_matches_reference_on_fixture_text(self, spark):
        from hg_data_pipelines_spark.queries.common import load

        docs = load(spark, "/root/testdata/sf0.001", "documents").limit(200)
        texts = [r["text"] for r in docs.select("text").collect()]
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["n"])
            for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
        ]
        assert got == bpe_train_reference(texts, 6)

    def test_overlapping_pair_merges_leftmost_first(self, spark):
        # 'aaaa' with top pair (a,a) must become (aa)(aa), not a cascade
        texts = ["aaaa aaaa ab"]
        got = _spark_merges(spark, texts, n_merges=2)
        ref = bpe_train_reference(texts, 2)
        assert got == ref
        assert got[0][1:4] == ("a", "a", "aa")

    def test_stops_when_no_pair_repeats(self, spark):
        texts = ["x y z"]  # single-char words: no adjacent pairs at all
        assert _spark_merges(spark, texts) == []


class TestBpeEncode:
    def test_encode_matches_reference(self, spark):
        from hg_data_pipelines_spark.operators.bpe import (
            bpe_encode,
            bpe_encode_reference,
            bpe_train,
        )

        texts = {
            0: "low lower lowest low low",
            1: "new newer newest new",
            2: "wide wider widest wide wide wide",
        }
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        merges = [
            (r["left"], r["right"])
            for r in bpe_train(df, n_merges=6).orderBy("rank").collect()
        ]
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_encode(df, merges).collect()
        }
        assert got == bpe_encode_reference(texts, merges)
        # merging strictly compresses: fewer tokens than characters
        chars = {i: sum(len(w) for w in t.split()) for i, t in texts.items()}
        assert all(got[i][1] < chars[i] for i in texts)

    def test_encode_folds_run_on_the_distinct_vocabulary_side(self, spark):
        # Round-8 contract: the chained merge folds cost ∝ |word vocab|,
        # not corpus size — the fold expression must sit ABOVE the
        # distinct-word aggregate, never on the corpus word stream, and
        # the plan carries exactly the three expected exchanges (distinct
        # vocabulary, word-key join co-partition [AQE broadcasts it at
        # runtime for real vocab sizes], final per-doc aggregation).
        from hg_data_pipelines_spark.operators.bpe import bpe_encode

        df = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
        plan = (
            bpe_encode(df, [("a", "b")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 3
        # the corpus-stream side of the join carries NO fold: its subtree
        # is scan → explode → filter → exchange only
        corpus_side = plan.split("SortMergeJoin")[1].split("Sort ")[1]
        assert "aggregate(" not in corpus_side.split("HashAggregate")[0]


class TestBpeMetacharacterTokens:
    """Corpus-derived tokens must never reach the Catalyst parser as SQL
    text — backslashes, quotes, and regex metacharacters in the hot pair
    previously produced ParseException (or worse, expression injection)."""

    def test_backslash_and_quote_tokens(self, spark):
        from hg_data_pipelines_spark.operators.bpe import (
            bpe_encode,
            bpe_encode_reference,
        )

        # code-like corpus: hot pairs contain \ ' " $ { } ( )
        texts = {
            0: r"a\b a\b a\b it's it's",
            1: r"x' x' \\n \\n \\n",
            2: r'say("hi") say("hi") ${var} ${var}',
        }
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        merges = bpe_train_reference(list(texts.values()), 8)
        got_merges = _spark_merges(spark, list(texts.values()), 8)
        assert got_merges == merges
        pairs = [(l, r) for _, l, r, _, _ in merges]
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_encode(df, pairs).collect()
        }
        assert got == bpe_encode_reference(texts, pairs)

    def test_trailing_backslash_token_cannot_inject(self, spark):
        from hg_data_pipelines_spark.operators.bpe import bpe_encode

        # token ending in backslash: with string-spliced SQL this escaped
        # the closing quote and let the next token parse as expression text
        df = spark.createDataFrame([(0, "x x")], ["doc_id", "text"])
        out = bpe_encode(df, [("c\\", "', reflect('java.lang.System','exit',0), '")])
        rows = out.collect()
        assert rows[0]["n_bpe_tokens"] == 2  # merge never matches, JVM alive


class TestBpePacking:
    def test_bpe_sequence_packing_matches_reference_chain(self, spark):
        """Full tokenizer-aware packing chain vs pure Python: train →
        encode → exclusive prefix-sum → fixed-budget bins."""
        from hg_data_pipelines_spark.queries.common import QUERIES, load

        sf = "/root/testdata/sf0.001"
        docs = load(spark, sf, "documents")
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.select("doc_id", "text").collect()
        }
        merges = [
            (l, r) for _, l, r, _, _ in bpe_train_reference(list(texts.values()), 8)
        ]
        from hg_data_pipelines_spark.operators.bpe import bpe_encode_reference

        enc = bpe_encode_reference(texts, merges)
        budget = 512
        bins: dict[int, list[int]] = {}
        prefix = 0
        for doc_id in sorted(enc):
            n_tok = enc[doc_id][1]
            bins.setdefault(prefix // budget, []).append(n_tok)
            prefix += n_tok
        want = {
            b: (len(v), sum(v)) for b, v in bins.items()
        }
        got = {
            r["bin_id"]: (r["n_docs"], r["bin_tokens"])
            for r in QUERIES["X4_bpe_sequence_packing"](spark, sf).collect()
        }
        assert got == want


class TestBpeSqlOracle:
    def test_positional_parity_rule_matches_fold_on_adversarial_words(self):
        # The DuckDB oracle (queries/corpus.py _bpe_merges_sql) applies
        # each merge POSITIONALLY: candidate runs (only possible when
        # left = right) merge at even offsets. This pins that rule
        # against the sequential fold reference on the worst cases —
        # same-char runs, alternating patterns, chains through merged
        # tokens — across every merge round.
        import duckdb

        from hg_data_pipelines_spark.queries.corpus import _bpe_merges_sql

        texts = [
            "aaaa aaaaa aa a",           # odd/even same-char runs
            "ababab abab ab ba",         # alternating, pair chaining
            "aab aabb abba baab",        # merged-token boundaries
            "xxyy xyxy yxyx",            # competing pairs
            "zzz zzz zzz",               # heavy weight on a run
        ] * 3
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
            + ") AS t(doc_id, text)"
        )
        got = con.execute(_bpe_merges_sql()).fetchall()
        want = bpe_train_reference(texts, n_merges=8)
        assert [tuple(r) for r in got] == [tuple(m) for m in want]
