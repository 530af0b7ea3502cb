"""D19 n-gram LM perplexity: the model-based quality gate.

Gates exact add-k arithmetic (hand-computed probabilities, including
the two boundary identities: unseen-context text scores ppl == V
exactly, and a pruned gram degrades to the smoothed floor with its
context total UNCHANGED), the in-domain < gibberish separation the
CCNet gate depends on, persistence, the band gate, and the plan shapes
(broadcast/shuffle_hash scoring joins, no Python eval anywhere).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators.lm import NgramLM, _doc_ngrams


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ate")],
        "doc_id int, text string",
    )


@pytest.fixture(scope="module")
def lm(tiny):
    return NgramLM.fit(tiny, n=3, k=0.1)


def _ppl(lm_, docs, doc_id):
    row = lm_.perplexity(docs).filter(F.col("doc_id") == doc_id).collect()[0]
    return row["ppl"], row["n_grams"]


class TestExactArithmetic:
    def test_hand_computed_trigram(self, lm, spark):
        """'the cat' context has 2 continuations (sat, ate), V=5:
        P(ate | the cat) = (1 + 0.1) / (2 + 0.1*5) = 0.44."""
        assert lm.vocab_size == 5
        doc = spark.createDataFrame([(4, "the cat ate")],
                                    "doc_id int, text string")
        ppl, n = _ppl(lm, doc, 4)
        assert n == 1
        assert ppl == pytest.approx(1 / 0.44, rel=1e-9)

    def test_unseen_text_scores_exactly_vocab_size(self, lm, spark):
        """Every gram unseen: P = k/(kV) = 1/V, so ppl == V - the
        add-k uniform floor, hit exactly through the left joins."""
        doc = spark.createDataFrame([(9, "zz yy xx ww")],
                                    "doc_id int, text string")
        ppl, n = _ppl(lm, doc, 9)
        assert n == 2
        assert ppl == pytest.approx(float(lm.vocab_size), rel=1e-9)

    def test_short_docs_score_null_ppl(self, lm, spark):
        docs = spark.createDataFrame([(7, "a b"), (8, "")],
                                     "doc_id int, text string")
        rows = {r["doc_id"]: r for r in lm.perplexity(docs).collect()}
        assert rows[7]["n_grams"] == 0 and rows[7]["ppl"] is None
        assert rows[8]["n_grams"] == 0 and rows[8]["ppl"] is None

    def test_case_insensitive(self, lm, spark):
        a = spark.createDataFrame([(1, "THE CAT ATE")], "doc_id int, text string")
        b = spark.createDataFrame([(1, "the cat ate")], "doc_id int, text string")
        assert _ppl(lm, a, 1) == _ppl(lm, b, 1)

    def test_arg_guards(self, tiny):
        with pytest.raises(ValueError):
            NgramLM.fit(tiny, n=0)
        with pytest.raises(ValueError):
            NgramLM.fit(tiny, k=0.0)


class TestPruning:
    def test_pruned_gram_degrades_to_floor_total_unchanged(self, spark):
        """After prune_min_count=2 the hapax gram row is gone but its
        context total still counts it: P(sat | the cat) becomes
        (0 + k) / (2 + kV) - the smoothed floor over the ORIGINAL
        denominator, not a renormalization onto survivors."""
        corpus = spark.createDataFrame(
            [(1, "the cat ate"), (2, "the cat ate"), (3, "the cat sat")],
            "doc_id int, text string",
        )
        full = NgramLM.fit(corpus, n=3, k=0.1)
        pruned = NgramLM.fit(corpus, n=3, k=0.1, prune_min_count=2)
        assert pruned.gram_rows < full.gram_rows
        doc = spark.createDataFrame([(5, "the cat sat")],
                                    "doc_id int, text string")
        ppl, _ = _ppl(pruned, doc, 5)
        # V=3 (ate, sat, cat... tokens appearing as gram targets): use
        # the model's own V for the expected value
        expected = (0 + 0.1) / (3 + 0.1 * pruned.vocab_size)
        assert ppl == pytest.approx(1 / expected, rel=1e-9)


class TestQualitySeparation:
    def test_in_domain_beats_gibberish(self, spark):
        """Fit on a corpus WITH n-gram structure (the synthetic
        /root/testdata documents are a structureless bag of ~31 words -
        every bigram distribution is near-uniform, so they cannot
        separate anything BY CONSTRUCTION); held-out docs drawn from
        the same templates must score far below token-soup docs - the
        property the gate exists for."""
        templates = [
            "the quick brown fox jumps over the lazy dog",
            "a stitch in time saves nine every single day",
            "all that glitters is not gold my friend",
        ]
        rows = [(i, templates[i % 3] + " " + templates[(i + 1) % 3])
                for i in range(60)]
        corpus = spark.createDataFrame(rows, "doc_id int, text string")
        train = corpus.filter(F.col("doc_id") % 2 == 0)
        held = corpus.filter(F.col("doc_id") % 2 == 1)
        lm_ = NgramLM.fit(train, n=2, k=0.1)
        # gibberish: same length, same vocabulary SIZE, no structure -
        # deterministic pseudo-words the model has never seen
        soup = held.withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t: F.concat(F.lit("zq"),
                                       (F.xxhash64(t) % 1000).cast("string")),
                ),
            ),
        )
        real_ppl = lm_.perplexity(held).agg(F.avg("ppl")).collect()[0][0]
        soup_ppl = lm_.perplexity(soup).agg(F.avg("ppl")).collect()[0][0]
        assert real_ppl is not None and soup_ppl is not None
        assert real_ppl * 5 < soup_ppl

    def test_gate_band_and_short_doc_drop(self, lm, spark):
        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"),   # in-domain, low ppl
             (2, "zz yy xx ww"),              # unseen, ppl == V == 5
             (3, "a b")],                     # too short: dropped
            "doc_id int, text string",
        )
        kept = lm.perplexity_gate(docs, max_ppl=4.0)
        assert [r["doc_id"] for r in kept.collect()] == [1]
        # band: min_ppl excludes the boilerplate-low end
        high_only = lm.perplexity_gate(docs, min_ppl=4.0, max_ppl=10.0)
        assert [r["doc_id"] for r in high_only.collect()] == [2]


class TestPersistenceAndPlans:
    def test_save_load_scores_identical(self, lm, tiny, tmp_path):
        loaded = lm.save(str(tmp_path / "lm"))
        assert (loaded.n, loaded.k, loaded.vocab_size, loaded.gram_rows) == (
            lm.n, lm.k, lm.vocab_size, lm.gram_rows,
        )
        a = lm.perplexity(tiny).orderBy("doc_id").collect()
        b = loaded.perplexity(tiny).orderBy("doc_id").collect()
        for x, y in zip(a, b):
            assert x == y

    def test_score_plan_broadcasts_small_model(self, lm, tiny):
        from kafka_cassandra_plugin_spark import plans as P

        plan = P.formatted_plan(lm.perplexity(tiny))
        assert plan.count("BroadcastHashJoin") >= 2
        assert "EvalPython" not in plan

    def test_score_plan_shuffle_hash_when_model_large(self, lm, tiny):
        from kafka_cassandra_plugin_spark import plans as P

        plan = P.formatted_plan(lm.perplexity(tiny, max_broadcast_rows=0))
        assert "ShuffledHashJoin" in plan

    def test_fit_plan_no_python(self, tiny):
        from kafka_cassandra_plugin_spark import plans as P

        lm_ = NgramLM.fit(tiny, n=2, k=0.5)
        assert "EvalPython" not in P.formatted_plan(lm_.grams)


class TestNgramExtraction:
    def test_unigram_empty_context(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
        rows = _doc_ngrams(df, "text", 1).select("ctx", "tok").collect()
        assert [(r["ctx"], r["tok"]) for r in rows] == [
            ("", "a"), ("", "b"), ("", "c"),
        ]

    def test_window_count(self, spark):
        df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
        assert _doc_ngrams(df, "text", 3).count() == 3
