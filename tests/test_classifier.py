"""D24 hashed-ngram quality classifier (fastText-style LR filter).

Gates: the fit separates planted separable corpora; scoring is exact
against a hand-computed sigmoid for a CONSTRUCTED weight table (the
fit is MLlib's, the scoring arithmetic is ours); featureless docs
score sigmoid(intercept) exactly; save/load score-identical; the
keep() filter thresholds correctly; score plan shapes (no Python
eval, broadcast weight join); DuckDB oracle at sf0.01 with the fitted
coefficients exported as literal tables (the IVF split of
responsibility).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.classifier import (
    QualityClassifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def fitted(spark):
    pos = _docs(spark, [
        (i, "scholarly treatise on quantum thermodynamics and analysis")
        for i in range(40)
    ])
    neg = _docs(spark, [
        (1000 + i, "click here buy now free casino winner prize")
        for i in range(40)
    ])
    return QualityClassifier.fit(pos, neg, buckets=512, hash_fn="md5")


class TestFit:
    def test_separable_corpora_separate(self, spark, fitted):
        probe = _docs(spark, [
            (1, "quantum thermodynamics analysis"),
            (2, "free casino prize click here"),
        ])
        got = {r.doc_id: r.quality_score
               for r in fitted.score(probe).collect()}
        assert got[1] > 0.9
        assert got[2] < 0.1

    def test_keep_thresholds(self, spark, fitted):
        probe = _docs(spark, [
            (1, "quantum thermodynamics analysis"),
            (2, "free casino prize click here"),
        ])
        kept = fitted.keep(probe, threshold=0.5)
        assert [r.doc_id for r in kept.collect()] == [1]

    def test_featureless_doc_scores_intercept(self, spark, fitted):
        probe = _docs(spark, [(1, "")])
        got = fitted.score(probe).first().quality_score
        assert got == pytest.approx(
            1.0 / (1.0 + math.exp(-fitted.intercept)), abs=1e-12)


class TestScoringArithmetic:
    """Scoring correctness independent of the MLlib fit: construct the
    model directly and hand-compute."""

    def test_hand_computed_sigmoid_exact(self, spark):
        import hashlib

        B = 64

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B

        # one doc: tokens alpha alpha beta -> grams with multiplicity
        text = "alpha alpha beta"
        grams = ["alpha", "alpha", "beta", "alpha alpha", "alpha beta"]
        from collections import Counter

        cnt = Counter(bucket(g) for g in grams)
        wmap = {b: 0.1 * (i + 1) for i, b in enumerate(sorted(cnt))}
        dot = sum(math.log1p(c) * wmap[b] for b, c in cnt.items())
        intercept = -0.3
        expected = 1.0 / (1.0 + math.exp(-(dot + intercept)))

        weights = spark.createDataFrame(
            [(int(b), float(w)) for b, w in wmap.items()],
            "bucket int, weight double",
        )
        clf = QualityClassifier(weights, intercept, buckets=B, ng_max=2,
                                hash_fn="md5")
        got = clf.score(_docs(spark, [(1, text)])).first().quality_score
        assert got == pytest.approx(expected, abs=1e-12)

    def test_unknown_buckets_contribute_nothing(self, spark):
        """A doc whose buckets miss the weight table entirely scores
        sigmoid(intercept) — the left-join/coalesce path."""
        weights = spark.createDataFrame([(0, 5.0)], "bucket int, weight double")
        clf = QualityClassifier(weights, 1.0, buckets=2, ng_max=1,
                                hash_fn="md5")
        # find a token hashing to bucket 1 under md5 % 2
        import hashlib

        tok = next(
            t for t in ("aa", "ab", "ac", "ad", "ae")
            if int(hashlib.md5(t.encode()).hexdigest()[:13], 16) % 2 == 1
        )
        got = clf.score(_docs(spark, [(1, tok)])).first().quality_score
        assert got == pytest.approx(1.0 / (1.0 + math.exp(-1.0)), abs=1e-12)


class TestLifecycle:
    def test_save_load_score_identical(self, spark, fitted, tmp_path):
        probe = _docs(spark, [
            (1, "quantum thermodynamics analysis"),
            (2, "free casino prize click here"),
            (3, ""),
        ])
        fitted.save(str(tmp_path / "clf"))
        back = QualityClassifier.load(spark, str(tmp_path / "clf"))
        assert back.buckets == fitted.buckets
        assert back.hash_fn == fitted.hash_fn
        a = {(r.doc_id, r.quality_score)
             for r in fitted.score(probe).collect()}
        b = {(r.doc_id, r.quality_score)
             for r in back.score(probe).collect()}
        assert a == b


class TestPlans:
    def test_score_no_python_no_cartesian(self, spark, fitted):
        probe = _docs(spark, [(1, "quantum analysis")])
        plan = P.formatted_plan(fitted.score(probe))
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_weight_join_broadcasts(self, spark, fitted):
        probe = _docs(spark, [(1, "quantum analysis")])
        plan = P.formatted_plan(fitted.score(probe))
        assert "BroadcastHashJoin" in plan


class TestOracle:
    def test_classifier_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            quality_classifier_oracle,
        )

        df, sql = quality_classifier_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, "quality_classifier")
        n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
        assert n == n_docs  # every document scored, none dropped


class TestFitIdCollision:
    def test_colliding_ids_across_sides_still_separate(self, spark):
        """pos and neg corpora with the SAME sequential doc_ids (the
        common two-independent-corpora setup): features must not merge
        across sides — the internal per-side fit key keeps the planted
        separable corpora separable."""
        pos = _docs(spark, [
            (i, "scholarly treatise on quantum thermodynamics analysis")
            for i in range(30)
        ])
        neg = _docs(spark, [  # identical id range 0..29
            (i, "click here buy now free casino winner prize")
            for i in range(30)
        ])
        clf = QualityClassifier.fit(pos, neg, buckets=512, hash_fn="md5")
        probe = _docs(spark, [
            (1, "quantum thermodynamics analysis"),
            (2, "free casino prize click here"),
        ])
        got = {r.doc_id: r.quality_score
               for r in clf.score(probe).collect()}
        assert got[1] > 0.9
        assert got[2] < 0.1


class TestEmptyWeightsModel:
    def test_intercept_only_model_roundtrips(self, spark, tmp_path):
        """A model whose every coefficient is zero (weights frame
        empty) must save and load — meta lives in its own file."""
        empty = spark.createDataFrame([], "bucket int, weight double")
        clf = QualityClassifier(empty, 0.7, buckets=64, ng_max=2,
                                hash_fn="md5")
        clf.save(str(tmp_path / "m"))
        back = QualityClassifier.load(spark, str(tmp_path / "m"))
        assert back.intercept == 0.7 and back.buckets == 64
        got = back.score(_docs(spark, [(1, "anything")])).first()
        assert got.quality_score == pytest.approx(
            1.0 / (1.0 + math.exp(-0.7)), abs=1e-12)
