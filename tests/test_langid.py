"""D25 language identification (multinomial NB over hashed char n-grams).

Gates: planted per-language corpora classify correctly; zero-gram docs
fall back to the priors exactly; hand-computed NB arithmetic for a tiny
constructed model; save/load predict-identical; plan shapes (no Python
eval, broadcast model join, no cartesian); the funnel's langid override
+ wrong_language gate; sink langid_path wiring; DuckDB oracle at sf0.01
re-deriving predictions from the exported model tables.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.langid import LangIdModel


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def fitted(spark):
    rows = []
    for i in range(30):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
    for i in range(30, 55):
        rows.append((i, "der schnelle braune fuchs und der faule hund", "de"))
    for i in range(55, 75):
        rows.append((i, "le renard brun rapide et le chien paresseux", "fr"))
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    return LangIdModel.fit(labeled, buckets=1024, hash_fn="md5")


class TestFit:
    def test_planted_languages_identified(self, spark, fitted):
        probe = _docs(spark, [
            (1, "the dog jumps over the fox"),
            (2, "der hund und der fuchs"),
            (3, "le chien et le renard"),
        ])
        got = {r.doc_id: (r.lang_pred, r.lang_conf)
               for r in fitted.predict(probe).collect()}
        assert got[1][0] == "en" and got[1][1] > 0.9
        assert got[2][0] == "de" and got[2][1] > 0.9
        assert got[3][0] == "fr" and got[3][1] > 0.9

    def test_zero_gram_doc_scores_priors(self, spark, fitted):
        """Empty text -> no char grams -> argmax prior ('en', 30/75
        docs) with the priors' softmax as confidence."""
        got = fitted.predict(_docs(spark, [(1, "")])).first()
        assert got.lang_pred == "en"
        assert got.lang_conf == pytest.approx(30 / 75, abs=1e-9)

    def test_empty_corpus_language_cannot_hijack_argmax(self, spark):
        """A language whose training docs are all empty/whitespace
        contributes priors but no grams.  If the dense table's language
        set came from gram totals, that language would have NO table
        rows, its likelihood would coalesce to 0.0 at predict, and it
        would beat every real language (whose likelihoods are large
        negative sums) on every non-empty document (r7 ADVICE).  With
        langs drawn from the labels and tot=0 priced at the smoothed
        log(1/B) floor, real evidence must win."""
        rows = [(i, "the quick brown fox jumps over the dog", "en")
                for i in range(10)]
        rows += [(100 + i, "   ", "xx") for i in range(10)]
        labeled = spark.createDataFrame(
            rows, "doc_id long, text string, lang string")
        m = LangIdModel.fit(labeled, buckets=256, hash_fn="md5")
        # the empty-trained language is priced in the dense table
        assert m.table.filter(F.col("lang") == "xx").count() == 256
        got = m.predict(
            _docs(spark, [(1, "the fox jumps over the dog")])).first()
        assert got.lang_pred == "en"

    def test_keep_filters(self, spark, fitted):
        probe = _docs(spark, [
            (1, "the dog jumps over the fox"),
            (2, "der hund und der fuchs"),
        ])
        kept = fitted.keep(probe, langs=("en",), min_conf=0.5)
        assert [r.doc_id for r in kept.collect()] == [1]


class TestArithmetic:
    """NB scoring independent of the fit: construct the model tables
    directly and hand-compute."""

    def test_hand_computed_posterior_exact(self, spark):
        import hashlib

        B = 64

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B

        text = "ab"
        # char 1..2-grams of "ab": a, b, ab
        grams = ["a", "b", "ab"]
        langs = {"aa": -0.2, "bb": -1.7}  # logpriors
        # constructed logp: lang aa favors these buckets, bb does not
        logp = {}
        for g in grams:
            logp[(bucket(g), "aa")] = -1.0
            logp[(bucket(g), "bb")] = -3.0
        score = {
            ln: langs[ln] + sum(logp[(bucket(g), ln)] for g in grams)
            for ln in langs
        }
        m = max(score.values())
        want_pred = min(ln for ln, s in score.items()
                        if round(s, 6) == round(m, 6))
        want_conf = 1.0 / sum(math.exp(s - m) for s in score.values())

        rows = [(b, ln, lp) for (b, ln), lp in logp.items()]
        # dense fill for remaining buckets (floor value; unused by this
        # doc but required for the always-hit join contract)
        present = {b for b, _ in logp}
        for b in range(B):
            if b not in present:
                rows += [(b, "aa", -9.0), (b, "bb", -9.0)]
        table = spark.createDataFrame(
            rows, "bucket int, lang string, logp double")
        priors = spark.createDataFrame(
            [(ln, lp) for ln, lp in langs.items()],
            "lang string, logprior double")
        model = LangIdModel(table, priors, buckets=B, ng_max=2,
                            max_chars=400, hash_fn="md5", smooth=1.0)
        got = model.predict(_docs(spark, [(1, text)])).first()
        assert got.lang_pred == want_pred
        assert got.lang_conf == pytest.approx(want_conf, abs=1e-12)

    def test_fit_counts_match_hand_nb(self, spark):
        """The closed-form fit: logp for a (bucket, lang) equals
        ln((cnt + k) / (tot + k*B)) with hand-counted grams."""
        labeled = spark.createDataFrame(
            [(1, "ab", "x"), (2, "cd", "y")],
            "doc_id long, text string, lang string")
        B = 32
        model = LangIdModel.fit(labeled, buckets=B, ng_max=1,
                                max_chars=10, smooth=1.0, hash_fn="md5")
        import hashlib

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B

        tab = {(r.bucket, r.lang): r.logp for r in model.table.collect()}
        # lang x: grams a, b (tot 2); lang y: grams c, d (tot 2)
        for g in ("a", "b"):
            assert tab[(bucket(g), "x")] == pytest.approx(
                math.log((1 + 1) / (2 + B)), abs=1e-12)
        # unseen bucket under x prices at the smoothed floor
        assert tab[(bucket("z"), "x")] == pytest.approx(
            math.log(1 / (2 + B)), abs=1e-12)
        pri = {r.lang: r.logprior for r in model.priors.collect()}
        assert pri["x"] == pytest.approx(math.log(0.5), abs=1e-12)


class TestLifecycle:
    def test_save_load_predict_identical(self, spark, fitted, tmp_path):
        probe = _docs(spark, [
            (1, "the dog and the fox"), (2, "der hund"), (3, "")])
        fitted.save(str(tmp_path / "lid"))
        back = LangIdModel.load(spark, str(tmp_path / "lid"))
        assert (back.buckets, back.ng_max, back.max_chars, back.hash_fn,
                back.smooth) == (fitted.buckets, fitted.ng_max,
                                 fitted.max_chars, fitted.hash_fn,
                                 fitted.smooth)
        a = {(r.doc_id, r.lang_pred, r.lang_conf)
             for r in fitted.predict(probe).collect()}
        b = {(r.doc_id, r.lang_pred, r.lang_conf)
             for r in back.predict(probe).collect()}
        assert a == b


class TestPlans:
    def test_predict_no_python_no_cartesian(self, spark, fitted):
        plan = P.formatted_plan(
            fitted.predict(_docs(spark, [(1, "the dog")])))
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_model_join_broadcasts(self, spark, fitted):
        plan = P.formatted_plan(
            fitted.predict(_docs(spark, [(1, "the dog")])))
        assert "BroadcastHashJoin" in plan


class TestFunnel:
    def test_langid_overrides_lang_and_gates(self, spark, fitted):
        from kafka_cassandra_plugin_spark.operators.pipeline import (
            curate_annotated,
        )

        batch = _docs(spark, [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "der schnelle braune fuchs und der faule hund laufen"),
            (3, "le renard brun rapide et le chien paresseux ensemble"),
        ])
        out = curate_annotated(
            batch, langid=fitted, langs=("en", "de"), min_quality=0.0,
        ).collect()
        by_id = {r.doc_id: r for r in out}
        # the annotation IS the model's prediction (heuristic would
        # call all three 'en'/'und' - none of these are marker words)
        assert by_id[1].lang == "en" and by_id[1].reject_reason is None
        assert by_id[2].lang == "de" and by_id[2].reject_reason is None
        assert by_id[3].lang == "fr"
        assert by_id[3].reject_reason == "wrong_lang"
        assert all(r.lang_conf is not None for r in out)

    def test_min_lang_conf_rejects_wrong_language(self, spark, fitted):
        from kafka_cassandra_plugin_spark.operators.pipeline import (
            curate_annotated,
        )

        batch = _docs(spark, [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, ""),  # zero grams -> priors only -> conf 0.4
        ])
        out = {r.doc_id: r for r in curate_annotated(
            batch, langid=fitted, min_lang_conf=0.9, min_quality=0.0,
        ).collect()}
        assert out[1].reject_reason is None
        assert out[2].reject_reason == "wrong_language"

    def test_min_lang_conf_without_model_raises(self, spark):
        from kafka_cassandra_plugin_spark.operators.pipeline import (
            curate_annotated,
        )

        with pytest.raises(ValueError, match="needs langid"):
            curate_annotated(_docs(spark, [(1, "x")]), min_lang_conf=0.5)

    def test_reserved_lang_conf_collision_raises(self, spark, fitted):
        from kafka_cassandra_plugin_spark.operators.pipeline import (
            curate_annotated,
        )

        batch = spark.createDataFrame(
            [(1, "x", 0.5)], "doc_id long, text string, lang_conf double")
        with pytest.raises(ValueError, match="lang_conf"):
            curate_annotated(batch, langid=fitted)


class TestSink:
    def test_langid_path_wiring(self, spark, fitted, tmp_path):
        """A sink with langid_path annotates lang from the model and
        applies the wrong_language gate through curate_kwargs."""
        from kafka_cassandra_plugin_spark.operators.dedup_index import (
            MinHashIndex,
        )
        from kafka_cassandra_plugin_spark.streaming.curate import (
            CurationSink,
            accepted_dataset,
        )

        lid_path = str(tmp_path / "lid")
        fitted.save(lid_path)
        seed = _docs(spark, [(900, "seed document for the index only")])
        idx_path = str(tmp_path / "idx")
        MinHashIndex.build(seed).save(idx_path)
        sink = CurationSink(
            idx_path, str(tmp_path / "out"),
            langid_path=lid_path, langs=("en",), min_lang_conf=0.5,
            min_quality=0.0,
        )
        batch = _docs(spark, [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "der schnelle braune fuchs und der faule hund laufen"),
        ])
        sink(batch, 0)
        acc = accepted_dataset(spark, str(tmp_path / "out")).collect()
        assert [r.doc_id for r in acc] == [1]
        assert acc[0].lang == "en"
        assert sink.funnel_totals == {"accepted": 1, "wrong_lang": 1}

    def test_langid_path_and_model_mutually_exclusive(self, spark, fitted,
                                                      tmp_path):
        from kafka_cassandra_plugin_spark.streaming.curate import (
            CurationSink,
        )

        with pytest.raises(ValueError, match="not both"):
            CurationSink("i", "o", langid_path="p", langid=fitted)


class TestOracle:
    def test_langid_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            langid_oracle,
        )

        df, sql = langid_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, "langid")
        n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
        assert n == n_docs  # every document identified, none dropped
