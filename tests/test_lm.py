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
        """'the cat' context has 2 continuations (sat, ate); V is the
        FULL vocabulary {the, cat, sat, on, mat, ate} = 6 (every corpus
        position, not just gram continuations):
        P(ate | the cat) = (1 + 0.1) / (2 + 0.1*6) = 1.1/2.6."""
        assert lm.vocab_size == 6
        doc = spark.createDataFrame([(4, "the cat ate")],
                                    "doc_id int, text string")
        ppl, n = _ppl(lm, doc, 4)
        assert n == 1
        assert ppl == pytest.approx(2.6 / 1.1, rel=1e-9)

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
        # V = |{the, cat, ate, sat}| = 4 (full vocabulary)
        assert pruned.vocab_size == 4
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


class TestIncrementalMaintenance:
    """The D18 pattern applied to the LM: exact counts are
    distributive, so batch-partitioned accumulation must be BIT-EXACT
    against a refit over the union corpus - no drift tolerance."""

    def _eq(self, a, b):
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_accumulate_equals_refit(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "the cat ate"),
             (3, "a dog sat on a log"), (4, "the dog ate the mat")],
            "doc_id int, text string",
        )
        refit = NgramLM.fit(corpus, n=3, k=0.1)
        inc = NgramLM.init(spark, str(tmp_path / "lm"), n=3, k=0.1)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") <= 2), 0)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") > 2), 1)
        assert (inc.n, inc.k) == (refit.n, refit.k)
        assert inc.vocab_size == refit.vocab_size
        assert inc.gram_rows == refit.gram_rows
        self._eq(inc.grams, refit.grams)
        self._eq(inc.contexts, refit.contexts)
        # and the scores agree exactly
        a = refit.perplexity(corpus).orderBy("doc_id").collect()
        b = inc.perplexity(corpus).orderBy("doc_id").collect()
        assert a == b

    def test_save_onto_stale_path_replaces_history(self, spark, tmp_path):
        """save() to a path already holding batch=N partitions must
        REPLACE them: without the pre-write cleanup, the stale counts
        would silently SUM into the freshly-saved model's loaded view
        (r6 ADVICE)."""
        path = str(tmp_path / "lm")
        old = spark.createDataFrame([(1, "aaa bbb aaa bbb aaa")],
                                    "doc_id int, text string")
        stale = NgramLM.init(spark, path, n=2, k=0.1)
        stale.append_batch(old, 0)
        new_corpus = spark.createDataFrame([(9, "ccc ddd ccc ddd")],
                                           "doc_id int, text string")
        fresh = NgramLM.fit(new_corpus, n=2, k=0.1)
        loaded = fresh.save(path)
        assert loaded.vocab_size == fresh.vocab_size
        assert loaded.gram_rows == fresh.gram_rows
        self._eq(loaded.grams, fresh.grams)
        self._eq(loaded.contexts, fresh.contexts)

    def test_save_onto_own_path_preserves_model(self, spark, tmp_path):
        """``NgramLM.load(p).save(p)``: the loaded tables are LAZY
        reads of the very partitions save() replaces, so a
        delete-before-write save() would destroy the data its own
        write plan reads (r7 ADVICE medium).  The staged-sibling swap
        must make this a lossless consolidation instead."""
        path = str(tmp_path / "lm")
        b0 = spark.createDataFrame([(1, "m n o m n")],
                                   "doc_id int, text string")
        b1 = spark.createDataFrame([(2, "o p q o p")],
                                   "doc_id int, text string")
        lm_ = NgramLM.init(spark, path, n=2, k=0.1)
        lm_ = lm_.append_batch(b0, 0)
        lm_ = lm_.append_batch(b1, 1)
        before_grams = sorted(map(tuple, lm_.grams.collect()))
        before_v = lm_.vocab_size
        resaved = NgramLM.load(spark, path).save(path)
        assert sorted(map(tuple, resaved.grams.collect())) == before_grams
        assert resaved.vocab_size == before_v
        # and the batch partitions are consolidated into batch=-1 only
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids
        assert list_batch_ids(spark, f"{path}/grams") == [-1]

    def test_replay_overwrites_not_doublecounts(self, spark, tmp_path):
        b0 = spark.createDataFrame([(1, "x y z x y")],
                                   "doc_id int, text string")
        lm_ = NgramLM.init(spark, str(tmp_path / "lm"), n=2, k=0.1)
        once = lm_.append_batch(b0, 0)
        counts_once = sorted(map(tuple, once.grams.collect()))
        again = once.append_batch(b0, 0)  # foreachBatch replay
        assert sorted(map(tuple, again.grams.collect())) == counts_once
        assert again.vocab_size == once.vocab_size

    def test_exclude_batch_hides_inflight_attempt(self, spark, tmp_path):
        b0 = spark.createDataFrame([(1, "p q r p q")],
                                   "doc_id int, text string")
        b1 = spark.createDataFrame([(2, "s t u s t")],
                                   "doc_id int, text string")
        lm_ = NgramLM.init(spark, str(tmp_path / "lm"), n=2, k=0.1)
        lm_ = lm_.append_batch(b0, 0)
        lm_.append_batch(b1, 1)  # uncommitted first attempt
        asof = NgramLM.load(spark, str(tmp_path / "lm"), exclude_batch=1)
        committed = NgramLM.init(spark, str(tmp_path / "ctl"),
                                 n=2, k=0.1).append_batch(b0, 0)
        self._eq(asof.grams, committed.grams)
        assert asof.vocab_size == committed.vocab_size

    def test_compact_preserves_model_and_exclusion(self, spark, tmp_path):
        path = str(tmp_path / "lm")
        b0 = spark.createDataFrame([(1, "a b c a b")],
                                   "doc_id int, text string")
        b1 = spark.createDataFrame([(2, "c d e c d")],
                                   "doc_id int, text string")
        b2 = spark.createDataFrame([(3, "f g h f g")],
                                   "doc_id int, text string")
        lm_ = NgramLM.init(spark, path, n=2, k=0.1)
        lm_ = lm_.append_batch(b0, 0).append_batch(b1, 1)
        lm_ = lm_.append_batch(b2, 2)  # the in-flight batch
        before = sorted(map(tuple, NgramLM.load(
            spark, path, exclude_batch=2
        ).grams.collect()))
        lm_.compact(exclude_batch=2)
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        glob = jvm.org.apache.hadoop.fs.Path(f"{path}/grams/batch=*")
        names = sorted(
            s.getPath().getName()
            for s in glob.getFileSystem(conf).globStatus(glob)
        )
        assert names == ["batch=-1", "batch=2"]
        after = sorted(map(tuple, NgramLM.load(
            spark, path, exclude_batch=2
        ).grams.collect()))
        assert before == after  # replay view unchanged by compaction
        full = NgramLM.load(spark, path)
        assert full.vocab_size == lm_.vocab_size
        assert full.gram_rows == lm_.gram_rows

    def test_compact_prune_matches_fit_prune(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(1, "the cat ate"), (2, "the cat ate"), (3, "the cat sat")],
            "doc_id int, text string",
        )
        refit = NgramLM.fit(corpus, n=3, k=0.1, prune_min_count=2)
        inc = NgramLM.init(spark, str(tmp_path / "lm"), n=3, k=0.1)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") <= 1), 0)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") > 1), 1)
        inc = inc.compact(prune_min_count=2)
        assert inc.gram_rows == refit.gram_rows
        assert inc.vocab_size == refit.vocab_size
        self._eq(inc.grams, refit.grams)
        self._eq(inc.contexts, refit.contexts)  # totals pre-prune

    def test_append_guards(self, spark, tmp_path, tiny):
        mem = NgramLM.fit(tiny, n=2)
        with pytest.raises(ValueError, match="saved model"):
            mem.append_batch(tiny, 0)
        disk = NgramLM.init(spark, str(tmp_path / "lm"), n=2)
        with pytest.raises(ValueError, match=">= 0"):
            disk.append_batch(tiny, -1)


class TestDigitBucketing:
    """CCNet numeral normalization: digits collapse to 0 at fit AND
    score time, and the flag survives persistence."""

    def test_numeric_variants_score_identically(self, spark):
        corpus = spark.createDataFrame(
            [(1, "order 123 shipped on day 45"),
             (2, "order 678 shipped on day 90")],
            "doc_id int, text string",
        )
        lm_ = NgramLM.fit(corpus, n=2, k=0.1, digit_bucket=True)
        a = spark.createDataFrame([(1, "order 555 shipped")],
                                  "doc_id int, text string")
        b = spark.createDataFrame([(1, "order 000 shipped")],
                                  "doc_id int, text string")
        assert _ppl(lm_, a, 1) == _ppl(lm_, b, 1)

    def test_bucketing_shrinks_numeric_vocab(self, spark):
        rows = [(i, f"price is {100 + i} dollars") for i in range(20)]
        corpus = spark.createDataFrame(rows, "doc_id int, text string")
        plain = NgramLM.fit(corpus, n=2)
        bucketed = NgramLM.fit(corpus, n=2, digit_bucket=True)
        # 20 distinct numerals collapse to one 000 pseudo-token
        assert bucketed.vocab_size == plain.vocab_size - 19

    def test_flag_persisted_and_applied_after_load(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(1, "value 11 and value 22")], "doc_id int, text string"
        )
        lm_ = NgramLM.fit(corpus, n=2, k=0.1, digit_bucket=True)
        loaded = lm_.save(str(tmp_path / "lm"))
        assert loaded.digit_bucket is True
        doc = spark.createDataFrame([(1, "value 99")],
                                    "doc_id int, text string")
        assert _ppl(loaded, doc, 1) == _ppl(lm_, doc, 1)


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


class TestOracle:
    """D19's DuckDB oracle (round 6): the fitted count tables export as
    literal tables and DuckDB re-derives every document's add-k trigram
    perplexity from the raw text — the last depth-tier op whose
    correctness rested on hand-computed cases alone."""

    def test_lm_perplexity_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            lm_perplexity_oracle,
        )

        df, sql = lm_perplexity_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, "lm_perplexity")
        n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
        assert n == n_docs  # every document scored (NULL ppl for short)


class TestCcnetBuckets:
    """D30: CCNet perplexity tertiles (Wenzek et al. 2020 §4.4) —
    head/middle/tail per language.  The rank form is oracled against
    DuckDB's identical NTILE window; the cutoff form (the map-only
    100-TB path) is gated by agreement with the rank form away from
    boundary ties and by a broadcast-join plan shape."""

    def _scored(self, spark, sf_dir):
        from kafka_cassandra_plugin_spark.catalog import Catalog

        d = Catalog(spark, sf_dir).documents.select("doc_id", "text", "lang")
        lm_ = NgramLM.fit(
            d.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text"),
            n=3, k=0.1,
        )
        return lm_.perplexity(d.select("doc_id", "text")).join(
            d.select("doc_id", "lang"), "doc_id"
        )

    def test_hand_tertiles_and_null_band(self, spark):
        """9 scored docs in one lang -> exactly 3/3/3 in ppl order; a
        sub-3-token doc keeps a NULL bucket."""
        from kafka_cassandra_plugin_spark.operators.lm import (
            ppl_buckets_by_rank,
        )

        rows = [(i, float(10 + i), "en") for i in range(9)]
        rows.append((99, None, "en"))  # unscorable
        ppl = spark.createDataFrame(
            rows, "doc_id int, ppl double, lang string"
        )
        got = {r.doc_id: r.ppl_bucket
               for r in ppl_buckets_by_rank(ppl).collect()}
        assert [got[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )
        assert got[99] is None

    def test_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            ccnet_ppl_buckets_oracle,
        )

        df, sql = ccnet_ppl_buckets_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, "ccnet_ppl_buckets")
        n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
        assert n == n_docs

    def test_cutoffs_agree_with_rank_up_to_boundary_parity(
            self, spark, sf_dir):
        """The broadcast-cutoff form labels documents identically to
        the rank form except (a) rows whose rounded ppl EQUALS a
        cutoff (a threshold cannot split id-ordered ties) and (b) at
        most ONE document per (language, boundary) from interpolation
        parity: when a language's count is not ≡ 0/1 (mod 3), the
        interpolated percentile and NTILE's ceil/floor tile sizes cut
        one rank apart.  Every disagreement must be between ADJACENT
        buckets, and the bulk must agree exactly."""
        from kafka_cassandra_plugin_spark.operators.lm import (
            apply_ppl_cutoffs,
            ppl_buckets_by_rank,
            ppl_cutoffs,
        )

        ppl = self._scored(spark, sf_dir)
        cuts = ppl_cutoffs(ppl)
        boundary = {
            round(v, 4)
            for r in cuts.collect()
            for v in (r.head_max, r.middle_max)
            if v is not None
        }
        n_langs = cuts.count()
        by_rank = {r.doc_id: r.ppl_bucket
                   for r in ppl_buckets_by_rank(ppl).collect()}
        by_cut = {
            r.doc_id: (r.ppl_bucket, r.ppl)
            for r in apply_ppl_cutoffs(ppl, cuts).collect()
        }
        assert set(by_rank) == set(by_cut)
        order = {"head": 0, "middle": 1, "tail": 2}
        n_agree = 0
        parity_disagreements = 0
        for doc_id, (bucket, p) in by_cut.items():
            if by_rank[doc_id] is None:
                assert bucket is None
                continue
            if p is not None and round(p, 4) in boundary:
                # boundary tie: cutoff form takes the lower bucket
                assert order[bucket] <= order[by_rank[doc_id]]
                continue
            if bucket != by_rank[doc_id]:
                assert abs(order[bucket] - order[by_rank[doc_id]]) == 1, (
                    doc_id)
                parity_disagreements += 1
                continue
            n_agree += 1
        # at most one parity slip per (language, boundary)
        assert parity_disagreements <= 2 * n_langs
        assert n_agree > 10 * parity_disagreements

    def test_apply_cutoffs_is_broadcast_map_only(self, spark, sf_dir):
        """The scale path: the corpus side of apply_ppl_cutoffs must
        not shuffle - cutoffs broadcast, bucketing is a projection."""
        from kafka_cassandra_plugin_spark.operators.lm import (
            apply_ppl_cutoffs,
            ppl_cutoffs,
        )

        ppl = self._scored(spark, sf_dir)
        cuts = ppl_cutoffs(ppl).localCheckpoint()  # cutoffs precomputed
        plan = apply_ppl_cutoffs(
            ppl.localCheckpoint(), cuts
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan

    def test_extra_cutoff_columns_do_not_leak(self, spark, sf_dir):
        """Round-9 ADVICE: a user-supplied cutoffs table with extra
        columns (ppl_cutoffs itself ships n_scored) must not leak
        them into the labeled output — only ppl_df's columns plus the
        bucket come back."""
        from kafka_cassandra_plugin_spark.operators.lm import (
            apply_ppl_cutoffs,
            ppl_cutoffs,
        )

        ppl = self._scored(spark, sf_dir)
        cuts = ppl_cutoffs(ppl).withColumn(
            "debug_note", F.lit("do-not-leak"))
        out = apply_ppl_cutoffs(ppl, cuts)
        assert set(out.columns) == set(ppl.columns) | {"ppl_bucket"}

    def test_approx_cutoffs_branch(self, spark, sf_dir):
        """The exact=False (approx_percentile one-pass sketch) branch
        - the 100-TB path - returns the same schema, ordered cutoffs,
        and values close to the exact form on this small corpus."""
        from kafka_cassandra_plugin_spark.operators.lm import ppl_cutoffs

        ppl = self._scored(spark, sf_dir)
        exact = {r.lang: r for r in ppl_cutoffs(ppl, exact=True).collect()}
        approx = {r.lang: r for r in ppl_cutoffs(ppl, exact=False).collect()}
        assert set(exact) == set(approx)
        for lang, a in approx.items():
            e = exact[lang]
            assert a.n_scored == e.n_scored
            assert a.head_max <= a.middle_max
            # sketch accuracy 10k on a few-hundred-row group: near-exact
            assert abs(a.head_max - e.head_max) <= 0.05 * max(e.head_max, 1)
            assert abs(a.middle_max - e.middle_max) <= (
                0.05 * max(e.middle_max, 1))
