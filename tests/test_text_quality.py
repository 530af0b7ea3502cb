"""Round-5 depth ops (SURVEY §2.5 D10/D11): Gopher-style repetition
signals and exact 13-gram-collision decontamination.

Both are oracle-compared against DuckDB at sf0.01 through the SAME
harness the declared queries use (the driver's 50-query verdict window
is full, so these run their oracle here instead - equal rigor, recorded
by pytest rather than CORRECTNESS_r*.json).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import oracle
from kafka_cassandra_plugin_spark.operators import contamination as C
from kafka_cassandra_plugin_spark.operators import text as T
from kafka_cassandra_plugin_spark.queries import llm_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestRepetitionProfile:
    def test_repeated_token_doc_fails_thresholds(self, spark):
        # "a a ... a": every 2-gram is "a a" -> top_2gram_frac well over
        # the 0.20 threshold; every 5-gram duplicated -> dup_5gram 1.0
        df = _docs(spark, [(1, " ".join(["a"] * 40))])
        r = T.repetition_profile(df).collect()[0]
        assert r.top_2gram_frac > 1.0  # overlapping-occurrence proxy
        assert r.dup_5gram_frac == 1.0
        assert not r.passes_repetition

    def test_distinct_long_doc_passes(self, spark):
        text = " ".join(f"w{i}" for i in range(60))
        r = T.repetition_profile(_docs(spark, [(1, text)])).collect()[0]
        assert r.dup_line_frac == 0.0
        assert r.top_2gram_frac == pytest.approx(2 / 60)
        assert r.dup_5gram_frac == 0.0
        assert r.passes_repetition

    def test_line_signals(self, spark):
        # 3 non-empty lines, 'xx' duplicated: dup_line_frac = 1 - 2/3;
        # dup chars = 4 of 7 total line chars
        df = _docs(spark, [(1, "xx\nxx\nyyy\n\n")])
        r = T.repetition_profile(df).collect()[0]
        assert r.dup_line_frac == pytest.approx(1 - 2 / 3)
        assert r.dup_line_char_frac == pytest.approx(4 / 7)

    def test_short_doc_no_grams(self, spark):
        # fewer tokens than the gram width -> zero signal, no [1,0]
        # descending-sequence blowup
        r = T.repetition_profile(_docs(spark, [(1, "one two")])).collect()[0]
        assert r.top_3gram_frac == 0.0
        assert r.dup_5gram_frac == 0.0

    def test_map_only_plan(self, spark, sf_dir):
        from kafka_cassandra_plugin_spark.catalog import Catalog

        d = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        plan = T.repetition_profile(d)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure map stage: no shuffle at all

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.repetition_signals(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.REPETITION_SIGNALS_SQL,
                           name="repetition_signals")
        assert n > 0


class TestNgramCollision:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        base = " ".join(f"tok{i}" for i in range(30))
        other = " ".join(f"alt{i}" for i in range(30))
        return _docs(spark, [(1, base), (2, other)])

    def test_verbatim_span_is_caught(self, spark, corpus):
        # benchmark doc embeds a 15-token span of doc 1 inside fresh text
        span = " ".join(f"tok{i}" for i in range(5, 20))
        bench = _docs(spark, [(100, f"intro words {span} outro words")])
        links = C.ngram_collision_links(corpus, bench, n=13).collect()
        assert [(r.corpus_id, r.bench_id) for r in links] == [(1, 100)]
        # 15-token span -> 3 distinct shared 13-grams
        assert links[0].n_shared == 3

    def test_disjoint_docs_no_links(self, spark, corpus):
        bench = _docs(spark, [(100, " ".join(f"b{i}" for i in range(30)))])
        assert C.ngram_collision_links(corpus, bench, n=13).count() == 0

    def test_repeated_span_counts_distinct_grams_once(self, spark, corpus):
        span = " ".join(f"tok{i}" for i in range(0, 13))
        bench = _docs(spark, [(100, f"{span} filler {span}")])
        links = C.ngram_collision_links(corpus, bench, n=13).collect()
        assert links[0].n_shared == 1

    def test_hash_and_raw_paths_agree(self, spark, corpus):
        span = " ".join(f"tok{i}" for i in range(10, 26))
        bench = _docs(spark, [(100, f"x {span} y"), (101, "short doc")])
        a = sorted(
            C.ngram_collision_links(corpus, bench, n=13, hash_fn="raw").collect()
        )
        b = sorted(
            C.ngram_collision_links(corpus, bench, n=13, hash_fn="xxhash64").collect()
        )
        assert a == b

    def test_decontaminate_ngrams_removes_linked_only(self, spark, corpus):
        span = " ".join(f"tok{i}" for i in range(5, 20))
        bench = _docs(spark, [(100, f"q: {span} ?")])
        kept = C.decontaminate_ngrams(corpus, bench, n=13)
        assert [r.doc_id for r in kept.collect()] == [2]

    def test_bench_side_is_broadcast(self, spark, corpus):
        bench = _docs(spark, [(100, "a b c")])
        plan = (
            C.ngram_collision_links(corpus, bench, n=13)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.decontam_ngram13(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.DECONTAM_NGRAM13_SQL,
                           name="decontam_ngram13")
        assert n > 0


class TestDecontamJaccardOracle:
    """D6's Jaccard-threshold contamination links, fully DuckDB-oracled
    under the portable md5 MinHash family (banding pinned 16x4; at
    threshold 0.8 candidate recall ~0.9998, so banding is deterministic
    evidence in both engines)."""

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.decontam_jaccard(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.DECONTAM_JACCARD_SQL,
                           name="decontam_jaccard")
        assert n > 0


class TestQualityReport:
    """quality_report: the per-(source, lang) curation dashboard."""

    def test_fractions_and_counts(self, spark):
        varied = " ".join(f"word{i}" for i in range(120))
        rows = [
            (1, varied, "s1", "en"),            # clean, passes both gates
            (2, "spam ham " * 50, "s1", "en"),  # repetitive
            (3, varied, "s1", "en"),            # exact bag-dup of 1
            (4, "!!!", "s2", "de"),             # junk quality
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string"
        )
        got = {(r.source, r.lang): r for r in T.quality_report(df).collect()}
        s1 = got[("s1", "en")]
        assert s1.n_docs == 3
        assert s1.frac_repetition_pass == pytest.approx(2 / 3, abs=1e-4)
        assert s1.fp_distinct_ratio == pytest.approx(2 / 3, abs=1e-4)
        s2 = got[("s2", "de")]
        assert s2.frac_quality_pass == 0.0

    def test_two_stage_agg_plan(self, spark, sf_dir):
        from kafka_cassandra_plugin_spark.catalog import Catalog

        d = Catalog(spark, sf_dir).documents
        plan = T.quality_report(d)._jdf.queryExecution().executedPlan().toString()
        # one hash-aggregate pair around one exchange (plus the orderBy
        # range exchange): never more than 2 Exchanges total
        assert plan.count("Exchange") <= 3

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.quality_report_by_group(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.QUALITY_REPORT_SQL,
                           name="quality_report")
        assert n > 0


class TestGopherQuality:
    """D28 (round 9): the Gopher A1.1 quality rule block."""

    GOOD = ("the data " + " ".join(f"point{i} value{i}" for i in range(30))
            + " with that and of")

    def _prof(self, spark, rows, **kw):
        return T.gopher_quality_profile(_docs(spark, rows), **kw)

    def test_good_doc_passes(self, spark):
        r = self._prof(spark, [(1, self.GOOD)]).collect()[0]
        assert r.passes_gopher_quality, r

    def test_word_count_bounds(self, spark):
        short = "the of " + " ".join(f"word{i}" for i in range(10))
        r = self._prof(spark, [(1, short)]).collect()[0]
        assert r.word_count == 12 and not r.passes_gopher_quality
        # lowering the floor flips it
        r2 = self._prof(spark, [(1, short)], min_words=5).collect()[0]
        assert r2.passes_gopher_quality

    def test_mean_word_len_bounds(self, spark):
        # 60 single-char words: mean length 1 < 3
        doc = "the of " + " ".join(["a"] * 58)
        r = self._prof(spark, [(1, doc)]).collect()[0]
        assert r.mean_word_len < 3 and not r.passes_gopher_quality

    def test_symbol_ratio(self, spark):
        doc = self.GOOD + " " + " ".join(["#"] * 12)
        r = self._prof(spark, [(1, doc)]).collect()[0]
        assert r.symbol_ratio > 0.1 and not r.passes_gopher_quality
        # '...' counts once per triple, '…' once per char
        d2 = self._prof(spark, [(2, "the of a... b… c")]).collect()[0]
        assert d2.symbol_ratio == pytest.approx(2 / 5)

    def test_bullet_lines(self, spark):
        body = self.GOOD.split()
        lines = "\n".join("• " + w for w in body)
        r = self._prof(spark, [(1, lines)]).collect()[0]
        assert r.bullet_frac == 1.0 and not r.passes_gopher_quality
        # dash and star prefixes count as bullets too
        d2 = self._prof(spark, [(2, "- x\n* y\nplain")]).collect()[0]
        assert d2.bullet_frac == pytest.approx(2 / 3)

    def test_ellipsis_lines(self, spark):
        doc = "\n".join([self.GOOD + "...", self.GOOD + "…", self.GOOD])
        r = self._prof(spark, [(1, doc)]).collect()[0]
        assert r.ellipsis_frac == pytest.approx(2 / 3)
        assert not r.passes_gopher_quality

    def test_alpha_fraction(self, spark):
        doc = self.GOOD + " " + " ".join(str(i) for i in range(40))
        r = self._prof(spark, [(1, doc)]).collect()[0]
        assert r.alpha_frac < 0.8 and not r.passes_gopher_quality

    def test_stop_hits_requires_two(self, spark):
        doc = " ".join(f"w{i}" for i in range(60)) + " the"
        r = self._prof(spark, [(1, doc)]).collect()[0]
        assert r.stop_hits == 1 and not r.passes_gopher_quality
        r2 = self._prof(spark, [(1, doc + " with")]).collect()[0]
        assert r2.stop_hits == 2

    def test_empty_and_null(self, spark):
        rows = self._prof(spark, [(1, ""), (2, None)]).collect()
        for r in rows:
            assert r.word_count in (0, None) or r.word_count == 0
            assert not r.passes_gopher_quality

    def test_map_only_no_python(self, spark):
        from kafka_cassandra_plugin_spark import plans as P

        df = self._prof(spark, [(1, self.GOOD)])
        assert P.count_exchanges(df) == 0
        plan = P.formatted_plan(df)
        assert "EvalPython" not in plan

    def test_oracle_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.gopher_quality(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.GOPHER_QUALITY_SQL,
                           "gopher_quality")
        assert n > 0


class TestContaminationReport:
    """D33: per-benchmark-document leakage table.  Planted verbatim
    spans report near-total overlap, held-out docs near-zero, sub-n
    docs NULL (out of band); the corpus side reduces THROUGH the
    broadcast bench-gram set (plan-gated); full DuckDB oracle."""

    def _mk(self, spark):
        long_a = " ".join(f"alpha{i}" for i in range(30))
        long_b = " ".join(f"beta{i}" for i in range(30))
        corpus = spark.createDataFrame(
            [(1, long_a), (2, long_b), (3, "unrelated " * 20)],
            "doc_id int, text string",
        )
        bench = spark.createDataFrame(
            [
                (10, long_a),                          # fully leaked
                (11, long_a + " fresh tail " + " ".join(
                    f"new{i}" for i in range(20))),    # partially leaked
                (12, " ".join(f"clean{i}" for i in range(30))),  # clean
                (13, "too short"),                     # sub-n
            ],
            "doc_id int, text string",
        )
        return corpus, bench

    def test_overlap_fractions_and_null_band(self, spark):
        corpus, bench = self._mk(spark)
        rep = {r.bench_id: r for r in C.contamination_report(
            corpus, bench, n=13).collect()}
        assert rep[10].overlap_frac == 1.0 and rep[10].contaminated
        assert 0.0 < rep[11].overlap_frac < 1.0 and rep[11].contaminated
        # partial doc: exactly the grams fully inside the copied prefix
        assert rep[11].n_hit == 30 - 13 + 1
        assert rep[12].n_hit == 0 and rep[12].overlap_frac == 0.0
        assert rep[12].contaminated is False
        assert rep[13].n_grams == 0
        assert rep[13].overlap_frac is None
        assert rep[13].contaminated is None

    def test_min_hits_threshold(self, spark):
        """30-token fully-leaked doc: 30-13+1 = 18 distinct grams, all
        hit.  min_hits at/below 18 fires, 19 cannot."""
        corpus, bench = self._mk(spark)
        at18 = {r.bench_id: r for r in C.contamination_report(
            corpus, bench, n=13, min_hits=18).collect()}
        assert at18[10].n_grams == 18 and at18[10].n_hit == 18
        assert at18[10].contaminated is True
        at19 = {r.bench_id: r.contaminated for r in C.contamination_report(
            corpus, bench, n=13, min_hits=19).collect()}
        assert at19[10] is False

    def test_raw_equals_xxhash64(self, spark):
        corpus, bench = self._mk(spark)
        a = {(r.bench_id, r.n_grams, r.n_hit) for r in
             C.contamination_report(corpus, bench, n=13,
                                    hash_fn="raw").collect()}
        b = {(r.bench_id, r.n_grams, r.n_hit) for r in
             C.contamination_report(corpus, bench, n=13,
                                    hash_fn="xxhash64").collect()}
        assert a == b

    def test_corpus_side_reduces_through_broadcast(self, spark):
        corpus, bench = self._mk(spark)
        plan = C.contamination_report(
            corpus.localCheckpoint(), bench.localCheckpoint(), n=13
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_oracle_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.contamination_report_q(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.CONTAMINATION_REPORT_SQL,
                           "contamination_report")
        assert n > 0
