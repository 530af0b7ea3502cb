"""D27 BPE tokenizer (Sennrich/Haddow/Birch ACL 2016).

Gates: the trained merge sequence EXACTLY matches an independent
naive reference trainer (full pair recount every iteration —
structurally different from the engine's incremental maintenance, so
an update bug in either diverges the sequence); encoding matches the
reference greedy encoder word-for-word; decode-roundtrip losslessness;
determinism across repeated trains; min_count / max_types governors;
save/load; plan shapes (ONE Exchange for the histogram, encode
map-only with the declared ArrowEvalPython only); the histogram
DuckDB oracle runs through the shared tier-D harness in
test_llm_ops.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.bpe import (
    END,
    BpeTokenizer,
    word_histogram,
)

# -- independent reference implementation -----------------------------------


def _ref_train(hist: dict[str, int], num_merges: int):
    """Naive reference: recount EVERY pair from scratch each
    iteration; argmax by (count, then lexicographically smallest
    pair)."""
    words = {w: [*w, END] for w in hist}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple, int] = {}
        for w, sym in words.items():
            c = hist[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] <= 0:
            break
        merges.append(best)
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference greedy encoder: repeatedly apply the lowest-rank
    applicable merge to all its occurrences."""
    ranks = {p: i for i, p in enumerate(merges)}
    sym = [*word, END]
    while len(sym) > 1:
        pairs = [(ranks[(a, b)], (a, b)) for a, b in zip(sym, sym[1:])
                 if (a, b) in ranks]
        if not pairs:
            break
        _, (a, b) = min(pairs)
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


# deterministic synthetic corpus: repeated morphology so merges are
# meaningful ("low", "lower", "lowest", "newer", "wider" — the
# Sennrich paper's running example family)
CORPUS = [
    (0, "low low low lower lower lowest"),
    (1, "new newer newest wide wider widest"),
    (2, "low lower newer wider low low"),
    (3, "the lowest and the widest of the new"),
    (4, "low low lower lower lower newest newest"),
]


def _hist_of(rows) -> dict[str, int]:
    h: dict[str, int] = {}
    for _, t in rows:
        for w in t.split():
            h[w] = h.get(w, 0) + 1
    return h


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def tok(docs):
    return BpeTokenizer.train(docs, num_merges=40)


class TestTrain:
    def test_merges_match_reference_exactly(self, docs, tok):
        ref = _ref_train(_hist_of(CORPUS), 40)
        assert tok.merges == ref

    def test_merges_match_reference_small_budget(self, docs):
        t = BpeTokenizer.train(docs, num_merges=7)
        assert t.merges == _ref_train(_hist_of(CORPUS), 7)

    def test_train_exhausts_when_no_pairs_left(self, spark):
        d = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
        t = BpeTokenizer.train(d, num_merges=100)
        # "ab</w>" fully merges in 2 steps; no third merge exists
        assert t.merges == _ref_train({"ab": 2}, 100)
        assert len(t.merges) == 2

    def test_deterministic(self, docs):
        a = BpeTokenizer.train(docs, num_merges=25)
        b = BpeTokenizer.train(docs, num_merges=25)
        assert a.merges == b.merges

    def test_train_from_histogram_frame(self, spark, docs, tok):
        h = word_histogram(docs)
        t = BpeTokenizer.train(h, num_merges=40)
        assert t.merges == tok.merges

    def test_lowercase_folds_types(self, spark):
        d = spark.createDataFrame(
            [(0, "Low low LOW")], "doc_id long, text string")
        t = BpeTokenizer.train(d, num_merges=5, lowercase=True)
        assert t.merges == _ref_train({"low": 3}, 5)


class TestHistogram:
    def test_counts(self, spark, docs):
        got = {r["word"]: r["count"]
               for r in word_histogram(docs).collect()}
        assert got == _hist_of(CORPUS)

    def test_min_count(self, spark, docs):
        ref = {w: c for w, c in _hist_of(CORPUS).items() if c >= 3}
        got = {r["word"]: r["count"]
               for r in word_histogram(docs, min_count=3).collect()}
        assert got == ref

    def test_max_types_deterministic_top(self, spark, docs):
        full = sorted(_hist_of(CORPUS).items(),
                      key=lambda wc: (-wc[1], wc[0]))
        got = [(r["word"], r["count"])
               for r in word_histogram(docs, max_types=4)
               .orderBy(F.col("count").desc(), "word").collect()]
        assert got == full[:4]

    def test_one_exchange(self, spark, docs):
        # explode + partial agg + ONE hash shuffle + final agg
        assert P.count_exchanges(word_histogram(docs)) == 1


class TestEncode:
    def test_matches_reference_per_word(self, tok):
        for w in _hist_of(CORPUS):
            assert tok._encode_word(w, {}) == _ref_encode(w, tok.merges), w

    def test_dataframe_encode(self, spark, docs, tok):
        rows = tok.encode(docs).orderBy("doc_id").collect()
        for (doc_id, text), r in zip(CORPUS, rows):
            ref = [t for w in text.split()
                   for t in _ref_encode(w, tok.merges)]
            assert r["bpe_tokens"] == ref, doc_id

    def test_roundtrip_lossless(self, docs, tok):
        rows = tok.encode(docs).orderBy("doc_id").collect()
        for (doc_id, text), r in zip(CORPUS, rows):
            rebuilt = "".join(r["bpe_tokens"]).replace(END, " ").strip()
            assert rebuilt == " ".join(text.split()), doc_id

    def test_oov_word_falls_back_to_chars(self, spark, tok):
        d = spark.createDataFrame([(0, "zzqxj")], "doc_id long, text string")
        got = tok.encode(d).first()["bpe_tokens"]
        assert got == _ref_encode("zzqxj", tok.merges)
        assert "".join(got) == "zzqxj" + END

    def test_null_and_empty_text(self, spark, tok):
        d = spark.createDataFrame([(0, None), (1, ""), (2, "  ")],
                                  "doc_id long, text string")
        rows = tok.encode(d).orderBy("doc_id").collect()
        assert [r["bpe_tokens"] for r in rows] == [[], [], []]

    def test_token_count(self, spark, docs, tok):
        rows = tok.token_count(docs).orderBy("doc_id").collect()
        for (doc_id, text), r in zip(CORPUS, rows):
            ref = sum(len(_ref_encode(w, tok.merges))
                      for w in text.split())
            assert r["bpe_token_count"] == ref, doc_id

    def test_encode_map_only(self, docs, tok):
        plan = P.formatted_plan(tok.encode(docs))
        assert P.count_exchanges(tok.encode(docs)) == 0
        assert "ArrowEvalPython" in plan  # the declared slow path


class TestPersist:
    def test_save_load_identical(self, spark, docs, tok, tmp_path):
        tok.save(spark, str(tmp_path / "bpe"))
        back = BpeTokenizer.load(spark, str(tmp_path / "bpe"))
        assert back.merges == tok.merges
        assert back.lowercase == tok.lowercase
        got = back.encode(docs).orderBy("doc_id").collect()
        want = tok.encode(docs).orderBy("doc_id").collect()
        assert [r["bpe_tokens"] for r in got] == [
            r["bpe_tokens"] for r in want]

    def test_to_frame_shape(self, spark, tok):
        rows = tok.to_frame(spark).orderBy("rank").collect()
        assert [(r["left"], r["right"]) for r in rows] == tok.merges


class TestOracle:
    def test_histogram_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            BPE_HISTOGRAM_SQL,
            bpe_histogram,
        )

        df = bpe_histogram(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, BPE_HISTOGRAM_SQL, "bpe_histogram")
        assert n > 0

    def test_token_counts_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            bpe_token_counts_oracle,
        )

        df, sql = bpe_token_counts_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, "bpe_token_counts")
        assert n > 0


class TestWordHistogramIncremental:
    """The D18/D19 replay-discipline standard, applied from day one:
    accumulate == whole-build, replay overwrites, exclude_batch
    as-of, compact keeps the in-flight batch hideable, compact onto
    own path lossless, trained tokenizer identical."""

    BATCHES = [
        [(0, "low low lower"), (1, "new newer lowest")],
        [(2, "low wider widest the"), (3, "newer newest of the")],
        [(4, "low lower lower wide the of")],
    ]

    def _whole(self):
        return _hist_of([r for b in self.BATCHES for r in b])

    def _got(self, wh):
        return {r["word"]: r["count"] for r in wh.histogram().collect()}

    @pytest.fixture()
    def accum(self, spark, tmp_path):
        from kafka_cassandra_plugin_spark.operators.bpe import WordHistogram

        wh = WordHistogram.init(spark, str(tmp_path / "wh"))
        for i, rows in enumerate(self.BATCHES):
            wh = wh.append_batch(
                spark.createDataFrame(rows, "doc_id long, text string"), i)
        return wh

    def test_accumulate_equals_whole_build(self, accum):
        assert self._got(accum) == self._whole()

    def test_replay_overwrites_not_double_counts(self, spark, accum):
        replay = spark.createDataFrame(self.BATCHES[1],
                                       "doc_id long, text string")
        wh = accum.append_batch(replay, 1)
        assert self._got(wh) == self._whole()

    def test_exclude_batch_is_as_of_predecessors(self, spark, accum):
        from kafka_cassandra_plugin_spark.operators.bpe import WordHistogram

        wh = WordHistogram.load(spark, accum.path, exclude_batch=2)
        assert self._got(wh) == _hist_of(self.BATCHES[0] + self.BATCHES[1])

    def test_compact_preserves_counts(self, spark, accum):
        wh = accum.compact()
        assert self._got(wh) == self._whole()
        # history really is consolidated: only batch=-1 remains
        import os

        batches = sorted(os.listdir(f"{accum.path}/counts"))
        assert [b for b in batches if b.startswith("batch=")] == ["batch=-1"]

    def test_compact_keeps_in_flight_batch_hideable(self, spark, accum):
        from kafka_cassandra_plugin_spark.operators.bpe import WordHistogram

        wh = accum.compact(exclude_batch=2)
        assert self._got(wh) == self._whole()
        asof = WordHistogram.load(spark, accum.path, exclude_batch=2)
        assert self._got(asof) == _hist_of(self.BATCHES[0] + self.BATCHES[1])

    def test_double_compact_lossless(self, spark, accum):
        wh = accum.compact().compact()
        assert self._got(wh) == self._whole()

    def test_trained_tokenizer_matches_whole_corpus(self, spark, accum):
        from kafka_cassandra_plugin_spark.operators.bpe import BpeTokenizer

        whole_rows = [(i, t) for i, (_, t) in
                      enumerate(r for b in self.BATCHES for r in b)]
        whole = BpeTokenizer.train(
            spark.createDataFrame(whole_rows, "doc_id long, text string"),
            num_merges=20)
        assert accum.train(num_merges=20).merges == whole.merges

    def test_negative_batch_id_raises(self, spark, accum):
        with pytest.raises(ValueError, match="batch_id"):
            accum.append_batch(
                spark.createDataFrame([(9, "x y")],
                                      "doc_id long, text string"), -1)

    def test_unsaved_append_raises(self, spark):
        from kafka_cassandra_plugin_spark.operators.bpe import WordHistogram

        wh = WordHistogram(
            spark.createDataFrame([], "word string, count long"), False)
        with pytest.raises(ValueError, match="init"):
            wh.append_batch(
                spark.createDataFrame([(9, "x y")],
                                      "doc_id long, text string"), 0)

    def test_load_missing_meta_raises(self, spark, tmp_path):
        from kafka_cassandra_plugin_spark.operators.bpe import WordHistogram

        with pytest.raises(ValueError, match="meta"):
            WordHistogram.load(spark, str(tmp_path / "nope"))

    def test_lowercase_convention_pinned_in_meta(self, spark, tmp_path):
        from kafka_cassandra_plugin_spark.operators.bpe import WordHistogram

        wh = WordHistogram.init(spark, str(tmp_path / "lc"), lowercase=True)
        wh = wh.append_batch(
            spark.createDataFrame([(0, "Low low LOW")],
                                  "doc_id long, text string"), 0)
        assert self._got(wh) == {"low": 3}
        assert wh.train(num_merges=3).lowercase is True


class TestTokenizerFertility:
    """D34: per-(source, lang) tokenizer efficiency.  Gates: hand
    arithmetic on a constructed corpus (fertility = tokens/words,
    chars_per_token; zero-word group NULL), a poorly-fitting group
    showing strictly higher fertility, and the full DuckDB oracle."""

    def test_hand_arithmetic_and_null_band(self, spark):
        from kafka_cassandra_plugin_spark.operators.bpe import (
            BpeTokenizer,
            tokenizer_fertility,
        )

        corpus = spark.createDataFrame(
            [(1, "aa aa aa aa", "s1", "en")] * 1,
            "doc_id int, text string, source string, lang string",
        )
        train = spark.createDataFrame(
            [(1, "aa aa")], "doc_id int, text string")
        # two merges: (a, </w>) by lexicographic tie-break, then
        # (a, a</w>) -> the whole word becomes ONE token
        tok = BpeTokenizer.train(train, num_merges=2)
        assert tok._encode_word("aa", {}) == ["aa</w>"]
        rep = {(r.source, r.lang): r for r in
               tokenizer_fertility(corpus, tok).collect()}
        r = rep[("s1", "en")]
        assert r.n_docs == 1 and r.words == 4
        assert r.bpe_tokens == 4          # each 'aa' encodes to 1 token
        assert r.fertility == 1.0
        assert r.chars_per_token == len("aa aa aa aa") / 4
        # empty-text group: zero words -> NULL fertility, not a crash
        empty = spark.createDataFrame(
            [(2, "   ", "s2", "xx")],
            "doc_id int, text string, source string, lang string",
        )
        r2 = {(q.source, q.lang): q for q in
              tokenizer_fertility(empty, tok).collect()}[("s2", "xx")]
        assert r2.words == 0 and r2.fertility is None

    def test_oov_group_shows_higher_fertility(self, spark):
        """A tokenizer trained on group A splits group B's unseen
        words into characters: fertility(B) > fertility(A)."""
        from kafka_cassandra_plugin_spark.operators.bpe import (
            BpeTokenizer,
            tokenizer_fertility,
        )

        a_text = "alpha beta gamma delta " * 5
        b_text = "zq xv wk pj " * 5
        corpus = spark.createDataFrame(
            [(1, a_text, "a", "en"), (2, b_text, "b", "xx")],
            "doc_id int, text string, source string, lang string",
        )
        tok = BpeTokenizer.train(
            corpus.filter("source = 'a'"), num_merges=64)
        rep = {r.source: r.fertility for r in
               tokenizer_fertility(corpus, tok).collect()}
        assert rep["b"] > rep["a"]

    def test_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            tokenizer_fertility_oracle,
        )

        df, sql = tokenizer_fertility_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, "tokenizer_fertility")
        assert n > 0
