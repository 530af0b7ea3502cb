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
