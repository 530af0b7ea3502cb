"""D20 exact substring-span dedup (Lee et al. 2022) + D21 CCNet line
dedup: sub-document dedup.

Gates: planted repeated passages are found as maximal spans with the
canonical copy exempted; span removal reassembles exactly the
uncovered tokens; raw and xxhash64 keys agree; duplicated lines drop
corpus-wide under CCNet normalization with originals preserved; plan
shapes (no cartesian, no Python eval); and both ops DuckDB-oracle at
sf0.01 under the §2.4 canonical protocol.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators.substring import (
    dedup_lines,
    duplicated_line_counts,
    duplicated_ngram_spans,
    remove_duplicated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


PASSAGE = " ".join(f"p{i}" for i in range(12))  # 12 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    """Doc 1 carries the passage (canonical); docs 2 and 3 quote it
    inside distinct surroundings; doc 4 is clean; doc 5 is too short
    to window."""
    return _docs(spark, [
        (1, f"{PASSAGE} tail1 tail2 tail3"),
        (2, f"lead2a lead2b {PASSAGE} end2"),
        (3, f"x3 y3 z3 w3 {PASSAGE}"),
        (4, " ".join(f"c{i}" for i in range(20))),
        (5, "tiny doc"),
    ])


class TestSpans:
    def test_planted_passage_found_canonical_exempt(self, corpus):
        spans = {
            (r.doc_id, r.span_start, r.span_end)
            for r in duplicated_ngram_spans(corpus, n=12).collect()
        }
        # doc 1 holds the canonical (min doc_id, start) occurrence
        assert not any(d == 1 for d, *_ in spans)
        # docs 2 and 3: the 12-token passage at its local offset
        assert (2, 2, 14) in spans
        assert (3, 4, 16) in spans
        assert not any(d in (4, 5) for d, *_ in spans)

    def test_overlapping_windows_merge_to_maximal_span(self, spark):
        # a 15-token passage duplicated verbatim: with n=12 there are
        # 4 window starts -> ONE maximal [0, 15) span in the copy
        passage = " ".join(f"q{i}" for i in range(15))
        docs = _docs(spark, [(1, passage), (2, passage)])
        spans = duplicated_ngram_spans(docs, n=12).collect()
        assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [
            (2, 0, 15)
        ]

    def test_keep_first_false_marks_every_copy(self, spark):
        passage = " ".join(f"r{i}" for i in range(12))
        docs = _docs(spark, [(1, passage), (2, passage)])
        spans = duplicated_ngram_spans(docs, n=12, keep_first=False)
        assert {r.doc_id for r in spans.collect()} == {1, 2}

    def test_min_count_threshold(self, spark):
        passage = " ".join(f"s{i}" for i in range(12))
        docs = _docs(spark, [(1, passage), (2, passage)])
        assert duplicated_ngram_spans(docs, n=12, min_count=3).count() == 0

    def test_raw_and_xxhash_agree(self, corpus):
        a = sorted(map(tuple, duplicated_ngram_spans(
            corpus, n=12, hash_fn="raw").collect()))
        b = sorted(map(tuple, duplicated_ngram_spans(
            corpus, n=12, hash_fn="xxhash64").collect()))
        assert a == b and a

    def test_removal_reassembles_uncovered_tokens(self, corpus):
        out = {r.doc_id: r.text for r in
               remove_duplicated_spans(corpus, n=12).collect()}
        assert out[1] == f"{PASSAGE} tail1 tail2 tail3"  # canonical kept
        assert out[2] == "lead2a lead2b end2"
        assert out[3] == "x3 y3 z3 w3"
        assert out[4] == " ".join(f"c{i}" for i in range(20))
        assert out[5] == "tiny doc"

    def test_fully_covered_doc_becomes_empty_not_dropped(self, spark):
        passage = " ".join(f"t{i}" for i in range(12))
        docs = _docs(spark, [(1, passage), (2, passage)])
        out = {r.doc_id: r.text for r in
               remove_duplicated_spans(docs, n=12).collect()}
        assert out[1] == passage and out[2] == ""

    def test_plan_no_cartesian_no_python(self, corpus):
        from kafka_cassandra_plugin_spark import plans as P

        for df in (duplicated_ngram_spans(corpus, n=12),
                   remove_duplicated_spans(corpus, n=12)):
            plan = P.formatted_plan(df)
            assert "CartesianProduct" not in plan
            assert "EvalPython" not in plan

    def test_hash_fn_guard(self, corpus):
        with pytest.raises(ValueError, match="hash_fn"):
            duplicated_ngram_spans(corpus, n=12, hash_fn="md5").collect()


HEADER = "Copyright Notice All Rights Reserved"


@pytest.fixture(scope="module")
def lined(spark):
    return _docs(spark, [
        (1, f"{HEADER}\nunique one\nPage 3 of 12"),
        (2, f"{HEADER}\nunique two\npage 9 of 47"),
        (3, "all original\nnothing shared"),
        (4, f"{HEADER}\n\nunique four"),
    ])


class TestLines:
    def test_duplicated_header_dropped_except_canonical(self, lined):
        out = {r.doc_id: r.text for r in dedup_lines(lined).collect()}
        assert out[1].splitlines()[0] == HEADER  # canonical survives
        assert HEADER not in out[2] and HEADER not in out[4]
        assert "unique two" in out[2] and "unique four" in out[4]
        assert out[3] == "all original\nnothing shared"

    def test_normalization_buckets_case_and_digits(self, lined):
        # "Page 3 of 12" and "page 9 of 47" share a normalized key:
        # one canonical survives, the other drops
        out = {r.doc_id: r.text for r in dedup_lines(lined).collect()}
        pages = [ln for d in (1, 2) for ln in out[d].splitlines()
                 if "of" in ln.lower() and "page" in ln.lower()]
        assert pages == ["Page 3 of 12"]  # original text, min-id copy

    def test_normalize_off_keeps_distinct_raw_lines(self, lined):
        out = {r.doc_id: r.text for r in
               dedup_lines(lined, normalize=False).collect()}
        assert "Page 3 of 12" in out[1] and "page 9 of 47" in out[2]

    def test_empty_lines_pass_through(self, lined):
        out = {r.doc_id: r.text for r in dedup_lines(lined).collect()}
        assert out[4].splitlines()[0] == ""  # header dropped, blank kept

    def test_keep_first_false_strips_all_copies(self, lined):
        out = {r.doc_id: r.text for r in
               dedup_lines(lined, keep_first=False).collect()}
        assert all(HEADER not in t for t in out.values())

    def test_counts_surface(self, lined):
        counts = {r.key: r.cnt for r in duplicated_line_counts(
            lined, hash_fn="raw").collect()}
        norm_header = HEADER.lower()
        assert counts[norm_header] == 3
        assert counts["page 0 of 00"] == 2

    def test_raw_and_xxhash_agree(self, lined):
        a = sorted(map(tuple, dedup_lines(lined, hash_fn="raw").collect()))
        b = sorted(map(tuple,
                       dedup_lines(lined, hash_fn="xxhash64").collect()))
        assert a == b


class TestOracle:
    """Both declared-shape queries + their SQL live in queries/llm_ops
    (the tier-D convention) so the bench sf1 oracle re-checks the same
    pairs this test pins at sf0.01."""

    def test_spans_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            DEDUP_SUBSTRING_SQL,
            dedup_substring_spans,
        )

        df = dedup_substring_spans(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, DEDUP_SUBSTRING_SQL, "dedup_substring")
        planted = duck.execute(
            "SELECT count(*) FROM documents WHERE doc_id % 5 = 0 AND "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
            "x -> x <> '')) >= 25"
        ).fetchone()[0]
        # every planted quote is a (non-canonical) span, so n >= planted
        assert n >= planted > 0

    def test_lines_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            DEDUP_LINES_SQL,
            dedup_lines_boilerplate,
        )

        df = dedup_lines_boilerplate(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, DEDUP_LINES_SQL, "dedup_lines")
        assert n == duck.execute(
            "SELECT count(*) FROM documents"
        ).fetchone()[0]


class TestLiteralSeparator:
    def test_regex_metachar_separator_is_literal(self, spark):
        """sep='|' (a regex metachar) must split on the literal pipe:
        an unquoted F.split would explode per character and mangle
        every document on rebuild."""
        docs = _docs(spark, [
            (1, "shared line|unique one"),
            (2, "shared line|unique two"),
        ])
        out = {r.doc_id: r.text
               for r in dedup_lines(docs, sep="|", hash_fn="raw").collect()}
        assert out[1] == "shared line|unique one"   # canonical copy kept
        assert out[2] == "unique two"               # duplicate line dropped

    def test_dot_separator(self, spark):
        docs = _docs(spark, [(1, "a.b"), (2, "a.c")])
        out = {r.doc_id: r.text
               for r in dedup_lines(docs, sep=".", hash_fn="raw").collect()}
        assert out[1] == "a.b"
        assert out[2] == "c"
