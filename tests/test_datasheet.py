"""D29 corpus datasheet (Gebru et al. 2021): the per-(source, lang)
composition table — hand-computed cells, exact-quantile interpolation
pinned, dup-rate edge, token_share conservation, plan shape, DuckDB
oracle at sf0.01."""

from __future__ import annotations

import pytest

from kafka_cassandra_plugin_spark import oracle, plans as P
from kafka_cassandra_plugin_spark.operators.datasheet import corpus_datasheet
from kafka_cassandra_plugin_spark.queries import llm_ops

ROWS = [
    # (source, lang, text)
    ("a", "en", "one two three"),            # 3 tokens, 13 chars
    ("a", "en", "one two three"),            # exact dup
    ("a", "en", "four five six seven eight"),  # 5 tokens
    ("a", "de", "ein zwei"),                 # 2 tokens
    ("b", "en", "x"),                        # 1 token
]


@pytest.fixture(scope="module")
def sheet(spark):
    df = spark.createDataFrame(ROWS, "source string, lang string, text string")
    return {(r["source"], r["lang"]): r
            for r in corpus_datasheet(df).collect()}


class TestCells:
    def test_counts_and_token_mass(self, sheet):
        aen = sheet[("a", "en")]
        assert aen["n_docs"] == 3
        assert aen["total_tokens"] == 11
        assert aen["mean_tokens"] == pytest.approx(11 / 3)
        assert sheet[("a", "de")]["total_tokens"] == 2
        assert sheet[("b", "en")]["total_tokens"] == 1

    def test_exact_quantile_interpolation(self, sheet):
        # (3, 3, 5): median = 3 exactly; p90 interpolates
        # linearly at rank 0.9*(n-1) = 1.8 -> 3 + 0.8*(5-3) = 4.6
        aen = sheet[("a", "en")]
        assert aen["median_tokens"] == pytest.approx(3.0)
        assert aen["p90_tokens"] == pytest.approx(4.6)

    def test_dup_frac(self, sheet):
        # 3 docs, 2 distinct texts -> 1/3 duplicated
        assert sheet[("a", "en")]["dup_frac"] == pytest.approx(1 / 3)
        assert sheet[("a", "de")]["dup_frac"] == 0.0

    def test_token_share_conserves(self, sheet):
        assert sum(r["token_share"] for r in sheet.values()) == \
            pytest.approx(1.0)
        assert sheet[("a", "en")]["token_share"] == pytest.approx(11 / 14)

    def test_mean_chars(self, sheet):
        assert sheet[("b", "en")]["mean_chars"] == pytest.approx(1.0)


class TestPlanShape:
    def test_single_group_pass_no_python(self, spark):
        df = spark.createDataFrame(ROWS,
                                   "source string, lang string, text string")
        sheet = corpus_datasheet(df)
        plan = P.formatted_plan(sheet)
        assert "EvalPython" not in plan
        # count-distinct expands inside the same logical pass; the
        # single-partition token_share window adds one more — bound the
        # budget rather than pin an exact count
        assert P.count_exchanges(sheet) <= 4


class TestOracle:
    def test_datasheet_oracle_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.corpus_datasheet_report(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.CORPUS_DATASHEET_SQL,
                           "corpus_datasheet")
        assert n > 0
