"""PII detection/redaction (SURVEY §2.5 D12): each detector fires on a
planted identifier and nothing else, redaction replaces every match in
canonical order, the whole operator is one map stage (zero Exchange),
the funnel's opt-in ``pii_heavy`` gate rejects with a disjoint reason,
and the planted-PII query hash-matches the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import oracle
from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import pii as P
from kafka_cassandra_plugin_spark.operators import pipeline as PL
from kafka_cassandra_plugin_spark.queries import llm_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


SAMPLES = {
    "email": "write to alice.smith+spam@mail.example.co today",
    "phone": "call 555-123-4567 or (415) 555-0199 x12",
    "ssn": "ssn is 123-45-6789 ok",
    "cc": "card 4111-1111-1111-1111 expires soon",
    "ipv4": "host 192.168.1.77 answered",
    "url": "see https://example.org/a?b=1#frag for details",
}


class TestDetectors:
    @pytest.mark.parametrize("kind", sorted(SAMPLES))
    def test_each_detector_fires_on_its_plant(self, spark, kind):
        df = P.pii_profile(_docs(spark, [(1, SAMPLES[kind])]))
        row = df.collect()[0]
        assert getattr(row, f"n_{kind}") >= 1, kind

    def test_clean_text_is_all_zero(self, spark):
        row = P.pii_profile(
            _docs(spark, [(1, "nothing sensitive in plain prose here")])
        ).collect()[0]
        assert row.pii_total == 0

    def test_phone_two_formats_counted(self, spark):
        row = P.pii_profile(_docs(spark, [(1, SAMPLES["phone"])])).collect()[0]
        assert row.n_phone == 2

    def test_ssn_not_double_counted_as_phone(self, spark):
        # 3-2-4 digit grouping must not satisfy the 3-3-4 phone pattern
        row = P.pii_profile(_docs(spark, [(1, SAMPLES["ssn"])])).collect()[0]
        assert (row.n_ssn, row.n_phone) == (1, 0)

    def test_cc_not_counted_as_phone(self, spark):
        row = P.pii_profile(_docs(spark, [(1, SAMPLES["cc"])])).collect()[0]
        assert (row.n_cc, row.n_phone) == (1, 0)

    def test_unknown_type_raises(self, spark):
        with pytest.raises(ValueError, match="unknown PII type"):
            P.pii_counts("text", types=["email", "nope"])


class TestRedaction:
    def test_every_plant_redacted(self, spark):
        text = " and ".join(SAMPLES.values())
        red = P.redact_pii(_docs(spark, [(1, text)])).collect()[0].text
        for token in ("[EMAIL]", "[PHONE]", "[SSN]", "[CC]", "[IPV4]", "[URL]"):
            assert token in red, token
        # nothing identifier-shaped survives a second profiling pass
        left = P.pii_profile(_docs(spark, [(1, red)])).collect()[0]
        assert left.pii_total == 0

    def test_redact_into_new_column_keeps_original(self, spark):
        out = P.redact_pii(
            _docs(spark, [(1, SAMPLES["email"])]), out_col="clean"
        ).collect()[0]
        assert "@" in out.text and "[EMAIL]" in out.clean

    def test_type_subset_only_redacts_those(self, spark):
        text = SAMPLES["email"] + " " + SAMPLES["ipv4"]
        red = P.redact_pii(
            _docs(spark, [(1, text)]), types=["email"]
        ).collect()[0].text
        assert "[EMAIL]" in red and "192.168.1.77" in red

    def test_url_redacted_before_email(self, spark):
        # userinfo URL: the email pattern would match inside it; order
        # guarantees the URL token wins and no [EMAIL] remnant appears
        red = P.redact_pii(
            _docs(spark, [(1, "at https://bob@example.com/x page")])
        ).collect()[0].text
        assert "[URL]" in red and "[EMAIL]" not in red


class TestPlanShape:
    def test_profile_and_redact_are_map_only(self, spark, sf_dir):
        d = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        df = P.redact_pii(P.pii_profile(d))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure map stage: no shuffle at all


class TestFunnelGate:
    @pytest.fixture(scope="class")
    def pii_batch(self, spark, sf_dir):
        docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        base = docs.filter(F.col("doc_id") % 2 == 1)
        # long enough to pass quality, saturated with identifiers
        leaky = _docs(spark, [(
            7_000_000,
            "please contact our support team by mail at help@example.com "
            "or by phone at 555-123-4567 from host 10.1.2.3 whenever "
            "anything in the nightly export process looks broken to you",
        )])
        return base.unionByName(leaky)

    def test_off_by_default(self, pii_batch):
        ann = PL.curate_annotated(pii_batch)
        row = ann.filter(F.col("doc_id") == 7_000_000).collect()[0]
        assert row.reject_reason is None

    def test_opt_in_rejects_with_disjoint_reason(self, pii_batch):
        ann = PL.curate_annotated(pii_batch, max_pii=0)
        row = ann.filter(F.col("doc_id") == 7_000_000).collect()[0]
        assert row.quality >= 0.5  # it got PAST the quality gate
        assert row.reject_reason == "pii_heavy"
        assert row.split is None

    def test_threshold_is_a_budget_not_a_switch(self, pii_batch):
        # the plant carries 3 identifiers: a budget of 3 lets it through
        ann = PL.curate_annotated(pii_batch, max_pii=3)
        row = ann.filter(F.col("doc_id") == 7_000_000).collect()[0]
        assert row.reject_reason is None

    def test_funnel_still_partitions_input(self, pii_batch):
        ann = PL.curate_annotated(pii_batch, max_pii=0)
        assert ann.count() == pii_batch.count()
        assert ann.select("doc_id").distinct().count() == pii_batch.count()


class TestOracle:
    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.pii_redaction(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.PII_REDACTION_SQL,
                           name="pii_redaction")
        assert n > 0
