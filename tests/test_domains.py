"""URL/domain-level filtering (SURVEY §2.5 D36): host/registrable-
domain extraction is correct on crafted URLs, literal and DataFrame
blocklists/allowlists agree, the verdict is one map stage for literal
lists (zero Exchange) and broadcast joins for frame lists (no corpus
shuffle), the funnel's opt-in stage-0 ``blocked_domain`` gate rejects
FIRST with a disjoint reason, the CurationSink applies a stored
blocklist every micro-batch without leaking blocked rows into any
store, and the report query hash-matches the DuckDB oracle at sf0.01."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import oracle
from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import domains as D
from kafka_cassandra_plugin_spark.operators import pipeline as PL
from kafka_cassandra_plugin_spark.queries import llm_ops


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, url: string")


class TestExtraction:
    @pytest.mark.parametrize("url,host", [
        ("https://docs.src7.example/123", "docs.src7.example"),
        ("http://WWW.Example.COM/path?q=1", "www.example.com"),
        ("https://user:pw@a.b.co.uk:8443/x#y", "a.b.co.uk"),
        ("ftp://mirror.kernel.org/pub", "mirror.kernel.org"),
        ("not a url at all", ""),
        ("/relative/path", ""),
    ])
    def test_url_host(self, spark, url, host):
        row = _urls(spark, [(1, url)]).select(D.url_host("url")).collect()[0]
        assert row.host == host

    @pytest.mark.parametrize("host,dom", [
        ("docs.src7.example", "src7.example"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("a.b.co.uk", "co.uk"),  # the documented naive-eTLD limitation
        ("", ""),
    ])
    def test_registrable_domain(self, spark, host, dom):
        row = (
            spark.createDataFrame([(host,)], "host: string")
            .select(D.registrable_domain("host"))
            .collect()[0]
        )
        assert row.domain == dom

    def test_synthetic_url_is_deterministic_and_sanitized(self, spark):
        df = spark.createDataFrame(
            [(5, "My Src!"), (5, "My Src!")], "doc_id: long, source: string"
        ).select(D.synthetic_url("source", "doc_id"))
        vals = [r.url for r in df.collect()]
        assert vals[0] == vals[1] == "https://docs.my-src-.example/5"

    def test_trailing_dot_host_cannot_bypass_blocklist(self, spark):
        """Round-14 advice: https://docs.bad.example./x is valid FQDN
        form; without the trailing-dot strip the registrable domain was
        'example.' and the row bypassed a bad.example blocklist entry
        despite being attributable."""
        rows = [(1, "https://docs.bad.example./x"),
                (2, "https://docs.bad.example.../y")]
        df = _urls(spark, rows)
        hosts = {r.doc_id: r.host for r in
                 df.select("doc_id", D.url_host("url")).collect()}
        assert hosts == {1: "docs.bad.example", 2: "docs.bad.example"}
        got = {r.doc_id: r.p for r in df.withColumn(
            "p", D.domain_gate("url", blocklist=["bad.example"])).collect()}
        assert got == {1: False, 2: False}

    def test_bare_string_list_raises(self, spark):
        """Round-14 advice: blocked_domains='bad.example' used to
        iterate characters into a no-op gate of single-char 'domains'."""
        with pytest.raises(TypeError, match="bare str"):
            D.domain_gate("url", blocklist="bad.example")
        with pytest.raises(TypeError, match="bare str"):
            D.domain_gate("url", allowlist="good.example")


class TestPsl:
    """Public-suffix-list eTLD+1 (round-14 verdict #4): the committed
    snapshot groups multi-label registry suffixes correctly, the frame
    path agrees with the literal path, a DuckDB mirror hash-agrees, and
    the naive/PSL divergence on the synthetic corpus is 0 (its URLs
    live under the IANA-reserved .example TLD by design)."""

    @pytest.mark.parametrize("host,dom", [
        ("a.b.co.uk", "b.co.uk"),          # the round-14 known-wrong row
        ("www.example.co.uk", "example.co.uk"),
        ("co.uk", "co.uk"),                # host IS a suffix: pass-through
        ("x.k12.ca.us", "x.k12.ca.us"),    # 3-label suffix, exactly +1
        ("www.school.k12.ca.us", "school.k12.ca.us"),
        ("deep.sub.act.edu.au", "sub.act.edu.au"),
        ("docs.src7.example", "src7.example"),  # non-PSL: naive rule
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("", ""),
    ])
    def test_registrable_domain_psl(self, spark, host, dom):
        row = (
            spark.createDataFrame([(host,)], "host: string")
            .select(D.registrable_domain("host", psl=D.psl_snapshot()))
            .collect()[0]
        )
        assert row.domain == dom

    def test_snapshot_loads_and_is_2_3_label_only(self):
        psl = D.psl_snapshot()
        assert len(psl) > 200
        assert all(1 <= s.count(".") <= 2 for s in psl)
        assert "co.uk" in psl and "k12.ca.us" in psl

    def test_frame_path_agrees_with_literal_path(self, spark):
        hosts = ["a.b.co.uk", "www.example.co.uk", "co.uk", "x.k12.ca.us",
                 "www.school.k12.ca.us", "deep.sub.act.edu.au",
                 "docs.src7.example", "example.com", "localhost",
                 "mirror.kernel.org", "a.b.c.d.e.gov.uk"]
        df = spark.createDataFrame([(h,) for h in hosts], "host: string")
        psl_df = spark.createDataFrame(
            [(s,) for s in D.psl_snapshot()], "suffix: string")
        lit = df.select(
            "host", D.registrable_domain("host", psl=D.psl_snapshot()))
        frm = D.registrable_domain_frame(df, psl_df)
        assert ({(r.host, r.domain) for r in lit.collect()}
                == {(r.host, r.domain) for r in frm.select(
                    "host", "domain").collect()})

    def test_frame_path_broadcasts_and_never_shuffles_corpus(self, spark):
        df = spark.range(100).selectExpr(
            "concat('h', id, '.co.uk') AS host")
        psl_df = spark.createDataFrame(
            [(s,) for s in D.psl_snapshot()], "suffix: string")
        plan = D.registrable_domain_frame(
            df, psl_df)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the suffix side may hash-exchange for its dedup aggregate (a
        # few hundred rows); the CORPUS side must never shuffle
        import re
        assert not re.search(r"Exchange hashpartitioning\([^)]*host", plan)

    def test_duckdb_mirror_agrees(self, spark, duck):
        """The PSL when-chain is oracle-expressible: the same snapshot
        as a DuckDB CASE over crafted hosts + the corpus's synthetic
        hosts produces identical domains."""
        hosts = ["a.b.co.uk", "www.example.co.uk", "co.uk", "x.k12.ca.us",
                 "www.school.k12.ca.us", "deep.sub.act.edu.au",
                 "docs.src7.example", "example.com", "localhost"]
        psl = D.psl_snapshot()
        spark_got = [
            r.domain for r in spark.createDataFrame(
                [(h,) for h in hosts], "host: string")
            .select(D.registrable_domain("host", psl=psl)).collect()
        ]
        case = D.psl_domain_sql_case("host", psl)
        duck_got = [
            r[0] for r in duck.execute(
                "SELECT " + case + " FROM (SELECT unnest(?) AS host)",
                [hosts]).fetchall()
        ]
        assert spark_got == duck_got

    def test_naive_psl_divergence_on_synthetic_corpus_is_zero(
            self, spark, oracle_sf_dir):
        """The corpus's synthetic URLs live under .example (IANA-
        reserved, never a multi-label registry suffix), so the naive
        and PSL groupings must agree on every row - the assertion that
        makes the naive default safe for the declared oracle query."""
        d = Catalog(spark, oracle_sf_dir).documents.select("doc_id", "source")
        hosts = d.withColumn("url", D.synthetic_url("source", "doc_id")) \
                 .select(D.url_host("url"))
        diverged = hosts.where(
            D.registrable_domain("host")
            != D.registrable_domain("host", psl=D.psl_snapshot())
        ).count()
        assert diverged == 0


class TestGateVerdicts:
    ROWS = [
        (1, "https://docs.good.example/1"),
        (2, "https://docs.bad.example/2"),
        (3, "https://sub.deep.bad.example/3"),   # subdomain of blocked
        (4, "totally-not-a-url"),                # unattributable
    ]

    def test_literal_blocklist(self, spark):
        out = _urls(spark, self.ROWS).withColumn(
            "p", D.domain_gate("url", blocklist=["bad.example"])
        )
        got = {r.doc_id: r.p for r in out.collect()}
        # blocklist blocks the registrable domain INCLUDING subdomains;
        # unattributable rows pass a pure blocklist (no origin to match)
        assert got == {1: True, 2: False, 3: False, 4: True}

    def test_literal_allowlist_rejects_unattributable(self, spark):
        out = _urls(spark, self.ROWS).withColumn(
            "p", D.domain_gate("url", allowlist=["good.example"])
        )
        got = {r.doc_id: r.p for r in out.collect()}
        assert got == {1: True, 2: False, 3: False, 4: False}

    def test_block_wins_over_allow(self, spark):
        out = _urls(spark, self.ROWS).withColumn(
            "p",
            D.domain_gate("url", blocklist=["good.example"],
                          allowlist=["good.example", "bad.example"]),
        )
        got = {r.doc_id: r.p for r in out.collect()}
        assert got == {1: False, 2: True, 3: True, 4: False}

    def test_neither_list_raises(self, spark):
        with pytest.raises(ValueError, match="needs blocklist"):
            D.domain_gate("url")
        df = _urls(spark, self.ROWS)
        with pytest.raises(ValueError, match="needs blocklist"):
            D.domain_gate_frame(df)

    def test_frame_lists_agree_with_literals(self, spark):
        df = _urls(spark, self.ROWS)
        bl = spark.createDataFrame([("BAD.example",)], "domain: string")
        al = spark.createDataFrame(
            [("good.example",), ("bad.example",)], "domain: string")
        lit = df.withColumn(
            "p", D.domain_gate("url", blocklist=["bad.example"],
                               allowlist=["good.example", "bad.example"]))
        frm = D.domain_gate_frame(df, blocklist=bl, allowlist=al,
                                  out_col="p")
        assert ({(r.doc_id, r.p) for r in lit.collect()}
                == {(r.doc_id, r.p) for r in frm.collect()})

    def test_literal_gate_is_map_only(self, spark, sf_dir):
        docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
        df = docs.select(
            D.domain_gate(D.synthetic_url("source", "doc_id"),
                          blocklist=["src3.example"]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure map stage: no shuffle at all

    def test_frame_gate_broadcasts_and_never_shuffles_corpus(
            self, spark, sf_dir):
        docs = Catalog(spark, sf_dir).documents.select(
            "doc_id", "source").withColumn(
            "url", D.synthetic_url("source", "doc_id"))
        bl = spark.createDataFrame([("src3.example",)], "domain: string")
        df = D.domain_gate_frame(docs, blocklist=bl)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the CORPUS (streamed, printed before the BroadcastExchange
        # subtree) never shuffles; the list side's own dedup exchange
        # is list-sized and allowed
        assert "Exchange hashpartitioning" not in plan.split(
            "BroadcastExchange")[0]

    def test_domain_profile_counts(self, spark):
        prof = D.domain_profile(_urls(spark, self.ROWS)).collect()
        assert [(r.domain, r.docs) for r in prof] == [
            ("bad.example", 2), ("", 1), ("good.example", 1)]


class TestFunnelGate:
    @pytest.fixture(scope="class")
    def batch(self, spark, sf_dir):
        return Catalog(spark, sf_dir).documents.select(
            "doc_id", "text", "source"
        ).filter(F.col("doc_id") % 7 == 1)

    def test_off_by_default(self, spark, batch):
        ann = PL.curate_annotated(batch)
        assert ann.filter(
            F.col("reject_reason") == "blocked_domain").count() == 0

    def test_blocklist_rejects_first_with_disjoint_reason(
            self, spark, batch):
        ann = PL.curate_annotated(
            batch, blocked_domains=["src3.example"], min_quality=0.0)
        rej = ann.filter(F.col("reject_reason") == "blocked_domain")
        assert rej.count() > 0
        # stage 0 precedes every content gate: every src3 row is
        # blocked_domain regardless of its text
        assert ann.filter(
            (F.col("source") == "src3")
            & (F.col("reject_reason") != "blocked_domain")
        ).count() == 0
        assert rej.filter(F.col("split").isNotNull()).count() == 0
        assert ann.count() == batch.count()  # still partitions input

    def test_frame_blocklist_matches_literal(self, spark, batch):
        bl = spark.createDataFrame([("src3.example",)], "domain: string")
        a = PL.curate_annotated(batch, blocked_domains=["src3.example"])
        b = PL.curate_annotated(batch, blocked_domains=bl)
        key = lambda df: {  # noqa: E731
            (r.doc_id, r.reject_reason) for r in
            df.select("doc_id", "reject_reason").collect()}
        assert key(a) == key(b)

    def test_allowlist_via_real_url_col(self, spark, batch):
        with_url = batch.withColumn(
            "u",
            F.when(F.col("source") == "src5",
                   F.lit("https://keep.example/x"))
            .otherwise(F.lit("https://drop.example/x")))
        ann = PL.curate_annotated(
            with_url, allowed_domains=["keep.example"], url_col="u")
        assert ann.filter(
            (F.col("source") != "src5")
            & (F.col("reject_reason") != "blocked_domain")
        ).count() == 0
        assert ann.filter(
            (F.col("source") == "src5")
            & (F.col("reject_reason") == "blocked_domain")
        ).count() == 0

    def test_url_col_without_lists_raises(self, spark, batch):
        with pytest.raises(ValueError, match="needs blocked_domains"):
            PL.curate_annotated(batch, url_col="text")

    def test_missing_url_col_raises(self, spark, batch):
        with pytest.raises(ValueError, match="no such column"):
            PL.curate_annotated(
                batch, blocked_domains=["x.example"], url_col="nope")

    def test_no_source_no_url_raises(self, spark, batch):
        with pytest.raises(ValueError, match="needs url_col"):
            PL.curate_annotated(
                batch.drop("source"), blocked_domains=["x.example"])


class TestSinkWiring:
    def test_sink_blocklist_gates_every_batch_and_no_store_leak(
            self, spark, tmp_path):
        from kafka_cassandra_plugin_spark.operators.dedup_index import (
            MinHashIndex,
        )
        from kafka_cassandra_plugin_spark.streaming.curate import (
            CurationSink,
            accepted_dataset,
        )

        words = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambda mu nu xi omicron pi rho sigma tau")
        rows = [
            (i, f"doc {i} {words} body text number {i} stable", src)
            for i, src in [(1, "src1"), (2, "srcbad"), (3, "src2"),
                           (4, "srcbad"), (5, "src3")]
        ]
        seed = spark.createDataFrame(
            [(100, f"seed document {words} zero")],
            "doc_id long, text string")
        idx_path = str(tmp_path / "idx")
        MinHashIndex.build(seed).save(idx_path)
        bl_path = str(tmp_path / "bl")
        spark.createDataFrame(
            [("srcbad.example",)], "domain: string"
        ).write.parquet(bl_path)
        out_path = str(tmp_path / "out")
        sink = CurationSink(idx_path, out_path, blocklist_path=bl_path,
                            min_quality=0.0)
        batch = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        sink(batch, 0)

        acc = accepted_dataset(spark, out_path)
        assert set(r.doc_id for r in acc.select("doc_id").collect()) == {
            1, 3, 5}
        assert sink.funnel_by_batch[0].get("blocked_domain") == 2
        # blocked rows must not have grown the index (store-leak check)
        idx = MinHashIndex.load(spark, idx_path)
        stored = {r.id for r in idx.shingles.select("id").collect()}
        assert 2 not in stored and 4 not in stored
        assert {1, 3, 5}.issubset(stored)

        # replay: same verdicts, no growth (exactly-once discipline)
        sink(batch, 0)
        assert accepted_dataset(spark, out_path).count() == 3
        idx2 = MinHashIndex.load(spark, idx_path)
        assert idx2.shingles.select("id").distinct().count() == len(stored)


class TestOracle:
    def test_report_hash_matches_sf001(self, spark, duck, oracle_sf_dir):
        df = llm_ops.domain_gate_report(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.DOMAIN_GATE_SQL,
                           name="domain_gate")
        assert n > 0

    def test_blocked_partition_sums_to_corpus(self, spark, oracle_sf_dir):
        rep = llm_ops.domain_gate_report(spark, oracle_sf_dir)
        total = rep.agg(F.sum("docs")).collect()[0][0]
        docs = Catalog(spark, oracle_sf_dir).documents.count()
        assert total == docs
        blocked = rep.filter(~F.col("passes")).collect()
        assert {r.domain for r in blocked} == {
            "src3.example", "src7.example", "src11.example"}
