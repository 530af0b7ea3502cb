"""Tier-D training-export ops: decontamination, shard export, packing.

Gates:
- decontaminate: planted benchmark copies (exact and perturbed) are
  removed, clean docs survive, links carry the right jaccard; the
  benchmark side is broadcast in the plan (scale shape).
- export_shards: shard contents AND in-shard order are identical for
  different input partitionings (determinism is a function of the data
  alone); one file per shard; read_shards prunes.
- pack_sequences: no pack exceeds the budget (except flagged oversize
  singletons); assignment is deterministic under repartitioning; fill
  is FFD-quality, not one-doc-per-pack.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators.contamination import (
    contamination_links,
    decontaminate,
)
from kafka_cassandra_plugin_spark.operators.export import (
    export_shards,
    read_shards,
    shard_assignments,
)
from kafka_cassandra_plugin_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select("doc_id", "text")


class TestDecontamination:
    @pytest.fixture(scope="class")
    def corpus_and_bench(self, docs):
        corpus = docs.filter(F.col("doc_id") % 3 != 0)
        # benchmarks: held-out docs + planted contamination = copies of
        # corpus docs (new ids, one leading word dropped -> near-dup,
        # not exact)
        # orderBy before limit: the planted frame is evaluated twice
        # (once to collect contaminated_ids, once inside the query) and
        # an unordered limit may pick different rows per evaluation
        clean_bench = docs.filter(F.col("doc_id") % 3 == 0).orderBy("doc_id").limit(40)
        planted = (
            corpus.filter((F.col("doc_id") % 7 == 1) & (F.instr("text", " ") > 0))
            .orderBy("doc_id")
            .limit(20)
            .select(
                (F.col("doc_id") + 5_000_000).alias("doc_id"),
                F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
            )
        )
        bench = clean_bench.unionByName(planted)
        contaminated_ids = {
            r.doc_id - 5_000_000 for r in planted.select("doc_id").collect()
        }
        return corpus, bench, contaminated_ids

    def test_links_find_planted_contamination(self, corpus_and_bench):
        corpus, bench, planted_ids = corpus_and_bench
        links = contamination_links(corpus, bench, threshold=0.5)
        found = {r.corpus_id for r in links.select("corpus_id").collect()}
        assert planted_ids <= found
        lk = links.collect()
        assert all(0.5 <= r.jaccard <= 1.0 for r in lk)

    def test_decontaminate_removes_exactly_linked_ids(self, corpus_and_bench):
        corpus, bench, _ = corpus_and_bench
        links = contamination_links(corpus, bench, threshold=0.5)
        dirty = {r.corpus_id for r in links.select("corpus_id").distinct().collect()}
        kept = {
            r.doc_id
            for r in decontaminate(corpus, bench, threshold=0.5)
            .select("doc_id").collect()
        }
        everyone = {r.doc_id for r in corpus.select("doc_id").collect()}
        assert kept == everyone - dirty
        assert dirty.isdisjoint(kept)

    def test_benchmark_side_is_broadcast(self, corpus_and_bench):
        from kafka_cassandra_plugin_spark import plans as P

        corpus, bench, _ = corpus_and_bench
        plan = P.formatted_plan(contamination_links(corpus, bench))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_index_probe_equivalent_to_frame_path(self, corpus_and_bench, tmp_path):
        """contamination_links(MinHashIndex, bench) must return exactly
        the frame-based links when the index carries the same banding
        geometry (32x2 = what adaptive_bands picks at threshold 0.5)."""
        from kafka_cassandra_plugin_spark.operators.dedup_index import MinHashIndex

        corpus, bench, planted_ids = corpus_and_bench
        idx = MinHashIndex.build(corpus, bands=32).save(str(tmp_path / "ix"))
        via_frame = contamination_links(corpus, bench, threshold=0.5)
        via_index = contamination_links(idx, bench, threshold=0.5)
        a = {(r.corpus_id, r.bench_id, r.jaccard) for r in via_frame.collect()}
        b = {(r.corpus_id, r.bench_id, r.jaccard) for r in via_index.collect()}
        assert a == b
        assert planted_ids <= {cid for cid, _, _ in b}

    def test_index_probe_never_scans_corpus_text(self, corpus_and_bench, spark, tmp_path):
        """The executed plan of the index probe must contain no corpus
        scan and no corpus-side shingle assembly - the stored band and
        shingle tables are the only corpus terms (that is the point of
        reusing the index: broadcast probe, not corpus pass)."""
        from kafka_cassandra_plugin_spark import plans as P
        from kafka_cassandra_plugin_spark.operators.dedup_index import MinHashIndex

        corpus, _, _ = corpus_and_bench
        idx = MinHashIndex.build(corpus, bands=32).save(str(tmp_path / "ix2"))
        bench_local = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
        )
        plan = P.formatted_plan(contamination_links(idx, bench_local, threshold=0.5))
        assert "documents.parquet" not in plan  # no corpus re-shingle scan
        assert "Window" not in plan  # no corpus-side shingle window either
        # contrast: the frame path necessarily scans the corpus text
        frame_plan = P.formatted_plan(
            contamination_links(corpus, bench_local, threshold=0.5)
        )
        assert "documents.parquet" in frame_plan

    def test_index_probe_warns_on_low_recall_geometry(self, corpus_and_bench, tmp_path):
        import warnings

        from kafka_cassandra_plugin_spark.operators.dedup_index import MinHashIndex

        corpus, bench, _ = corpus_and_bench
        idx = MinHashIndex.build(corpus, bands=16).save(str(tmp_path / "ix3"))
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            contamination_links(idx, bench, threshold=0.5)
        assert any("banding" in str(w.message) for w in caught)

    def test_adaptive_bands_knee_tracks_threshold(self):
        from kafka_cassandra_plugin_spark.operators.dedup import adaptive_bands

        # the anchored 16x4 geometry is reproduced at the 0.8 default
        assert adaptive_bands(0.8, 64) == 16
        # at 0.5 the fixed 16x4 proposes only ~64% of threshold pairs;
        # the adaptive geometry widens to 32x2 (recall ~0.9999)
        assert adaptive_bands(0.5, 64) == 32
        for t in (0.3, 0.5, 0.7, 0.8, 0.9):
            b = adaptive_bands(t, 64)
            r = 64 // b
            assert 1.0 - (1.0 - t**r) ** b >= 0.95, (t, b)

    def test_near_threshold_contamination_is_found(self, docs):
        """Pairs with exact Jaccard just above the 0.5 threshold must be
        proposed by the banding (the fixed 16x4 geometry missed ~25-35%
        of them - the ADVICE r4 leakage).  Perturbation: every 10th word
        replaced -> ~70% of 3-shingles survive -> J ~= 0.7/1.3 ~= 0.54,
        right in the weak zone of the old knee."""
        from kafka_cassandra_plugin_spark.operators.dedup import exploded_shingles

        corpus = (
            docs.filter(
                (F.col("doc_id") % 5 == 2) & (F.size(F.split("text", " ")) >= 30)
            )
            .orderBy("doc_id")
            .limit(30)
        )
        words = F.split("text", " ")
        perturbed = corpus.select(
            (F.col("doc_id") + 9_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    words,
                    lambda w, i: F.when(
                        i % 10 == 9, F.concat(F.lit("zqx"), i.cast("string"))
                    ).otherwise(w),
                ),
                " ",
            ).alias("text"),
        )
        a = (
            exploded_shingles(corpus, "text", "doc_id", 3)
            .groupBy("id")
            .agg(F.collect_set("sh").alias("sa"))
        )
        b = (
            exploded_shingles(perturbed, "text", "doc_id", 3)
            .groupBy("id")
            .agg(F.collect_set("sh").alias("sb"))
            .withColumn("id", F.col("id") - 9_000_000)
        )
        jac = {
            r["id"]: r["j"]
            for r in a.join(b, "id")
            .select(
                "id",
                (
                    F.size(F.array_intersect("sa", "sb"))
                    / F.size(F.array_union("sa", "sb"))
                ).alias("j"),
            )
            .collect()
        }
        must_find = {i for i, v in jac.items() if v >= 0.5}
        assert must_find, "construction should land pairs at/above threshold"
        assert any(v < 0.7 for v in jac.values()), "pairs should be NEAR threshold"
        links = contamination_links(corpus, perturbed, threshold=0.5)
        found = {r.corpus_id for r in links.select("corpus_id").collect()}
        assert must_find <= found


class TestShardExport:
    N = 8

    def test_deterministic_across_partitionings(self, spark, docs, tmp_path):
        a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
        export_shards(docs, a_path, self.N)
        export_shards(docs.repartition(13), b_path, self.N)
        for k in range(self.N):
            rows_a = [
                (r.doc_id, r.text)
                for r in spark.read.parquet(f"{a_path}/shard={k}").collect()
            ]
            rows_b = [
                (r.doc_id, r.text)
                for r in spark.read.parquet(f"{b_path}/shard={k}").collect()
            ]
            assert rows_a == rows_b  # same contents AND same order
            assert len(rows_a) > 0

    def test_one_file_per_shard_and_coverage(self, spark, docs, tmp_path):
        import glob

        path = str(tmp_path / "s")
        export_shards(docs, path, self.N)
        for k in range(self.N):
            files = glob.glob(f"{path}/shard={k}/*.parquet")
            assert len(files) == 1, f"shard {k}: {files}"
        total = read_shards(spark, path).count()
        assert total == docs.count()

    def test_read_shards_prunes(self, spark, docs, tmp_path):
        path = str(tmp_path / "p")
        export_shards(docs, path, self.N)
        some = read_shards(spark, path, shards=[0, 3])
        assert {r.shard for r in some.select("shard").distinct().collect()} == {0, 3}

    def test_jsonl_shards_match_parquet_exactly(self, spark, docs, tmp_path):
        """fmt='json' emits one JSON-Lines file per shard with the SAME
        deterministic assignment and in-shard order as parquet - the
        determinism lives in the staging plan, not the writer."""
        import glob

        pq, js = str(tmp_path / "pq"), str(tmp_path / "js")
        export_shards(docs, pq, self.N)
        export_shards(docs, js, self.N, fmt="json")
        for k in range(self.N):
            files = glob.glob(f"{js}/shard={k}/*.json")
            assert len(files) == 1, f"shard {k}: {files}"
            rows_pq = [
                (r.doc_id, r.text)
                for r in spark.read.parquet(f"{pq}/shard={k}").collect()
            ]
            with open(files[0]) as f:
                import json as _json

                rows_js = [
                    (d["doc_id"], d["text"])
                    for d in (_json.loads(line) for line in f)
                ]
            assert rows_js == rows_pq  # contents AND order, line-readable

    def test_jsonl_gzip_round_trip(self, spark, docs, tmp_path):
        import glob

        path = str(tmp_path / "gz")
        export_shards(docs, path, self.N, fmt="json", compression="gzip")
        files = glob.glob(f"{path}/shard=0/*.json.gz")
        assert len(files) == 1
        back = read_shards(spark, path, fmt="json")
        assert back.count() == docs.count()

    def test_bad_format_raises(self, docs, tmp_path):
        with pytest.raises(ValueError, match="fmt"):
            export_shards(docs, str(tmp_path / "x"), self.N, fmt="orc")

    def test_json_schema_restores_null_columns_and_types(
        self, spark, docs, tmp_path
    ):
        """The JSON writer omits null fields, so an entirely-null
        column vanishes under inference and a timestamp comes back a
        string; read_shards(schema=) makes the json round-trip
        schema-faithful."""
        from pyspark.sql import functions as F

        aug = docs.withColumn("always_null", F.lit(None).cast("string")) \
                  .withColumn("ts", F.lit("2026-01-02 03:04:05")
                              .cast("timestamp"))
        path = str(tmp_path / "nulls")
        export_shards(aug, path, self.N, fmt="json")
        inferred = read_shards(spark, path, fmt="json")
        assert "always_null" not in inferred.columns  # the caveat, pinned
        ddl = ("doc_id long, text string, always_null string, "
               "ts timestamp, shard int")
        faithful = read_shards(spark, path, fmt="json", schema=ddl)
        assert "always_null" in faithful.columns
        assert dict(faithful.dtypes)["ts"] == "timestamp"
        row = faithful.filter(F.col("always_null").isNotNull()).take(1)
        assert row == []

    def test_seed_reshuffles(self, docs):
        a = shard_assignments(docs, self.N, seed=1).select("doc_id", "shard")
        b = shard_assignments(docs, self.N, seed=2).select("doc_id", "shard")
        moved = a.join(b.withColumnRenamed("shard", "shard2"), "doc_id").filter(
            F.col("shard") != F.col("shard2")
        )
        assert moved.count() > 0


class TestPacking:
    BUDGET = 256

    @pytest.fixture(scope="class")
    def packed(self, docs):
        return pack_sequences(docs, self.BUDGET, num_groups=8).cache()

    def test_every_doc_assigned_once(self, docs, packed):
        assert packed.count() == docs.count()
        assert packed.select("doc_id").distinct().count() == docs.count()

    def test_budget_respected(self, packed):
        stats = packing_stats(packed, self.BUDGET)
        over = stats.filter(
            (~F.col("oversize")) & (F.col("tokens") > self.BUDGET)
        )
        assert over.count() == 0

    def test_oversize_docs_are_flagged_singletons(self, packed):
        big = packed.filter(F.col("oversize"))
        if big.take(1):
            per_pack = big.groupBy("pack").count()
            assert per_pack.filter(F.col("count") > 1).count() == 0
            assert big.filter(F.col("n_tokens") <= self.BUDGET).count() == 0

    def test_fill_beats_one_doc_per_pack(self, docs, packed):
        n_docs = docs.count()
        n_packs = packed.select("pack").distinct().count()
        assert n_packs < n_docs * 0.6  # packing actually packs

    def test_deterministic_across_partitionings(self, docs, packed):
        again = pack_sequences(docs.repartition(17), self.BUDGET, num_groups=8)
        a = {(r.doc_id, r.pack, r.slot) for r in packed.collect()}
        b = {(r.doc_id, r.pack, r.slot) for r in again.collect()}
        assert a == b

    def test_derived_num_groups_recorded_and_reproducible(self, docs):
        n = docs.count()
        derived = pack_sequences(docs, self.BUDGET, target_group_docs=100)
        recorded = [r.num_groups for r in derived.select("num_groups").distinct().collect()]
        assert recorded == [-(-n // 100)]  # ceil(rows / target)
        # pinning the recorded value reproduces the assignment exactly -
        # the recorded column IS the re-materialization contract
        pinned = pack_sequences(docs, self.BUDGET, num_groups=recorded[0])
        a = {(r.doc_id, r.pack, r.slot) for r in derived.collect()}
        b = {(r.doc_id, r.pack, r.slot) for r in pinned.collect()}
        assert a == b

    def test_oversized_group_raises(self, docs):
        with pytest.raises(Exception, match="max_group_docs"):
            pack_sequences(
                docs, self.BUDGET, num_groups=1, max_group_docs=50
            ).collect()


class TestStratifiedSampleAndMix:
    @pytest.fixture(scope="class")
    def docs_src(self, spark, sf_dir):
        return Catalog(spark, sf_dir).documents.select(
            "doc_id", "text", "lang", "source"
        )

    def test_stratified_rates_and_determinism(self, docs_src):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            stratified_sample,
        )

        by_n = sorted(
            docs_src.groupBy("lang").count().collect(),
            key=lambda r: -r["count"],
        )
        big, small = by_n[0].lang, by_n[1].lang  # largest stratum first
        fr = {big: 0.25, small: 1.0}
        samp = stratified_sample(docs_src, "doc_id", "lang", fr)
        base = {r.lang: r["count"] for r in docs_src.groupBy("lang").count().collect()}
        got = {r.lang: r["count"] for r in samp.groupBy("lang").count().collect()}
        # full stratum kept exactly; sampled stratum near its rate;
        # default_fraction=0 drops everything else
        assert got[small] == base[small]
        # hash-slice rate has binomial-like variance; the table is small
        # (hundreds of docs per stratum), so gate at ~3 sigma
        assert abs(got[big] / base[big] - 0.25) < 0.12
        assert set(got) == {big, small}
        # determinism: identical membership under repartitioning
        again = stratified_sample(docs_src.repartition(13), "doc_id", "lang", fr)
        assert {r.doc_id for r in samp.select("doc_id").collect()} == {
            r.doc_id for r in again.select("doc_id").collect()
        }

    def test_mix_sources_epochs_and_fractions(self, docs_src):
        from kafka_cassandra_plugin_spark.operators.sampling import mix_sources

        srcs = [r.source for r in docs_src.select("source").distinct().collect()]
        up, down = srcs[0], srcs[1]
        mixed = mix_sources(
            docs_src, "doc_id", "source", {up: 2.5, down: 0.5}
        )
        base = {
            r.source: r["count"] for r in docs_src.groupBy("source").count().collect()
        }
        got = {r.source: r["count"] for r in mixed.groupBy("source").count().collect()}
        assert set(got) == {up, down}  # unweighted sources drop
        # 2.5 epochs: two full copies + ~half; epochs 0,1 exact
        per_epoch = {
            (r.source, r.epoch): r["count"]
            for r in mixed.groupBy("source", "epoch").count().collect()
        }
        assert per_epoch[(up, 0)] == base[up]
        assert per_epoch[(up, 1)] == base[up]
        assert abs(per_epoch[(up, 2)] / base[up] - 0.5) < 0.1
        assert abs(got[down] / base[down] - 0.5) < 0.1
        # repeats are distinct training rows: (doc_id, epoch) unique
        assert (
            mixed.groupBy("doc_id", "epoch").count().filter(F.col("count") > 1).count()
            == 0
        )

    def test_mix_requires_positive_weight(self, docs_src):
        from kafka_cassandra_plugin_spark.operators.sampling import mix_sources

        with pytest.raises(ValueError):
            mix_sources(docs_src, "doc_id", "source", {"nope": 0.0})


class TestTrainingExportPlans:
    """Plan-shape gates for the scale claims: sampling/mixing are pure
    map stages (zero Exchange); shard export is exactly ONE shuffle."""

    def test_stratified_sample_no_shuffle(self, docs_src_plans):
        from kafka_cassandra_plugin_spark import plans as P
        from kafka_cassandra_plugin_spark.operators.sampling import (
            stratified_sample,
        )

        plan = P.formatted_plan(
            stratified_sample(docs_src_plans, "doc_id", "lang", {"en": 0.5})
        )
        assert "Exchange" not in plan

    def test_mix_sources_no_shuffle(self, docs_src_plans):
        from kafka_cassandra_plugin_spark import plans as P
        from kafka_cassandra_plugin_spark.operators.sampling import mix_sources

        plan = P.formatted_plan(
            mix_sources(docs_src_plans, "doc_id", "source",
                        {"src0": 2.5, "src1": 0.5})
        )
        assert "Exchange" not in plan

    def test_export_shards_single_shuffle(self, docs_src_plans):
        from kafka_cassandra_plugin_spark import plans as P
        from kafka_cassandra_plugin_spark.operators.export import (
            shard_assignments,
        )

        staged = (
            shard_assignments(docs_src_plans, 8)
            .repartition(8, "shard")
            .sortWithinPartitions("shard", "__ord")
        )
        plan = P.formatted_plan(staged)
        # formatted plans print each node twice (tree + detail); count
        # detail headers "(n) Exchange" - exactly one shuffle node
        assert plan.count(") Exchange") == 1
        assert "rangepartitioning" not in plan.lower()  # no global sort


@pytest.fixture(scope="module")
def docs_src_plans(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "lang", "source"
    )


class TestTakePerGroup:
    """D14: exact deterministic per-stratum selection."""

    @pytest.fixture(scope="class")
    def docs_lang(self, spark, sf_dir):
        return Catalog(spark, sf_dir).documents.select("doc_id", "lang")

    def test_exact_counts_per_stratum(self, docs_lang):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            take_per_group,
        )

        base = {r.lang: r["count"]
                for r in docs_lang.groupBy("lang").count().collect()}
        got = {r.lang: r["count"]
               for r in take_per_group(docs_lang, "doc_id", "lang", k=9)
               .groupBy("lang").count().collect()}
        assert got == {lang: min(9, n) for lang, n in base.items()}

    def test_membership_and_rank_invariant_to_partitioning(self, docs_lang):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            take_per_group,
        )

        a = {(r.lang, r.take_rank): r.doc_id
             for r in take_per_group(docs_lang, "doc_id", "lang", k=5).collect()}
        b = {(r.lang, r.take_rank): r.doc_id
             for r in take_per_group(docs_lang.repartition(17), "doc_id",
                                     "lang", k=5).collect()}
        assert a == b

    def test_prefix_property_growing_k_only_adds(self, docs_lang):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            take_per_group,
        )

        small = {r.doc_id for r in
                 take_per_group(docs_lang, "doc_id", "lang", k=3).collect()}
        big = {r.doc_id for r in
               take_per_group(docs_lang, "doc_id", "lang", k=12).collect()}
        assert small <= big

    def test_salt_draws_an_independent_sample(self, docs_lang):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            take_per_group,
        )

        a = {r.doc_id for r in
             take_per_group(docs_lang, "doc_id", "lang", k=5, salt="x").collect()}
        b = {r.doc_id for r in
             take_per_group(docs_lang, "doc_id", "lang", k=5, salt="y").collect()}
        assert a != b

    def test_bad_k_raises(self, docs_lang):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            take_per_group,
        )

        with pytest.raises(ValueError, match="k must be"):
            take_per_group(docs_lang, "doc_id", "lang", k=0)

    def test_rank_limit_pushed_into_shuffle(self, docs_lang):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            take_per_group,
        )

        plan = (
            take_per_group(docs_lang, "doc_id", "lang", k=7)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # WindowGroupLimit = map-side per-partition top-k truncation:
        # the shuffle carries O(tasks x k) rows per stratum, not the
        # stratum - the property that makes exact-k safe on skewed langs
        assert "WindowGroupLimit" in plan

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries import llm_ops

        df = llm_ops.sample_per_group(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.SAMPLE_PER_GROUP_SQL,
                           name="sample_per_group")
        assert n > 0


class TestPlanMixture:
    """D15: target-share + token-budget -> per-source epoch factors."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # source A: 100 docs x 10 tokens = 1000; B: 50 x 20 = 1000;
        # C exists but gets no target share
        rows = (
            [(i, "A", 10) for i in range(100)]
            + [(1000 + i, "B", 20) for i in range(50)]
            + [(2000 + i, "C", 5) for i in range(10)]
        )
        return spark.createDataFrame(
            rows, "doc_id: long, source: string, n_tokens: long"
        )

    def test_exact_plan_arithmetic(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            plan_mixture,
        )

        epochs, planned = plan_mixture(
            corpus, "source", "n_tokens", {"A": 0.75, "B": 0.25}, 2000
        )
        assert planned == 2000
        assert epochs == pytest.approx({"A": 1.5, "B": 0.5})

    def test_max_epochs_scales_budget_preserving_shares(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            plan_mixture,
        )

        epochs, planned = plan_mixture(
            corpus, "source", "n_tokens", {"A": 0.75, "B": 0.25}, 2000,
            max_epochs=1.2,
        )
        # A binds: feasible = 1000 * 1.2 / 0.75 = 1600
        assert planned == pytest.approx(1600)
        assert epochs == pytest.approx({"A": 1.2, "B": 0.4})
        # shares preserved exactly: epochs_s * avail_s / planned = share
        assert epochs["A"] * 1000 / planned == pytest.approx(0.75)
        assert epochs["B"] * 1000 / planned == pytest.approx(0.25)

    def test_shares_normalize(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            plan_mixture,
        )

        a, _ = plan_mixture(corpus, "source", "n_tokens",
                            {"A": 3, "B": 1}, 2000)
        b, _ = plan_mixture(corpus, "source", "n_tokens",
                            {"A": 0.75, "B": 0.25}, 2000)
        assert a == pytest.approx(b)

    def test_share_on_empty_source_raises(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            plan_mixture,
        )

        with pytest.raises(ValueError, match="no tokens"):
            plan_mixture(corpus, "source", "n_tokens",
                         {"A": 0.5, "nope": 0.5}, 1000)

    def test_no_positive_share_raises(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            plan_mixture,
        )

        with pytest.raises(ValueError, match="positive target share"):
            plan_mixture(corpus, "source", "n_tokens", {"A": 0.0}, 1000)

    def test_mix_to_budget_realizes_shares(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            mix_to_budget,
        )
        from pyspark.sql import functions as F

        mixed = mix_to_budget(
            corpus, "doc_id", "source", "n_tokens",
            {"A": 0.75, "B": 0.25}, 2000,
        )
        got = {
            r.source: r.tok
            for r in mixed.groupBy("source")
            .agg(F.sum("n_tokens").alias("tok")).collect()
        }
        # whole epochs are exact; fractional halves carry hash-slice
        # variance (binomial over 100/50 docs, ~2 sigma = 0.035/0.07 of
        # the budget).  The draw is DETERMINISTIC (fixed salt), so this
        # is a regression pin at a bound the current draw satisfies,
        # not a statistical gate that could flake
        assert set(got) == {"A", "B"}
        assert abs(got["A"] / 2000 - 0.75) < 0.08
        assert abs(got["B"] / 2000 - 0.25) < 0.08
        # C never appears: zero target share drops the source entirely
        assert mixed.filter(F.col("source") == "C").count() == 0

    def test_planner_determinism(self, corpus):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            mix_to_budget,
        )

        a = {(r.doc_id, r.epoch) for r in mix_to_budget(
            corpus, "doc_id", "source", "n_tokens",
            {"A": 0.6, "B": 0.4}, 1500).collect()}
        b = {(r.doc_id, r.epoch) for r in mix_to_budget(
            corpus.repartition(7), "doc_id", "source", "n_tokens",
            {"A": 0.6, "B": 0.4}, 1500).collect()}
        assert a == b


class TestChunkDocuments:
    """D17: token-window chunking - the oversize bridge into packing."""

    def _toks(self, s):
        return [t for t in s.split() if t]

    @pytest.fixture(scope="class")
    def sample(self, spark):
        rows = [
            (1, " ".join(f"w{i}" for i in range(100))),  # multi-chunk
            (2, "just five little tokens here"),          # single chunk
            (3, ""),                                      # empty -> none
            (4, "   \n  "),                               # whitespace only
        ]
        return spark.createDataFrame(rows, "doc_id: long, text: string")

    def test_every_chunk_within_budget(self, sample):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
        )

        out = chunk_documents(sample, max_tokens=16, overlap=4).collect()
        assert all(r.n_tokens <= 16 for r in out)
        assert all(len(self._toks(r.chunk_text)) == r.n_tokens for r in out)

    def test_overlap_roundtrip_reconstructs_tokens(self, sample):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
        )

        overlap = 4
        chunks = sorted(
            chunk_documents(sample, max_tokens=16, overlap=overlap)
            .filter(F.col("doc_id") == 1).collect(),
            key=lambda r: r.chunk_idx,
        )
        rebuilt = self._toks(chunks[0].chunk_text)
        for c in chunks[1:]:
            rebuilt += self._toks(c.chunk_text)[overlap:]
        assert rebuilt == [f"w{i}" for i in range(100)]

    def test_short_doc_one_chunk_empty_doc_none(self, sample):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
        )

        got = {
            r.doc_id: r["count"]
            for r in chunk_documents(sample, max_tokens=16, overlap=4)
            .groupBy("doc_id").count().collect()
        }
        assert got.get(2) == 1 and 3 not in got and 4 not in got

    def test_no_overlap_partitions_exactly(self, sample):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
        )

        chunks = chunk_documents(sample, max_tokens=16, overlap=0).filter(
            F.col("doc_id") == 1
        )
        assert chunks.count() == 7  # ceil(100/16)
        assert chunks.agg(F.sum("n_tokens")).first()[0] == 100

    def test_bad_args_raise(self, sample):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
        )

        with pytest.raises(ValueError, match="max_tokens"):
            chunk_documents(sample, max_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(sample, max_tokens=8, overlap=8)

    def test_map_only_plan(self, spark, sf_dir):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
        )

        d = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        plan = (
            chunk_documents(d, max_tokens=40, overlap=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_chunks_feed_packing_without_oversize(self, spark, sf_dir):
        from kafka_cassandra_plugin_spark.operators.packing import (
            chunk_documents,
            pack_sequences,
        )

        d = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        chunks = chunk_documents(d, max_tokens=40, overlap=0).select(
            F.concat_ws("#", "doc_id", "chunk_idx").alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
        packed = pack_sequences(chunks, 64, num_groups=4)
        assert packed.filter(F.col("oversize")).count() == 0

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries import llm_ops

        df = llm_ops.chunk_docs(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, llm_ops.CHUNK_DOCUMENTS_SQL,
                           name="chunk_docs")
        assert n > 0


class TestPackExamples:
    """D31: tokenize -> pack -> concatenate (the training example
    stream).  Gates: token conservation (every encoded token appears
    exactly once across pack streams), budget (len(tokens) == n_tokens
    <= budget for non-oversize packs), slot order (each pack's stream
    is the slot-ordered concatenation of member encodes + eos), and
    determinism across input partitionings."""

    BUDGET = 192

    @pytest.fixture(scope="class")
    def tok(self, docs):
        from kafka_cassandra_plugin_spark.operators.bpe import BpeTokenizer

        return BpeTokenizer.train(docs.limit(200), num_merges=64)

    @pytest.fixture(scope="class")
    def corpus(self, docs):
        return docs.limit(400).cache()

    @pytest.fixture(scope="class")
    def packs(self, corpus, tok):
        from kafka_cassandra_plugin_spark.operators.packing import (
            pack_examples,
        )

        return pack_examples(
            corpus, tok, self.BUDGET, num_groups=4
        ).cache()

    def test_budget_and_stream_length(self, packs):
        rows = packs.collect()
        assert rows
        for r in rows:
            assert len(r.tokens) == r.n_tokens
            if not r.oversize:
                assert r.n_tokens <= self.BUDGET
            else:
                assert r.n_docs == 1 and r.n_tokens > self.BUDGET

    def test_token_conservation_and_eos(self, corpus, tok, packs):
        enc = tok.encode(corpus, out_col="t")
        total_doc = enc.select(
            F.sum(F.size("t") + 1).alias("s")  # +1 eos per doc
        ).collect()[0].s
        total_pack = packs.select(F.sum("n_tokens").alias("s")).collect()[0].s
        assert total_pack == total_doc
        n_docs = corpus.count()
        eos_count = packs.select(
            F.sum(F.size(F.filter("tokens", lambda x: x == F.lit("</s>"))))
            .alias("s")
        ).collect()[0].s
        assert eos_count == n_docs
        assert packs.select(F.sum("n_docs").alias("s")).collect()[0].s == n_docs

    def test_stream_is_slot_ordered_member_concat(self, corpus, tok, packs):
        """Rebuild one multi-doc pack's stream by hand from the
        assignment + per-doc encodes."""
        from kafka_cassandra_plugin_spark.operators.packing import (
            pack_sequences,
        )

        enc = tok.encode(corpus, out_col="t").withColumn(
            "t", F.concat("t", F.array(F.lit("</s>")))
        ).withColumn("nt", F.size("t").cast("long"))
        assign = pack_sequences(
            enc, self.BUDGET, tokens_col="nt", num_groups=4
        )
        target = (
            packs.filter(F.col("n_docs") >= 2)
            .orderBy(F.col("n_docs").desc())
            .limit(1).collect()[0]
        )
        members = (
            assign.filter(F.col("pack") == target.pack)
            .join(enc.select("doc_id", "t"), "doc_id")
            .orderBy("slot")
            .collect()
        )
        manual = [x for m in members for x in m.t]
        assert manual == list(target.tokens)

    def test_deterministic_across_partitionings(self, corpus, tok, packs):
        from kafka_cassandra_plugin_spark.operators.packing import (
            pack_examples,
        )

        again = pack_examples(
            corpus.repartition(13), tok, self.BUDGET, num_groups=4
        )
        a = {(r.pack, tuple(r.tokens)) for r in packs.collect()}
        b = {(r.pack, tuple(r.tokens)) for r in again.collect()}
        assert a == b

    def test_terminator_is_billed_exact_budget_doc_is_oversize(
            self, spark, tok):
        """The documented contract (round-9 ADVICE): the EOS token
        occupies a slot, so a doc encoding to exactly max_tokens
        pre-EOS bills max_tokens+1 and is oversize, while a doc at
        max_tokens-1 pre-EOS fits exactly."""
        from kafka_cassandra_plugin_spark.operators.packing import (
            pack_examples,
        )

        probe = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string")
        n1 = tok.encode(probe, out_col="t").filter(
            F.col("doc_id") == 1).select(F.size("t")).collect()[0][0]
        packs = {
            r.n_docs: r for r in pack_examples(
                probe.filter(F.col("doc_id") == 1), tok, n1, num_groups=1
            ).collect()
        }
        assert len(packs) == 1
        (r,) = packs.values()
        assert r.oversize and r.n_tokens == n1 + 1
        fits = pack_examples(
            probe.filter(F.col("doc_id") == 1), tok, n1 + 1, num_groups=1
        ).collect()
        assert len(fits) == 1 and not fits[0].oversize
        assert fits[0].n_tokens == n1 + 1

    def test_no_eos_mode_conserves_exactly(self, corpus, tok):
        from kafka_cassandra_plugin_spark.operators.packing import (
            pack_examples,
        )

        packs = pack_examples(
            corpus, tok, self.BUDGET, eos=None, num_groups=4
        )
        enc = tok.encode(corpus, out_col="t")
        total_doc = enc.select(F.sum(F.size("t")).alias("s")).collect()[0].s
        got = packs.select(
            F.sum("n_tokens").alias("nt"),
            F.sum(F.size("tokens")).alias("st"),
        ).collect()[0]
        assert got.nt == total_doc and got.st == total_doc


class TestSoftDedup:
    """D32: SoftDedup (He et al. 2024) - duplicates are down-weighted,
    not deleted.  Gates: exact commonness/weight arithmetic (alpha
    family), whitespace/case canonicalization, per-cluster expected
    epoch mass under alpha=1, mix_by_weight determinism + structural
    fanout + zero-Exchange plan, and the full DuckDB oracle."""

    def test_commonness_weight_and_normalization(self, spark):
        from kafka_cassandra_plugin_spark.operators.dedup import (
            soft_dedup_weights,
        )

        df = spark.createDataFrame(
            [(1, "The cat sat"), (2, "the  cat   sat"), (3, "THE CAT SAT "),
             (4, "a unique doc"), (5, "another one"), (6, "another one")],
            "doc_id int, text string",
        )
        got = {r.doc_id: (r.commonness, r.weight)
               for r in soft_dedup_weights(df, alpha=1.0).collect()}
        assert got[1] == (3, pytest.approx(1 / 3))
        assert got[2] == (3, pytest.approx(1 / 3))
        assert got[3] == (3, pytest.approx(1 / 3))  # reflow + case caught
        assert got[4] == (1, 1.0)
        assert got[5] == (2, 0.5) and got[6] == (2, 0.5)
        # alpha family
        half = {r.doc_id: r.weight
                for r in soft_dedup_weights(df, alpha=0.5).collect()}
        assert half[1] == pytest.approx(3 ** -0.5)
        off = {r.doc_id: r.weight
               for r in soft_dedup_weights(df, alpha=0.0).collect()}
        assert set(off.values()) == {1.0}
        # normalize=False splits the reflowed variants
        raw = {r.doc_id: r.commonness
               for r in soft_dedup_weights(df, normalize=False).collect()}
        assert raw[1] == 1 and raw[2] == 1 and raw[3] == 1

    def test_cluster_epoch_mass_alpha1(self, spark, docs):
        """alpha=1 makes every duplicate CLUSTER contribute ~1 expected
        epoch: total realized epochs over (docs + planted copies) must
        sit near the DISTINCT-content count."""
        from kafka_cassandra_plugin_spark.operators.dedup import (
            soft_dedup_weights,
        )
        from kafka_cassandra_plugin_spark.operators.sampling import (
            mix_by_weight,
        )

        d = docs.limit(400)
        corpus = d.unionByName(
            d.filter(F.col("doc_id") % 2 == 0)
            .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        )
        w = soft_dedup_weights(corpus, alpha=1.0)
        realized = mix_by_weight(w, "doc_id", "weight").count()
        n_distinct = d.select("text").distinct().count()
        assert abs(realized - n_distinct) <= 0.1 * n_distinct

    def test_mix_by_weight_mechanics(self, spark):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            mix_by_weight,
        )

        df = spark.createDataFrame(
            [(i, 2.5) for i in range(200)]
            + [(1000, 0.0), (1001, None), (1002, 1.0)],
            "doc_id int, weight double",
        )
        out = mix_by_weight(df, "doc_id", "weight")
        rows = out.collect()
        ids = {r.doc_id for r in rows}
        assert 1000 not in ids and 1001 not in ids
        per = {}
        for r in rows:
            per.setdefault(r.doc_id, []).append(r.epoch)
        assert sorted(per[1002]) == [0]
        counts = [len(v) for k, v in per.items() if k < 1000]
        assert set(counts) <= {2, 3}  # floor(2.5) + {0,1}
        frac3 = sum(1 for c in counts if c == 3) / len(counts)
        assert 0.35 < frac3 < 0.65  # ~0.5 expected
        for k, v in per.items():
            assert sorted(v) == list(range(len(v)))
        # deterministic across partitionings
        again = mix_by_weight(df.repartition(7), "doc_id", "weight")
        assert {(r.doc_id, r.epoch) for r in again.collect()} == {
            (r.doc_id, r.epoch) for r in rows}

    def test_mix_by_weight_zero_exchange(self, spark, docs):
        from kafka_cassandra_plugin_spark.operators.sampling import (
            mix_by_weight,
        )

        src = docs.limit(100).withColumn(
            "weight", F.lit(0.7)).localCheckpoint()
        plan = mix_by_weight(
            src, "doc_id", "weight"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            SOFT_DEDUP_SQL,
            soft_dedup,
        )

        df = soft_dedup(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, SOFT_DEDUP_SQL, "soft_dedup")
        assert n > 0

    def test_weights_plan_single_exchange(self, spark, docs):
        """soft_dedup_weights is ONE hash shuffle (the fingerprint
        window) - the shuffle term is distinct contents, same as exact
        dedup; anything more means a regression grew a join or a
        second aggregation pass."""
        from kafka_cassandra_plugin_spark.operators.dedup import (
            soft_dedup_weights,
        )

        plan = soft_dedup_weights(
            docs.limit(200).repartition(8).localCheckpoint()
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "EvalPython" not in plan
