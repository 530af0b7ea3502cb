"""PQ gates: encode determinism, codebook save/load fidelity, ADC
shortlist quality (recall@10 vs brute force after exact re-rank), and
the compression contract (m codes per vector, all < n_codes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import quantization as Q
from kafka_cassandra_plugin_spark.operators import similarity as S

DIM = 64
M = 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return Catalog(spark, sf_dir).embeddings


@pytest.fixture(scope="module")
def codebook(emb):
    return Q.PqCodebook.fit(emb, DIM, m=M, k=64, seed=42)


class TestEncode:
    def test_codes_shape_and_range(self, emb, codebook):
        codes = codebook.encode(emb)
        bad = codes.filter(
            (F.size("codes") != M)
            | F.exists("codes", lambda c: (c < 0) | (c >= codebook.k))
        )
        assert bad.count() == 0

    def test_encode_deterministic(self, emb, codebook):
        a = {(r.id, tuple(r.codes)) for r in codebook.encode(emb).collect()}
        b = {(r.id, tuple(r.codes)) for r in codebook.encode(emb).collect()}
        assert a == b

    def test_same_seed_same_codebook(self, emb, codebook):
        again = Q.PqCodebook.fit(emb, DIM, m=M, k=64, seed=42)
        assert (again.centroids == codebook.centroids).all()


class TestPersistence:
    def test_roundtrip(self, spark, emb, codebook, tmp_path):
        path = str(tmp_path / "pq")
        codebook.save(spark, path)
        loaded = Q.PqCodebook.load(spark, path)
        assert loaded.dim == codebook.dim and loaded.m == codebook.m
        assert (loaded.centroids == codebook.centroids).all()
        a = {(r.id, tuple(r.codes)) for r in codebook.encode(emb).collect()}
        b = {(r.id, tuple(r.codes)) for r in loaded.encode(emb).collect()}
        assert a == b


class TestSearchQuality:
    K = 10

    @pytest.fixture(scope="class")
    def queries(self, emb):
        return emb.filter(F.col("vec_id") % 10 == 0)

    @pytest.fixture(scope="class")
    def exact(self, emb, queries):
        df = S.brute_force_topk(emb, queries, k=self.K)
        df.cache().count()
        return df

    def test_rerank_recall_gate(self, emb, queries, exact, codebook):
        approx = Q.pq_topk(
            emb, queries, DIM, k=self.K, shortlist=100, codebook=codebook
        )
        r = S.recall_at_k(approx, exact, self.K)
        assert r >= 0.85, f"PQ recall@{self.K} too low: {r}"

    def test_shortlist_bounded_per_query(self, emb, queries, codebook):
        codes = codebook.encode(emb)
        short = codebook.adc_shortlist(codes, queries, r=25)
        over = short.groupBy("query_id").count().filter(F.col("count") > 25)
        assert over.count() == 0

    def test_chunked_adc_identical_to_single_group(self, emb, queries, codebook):
        """The chunked (bounded-group) ADC path is a pure refactoring of
        the single-group scan: local top-r per hash chunk + window merge
        keeps exactly the global top-r, ties and all."""
        codes = codebook.encode(emb).cache()
        one = {(r.query_id, r.neighbor_id, round(r.adc_score, 9))
               for r in codebook.adc_shortlist(codes, queries, r=25,
                                               chunks=1).collect()}
        many = {(r.query_id, r.neighbor_id, round(r.adc_score, 9))
                for r in codebook.adc_shortlist(codes, queries, r=25,
                                                chunks=16).collect()}
        codes.unpersist()
        assert one == many and len(one) > 0

    def test_chunked_identical_under_rank_rounding(self, emb, queries,
                                                   codebook):
        """The oracle protocol's rounded cut (round-12): with
        rank_rounding set, the chunked path must still equal chunks=1
        EXACTLY - both Spark-side cuts share one numpy half-even
        rounding implementation, so a chunk-boundary candidate can
        never be admitted by one stage and cut by the other (the
        mixed F.round/np.round divergence the self-review flagged)."""
        codes = codebook.encode(emb).cache()
        one = {(r.query_id, r.neighbor_id, round(r.adc_score, 9))
               for r in codebook.adc_shortlist(
                   codes, queries, r=25, chunks=1,
                   rank_rounding=6).collect()}
        many = {(r.query_id, r.neighbor_id, round(r.adc_score, 9))
                for r in codebook.adc_shortlist(
                    codes, queries, r=25, chunks=16,
                    rank_rounding=6).collect()}
        codes.unpersist()
        assert one == many and len(one) > 0


class TestIvfPqComposition:
    K = 10

    def test_recall_and_group_bound(self, spark, emb):
        from kafka_cassandra_plugin_spark.operators.similarity import (
            IvfIndex,
            brute_force_topk,
            recall_at_k,
        )

        queries = emb.filter(F.col("vec_id") % 10 == 0)
        exact = brute_force_topk(emb, queries, k=self.K)
        idx = IvfIndex.build(emb, nlist=16, seed=42)
        cb = Q.PqCodebook.fit(emb, DIM, m=M, k=64, seed=42)
        approx = Q.ivf_pq_topk(idx, cb, queries, k=self.K, nprobe=10,
                               shortlist=100)
        r = recall_at_k(approx, exact, self.K)
        # two stacked approximations (probed lists x ADC shortlist);
        # the probe stage alone measures ~0.94 on this corpus
        assert r >= 0.8, f"IVF-PQ recall@{self.K} too low: {r}"
        per_q = approx.groupBy("query_id").count()
        assert per_q.filter(F.col("count") > self.K).count() == 0


class TestPersistedCodesPlan:
    def test_stored_codes_skip_encode_stage(self, spark, emb, codebook, tmp_path):
        """quantization.py promises persisted codes avoid re-encoding:
        with ``codes=stored`` the ivf_pq_topk plan must contain no
        ``_enc`` pandas-UDF stage over the corpus.  (The query-side
        ``probe`` UDF - bounded by the tiny query set - is present
        either way, so the assertion pins the encode stage by name, not
        ArrowEvalPython generically.)  Without stored codes the _enc
        stage appears."""
        from kafka_cassandra_plugin_spark import plans as P
        from kafka_cassandra_plugin_spark.operators.similarity import IvfIndex

        idx = IvfIndex.build(emb, nlist=8, seed=42)
        queries = emb.filter(F.col("vec_id") % 50 == 0)
        path = str(tmp_path / "codes")
        codebook.encode(
            idx.assigned, id_col="neighbor_id", vec_col="c_vec",
            keep=("list_id",),
        ).write.parquet(path)
        stored = spark.read.parquet(path)

        with_stored = P.formatted_plan(
            Q.ivf_pq_topk(idx, codebook, queries, k=5, codes=stored))
        assert "_enc(" not in with_stored
        assert "FlatMapGroupsInPandas" in with_stored

        without = P.formatted_plan(Q.ivf_pq_topk(idx, codebook, queries, k=5))
        assert "_enc(" in without


class TestClusterableRecall:
    """The adaptive-geometry recall claim, measured on clusterABLE data.

    The driver's synthetic embeddings are adversarially uniform
    (within-label cosine ~= cross-label ~= 0), where recall is
    probed-fraction-bound for ANY index - so these gates run on a
    planted-cluster corpus with the geometry real embedding corpora
    have (same construction as scripts/build_sf1.py --clustered, at
    reduced scale for suite runtime; the full 20k measurement is
    recorded in BASELINE.md via scripts/clustered_recall.py).  Gate:
    IVF recall@10 >= 0.9 at the default nprobe=10 and corpus-adaptive
    nlist - the round-4 VERDICT's 'done' criterion."""

    K = 10
    N, DIM_C, CLUSTERS, SIGMA = 6_000, 64, 60, 0.05

    @pytest.fixture(scope="class")
    def clustered(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        centers = rng.standard_normal((self.CLUSTERS, self.DIM_C)).astype("float32")
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, self.CLUSTERS, size=self.N)
        mat = centers[labels] + self.SIGMA * rng.standard_normal(
            (self.N, self.DIM_C)
        ).astype("float32")
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in mat[i]]) for i in range(self.N)],
            "vec_id long, embedding array<float>",
        ).cache()
        df.count()
        return df

    @pytest.fixture(scope="class")
    def c_queries(self, clustered):
        return clustered.filter(F.col("vec_id") % 50 == 0)  # 120 queries

    @pytest.fixture(scope="class")
    def c_exact(self, clustered, c_queries):
        df = S.brute_force_topk(clustered, c_queries, k=self.K)
        df.cache().count()
        return df

    def test_ivf_adaptive_geometry_recall(self, clustered, c_queries, c_exact):
        idx = S.IvfIndex.build(
            clustered, nlist=S.adaptive_nlist(self.N), seed=42
        )
        r = S.recall_at_k(idx.topk(c_queries, k=self.K, nprobe=10), c_exact, self.K)
        assert r >= 0.9, f"IVF recall@10 on clusterable corpus: {r}"

    def test_lsh_adaptive_geometry_recall(self, clustered, c_queries, c_exact):
        approx = S.rp_lsh_topk(
            clustered, c_queries, dim=self.DIM_C, k=self.K,
            n_planes=S.adaptive_n_planes(self.N),
        )
        r = S.recall_at_k(approx, c_exact, self.K)
        assert r >= 0.85, f"LSH recall@10 on clusterable corpus: {r}"

    def test_ivf_pq_recall(self, clustered, c_queries, c_exact):
        idx = S.IvfIndex.build(
            clustered, nlist=S.adaptive_nlist(self.N), seed=42
        )
        cb = Q.PqCodebook.fit(clustered, self.DIM_C, m=M, k=64, seed=42)
        approx = Q.ivf_pq_topk(idx, cb, c_queries, k=self.K, nprobe=10,
                               shortlist=100)
        r = S.recall_at_k(approx, c_exact, self.K)
        assert r >= 0.85, f"IVF-PQ recall@10 on clusterable corpus: {r}"


class TestNonBigintIds:
    def test_string_ids_flow_through(self, spark, emb):
        """pq_topk's output contract follows brute_force_topk: id-type
        agnostic (the ADC schema mirrors the input id types)."""
        s = emb.select(
            F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
            "embedding",
        )
        q = s.filter(F.col("vec_id").endswith("0")).limit(5)
        out = Q.pq_topk(s, q, DIM, k=3, shortlist=20,
                        codebook=None, m=M, n_codes=32)
        row = out.first()
        assert isinstance(row.query_id, str) and isinstance(row.neighbor_id, str)

    def test_precomputed_codes_reused(self, emb, codebook):
        codes = codebook.encode(emb)
        q = emb.filter(F.col("vec_id") % 10 == 0)
        a = {(r.query_id, r.neighbor_id)
             for r in Q.pq_topk(emb, q, DIM, k=5, codebook=codebook).collect()}
        b = {(r.query_id, r.neighbor_id)
             for r in Q.pq_topk(emb, q, DIM, k=5, codebook=codebook,
                                codes=codes).collect()}
        assert a == b
