"""Quality gates for the non-oracle LLM ops: planted-duplicate recall for
MinHash-LSH / SimHash, recall@k vs brute force for the ANN paths, and
dedup idempotence (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import dedup as D
from kafka_cassandra_plugin_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select("doc_id", "text")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return Catalog(spark, sf_dir).embeddings


def plant_exact(docs, mod=5):
    return docs.unionByName(
        docs.filter(F.col("doc_id") % mod == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )


class TestMinHashLsh:
    def test_planted_exact_dups_recall(self, docs):
        corpus = plant_exact(docs, mod=5)
        planted = {
            (r.doc_id, r.doc_id + 1000000)
            for r in docs.filter(F.col("doc_id") % 5 == 0).collect()
        }
        pairs = {
            (r.id_a, r.id_b)
            for r in D.minhash_lsh_dedup_pairs(
                corpus, threshold=0.9, num_hashes=64, bands=16
            ).collect()
        }
        # identical docs agree on every band -> recall must be 1.0
        assert planted <= pairs

    def test_dedup_idempotent(self, docs):
        once = D.exact_dedup(plant_exact(docs), "text", "doc_id")
        twice = D.exact_dedup(once, "text", "doc_id")
        assert once.count() == twice.count() == docs.count()


class TestSimHash:
    def test_planted_exact_dups_recall(self, docs):
        corpus = plant_exact(docs, mod=7)
        planted = {
            (r.doc_id, r.doc_id + 1000000)
            for r in docs.filter(F.col("doc_id") % 7 == 0).collect()
        }
        pairs = {
            (r.id_a, r.id_b)
            for r in D.simhash_near_pairs(corpus, max_hamming=0).collect()
        }
        assert planted <= pairs  # identical text -> identical simhash

    def test_hamming_bound_respected(self, docs):
        out = D.simhash_near_pairs(plant_exact(docs), max_hamming=3)
        assert out.filter(F.col("hamming") > 3).count() == 0


class TestAnnRecall:
    K = 10

    @pytest.fixture(scope="class")
    def exact(self, emb):
        q = emb.filter(F.col("vec_id") % 10 == 0)
        df = S.brute_force_topk(emb, q, k=self.K)
        df.cache().count()
        return df

    def test_lsh_recall(self, emb, exact):
        q = emb.filter(F.col("vec_id") % 10 == 0)
        approx = S.rp_lsh_topk(emb, q, dim=64, k=self.K)
        r = S.recall_at_k(approx, exact, self.K)
        assert r >= 0.5, f"LSH recall@{self.K} too low: {r}"

    def test_ivf_recall(self, emb, exact):
        q = emb.filter(F.col("vec_id") % 10 == 0)
        approx = S.ivf_topk(emb, q, k=self.K, nlist=16, nprobe=8)
        r = S.recall_at_k(approx, exact, self.K)
        assert r >= 0.5, f"IVF recall@{self.K} too low: {r}"

    def test_exact_self_recall(self, exact):
        assert S.recall_at_k(exact, exact, self.K) == 1.0
