"""SemDeDup-style semantic dedup (SURVEY §2.5 D16): planted
near-identical embeddings are caught and resolved to min-id survivors,
the prebuilt-index path is equivalent to the self-built one (and skips
clustering), candidate generation is an equi-join on the cluster id
(never a cartesian), recall matches the exact all-pairs baseline on
exact copies, and the degenerate-cell cap bounds fanout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import dedup as D
from kafka_cassandra_plugin_spark.operators.similarity import IvfIndex


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Embeddings + exact copies of every 10th vector under new ids:
    an exact copy is the strongest semantic dup (cosine 1.0) and is
    blocking-proof — identical vectors always share a cluster."""
    emb = Catalog(spark, sf_dir).embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    copies = emb.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 1_000_000).alias("id"), "vec"
    )
    df = emb.unionByName(copies)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def planted_ids(corpus):
    return {
        r.id - 1_000_000
        for r in corpus.filter(F.col("id") >= 1_000_000).collect()
    }


class TestSemanticDedup:
    def test_every_exact_copy_paired(self, corpus, planted_ids):
        pairs = D.semantic_dedup_pairs(corpus, threshold=0.99,
                                       nlist=8, seed=7)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        for base in planted_ids:
            assert (base, base + 1_000_000) in got, base
        # exact copies score cosine 1.0
        assert all(r.cosine == 1.0 for r in pairs.filter(
            F.col("id_b") - F.col("id_a") == 1_000_000).collect())

    def test_survivors_drop_copies_keep_min(self, corpus, planted_ids):
        kept = {r.id for r in
                D.semantic_dedup(corpus, threshold=0.99, nlist=8,
                                 seed=7).select("id").collect()}
        for base in planted_ids:
            assert base in kept and base + 1_000_000 not in kept

    def test_prebuilt_index_path_equivalent_and_reused(self, corpus):
        idx = IvfIndex.build(
            corpus.select(F.col("id").alias("vec_id"),
                          F.col("vec").alias("embedding")),
            nlist=8, seed=7,
        )
        a = {(r.id_a, r.id_b) for r in D.semantic_dedup_pairs(
            corpus, threshold=0.99, nlist=8, seed=7).collect()}
        b = {(r.id_a, r.id_b) for r in D.semantic_dedup_pairs(
            corpus, threshold=0.99, index=idx).collect()}
        assert a == b

    def test_matches_exact_allpairs_on_exact_copies(self, corpus, planted_ids):
        """The all-pairs baseline finds every cosine>=0.99 pair; the
        cluster-blocked tier must find at least the exact-copy subset
        (identical vector -> identical cell, structurally guaranteed)."""
        exact = D.embedding_cosine_pairs(
            corpus, threshold=0.99, id_col="id", vec_col="vec",
            block_top_k=None,
        )
        exact_copy_pairs = {
            (r.id_a, r.id_b)
            for r in exact.collect()
            if r.id_b - r.id_a == 1_000_000
        }
        got = {(r.id_a, r.id_b) for r in D.semantic_dedup_pairs(
            corpus, threshold=0.99, nlist=8, seed=7).collect()}
        assert exact_copy_pairs <= got
        assert len(exact_copy_pairs) == len(planted_ids)

    def test_equi_join_plan_no_cartesian(self, corpus):
        plan = (
            D.semantic_dedup_pairs(corpus, threshold=0.99, nlist=8, seed=7)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_cluster_cap_bounds_fanout(self, corpus):
        # cap below any cell size -> zero candidates survive the cap
        pairs = D.semantic_dedup_pairs(corpus, threshold=0.99, nlist=8,
                                       seed=7, max_cluster_size=1)
        assert pairs.count() == 0


class TestPerturbedRecall:
    """Near-dup (not exact-copy) recall: slightly perturbed vectors -
    cosine ~0.999, the SemDeDup regime - must land in the same KMeans
    cell almost always.  Gate at 0.9 pair recall vs the exact
    all-pairs baseline (the published method's boundary-straddle loss
    is the remainder)."""

    @pytest.fixture(scope="class")
    def perturbed_corpus(self, spark, sf_dir):
        emb = Catalog(spark, sf_dir).embeddings.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )
        # deterministic micro-perturbation: x_i + 0.003*sin(id + i)
        copies = emb.filter(F.col("id") % 7 == 0).select(
            (F.col("id") + 1_000_000).alias("id"),
            F.transform(
                "vec",
                lambda x, i: x + 0.003 * F.sin(F.col("id") + i),
            ).alias("vec"),
        )
        df = emb.unionByName(copies)
        df.cache().count()
        return df

    def test_perturbed_pair_recall(self, perturbed_corpus):
        exact = {
            (r.id_a, r.id_b)
            for r in D.embedding_cosine_pairs(
                perturbed_corpus, threshold=0.99, id_col="id",
                vec_col="vec", block_top_k=None,
            ).collect()
            if r.id_b - r.id_a == 1_000_000
        }
        assert exact  # the perturbation stayed above the threshold
        got = {
            (r.id_a, r.id_b)
            for r in D.semantic_dedup_pairs(
                perturbed_corpus, threshold=0.99, nlist=8, seed=7
            ).collect()
        }
        recall = len(exact & got) / len(exact)
        assert recall >= 0.9, recall


class TestSemanticOracle:
    """D16's DuckDB oracle (§2.4 canonical protocol at sf0.01): the
    cell assignment exports as a literal (id, list_id) table and DuckDB
    independently re-derives the planted corpus, the blocking join, the
    cluster cap, and the exact left-fold cosine - everything downstream
    of the (recall-gated) KMeans fit hash-matches."""

    def test_oracle_match_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            semantic_dedup_oracle,
        )

        df, sql = semantic_dedup_oracle(spark, oracle_sf_dir, duck)
        n = oracle.compare(df, duck, sql, name="dedup_semantic")
        # every planted exact copy (id%10==0 -> id+1e6, cosine 1.0)
        # must be in the matched result, so n bounds below at the
        # planted-copy count
        planted = duck.execute(
            "SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0"
        ).fetchone()[0]
        assert n >= planted > 0


class TestLoadedIndexPath:
    def test_disk_loaded_index_equivalent(self, spark, corpus, tmp_path):
        """The daily-run shape: semantic dedup over an index LOADED from
        its partitioned-parquet layout must match the in-memory build -
        the stored (id, vec, list_id) table is the whole clustering
        state."""
        built = IvfIndex.build(
            corpus.select(F.col("id").alias("vec_id"),
                          F.col("vec").alias("embedding")),
            nlist=8, seed=7,
        )
        loaded = built.save(str(tmp_path / "sem_ix"))
        a = {(r.id_a, r.id_b) for r in D.semantic_dedup_pairs(
            corpus, threshold=0.99, index=built).collect()}
        b = {(r.id_a, r.id_b) for r in D.semantic_dedup_pairs(
            corpus, threshold=0.99, index=loaded).collect()}
        assert a == b and a
