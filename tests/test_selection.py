"""D23 DSIR importance-resampled data selection (arXiv:2302.03169).

Gates: hand-computed log importance weights exact to the ulp against
an independent Python reimplementation of the hashed-ngram multinomial
ratio; empty docs are distribution-neutral; target-like raw documents
outweigh off-target ones; the Gumbel draw is deterministic per seed and
moves with the seed; selection prefers high-weight docs; plan shapes
(no cartesian, no Python eval, ratio table broadcast); DuckDB oracle at
sf0.01 under the §2.4 canonical protocol.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.selection import (
    bucket_distribution,
    dsir_logweights,
    dsir_select,
    hashed_ngram_buckets,
)

B, S = 64, 1.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _h52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _grams(text: str):
    t = [x.lower() for x in text.split() if x]
    return t + [" ".join(t[i:i + 2]) for i in range(len(t) - 1)]


TARGET_ROWS = [(100, "alpha beta alpha"), (101, "beta gamma")]
RAW_ROWS = [
    (1, "alpha beta"),
    (2, "delta epsilon zeta"),
    (3, "alpha alpha alpha"),
    (4, ""),
]


@pytest.fixture(scope="module")
def target(spark):
    return _docs(spark, TARGET_ROWS)


@pytest.fixture(scope="module")
def raw(spark):
    return _docs(spark, RAW_ROWS)


def _expected_weights():
    tc, rc = Counter(), Counter()
    for _, txt in TARGET_ROWS:
        tc.update(_h52(g) % B for g in _grams(txt))
    for _, txt in RAW_ROWS:
        rc.update(_h52(g) % B for g in _grams(txt))
    t_tot, r_tot = sum(tc.values()), sum(rc.values())

    def logr(b):
        return (math.log((tc[b] + S) / (t_tot + S * B))
                - math.log((rc[b] + S) / (r_tot + S * B)))

    return {
        did: sum(logr(_h52(g) % B) for g in _grams(txt))
        for did, txt in RAW_ROWS
    }


class TestWeights:
    def test_hand_computed_logweights_exact(self, raw, target):
        td = bucket_distribution(target, buckets=B, hash_fn="md5")
        rd = bucket_distribution(raw, buckets=B, hash_fn="md5")
        got = {
            r.doc_id: r.logw
            for r in dsir_logweights(raw, td, rd, buckets=B,
                                     hash_fn="md5").collect()
        }
        for did, w in _expected_weights().items():
            assert got[did] == pytest.approx(w, abs=1e-12), did

    def test_empty_doc_is_neutral(self, raw, target):
        td = bucket_distribution(target, buckets=B, hash_fn="md5")
        rd = bucket_distribution(raw, buckets=B, hash_fn="md5")
        w = dsir_logweights(raw, td, rd, buckets=B, hash_fn="md5")
        assert w.filter(F.col("doc_id") == 4).first().logw == 0.0

    def test_target_like_doc_outweighs_off_target(self, raw, target):
        """Doc 1 shares its vocabulary with the target; doc 2 shares
        nothing — the importance ratio must order them."""
        weights = _expected_weights()
        assert weights[1] > weights[2]
        td = bucket_distribution(target, buckets=B, hash_fn="md5")
        rd = bucket_distribution(raw, buckets=B, hash_fn="md5")
        got = {r.doc_id: r.logw
               for r in dsir_logweights(raw, td, rd, buckets=B,
                                        hash_fn="md5").collect()}
        assert got[1] > got[2]

    def test_multiplicity_counts(self, spark, target):
        """The bag counts OCCURRENCES: 'alpha alpha' contributes the
        alpha bucket twice, not once (plus its bigram)."""
        one = _docs(spark, [(1, "alpha")])
        two = _docs(spark, [(1, "alpha alpha")])
        occ1 = hashed_ngram_buckets(one, buckets=B, hash_fn="md5").count()
        occ2 = hashed_ngram_buckets(two, buckets=B, hash_fn="md5").count()
        assert (occ1, occ2) == (1, 3)

    def test_xxhash_variant_runs(self, raw, target):
        """The at-scale bucket hash: same shape, different buckets —
        every weight finite, every doc covered."""
        td = bucket_distribution(target, buckets=B)
        rd = bucket_distribution(raw, buckets=B)
        rows = dsir_logweights(raw, td, rd, buckets=B).collect()
        assert len(rows) == len(RAW_ROWS)
        assert all(math.isfinite(r.logw) for r in rows)


class TestSelection:
    def test_deterministic_per_seed(self, raw, target):
        a = [r.doc_id for r in dsir_select(raw, target, k=2, buckets=B,
                                           hash_fn="md5").collect()]
        b = [r.doc_id for r in dsir_select(raw, target, k=2, buckets=B,
                                           hash_fn="md5").collect()]
        assert a == b

    def test_seed_moves_the_draw(self, spark, target):
        """With many identically-weighted docs the Gumbel noise is the
        only discriminator, so two seeds must disagree somewhere."""
        pool = _docs(spark, [(i, "filler text") for i in range(200)])
        a = {r.doc_id for r in dsir_select(pool, target, k=20, buckets=B,
                                           seed=1, hash_fn="md5").collect()}
        b = {r.doc_id for r in dsir_select(pool, target, k=20, buckets=B,
                                           seed=2, hash_fn="md5").collect()}
        assert a != b

    def test_selection_prefers_high_weight(self, spark):
        """100 target-like + 100 off-target docs, k=50: the softmax
        resample must pull overwhelmingly from the target-like half
        (weight gap >> Gumbel scale)."""
        target = _docs(spark, [
            (1000 + i, "quantum flux harmonics resonance cascade")
            for i in range(5)
        ])
        pool = _docs(
            spark,
            [(i, "quantum flux harmonics resonance cascade")
             for i in range(100)]
            + [(100 + i, "mundane filler words entirely elsewhere")
               for i in range(100)],
        )
        got = dsir_select(pool, target, k=50, buckets=1024,
                          hash_fn="md5").collect()
        on_target = sum(1 for r in got if r.doc_id < 100)
        assert on_target >= 45
        # and the exposed key actually ordered the draw
        keys = [r.gumbel_key for r in got]
        assert all(math.isfinite(x) for x in keys)

    def test_threshold_variant_approximates_topk(self, spark, target):
        """The distributed cut returns ~k rows, every one at/above the
        threshold, and contains the exact top-k's head (the quantile
        sketch can only blur the BOUNDARY, not the interior)."""
        from kafka_cassandra_plugin_spark.operators.selection import (
            dsir_select_threshold,
        )

        pool = _docs(spark, [(i, f"word{i % 37} filler text common")
                             for i in range(500)])
        k = 50
        exact = [r.doc_id for r in dsir_select(
            pool, target, k=k, buckets=B, hash_fn="md5").collect()]
        approx = {r.doc_id for r in dsir_select_threshold(
            pool, target, k=k, buckets=B, hash_fn="md5",
            rel_err=0.01).collect()}
        assert abs(len(approx) - k) <= 0.01 * 500 + 1
        # interior of the exact draw survives the boundary blur
        assert set(exact[: k - 6]) <= approx

    def test_threshold_variant_k_ge_n_returns_all(self, raw, target):
        from kafka_cassandra_plugin_spark.operators.selection import (
            dsir_select_threshold,
        )

        out = dsir_select_threshold(raw, target, k=100, buckets=B,
                                    hash_fn="md5")
        assert out.count() == len(RAW_ROWS)

    def test_k_bounds_output(self, raw, target):
        assert dsir_select(raw, target, k=3, buckets=B,
                           hash_fn="md5").count() == 3
        assert dsir_select(raw, target, k=100, buckets=B,
                           hash_fn="md5").count() == len(RAW_ROWS)


class TestPlans:
    def test_no_cartesian_no_python(self, raw, target):
        plan = P.formatted_plan(
            dsir_select(raw, target, k=2, buckets=B, hash_fn="md5"))
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan

    def test_ratio_table_broadcasts(self, raw, target):
        """The per-occurrence join against the <=B-row ratio table must
        be broadcast — shuffling the exploded corpus by bucket would be
        the classic anti-plan."""
        td = bucket_distribution(target, buckets=B, hash_fn="md5")
        rd = bucket_distribution(raw, buckets=B, hash_fn="md5")
        plan = P.formatted_plan(
            dsir_logweights(raw, td, rd, buckets=B, hash_fn="md5"))
        assert "BroadcastHashJoin" in plan


class TestOracle:
    def test_dsir_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            DSIR_SELECT_SQL,
            dsir_selection,
        )

        df = dsir_selection(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, DSIR_SELECT_SQL, "dsir_select")
        assert n == 200
