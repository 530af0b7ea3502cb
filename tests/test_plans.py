"""Plan-shape regression tests: pin the physical-plan properties that
matter at 100 TB (pushdown, pruning, broadcast, shuffle budgets) for
representative declared queries.  A silent plan regression (lost
pushdown, a new shuffle) fails here even though answers stay right."""

from __future__ import annotations

import pytest

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.queries import load_all

REG = load_all()


@pytest.fixture(scope="module")
def q(spark, oracle_sf_dir):
    def build(name):
        return REG[name].build(spark, oracle_sf_dir)

    return build


class TestPushdown:
    def test_shipdate_filter_reaches_scan(self, q):
        P.assert_filter_pushed(q("agg_pricing_summary"), "l_shipdate")

    def test_predicates_reach_scan(self, q):
        P.assert_filter_pushed(q("filter_predicates"), "o_totalprice")

    def test_point_lookup_in_filter_pushed(self, q):
        # kv lookup: the IN list must reach the parquet scan (R1 pushdown,
        # the Spark analog of Cassandra PK-restricted SELECT)
        P.assert_filter_pushed(q("kv_point_lookup"), "o_orderkey")


class TestPruning:
    def test_q1_reads_only_needed_columns(self, q):
        # lineitem has 11 columns; Q1 needs 7
        P.assert_column_pruned(q("agg_pricing_summary"), table_cols=11, max_cols=7)

    def test_topk_reads_three_columns(self, q):
        # part has 9 columns; per-group top-k needs brand/partkey/price
        P.assert_column_pruned(q("topk_per_group"), table_cols=9, max_cols=3)


class TestPartitionPruning:
    def test_partitioned_write_prunes_directories(self, q):
        df = q("parquet_roundtrip")
        pf = P.partition_filters(df)
        assert any("1997" in f for f in pf), (
            f"expected a partition filter on y=1997, got {pf}"
        )


class TestJoinStrategy:
    def test_star_join_broadcasts_dims(self, q):
        # customer/nation/region must broadcast; only lineitem<->orders may shuffle
        df = q("join_star_revenue")
        P.assert_broadcast(df, at_least=3)

    def test_range_bands_is_broadcast_nlj(self, q):
        df = q("join_range_bands")
        assert P.count_broadcast_joins(df) >= 1
        # the part table itself must not shuffle for the join (agg may)
        P.assert_max_shuffles(df, budget=2)

    def test_topk_is_take_ordered(self, q):
        # global sort + LIMIT must plan as per-partition heaps, not a full sort
        assert "TakeOrderedAndProject" in P.formatted_plan(q("term_frequency_topk"))


class TestShuffleBudgets:
    @pytest.mark.parametrize(
        "name,budget",
        [
            ("agg_pricing_summary", 1),   # one agg shuffle (+ sort collapses into TakeOrdered/AQE)
            ("asof_last_purchase", 1),    # one shuffle by user_id
            ("dedup_latest_per_key", 1),  # one shuffle by custkey
            ("term_frequency_topk", 1),   # explode is map-side; one count shuffle
            ("text_stats", 0),            # pure projection: NO shuffle at all
        ],
    )
    def test_shuffle_budget(self, q, name, budget):
        df = q(name)
        # +1 tolerance for the final global orderBy (range exchange) the
        # oracle protocol demands; the operator itself must fit `budget`.
        P.assert_max_shuffles(df, budget=budget + 1)


class TestCodegen:
    def test_hot_queries_are_codegened(self, q):
        for name in ["agg_pricing_summary", "join_star_revenue", "fn_string"]:
            assert P.wholestage_codegen_ids(q(name)), f"{name} lost codegen"


class TestEmbeddingDedupPlan:
    def test_no_cartesian_and_bounded_shuffles(self, q):
        """Tier-5 dedup must stay an equi-join on the block signature -
        a CartesianProduct here means blocking silently fell out of the
        plan (the 100 TB disaster case)."""
        df = q("dedup_embedding_cosine")
        plan = P.formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # two vector builds (join sides, each agg + explicit blk
        # repartition) + pair-join + final orderBy: the blocked
        # self-join must plan as equality join, shuffles stay bounded
        # (no quadratic exchange)
        P.assert_max_shuffles(df, budget=8)

    def test_vector_build_is_codegened(self, q):
        # the n_dims conditional-sum aggregation must stay inside
        # whole-stage codegen (the map->densify formulation it replaced
        # was interpreted)
        assert P.wholestage_codegen_ids(q("dedup_embedding_cosine"))


class TestHashDedupPlans:
    @pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_simhash"])
    def test_candidates_come_from_equi_joins(self, q, name):
        """LSH banding / chunk blocking must plan as equality joins -
        a cartesian fallback means candidate generation went quadratic."""
        plan = P.formatted_plan(q(name))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPortableLshPlan:
    def test_candidates_equi_join_queries_broadcast(self, q):
        """The hash-matched ANN row keeps the rp_lsh_topk plan shape:
        candidates from a (table,bucket)-key equality join (never a
        cartesian), and the query-vector re-attach is a broadcast (the
        query set is small by contract)."""
        plan = P.formatted_plan(q("sim_lsh_ann_portable"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan  # q_vecs re-attach
