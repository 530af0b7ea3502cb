"""Star connected components (SURVEY §2.5 D13): agreement with a
driver-side union-find oracle and with the propagation labeler on
random graphs, correct handling of cliques/chains/isolates, the
diameter-independence claim (a chain far deeper than the propagation
round budget labels correctly), and the survivors wiring."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators import dedup as D
from kafka_cassandra_plugin_spark.operators import graph as G


def _union_find(n_nodes, edges):
    """Reference labels: component min per node, computed driver-side."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in range(n_nodes)}


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a: long, id_b: long"
    )


def _nodes(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _labels(df):
    return {r.node: r.label for r in df.collect()}


class TestStarLabels:
    def test_two_cliques_and_an_isolate(self, spark):
        edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12)]
        got = _labels(G.component_labels_star(_nodes(spark, 14), _pairs(spark, edges)))
        assert got[0] == got[1] == got[2] == 0
        assert got[10] == got[11] == got[12] == 10
        assert got[13] == 13  # isolate labels itself

    def test_empty_edge_set_all_singletons(self, spark):
        got = _labels(G.component_labels_star(_nodes(spark, 5),
                                              _pairs(spark, [])))
        assert got == {i: i for i in range(5)}

    def test_duplicate_and_reversed_edges_are_harmless(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 3)]
        got = _labels(G.component_labels_star(_nodes(spark, 4), _pairs(spark, edges)))
        assert got[1] == got[2] == got[3] == 1 and got[0] == 0

    @pytest.mark.parametrize("seed", [7, 21, 99])
    def test_random_graph_matches_union_find(self, spark, seed):
        rng = random.Random(seed)
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        edges = [e for e in edges if e[0] != e[1]]
        want = _union_find(n, edges)
        got = _labels(G.component_labels_star(_nodes(spark, n), _pairs(spark, edges)))
        assert got == want

    def test_agrees_with_propagation_on_shallow_graph(self, spark):
        rng = random.Random(4)
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
        edges = [e for e in edges if e[0] != e[1]]
        star = _labels(G.component_labels_star(_nodes(spark, n), _pairs(spark, edges)))
        prop = _labels(D.component_labels(_nodes(spark, n), _pairs(spark, edges)))
        assert star == prop

    def test_deep_chain_beyond_propagation_budget(self, spark):
        # a 400-edge path: propagation moves the min ONE hop per round,
        # so its default 20-round budget cannot label the far end - the
        # star rounds contract doubly-logarithmically and can
        n = 401
        chain = [(i, i + 1) for i in range(n - 1)]
        got = _labels(G.component_labels_star(_nodes(spark, n), _pairs(spark, chain)))
        assert set(got.values()) == {0}
        prop = _labels(D.component_labels(_nodes(spark, n), _pairs(spark, chain),
                                          max_rounds=20))
        assert prop[n - 1] != 0  # the default budget provably isn't enough here

    def test_nonconvergence_raises(self, spark):
        with pytest.raises(RuntimeError, match="did not converge"):
            G.connected_components_star(
                _pairs(spark, [(i, i + 1) for i in range(64)]), max_rounds=1
            )


class TestSurvivorsWiring:
    def test_star_and_propagation_keep_identical_rows(self, spark):
        rng = random.Random(11)
        n = 50
        df = _nodes(spark, n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
        pairs = _pairs(spark, [e for e in edges if e[0] != e[1]])
        a = {r.doc_id for r in D.survivors_from_pairs(df, pairs).collect()}
        b = {r.doc_id for r in
             D.survivors_from_pairs(df, pairs, labeler="star").collect()}
        assert a == b

    def test_star_survivor_is_component_min(self, spark):
        df = _nodes(spark, 6)
        pairs = _pairs(spark, [(3, 5), (4, 3)])
        kept = {r.doc_id for r in
                D.survivors_from_pairs(df, pairs, labeler="star").collect()}
        assert kept == {0, 1, 2, 3}


class TestComponentLabelsAuto:
    """Round-15 optimization: the driver union-find fast path of
    component_labels_auto must agree exactly with the distributed
    propagation labeler (it replaced the loop inside
    dedup_ngram_jaccard - 44 -> ~20 Spark jobs at sf0.1)."""

    @pytest.mark.parametrize("seed", [3, 17, 42])
    def test_agrees_with_propagation(self, spark, seed):
        rng = random.Random(seed)
        n = 50
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(35)]
        edges = [e for e in edges if e[0] != e[1]]
        nodes = _nodes(spark, n)
        auto = {r.node: r.label for r in D.component_labels_auto(
            nodes, _pairs(spark, edges)).collect()}
        prop = {r.node: r.label for r in D.component_labels(
            nodes, _pairs(spark, edges)).collect()}
        assert auto == prop

    def test_isolated_nodes_label_themselves(self, spark):
        got = {r.node: r.label for r in D.component_labels_auto(
            _nodes(spark, 6), _pairs(spark, [(0, 1)])).collect()}
        assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4, 5: 5}

    def test_over_cap_falls_back_to_distributed(self, spark, monkeypatch):
        # cap of 1: two edges must route through component_labels
        monkeypatch.setattr(D, "MAX_DRIVER_PAIRS", 1)
        got = {r.node: r.label for r in D.component_labels_auto(
            _nodes(spark, 4), _pairs(spark, [(0, 1), (1, 2)])).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 3}

    def test_union_find_labels_matches_reference(self):
        rng = random.Random(9)
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
        edges = [e for e in edges if e[0] != e[1]]
        want = _union_find(n, edges)
        got = D.union_find_labels(edges)
        touched = {u for e in edges for u in e}
        assert got == {x: want[x] for x in touched}
