"""Unit + property tests for the reference-semantics library
(operators/kv.py, operators/changes.py) against hand-computed
expectations on the FIXTURES.md group-B schemas, pinning the contracts
the reference specifies:

- put-throws-on-existing / update-throws-on-missing (README.md:194-209)
- CAS insert/update/delete guards (CassandraLeaderElection.scala:53-60)
- TTL lease expiry (README.md:314)
- leader-election fold (CassandraLeaderElection.scala:111-137)
- CDC completeness: replay(value_changes(H)) == latest_snapshot(H)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators import changes as C
from kafka_cassandra_plugin_spark.operators import kv as KV


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def kv_df(spark):
    return spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", None)], "key string, value string"
    )


def rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


class TestStorageContract:
    def test_kv_get(self, spark, kv_df):
        assert rows(KV.kv_get(kv_df, ["a", "zz"]), "key") == [("a", "1")]

    def test_put_new_key(self, spark, kv_df):
        new = spark.createDataFrame([("d", "4")], "key string, value string")
        out = KV.kv_put(kv_df, new)
        assert ("d", "4") in rows(out, "key")
        assert out.count() == 4

    def test_put_throws_on_existing(self, spark, kv_df):
        new = spark.createDataFrame([("a", "9")], "key string, value string")
        with pytest.raises(KV.KeyExistsError):
            KV.kv_put(kv_df, new)

    def test_update_existing(self, spark, kv_df):
        upd = spark.createDataFrame([("a", "9")], "key string, value string")
        out = rows(KV.kv_update(kv_df, upd), "key")
        assert out == [("a", "9"), ("b", "2"), ("c", None)]

    def test_update_throws_on_missing(self, spark, kv_df):
        upd = spark.createDataFrame([("zz", "9")], "key string, value string")
        with pytest.raises(KV.KeyNotFoundError):
            KV.kv_update(kv_df, upd)


class TestCas:
    def test_cas_insert_only_absent(self, spark, kv_df):
        new = spark.createDataFrame(
            [("a", "X"), ("d", "4")], "key string, value string"
        )
        out = rows(KV.cas_insert(kv_df, new, ["key"]), "key")
        assert out == [("a", "1"), ("b", "2"), ("c", None), ("d", "4")]

    def test_cas_insert_contended_key_single_winner(self, spark, kv_df):
        new = spark.createDataFrame(
            [("d", "zzz"), ("d", "aaa")], "key string, value string"
        )
        out = rows(KV.cas_insert(kv_df, new, ["key"]), "key")
        assert ("d", "aaa") in out and ("d", "zzz") not in out

    def test_cas_update_guard(self, spark):
        lease = spark.createDataFrame(
            [("r1", "alice", "s1"), ("r2", "bob", "s2")],
            "resource string, owner string, sup_data string",
        )
        upd = KV.with_upd_marker(
            spark.createDataFrame(
                [("r1", "alice", "alice2"), ("r2", "carol", "carol2")],
                "resource string, expected_owner string, new_owner string",
            )
        )
        out = rows(KV.cas_update(lease, upd, ["resource"], ["owner"]), "resource")
        # r1: guard holds (owner==alice) -> rewritten; r2: guard fails -> kept
        assert out == [("r1", "alice2", "s1"), ("r2", "bob", "s2")]

    def test_cas_delete_guard(self, spark):
        lease = spark.createDataFrame(
            [("r1", "alice"), ("r2", "bob")], "resource string, owner string"
        )
        dels = KV.with_upd_marker(
            spark.createDataFrame(
                [("r1", "alice"), ("r2", "carol")],
                "resource string, expected_owner string",
            )
        )
        out = rows(KV.cas_delete(lease, dels, ["resource"], ["owner"]), "resource")
        assert out == [("r2", "bob")]  # r1 resigned; r2 guard failed


class TestLease:
    LEASES = [
        ("r1", "alice", ts("2024-01-01 00:00:10")),
        ("r2", "bob", ts("2024-01-01 00:00:08")),
        ("r3", "carol", ts("2024-01-01 00:00:12")),  # in the future vs now
    ]

    def test_lease_view_ttl(self, spark):
        df = spark.createDataFrame(
            self.LEASES, "resource string, owner string, write_ts timestamp_ntz"
        )
        live = rows(
            KV.lease_view(df, "2024-01-01 00:00:11", ttl_seconds=2), "resource"
        )
        # r1 written 1s ago: live. r2 written 3s ago: expired. r3: future write excluded.
        assert [r[0] for r in live] == ["r1"]

    def test_current_leaders_tiebreak(self, spark):
        hb = spark.createDataFrame(
            [
                ("r1", "alice", ts("2024-01-01 00:00:10")),
                ("r1", "bob", ts("2024-01-01 00:00:10")),  # same ts: owner max wins
            ],
            "resource string, owner string, write_ts timestamp_ntz",
        )
        out = rows(KV.current_leaders(hb, "2024-01-01 00:00:11", 5), "resource")
        assert out[0][:2] == ("r1", "bob")


class TestLeaderTimeline:
    def test_fold(self, spark):
        hb = spark.createDataFrame(
            [
                ("r1", "a", ts("2024-01-01 00:00:00")),  # acquire (no owner)
                ("r1", "b", ts("2024-01-01 00:00:01")),  # reject (a holds, fresh)
                ("r1", "a", ts("2024-01-01 00:00:02")),  # renew (elapsed 2 < ttl 3)
                ("r1", "b", ts("2024-01-01 00:00:10")),  # acquire (a expired, ttl=3)
                ("r2", "c", ts("2024-01-01 00:00:00")),  # independent resource
            ],
            "resource string, candidate string, ts timestamp_ntz",
        )
        out = rows(
            KV.leader_timeline(hb, ttl_seconds=3), "resource", "ts", "candidate"
        )
        actions = [(r[0], r[1], r[3], r[4]) for r in out]
        assert actions == [
            ("r1", "a", "a", "acquire"),
            ("r1", "b", "a", "reject"),
            ("r1", "a", "a", "renew"),
            ("r1", "b", "b", "acquire"),
            ("r2", "c", "c", "acquire"),
        ]

    def test_chunked_replay_equals_plain_fold(self, spark, oracle_sf_dir):
        """The hot-resource escape hatch: slicing the log into time
        chunks with carried (owner, owner_ts) state must reproduce the
        single-group fold exactly, for several chunkings, on the real
        events fixture."""
        from kafka_cassandra_plugin_spark.catalog import Catalog

        ev = Catalog(spark, oracle_sf_dir).events
        hb = ev.filter(F.col("event_id") < 5000).selectExpr(
            "concat('r', cast(pmod(event_id, 5) as string)) as resource",
            "concat('c', cast(pmod(event_id, 3) as string)) as candidate",
            "cast(ts as timestamp_ntz) as ts",
        )
        plain = rows(
            KV.leader_timeline(hb, ttl_seconds=30),
            "resource", "ts", "candidate",
        )
        for n_chunks in (1, 3, 8):
            chunked = rows(
                KV.leader_timeline_chunked(hb, ttl_seconds=30,
                                           n_chunks=n_chunks),
                "resource", "ts", "candidate",
            )
            assert chunked == plain, f"n_chunks={n_chunks} diverged"

    def test_chunked_replay_empty_input(self, spark):
        hb = spark.createDataFrame(
            [], "resource string, candidate string, ts timestamp_ntz"
        )
        assert KV.leader_timeline_chunked(hb, ttl_seconds=2).count() == 0

    def test_ttl_boundary_shared_with_lease_view(self, spark):
        """The exact-TTL instant: Cassandra expires the row at exactly
        write_ts + ttl.  Both the batch fold (leader_timeline) and the
        lease view must treat elapsed == ttl as EXPIRED (round-1 advisor
        finding: the two paths disagreed at the boundary)."""
        # fold: b beats at exactly owner_ts + ttl -> acquire, not reject
        hb = spark.createDataFrame(
            [
                ("r1", "a", ts("2024-01-01 00:00:00")),
                ("r1", "b", ts("2024-01-01 00:00:02")),  # elapsed == ttl=2
            ],
            "resource string, candidate string, ts timestamp_ntz",
        )
        out = rows(KV.leader_timeline(hb, ttl_seconds=2), "resource", "ts")
        assert [(r[1], r[3], r[4]) for r in out] == [
            ("a", "a", "acquire"),
            ("b", "b", "acquire"),  # >= boundary: the old lease is dead
        ]
        # view: a lease written exactly ttl ago is NOT live
        leases = spark.createDataFrame(
            [("r1", "a", ts("2024-01-01 00:00:00"))],
            "resource string, owner string, write_ts timestamp_ntz",
        )
        live = rows(
            KV.lease_view(leases, "2024-01-01 00:00:02", ttl_seconds=2), "resource"
        )
        assert live == []


class TestCdc:
    HISTORY = [
        ("k1", ts("2024-01-01 00:00:00"), "v1"),
        ("k1", ts("2024-01-01 00:00:01"), "v1"),  # unchanged -> suppressed
        ("k1", ts("2024-01-01 00:00:02"), "v2"),  # changed
        ("k2", ts("2024-01-01 00:00:01"), "x"),   # first sighting -> change
    ]

    def _hist(self, spark):
        return spark.createDataFrame(
            self.HISTORY, "key string, poll_ts timestamp_ntz, value string"
        )

    def test_value_changes_suppresses_unchanged(self, spark):
        out = rows(C.value_changes(self._hist(spark), ["key"]), "key", "poll_ts")
        assert [(r[0], r[2], r[3]) for r in out] == [
            ("k1", None, "v1"),
            ("k1", "v1", "v2"),
            ("k2", None, "x"),
        ]

    def test_replay_reconstructs_latest(self, spark):
        hist = self._hist(spark)
        replayed = rows(C.replay(C.value_changes(hist, ["key"]), ["key"]), "key")
        latest = rows(C.latest_snapshot(hist, ["key"]), "key")
        assert replayed == latest

    def test_keyset_changes(self, spark):
        prev = spark.createDataFrame([("a",), ("b",)], "key string")
        nxt = spark.createDataFrame([("b",), ("c",)], "key string")
        out = rows(C.keyset_changes(prev, nxt, ["key"]), "key")
        assert out == [("a", "removed"), ("c", "added")]

    def test_snapshot_diff(self, spark):
        prev = spark.createDataFrame(
            [("a", "1"), ("b", "2"), ("d", "4")], "key string, value string"
        )
        nxt = spark.createDataFrame(
            [("a", "1"), ("b", "9"), ("c", "3")], "key string, value string"
        )
        out = rows(C.snapshot_diff(prev, nxt, ["key"]), "key")
        assert out == [
            ("b", "changed", "2", "9"),
            ("c", "added", None, "3"),
            ("d", "removed", "4", None),
        ]


class TestLeaderSupData:
    def test_get_leader_returns_owner_and_sup_data(self, spark):
        """Interface-drift note (SURVEY §2.1): getLeader ==
        Option[(owner, sup_data)] per the implementation
        (CassandraLeaderElection.scala:64), not the README's
        Option[String]."""
        hb = spark.createDataFrame(
            [
                ("r1", "alice", "meta-a", ts("2024-01-01 00:00:09")),
                ("r1", "bob", "meta-b", ts("2024-01-01 00:00:10")),
            ],
            "resource string, owner string, sup_data string, write_ts timestamp_ntz",
        )
        out = rows(KV.current_leaders(hb, "2024-01-01 00:00:11", 5), "resource")
        assert out == [("r1", "bob", "meta-b", ts("2024-01-01 00:00:10"))]
