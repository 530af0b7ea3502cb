"""Group-membership contract tests (SURVEY.md §5.2 item 5): the
README-spec'd module (README.md:25-103) the reference never implemented,
pinned against the spec's contracts."""

from __future__ import annotations

import pytest

from kafka_cassandra_plugin_spark.operators import membership as M

SCHEMA = "group string, member_id string, data string"


@pytest.fixture()
def members(spark):
    return spark.createDataFrame(
        [("g1", "a", "d1"), ("g1", "b", "d2"), ("g2", "a", "d3")], SCHEMA
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestContracts:
    def test_join_new_member(self, spark, members):
        joins = spark.createDataFrame([("g1", "c", "d4")], SCHEMA)
        out = rows(M.join_group(members, joins))
        assert ("g1", "c", "d4") in out and len(out) == 4

    def test_join_existing_replaces_data(self, spark, members):
        joins = spark.createDataFrame([("g1", "a", "NEW")], SCHEMA)
        out = rows(M.join_group(members, joins))
        assert ("g1", "a", "NEW") in out and ("g1", "a", "d1") not in out
        assert len(out) == 3  # map semantics: no duplicate membership

    def test_leave_member(self, spark, members):
        leaves = spark.createDataFrame([("g1", "a", None)], SCHEMA)
        out = rows(M.leave_group(members, leaves))
        assert ("g1", "a", "d1") not in out and len(out) == 2
        # same member still in the OTHER group
        assert ("g2", "a", "d3") in out

    def test_leave_nonmember_throws(self, spark, members):
        leaves = spark.createDataFrame([("g2", "zz", None)], SCHEMA)
        with pytest.raises(M.NotAMemberError):
            M.leave_group(members, leaves)

    def test_group_snapshot(self, spark, members):
        snap = rows(M.group_snapshot(members, "g1"))
        assert snap == [("a", "d1"), ("b", "d2")]

    def test_membership_changes(self, spark, members):
        joins = spark.createDataFrame([("g1", "c", "d4")], SCHEMA)
        nxt = M.leave_group(
            M.join_group(members, joins),
            spark.createDataFrame([("g1", "b", None)], SCHEMA),
        )
        out = {
            (r.group, r.member_id, r.change)
            for r in M.membership_changes(members, nxt).collect()
        }
        assert out == {("g1", "c", "joined"), ("g1", "b", "left")}
