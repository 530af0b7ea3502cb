"""Group membership - the reference's *specified but unimplemented*
module (``/root/reference/README.md:25-103``), realized as batch
DataFrame operators plus the CDC machinery for membership-change
notification.

The spec's model: per group, a ``Map[member-id -> supplemental data]``;
operations joinGroup / leaveGroup; listeners notified on membership
change (best-effort).  Contracts encoded here and pinned by tests
(tests/test_membership.py):

- joining an existing (group, member) REPLACES its supplemental data
  (the spec's map semantics - last write wins),
- leaving a group the member is not in raises (mirror of the Storage
  update-throws-on-missing contract, README.md:202-209),
- membership snapshots diff with :func:`~.changes.keyset_changes`, which
  is exactly the KeySetWatcher the reference would have wired up.

Schema: ``group string, member_id string, data string`` (FIXTURES.md
group-B ``membership`` fixture).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import changes as _changes


class NotAMemberError(ValueError):
    """leave_group() for a member not in the group."""


KEY = ("group", "member_id")


def join_group(membership: DataFrame, joins: DataFrame) -> DataFrame:
    """Add (group, member) rows; an existing membership has its ``data``
    replaced (map put semantics, README.md:34-46)."""
    kept = membership.join(joins.select(*KEY), list(KEY), "left_anti")
    return kept.unionByName(joins.select(*membership.columns))


def leave_group(membership: DataFrame, leaves: DataFrame,
                strict: bool = True) -> DataFrame:
    """Remove (group, member) rows; with ``strict``, leaving a group the
    member never joined raises (README.md:46 throw contract)."""
    if strict:
        missing = leaves.select(*KEY).join(
            membership.select(*KEY), list(KEY), "left_anti"
        ).limit(1)
        rows = missing.collect()
        if rows:
            raise NotAMemberError(f"leave_group: not a member: {rows}")
    return membership.join(leaves.select(*KEY), list(KEY), "left_anti")


def group_snapshot(membership: DataFrame, group: str) -> DataFrame:
    """The spec's ``Map[member-id, data]`` for one group, as rows
    (README.md:56-66 getMembers)."""
    return (
        membership.filter(F.col("group") == group)
        .select("member_id", "data")
    )


def membership_changes(prev: DataFrame, nxt: DataFrame) -> DataFrame:
    """Joined/left members between two membership snapshots - what the
    spec's membership listener would be fired with (README.md:68-103);
    delegates to the KeySetWatcher diff (R10)."""
    out = _changes.keyset_changes(prev, nxt, list(KEY))
    return out.withColumn(
        "change",
        F.when(F.col("change") == "added", "joined").otherwise("left"),
    )
