"""Change-detection (CDC) operators - the poll-and-diff core.

Re-expresses ``CacheListenerRegistry.scala``'s watcher machinery as batch
DataFrame operators (the streaming twins live in ``streaming/``):

- ``ValueWatcher`` (CacheListenerRegistry.scala:43-61): per-key compare of
  the freshly-fetched value against the cached previous value, emitting
  only on difference -> :func:`value_changes` (lag window) and
  :func:`snapshot_diff` (two-snapshot full-outer diff).
- ``KeySetWatcher`` (CacheListenerRegistry.scala:63-81): set-difference of
  consecutive key snapshots -> :func:`keyset_changes`.
- Best-effort coalescing ("There is no guarantee listener will be fired on
  ALL events", README.md:79,156): poll-based CDC only sees the *latest*
  value per poll; :func:`replay` reconstructs exactly the final snapshot,
  which is the precise contract the reference provides.

Scale: every operator shuffles once by key; the lag formulation keeps a
single window sort per partition, and snapshot diffs are key-partitioned
full-outer joins (broadcast when one snapshot is small).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def value_changes(snapshots: DataFrame, key_cols: Sequence[str],
                  value_col: str = "value",
                  ts_col: str = "poll_ts") -> DataFrame:
    """Change log from a history of polled snapshots: one row per (key,
    poll) whose value differs from the previous poll's value (null-safe -
    first sighting counts as a change from 'absent', exactly like the
    watcher's initial None cache).  Output: key cols, ts, old_value,
    new_value."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(value_col).over(w)
    return (
        snapshots.withColumn("old_value", prev)
        .filter(~F.col("old_value").eqNullSafe(F.col(value_col)))
        .select(
            *key_cols,
            F.col(ts_col),
            "old_value",
            F.col(value_col).alias("new_value"),
        )
    )


def keyset_changes(prev: DataFrame, nxt: DataFrame,
                   key_cols: Sequence[str]) -> DataFrame:
    """KeySetWatcher diff: keys added / removed between two snapshots
    (kept keys are not emitted, matching the watcher which only fires on
    set change)."""
    a = prev.select(*key_cols).distinct()
    b = nxt.select(*key_cols).distinct()
    added = b.join(a, on=list(key_cols), how="left_anti").withColumn(
        "change", F.lit("added")
    )
    removed = a.join(b, on=list(key_cols), how="left_anti").withColumn(
        "change", F.lit("removed")
    )
    return added.unionByName(removed)


def snapshot_diff(prev: DataFrame, nxt: DataFrame, key_cols: Sequence[str],
                  value_col: str = "value") -> DataFrame:
    """Two-snapshot value diff: added / removed / changed rows with old and
    new values (kept-equal rows suppressed).  This is the batch analog of
    one watcher poll against the previous cache."""
    a = prev.select(*key_cols, F.col(value_col).alias("old_value"))
    b = nxt.select(*key_cols, F.col(value_col).alias("new_value"))
    j = a.join(b, on=list(key_cols), how="outer")
    has_old = F.col("old_value").isNotNull()
    has_new = F.col("new_value").isNotNull()
    return (
        j.withColumn(
            "change",
            F.when(~has_old & has_new, "added")
            .when(has_old & ~has_new, "removed")
            .when(~F.col("old_value").eqNullSafe(F.col("new_value")), "changed"),
        )
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change", "old_value", "new_value")
    )


def latest_snapshot(snapshots: DataFrame, key_cols: Sequence[str],
                    value_col: str = "value",
                    ts_col: str = "poll_ts") -> DataFrame:
    """Last-observed value per key (max_by on poll ts) - the cache state
    after draining the poll history."""
    return snapshots.groupBy(*key_cols).agg(
        F.expr(f"max_by({value_col}, {ts_col})").alias(value_col),
        F.max(ts_col).alias(ts_col),
    )


def replay(changelog: DataFrame, key_cols: Sequence[str],
           ts_col: str = "poll_ts") -> DataFrame:
    """Reconstruct the final snapshot from a :func:`value_changes` log:
    apply the last change per key, dropping keys whose final value is
    null - in the KV model a null value IS absence (the watcher's
    Option.None cache state), so a trailing null change is a deletion.

    Property (hypothesis-tested): for any snapshot history H,
    ``replay(value_changes(H)) == latest_snapshot(H) where value is not
    null`` - the completeness contract of poll-based CDC.  (Found by the
    property test: a key only ever observed as null must NOT appear in
    the replayed snapshot.)"""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("new_value").isNotNull())
        .select(*key_cols, F.col("new_value").alias("value"), F.col(ts_col))
    )
