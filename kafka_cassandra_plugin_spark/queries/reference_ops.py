"""Declared queries that run the reference-semantics library
(operators/kv.py, operators/changes.py) over the driver's tables, so the
library itself is oracle-validated (SURVEY.md §2.1 Tier R rows).

The kv-shaped inputs are *derived in-query* from the synthetic tables
(orders as a key->status KV; events as heartbeat streams), so the DuckDB
oracle can reproduce them from the same parquet views.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..operators import changes as C
from ..operators import kv as KV
from . import register


def _orders_kv(spark, sf_dir):
    """orders as a kv table: key = orderkey string, value = status."""
    o = Catalog(spark, sf_dir).orders
    return o.select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_orderstatus").alias("value"),
    )


# --------------------------------------------------------------------------
# R1/R3: point lookup with projection.
# --------------------------------------------------------------------------
@register(
    "kv_point_lookup",
    sql="""
    SELECT cast(o_orderkey AS varchar) AS key, o_orderstatus AS value
    FROM orders
    WHERE o_orderkey IN (1, 500, 1500, 29000, 999999)
    ORDER BY key
    """,
    tags=("R1", "R3", "G8"),
    doc="kv_get over a kv view of orders - SELECT value FROM kv WHERE "
    "key=? (CassandraListenerRegistry.scala:27) generalized to a key "
    "list. The lookup runs on the NATIVE key column so the IN predicate "
    "reaches the parquet scan (a string-cast key would block pushdown - "
    "pinned by tests/test_plans.py); the text kv shape is projected "
    "after the filter.",
)
def kv_point_lookup(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    kv_native = o.select(F.col("o_orderkey").alias("key"),
                         F.col("o_orderstatus").alias("value"))
    hits = KV.kv_get(kv_native, [1, 500, 1500, 29000, 999999])
    return hits.select(F.col("key").cast("string").alias("key"), "value").orderBy("key")


# --------------------------------------------------------------------------
# R5 + R6 + R7: the full CAS lifecycle as one sequential batch merge —
# insert-if-not-exists, then guarded update, then guarded delete, exactly
# the statement sequence a leader-election round issues.
# --------------------------------------------------------------------------
@register(
    "cas_lifecycle",
    sql="""
    WITH cur AS (
      SELECT cast(o_orderkey AS varchar) AS key, o_orderstatus AS value
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ),
    new AS (
      SELECT cast(o_orderkey AS varchar) AS key, o_orderpriority AS value
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    ),
    s1 AS (
      SELECT key, value FROM cur
      UNION ALL
      SELECT key, value FROM new WHERE key NOT IN (SELECT key FROM cur)
    ),
    s2 AS (
      SELECT key,
             CASE WHEN cast(key AS bigint) % 3 = 0 AND value = 'O'
                  THEN 'CLOSED' ELSE value END AS value
      FROM s1
    )
    SELECT key, value FROM s2
    WHERE NOT (cast(key AS bigint) % 5 = 0 AND value = 'F')
    ORDER BY key
    """,
    tags=("R5", "R6", "R7", "G13", "G15", "G42"),
    doc="cas_insert -> cas_update -> cas_delete pipelined on one kv table: "
    "INSERT IF NOT EXISTS (CassandraLeaderElection.scala:56-57, left-anti "
    "merge; contended keys keep the current row), then UPDATE ... IF "
    "owner=? (:59-60, guarded rewrite where the expected value matches), "
    "then DELETE ... IF owner=? (:53-54, rows removed only when key AND "
    "guard hold). Scale: three key-partitioned joins; the update/delete "
    "delta sides broadcast when small.",
)
def cas_lifecycle(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    cut96 = F.lit("1996-01-01").cast("timestamp_ntz")
    cut97 = F.lit("1997-01-01").cast("timestamp_ntz")
    cur = o.filter(F.col("o_orderdate") < cut97).select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_orderstatus").alias("value"),
    )
    new = o.filter(F.col("o_orderdate") >= cut96).select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_orderpriority").alias("value"),
    )
    s1 = KV.cas_insert(cur, new, ["key"])
    # round-15 (guide §1.1 first-principles): the update/delete DELTAS
    # only need s1/s2's KEY SETS, and cas_insert/cas_update preserve the
    # key universe - s1.keys == s2.keys == distinct(cur.keys ∪ new.keys)
    # (orderkey is unique per side, so the distinct is exact).  Deriving
    # the deltas from s1/s2 dragged the whole union+window+anti-join
    # pipeline into each broadcast build side (broadcast builds are
    # never AQE-reused): ~4 orders scans, 3 WindowGroupLimit passes.
    # The key-universe form is two column-pruned scans + one distinct
    # per delta.  Measured: 1.54 -> 1.24 s at sf0.1 AND 2.93 -> 2.49 s
    # at sf1 (same JVM A/B, results identical).  A localCheckpoint of
    # s1/s2 was tried first and REVERTED: it won at sf0.1 (2.13 ->
    # 1.96 s) but lost at sf1 (3.90 -> 4.44 s) - materializing the full
    # KV table twice is the wrong trade at scale.
    keys = cur.select("key").unionByName(new.select("key")).distinct()
    updates = KV.with_upd_marker(
        keys.filter(F.col("key").cast("bigint") % 3 == 0).select(
            "key",
            F.lit("O").alias("expected_value"),
            F.lit("CLOSED").alias("new_value"),
        )
    )
    s2 = KV.cas_update(s1, updates, ["key"], ["value"])
    deletes = KV.with_upd_marker(
        keys.filter(F.col("key").cast("bigint") % 5 == 0).select(
            "key", F.lit("F").alias("expected_value")
        )
    )
    return KV.cas_delete(s2, deletes, ["key"], ["value"]).orderBy("key")


# --------------------------------------------------------------------------
# R1 + R2 + R12: getLeader at an instant, all resources — the TTL-lease
# view (lease_view runs inside current_leaders) plus the deterministic
# first-row pick.
# --------------------------------------------------------------------------
@register(
    "leader_at_instant",
    sql="""
    WITH live AS (
      SELECT event_type AS resource, cast(user_id AS varchar) AS owner, ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, cast(user_id AS varchar) DESC) AS rn,
             max(ts) OVER (PARTITION BY event_type) AS write_ts
      FROM events
      WHERE ts >  TIMESTAMP '2024-01-05 00:00:00' - INTERVAL 6 HOUR
        AND ts <= TIMESTAMP '2024-01-05 00:00:00'
    )
    SELECT resource, owner, write_ts FROM live WHERE rn = 1
    ORDER BY resource
    """,
    tags=("R1", "R2", "R12", "G25"),
    doc="current_leaders(now): per resource, the owner with the freshest "
    "in-TTL heartbeat, deterministic tie-break on (ts, owner) - getLeader "
    "(CassandraLeaderElection.scala:64-69) for every resource at once. "
    "TTL expiry (R12, table option default_time_to_live=2 of "
    "README.md:314 made deterministic) is the lease_view write_ts range "
    "filter this operator applies first; now is an explicit parameter, "
    "never current_timestamp().",
)
def leader_at_instant(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    hb = ev.select(
        F.col("event_type").alias("resource"),
        F.col("user_id").cast("string").alias("owner"),
        F.col("ts").alias("write_ts"),
    )
    return KV.current_leaders(
        hb, "2024-01-05 00:00:00", ttl_seconds=6 * 3600
    ).orderBy("resource")


# --------------------------------------------------------------------------
# R9: poll-and-diff change log from snapshot history (lag + lead).
# --------------------------------------------------------------------------
@register(
    "cdc_value_changes",
    sql="""
    WITH ranked AS (
      SELECT cast(user_id AS varchar) AS key,
             date_trunc('day', ts) AS poll_ts, event_type,
             row_number() OVER (PARTITION BY cast(user_id AS varchar),
                                             date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    snapshots AS (
      SELECT key, poll_ts, event_type AS value FROM ranked WHERE rn = 1
    ),
    diffed AS (
      SELECT key, poll_ts, value,
             lag(value) OVER (PARTITION BY key ORDER BY poll_ts) AS old_value
      FROM snapshots
    ),
    changes AS (
      SELECT key, cast(poll_ts AS timestamp) AS poll_ts, old_value,
             value AS new_value
      FROM diffed
      WHERE old_value IS DISTINCT FROM value
    )
    SELECT key, poll_ts, old_value, new_value,
           lead(new_value) OVER (PARTITION BY key ORDER BY poll_ts)
             AS next_value
    FROM changes
    ORDER BY key, poll_ts
    """,
    tags=("R9", "G10", "G25", "G29"),
    doc="value_changes over a daily poll history (last event_type per user "
    "per day = the polled snapshot): emits only polls where the value "
    "changed (null-safe compare - the watcher's Option cache), "
    "ValueWatcher.run() (CacheListenerRegistry.scala:43-61) as one lag "
    "window, plus a lead() peek at each key's following change.",
)
def cdc_value_changes(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    snapshots = (
        ev.groupBy(
            F.col("user_id").cast("string").alias("key"),
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("poll_ts"),
        )
        .agg(F.expr("max_by(event_type, struct(ts, event_id))").alias("value"))
    )
    changes = C.value_changes(snapshots, ["key"])
    w = Window.partitionBy("key").orderBy("poll_ts")
    return (
        changes.withColumn("next_value", F.lead("new_value").over(w))
        .orderBy("key", "poll_ts")
    )


# --------------------------------------------------------------------------
# R9 + R10: full snapshot value diff (added/removed/changed) — the
# two-snapshot watcher poll, covering the KeySetWatcher set diff as the
# added/removed subset (CacheListenerRegistry.scala:63-81).
# --------------------------------------------------------------------------
@register(
    "cdc_snapshot_diff",
    sql="""
    WITH r1 AS (SELECT cast(user_id AS varchar) AS key, event_type,
                       row_number() OVER (PARTITION BY cast(user_id AS varchar)
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         s1 AS (SELECT key, event_type AS old_value FROM r1 WHERE rn = 1),
         r2 AS (SELECT cast(user_id AS varchar) AS key, event_type,
                       row_number() OVER (PARTITION BY cast(user_id AS varchar)
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '2024-01-06 00:00:00'),
         s2 AS (SELECT key, event_type AS new_value FROM r2 WHERE rn = 1)
    SELECT coalesce(s1.key, s2.key) AS key,
           CASE WHEN s1.key IS NULL THEN 'added'
                WHEN s2.key IS NULL THEN 'removed'
                WHEN old_value IS DISTINCT FROM new_value THEN 'changed'
           END AS change,
           old_value, new_value
    FROM s1 FULL OUTER JOIN s2 ON s1.key = s2.key
    WHERE CASE WHEN s1.key IS NULL THEN 'added'
               WHEN s2.key IS NULL THEN 'removed'
               WHEN old_value IS DISTINCT FROM new_value THEN 'changed'
          END IS NOT NULL
    ORDER BY key
    """,
    tags=("R9", "R10", "G13"),
    doc="snapshot_diff: added/removed/changed with old+new values between "
    "two polled snapshots (full-outer join on key) - one watcher poll "
    "against the previous cache; the added/removed subset IS the "
    "KeySetWatcher diff (R10).",
)
def cdc_snapshot_diff(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    c3 = F.lit("2024-01-03").cast("timestamp_ntz")
    c6 = F.lit("2024-01-06").cast("timestamp_ntz")

    def snap(cut):
        return (
            ev.filter(F.col("ts") < cut)
            .groupBy(F.col("user_id").cast("string").alias("key"))
            .agg(F.expr("max_by(event_type, struct(ts, event_id))").alias("value"))
        )

    return C.snapshot_diff(snap(c3), snap(c6), ["key"]).orderBy("key")


# --------------------------------------------------------------------------
# R15: leader-election replay.  The fold is iterative, but it IS
# expressible as a linear-recursive CTE (one row per step, previous
# state joined on rn+1), so the oracle hash-checks the whole state
# machine - acquire/renew/reject and the >=ttl expiry boundary - not
# just row counts.
# --------------------------------------------------------------------------
@register(
    "leader_timeline_replay",
    sql="""
    WITH RECURSIVE hb AS (
      SELECT event_type AS resource, CAST(user_id AS VARCHAR) AS candidate,
             ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, CAST(user_id AS VARCHAR)) AS rn
      FROM events WHERE user_id % 3 = 0
    ),
    fold AS (
      SELECT resource, rn, candidate, ts,
             candidate AS owner, ts AS owner_ts, 'acquire' AS action
      FROM hb WHERE rn = 1
      UNION ALL
      SELECT h.resource, h.rn, h.candidate, h.ts,
             CASE WHEN epoch(h.ts) - epoch(f.owner_ts) >= 3600
                  THEN h.candidate ELSE f.owner END,
             CASE WHEN epoch(h.ts) - epoch(f.owner_ts) >= 3600
                       OR h.candidate = f.owner THEN h.ts
                  ELSE f.owner_ts END,
             CASE WHEN epoch(h.ts) - epoch(f.owner_ts) >= 3600
                  THEN 'acquire'
                  WHEN h.candidate = f.owner THEN 'renew'
                  ELSE 'reject' END
      FROM fold f JOIN hb h ON h.resource = f.resource AND h.rn = f.rn + 1
    )
    SELECT resource, candidate, ts, owner, action
    FROM fold ORDER BY resource, ts, candidate
    """,
    tags=("R15", "R6", "G51"),
    doc="leader_timeline: sequential lease state machine "
    "(CassandraLeaderElection.scala:111-137) replayed per resource via "
    "applyInPandas (resources fold independently after one shuffle). "
    "Oracle: the same fold as a linear-recursive CTE - hash-matched, "
    "including the exactly-at-ttl expiry boundary (>= 3600s).",
)
def leader_timeline_replay(spark, sf_dir):
    # user_id % 3 bounds the per-resource heartbeat chain: the oracle's
    # linear-recursive CTE costs O(chain_length x total_rows), so the
    # slice keeps the oracle fast while replaying the identical state
    # machine; the Spark fold itself is O(n) per resource either way.
    ev = Catalog(spark, sf_dir).events.filter(F.col("user_id") % 3 == 0)
    hb = ev.select(
        F.col("event_type").alias("resource"),
        F.col("user_id").cast("string").alias("candidate"),
        F.col("ts"),
    )
    return KV.leader_timeline(hb, ttl_seconds=3600).orderBy(
        "resource", "ts", "candidate"
    )
