"""Declared queries that run the reference-semantics library
(operators/kv.py, operators/changes.py) over the driver's tables, so the
library itself is oracle-validated (SURVEY.md §2.1 Tier R rows).

The kv-shaped inputs are *derived in-query* from the synthetic tables
(orders as a key->status KV; events as heartbeat streams), so the DuckDB
oracle can reproduce them from the same parquet views.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


_ORDERS_KV_SQL = (
    "SELECT cast(o_orderkey AS varchar) AS key, o_orderstatus AS value FROM orders"
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
# R4: full-table key scan -> set (namespace watcher fetcher).
# --------------------------------------------------------------------------
@register(
    "keyset_scan",
    sql="""
    SELECT DISTINCT o_orderstatus AS key FROM orders ORDER BY key
    """,
    tags=("R4",),
    doc="SELECT key FROM <namespace> materialized as a distinct set "
    "(CassandraListenerRegistry.scala:50-58).",
)
def keyset_scan(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return o.select(F.col("o_orderstatus").alias("key")).distinct().orderBy("key")


# --------------------------------------------------------------------------
# R5: CAS insert-if-not-exists as a batch merge.
# --------------------------------------------------------------------------
@register(
    "cas_insert_merge",
    sql="""
    WITH cur AS (
      SELECT cast(o_orderkey AS varchar) AS key, o_orderstatus AS value
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ),
    new AS (
      SELECT cast(o_orderkey AS varchar) AS key, o_orderpriority AS value
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT key, value FROM cur
    UNION ALL
    SELECT key, value FROM new WHERE key NOT IN (SELECT key FROM cur)
    ORDER BY key
    """,
    tags=("R5", "G15"),
    doc="cas_insert: INSERT IF NOT EXISTS (CassandraLeaderElection.scala:"
    "56-57) == left-anti merge; contended keys keep the current row.",
)
def cas_insert_merge(spark, sf_dir):
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
    return KV.cas_insert(cur, new, ["key"]).orderBy("key")


# --------------------------------------------------------------------------
# R6: CAS conditional update.
# --------------------------------------------------------------------------
@register(
    "cas_update_merge",
    sql="""
    WITH kv AS (SELECT cast(o_orderkey AS varchar) AS key, o_orderstatus AS value
                FROM orders)
    SELECT key,
           CASE WHEN value = 'O' AND cast(key AS bigint) % 3 = 0
                THEN 'CLOSED' ELSE value END AS value
    FROM kv
    ORDER BY key
    """,
    tags=("R6", "G13", "G42"),
    doc="cas_update: UPDATE ... IF owner=? (CassandraLeaderElection.scala:"
    "59-60): guarded rewrite where expected value matches, no-op rows "
    "where the guard fails or no update exists.",
)
def cas_update_merge(spark, sf_dir):
    kv = _orders_kv(spark, sf_dir)
    updates = KV.with_upd_marker(
        kv.filter(F.col("key").cast("bigint") % 3 == 0).select(
            "key",
            F.lit("O").alias("expected_value"),
            F.lit("CLOSED").alias("new_value"),
        )
    )
    return KV.cas_update(kv, updates, ["key"], ["value"]).orderBy("key")


# --------------------------------------------------------------------------
# R7: CAS conditional delete (resign).
# --------------------------------------------------------------------------
@register(
    "cas_delete_merge",
    sql="""
    WITH kv AS (SELECT cast(o_orderkey AS varchar) AS key, o_orderstatus AS value
                FROM orders)
    SELECT key, value FROM kv
    WHERE NOT (value = 'F' AND cast(key AS bigint) % 5 = 0)
    ORDER BY key
    """,
    tags=("R7", "G13"),
    doc="cas_delete: DELETE ... IF owner=? (CassandraLeaderElection.scala:"
    "53-54): rows are removed only when both key matches and guard holds.",
)
def cas_delete_merge(spark, sf_dir):
    kv = _orders_kv(spark, sf_dir)
    deletes = KV.with_upd_marker(
        kv.filter(F.col("key").cast("bigint") % 5 == 0).select(
            "key", F.lit("F").alias("expected_value")
        )
    )
    return KV.cas_delete(kv, deletes, ["key"], ["value"]).orderBy("key")


# --------------------------------------------------------------------------
# R12: TTL lease view at an explicit `now`.
# --------------------------------------------------------------------------
@register(
    "lease_live_view",
    sql="""
    WITH leases AS (
      SELECT cast(user_id AS varchar) AS resource,
             max(ts) AS write_ts
      FROM events
      WHERE ts <= TIMESTAMP '2024-01-30 00:00:00'
      GROUP BY user_id
    )
    SELECT resource, write_ts FROM leases
    WHERE write_ts >  TIMESTAMP '2024-01-30 00:00:00' - INTERVAL 24 HOUR
      AND write_ts <= TIMESTAMP '2024-01-30 00:00:00'
    ORDER BY resource
    """,
    tags=("R12", "G20", "G40"),
    doc="lease_view(now): TTL expiry as an explicit write_ts range filter "
    "(default_time_to_live=2 of README.md:314 made deterministic); here "
    "each user's last heartbeat at-or-before now holds a 24h lease; "
    "now=2024-01-30 splits live vs expired users.",
)
def lease_live_view(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    now = "2024-01-30 00:00:00"
    leases = (
        ev.filter(F.col("ts") <= F.lit(now).cast("timestamp_ntz"))
        .groupBy(F.col("user_id").cast("string").alias("resource"))
        .agg(F.max("ts").alias("write_ts"))
    )
    return KV.lease_view(leases, now, ttl_seconds=24 * 3600).orderBy("resource")


# --------------------------------------------------------------------------
# R2 + R12: getLeader at an instant, all resources.
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
    tags=("R1", "R2", "G25"),
    doc="current_leaders(now): per resource, the owner with the freshest "
    "in-TTL heartbeat, deterministic tie-break on (ts, owner) - getLeader "
    "(CassandraLeaderElection.scala:64-69) for every resource at once.",
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
# R9: poll-and-diff change log from snapshot history.
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
    )
    SELECT key, cast(poll_ts AS timestamp) AS poll_ts, old_value,
           value AS new_value
    FROM diffed
    WHERE old_value IS DISTINCT FROM value
    ORDER BY key, poll_ts
    """,
    tags=("R9", "G25", "G29"),
    doc="value_changes over a daily poll history (last event_type per user "
    "per day = the polled snapshot): emits only polls where the value "
    "changed - ValueWatcher.run() (CacheListenerRegistry.scala:43-61) as "
    "one lag window.",
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
    return C.value_changes(snapshots, ["key"]).orderBy("key", "poll_ts")


# --------------------------------------------------------------------------
# R10: key-set diff between two snapshots.
# --------------------------------------------------------------------------
@register(
    "cdc_keyset_changes",
    sql="""
    WITH d1 AS (SELECT DISTINCT user_id FROM events
                WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         d2 AS (SELECT DISTINCT user_id FROM events
                WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
                  AND ts < TIMESTAMP '2024-01-05 00:00:00')
    SELECT user_id, 'added' AS change FROM d2
    WHERE user_id NOT IN (SELECT user_id FROM d1)
    UNION ALL
    SELECT user_id, 'removed' FROM d1
    WHERE user_id NOT IN (SELECT user_id FROM d2)
    ORDER BY user_id, change
    """,
    tags=("R10", "G37"),
    doc="keyset_changes between two key snapshots: added/removed only "
    "(KeySetWatcher, CacheListenerRegistry.scala:63-81).",
)
def cdc_keyset_changes(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    c3 = F.lit("2024-01-03").cast("timestamp_ntz")
    c5 = F.lit("2024-01-05").cast("timestamp_ntz")
    d1 = ev.filter(F.col("ts") < c3).select("user_id")
    d2 = ev.filter((F.col("ts") >= c3) & (F.col("ts") < c5)).select("user_id")
    return C.keyset_changes(d1, d2, ["user_id"]).orderBy("user_id", "change")


# --------------------------------------------------------------------------
# R9+R10: full snapshot value diff.
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
    "two polled snapshots - one watcher poll against the previous cache.",
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
# R15: leader-election replay (iterative fold -> rows-only check; the
# semantics are pinned by unit tests with hand-computed expectations).
# --------------------------------------------------------------------------
@register(
    "leader_timeline_replay",
    sql=None,
    tags=("R15", "R6", "G51"),
    doc="leader_timeline: sequential lease state machine "
    "(CassandraLeaderElection.scala:111-137) replayed per resource via "
    "applyInPandas; iterative, hence no SQL oracle (driver records "
    "rows-only; unit tests pin the fold).",
)
def leader_timeline_replay(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    hb = ev.select(
        F.col("event_type").alias("resource"),
        F.col("user_id").cast("string").alias("candidate"),
        F.col("ts"),
    )
    return KV.leader_timeline(hb, ttl_seconds=3600).orderBy(
        "resource", "ts", "candidate"
    )
