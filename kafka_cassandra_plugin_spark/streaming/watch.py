"""Stateful streaming watcher (S8/S10) - the ValueWatcher's true twin.

``watch_value_changes`` maintains last-seen value per key in Spark's
state store (``applyInPandasWithState``), emitting a change row exactly
when a freshly observed value differs from the cached one - the same
compare-and-fire as ``ValueWatcher.run()``
(CacheListenerRegistry.scala:43-61), with the cache promoted from an
in-process HashMap to partitioned, checkpointed state.

``ListenerHub`` is the foreachBatch fan-out (R13,
CassandraLeaderElection.scala:129-134): registered Python callbacks get
each micro-batch of change events.  Unlike the reference's synchronized
multicast (best-effort, in-process), delivery here is per-micro-batch
with checkpointed source offsets: replayable, at-least-once.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def watch_value_changes(stream: DataFrame, key_col: str = "key",
                        value_col: str = "value",
                        ts_col: str = "poll_ts") -> DataFrame:
    """Emit (key, poll_ts, old_value, new_value) whenever a key's value
    differs from the last observed value (state = last value per key;
    first observation fires with old_value=null, like the watcher's
    initial None cache).

    Scale: state is partitioned by key across executors and persisted in
    the checkpoint; within a micro-batch rows are folded in ts order, so
    a batch containing several flips emits each transition (stronger than
    the reference's poll coalescing, which loses intermediate values)."""
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("poll_ts", TimestampNTZType()),
            StructField("old_value", StringType()),
            StructField("new_value", StringType()),
        ]
    )
    state_schema = StructType([StructField("last", StringType())])

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        last = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                if v != last:
                    rows.append((key[0], t, last, v))
                    last = v
        state.update((last,))
        yield pd.DataFrame(
            rows, columns=["key", "poll_ts", "old_value", "new_value"]
        )

    renamed = stream.selectExpr(
        f"{key_col} AS key", f"{value_col} AS value", f"{ts_col} AS poll_ts"
    )
    return (
        renamed.groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class ListenerHub:
    """foreachBatch listener fan-out (R13): registered callbacks receive
    each micro-batch of change events as a pandas DataFrame.  Use:

        hub = ListenerHub()
        hub.add_listener(lambda pdf: ...)
        changes = watch_value_changes(stream)
        q = changes.writeStream.foreachBatch(hub) \\
             .option("checkpointLocation", ckpt).start()

    Mirrors addValueChangeListener / removeValueChangeListener refcounting
    (CacheListenerRegistry.scala:130-172) minus the poll-task lifecycle,
    which Spark's query lifecycle owns (start/stop the StreamingQuery).

    Driver-materialization bound: callbacks are in-process Python, so each
    micro-batch lands on the driver — an unbounded first batch (initial
    snapshot) could be huge.  ``max_rows_per_batch`` caps what is
    delivered and sets ``truncated=True`` on the hub when a batch was
    cut.  WHICH rows survive the cut is arbitrary (``limit`` takes rows
    from whichever partitions answer first) unless ``order_cols`` is
    given, in which case the batch is sorted on those columns first and
    the cap keeps the smallest.  The reference's
    listener contract is explicitly best-effort ("There is no guarantee
    listener will be fired on ALL events", README.md:79), so a bounded
    delivery is faithful; for unbounded volumes use a distributed sink
    (foreachPartition / Cassandra), not in-process callbacks.
    """

    def __init__(self, max_rows_per_batch: int = 100_000,
                 order_cols: "Sequence[str] | None" = None) -> None:
        self._listeners: list[Callable[[pd.DataFrame], None]] = []
        self.max_rows_per_batch = max_rows_per_batch
        self.order_cols = list(order_cols) if order_cols else None
        self.truncated = False

    def add_listener(self, fn: Callable[[pd.DataFrame], None]) -> None:
        self._listeners.append(fn)

    def remove_listener(self, fn: Callable[[pd.DataFrame], None]) -> None:
        self._listeners.remove(fn)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not self._listeners:
            return
        cap = self.max_rows_per_batch
        if self.order_cols:
            batch_df = batch_df.orderBy(*self.order_cols)
        pdf = batch_df.limit(cap + 1).toPandas()
        if len(pdf) > cap:
            import warnings

            self.truncated = True
            warnings.warn(
                f"ListenerHub: micro-batch {batch_id} exceeded "
                f"max_rows_per_batch={cap}; delivering the first {cap} rows "
                "(listener delivery is best-effort per the reference "
                "contract - use a distributed sink for full volumes)"
            )
            pdf = pdf.iloc[:cap]
        if pdf.empty:
            return
        for fn in list(self._listeners):
            fn(pdf)


def leader_election_stream(heartbeats: DataFrame, ttl_seconds: float,
                           resource_col: str = "resource",
                           candidate_col: str = "candidate",
                           ts_col: str = "ts") -> DataFrame:
    """Streaming leader election - the setupLeaderWatchers loop
    (CassandraLeaderElection.scala:111-137) as partitioned, checkpointed
    state (SURVEY §7.2 names this the hard part: timeout-driven lease
    expiry exactly mirroring TTL=2s).

    State per resource: (owner, owner's last accepted heartbeat ts).
    Each heartbeat folds exactly like the batch :func:`~..operators.kv.
    leader_timeline` - acquire when no owner or the owner's lease aged
    past the TTL *in event time*, renew when the owner beats, reject
    otherwise.  Event-time expiry keeps the fold deterministic and
    replayable (wall-clock ProcessingTimeTimeout would make tests and
    backfills nondeterministic - the batch/stream equivalence test pins
    stream == batch replay on the same history).
    """
    out_schema = StructType(
        [
            StructField("resource", StringType()),
            StructField("candidate", StringType()),
            StructField("ts", TimestampNTZType()),
            StructField("owner", StringType()),
            StructField("action", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("owner", StringType()),
            StructField("owner_ts", TimestampNTZType()),
        ]
    )
    ttl = float(ttl_seconds)

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        owner, owner_ts = (state.get if state.exists else (None, None))
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "candidate"], kind="mergesort")
            for cand, t in zip(pdf["candidate"], pdf["ts"]):
                # expire at exactly write_ts + ttl (>=) — the lease_view /
                # leader_timeline boundary, pinned by a shared test
                expired = owner is None or (t - owner_ts).total_seconds() >= ttl
                if expired:
                    owner, owner_ts, action = cand, t, "acquire"
                elif cand == owner:
                    owner_ts, action = t, "renew"
                else:
                    action = "reject"
                rows.append((key[0], cand, t, owner, action))
        state.update((owner, owner_ts))
        yield pd.DataFrame(
            rows, columns=["resource", "candidate", "ts", "owner", "action"]
        )

    renamed = heartbeats.selectExpr(
        f"{resource_col} AS resource",
        f"{candidate_col} AS candidate",
        f"{ts_col} AS ts",
    )
    return renamed.groupBy("resource").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
