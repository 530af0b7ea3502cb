"""Structured Streaming twins of the reference's poll/notify machinery
(SURVEY.md §2.3 Tier S).

The reference's runtime is a 500 ms poll loop + listener fan-out
(CacheListenerRegistry.scala:85,94; plugin.properties:26,31).  Here each
micro-batch trigger *is* one poll: ``trigger(processingTime='500
milliseconds')`` reproduces the cadence, watermarks make the best-effort
coalescing window explicit, and ``foreachBatch`` performs the fan-out /
external writes the listeners did.

Everything is testable without infrastructure via bounded file-source
replay (``replay_stream``) + ``trigger(availableNow=True)``; the Kafka
source and Cassandra sink are thin option-builders in ``sources/`` that
plug into the same pipeline shape.
"""

from .ops import (
    DEFAULT_TRIGGER_MS,
    replay_stream,
    run_to_memory,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    stream_static_join,
    tumbling_window_agg,
)
from .pipeline import Pipeline
from .watch import ListenerHub, leader_election_stream, watch_value_changes

__all__ = [
    "DEFAULT_TRIGGER_MS",
    "replay_stream",
    "run_to_memory",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_dedup",
    "stream_static_join",
    "watch_value_changes",
    "ListenerHub",
    "Pipeline",
    "leader_election_stream",
]
