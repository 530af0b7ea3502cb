"""Fluent streaming pipeline builder - the engine's third entry point
(SURVEY.md §3.5): ``Pipeline.from_kafka(...).watch(...).to_cassandra(...)``.

This is the north-star ETL shape (BASELINE.json: "Structured Streaming
Kafka source + Cassandra connector") as a small composable API over the
pieces in streaming/ and sources/:

    p = (Pipeline.from_kafka(spark, "broker:9092", "kv-updates",
                             value_schema="key string, value string")
         .select("data.key AS key", "data.value AS value",
                 "kafka_ts AS poll_ts")
         .watch()                        # stateful last-value CDC (S8)
         .to_cassandra_lwt(["cass1"], "ks", "kv"))   # LWT sink (S10)
    q = p.start(checkpoint="/ckpt/kv-watch")

Every stage also runs against a bounded replay source
(``Pipeline.from_replay``) which is how the tests exercise the full
pipeline with no brokers: same code path, availableNow trigger.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .. import sources as S
from . import ops as OPS
from .watch import ListenerHub, watch_value_changes


class Pipeline:
    def __init__(self, df: DataFrame, spark: SparkSession):
        self._df = df
        self._spark = spark
        self._sink: Callable | None = None
        self._sink_format: tuple | None = None
        self._trigger_ms: int | None = None

    # -- sources -------------------------------------------------------------
    @classmethod
    def from_kafka(cls, spark: SparkSession, bootstrap: str, topics: str,
                   value_schema=None, starting_offsets: str = "latest") -> "Pipeline":
        return cls(
            S.kafka_stream(spark, bootstrap, topics, value_schema, starting_offsets),
            spark,
        )

    @classmethod
    def from_replay(cls, spark: SparkSession, df: DataFrame, path: str) -> "Pipeline":
        """Bounded replay of a batch DataFrame (test/backfill substrate)."""
        return cls(OPS.replay_stream(spark, df, path), spark)

    # -- transforms ----------------------------------------------------------
    def select(self, *exprs: str) -> "Pipeline":
        self._df = self._df.selectExpr(*exprs)
        return self

    def where(self, cond: str) -> "Pipeline":
        self._df = self._df.where(cond)
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        self._df = fn(self._df)
        return self

    def watch(self, key_col: str = "key", value_col: str = "value",
              ts_col: str = "poll_ts") -> "Pipeline":
        """Stateful last-value change detection (the ValueWatcher twin)."""
        self._df = watch_value_changes(self._df, key_col, value_col, ts_col)
        return self

    def window_agg(self, window: str, ts_col: str = "ts",
                   group_cols: Sequence[str] = ()) -> "Pipeline":
        self._df = OPS.tumbling_window_agg(
            self._df, window, ts_col=ts_col, group_cols=tuple(group_cols)
        )
        return self

    def dedup(self, key_cols: Sequence[str], ts_col: str = "ts") -> "Pipeline":
        self._df = OPS.streaming_dedup(self._df, key_cols, ts_col)
        return self

    def enrich(self, dim: DataFrame, on: str) -> "Pipeline":
        self._df = OPS.stream_static_join(self._df, dim, on)
        return self

    def trigger_ms(self, ms: int = OPS.DEFAULT_TRIGGER_MS) -> "Pipeline":
        """Fixed-rate micro-batch cadence (the reference's 500 ms poll,
        plugin.properties:26,31)."""
        self._trigger_ms = ms
        return self

    # -- sinks ---------------------------------------------------------------
    def to_cassandra_lwt(self, contact_points: Sequence[str], keyspace: str,
                         table: str, op: str = "insert_if_not_exists",
                         guard_col: str | None = None,
                         order_col: str | None = None) -> "Pipeline":
        self._sink = S.CassandraLwtForeachBatch(
            contact_points, keyspace, table, op, guard_col, order_col
        )
        return self

    def to_listeners(self, hub: ListenerHub) -> "Pipeline":
        self._sink = hub
        return self

    def to_foreach_batch(self, fn: Callable) -> "Pipeline":
        self._sink = fn
        return self

    def to_parquet(self, path: str) -> "Pipeline":
        self._sink_format = ("parquet", path)
        return self

    # -- run -----------------------------------------------------------------
    def dataframe(self) -> DataFrame:
        """The (streaming) DataFrame as built so far."""
        return self._df

    def start(self, checkpoint: str, available_now: bool = False,
              output_mode: str = "append") -> StreamingQuery:
        w = self._df.writeStream.outputMode(output_mode).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            w = w.trigger(availableNow=True)
        elif self._trigger_ms is not None:
            w = w.trigger(processingTime=f"{self._trigger_ms} milliseconds")
        if self._sink is not None:
            w = w.foreachBatch(self._sink)
        elif self._sink_format is not None:
            fmt, path = self._sink_format
            w = w.format(fmt).option("path", path)
        else:
            raise ValueError("no sink configured")
        return w.start()
