"""Sources & sinks (SURVEY.md §2.2 G1-G6).

The north-star pipeline is Kafka -> transform -> Cassandra
(BASELINE.json: "Structured Streaming Kafka source + Cassandra
connector").  This container has neither a Kafka broker nor a Cassandra
cluster, so those endpoints are *option-builders + foreachBatch adapters*
whose plumbing is real (they produce the exact reader/writer
configuration Spark needs) and import-gated where a driver library would
be required; everything else (parquet/CSV/JSON, the test substrate) is
fully exercised by tests.
"""

from __future__ import annotations

import json
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


# --------------------------------------------------------------------------
# G1/G2: batch file sources with explicit schemas (schema inference is a
# correctness + perf hazard at 100 TB: always pass the schema).
# --------------------------------------------------------------------------

def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             header: bool = True, **options) -> DataFrame:
    return spark.read.csv(path, schema=schema, header=header, **options)


def read_json(spark: SparkSession, path: str,
              schema: StructType | str, **options) -> DataFrame:
    return spark.read.json(path, schema=schema, **options)


# --------------------------------------------------------------------------
# G5: parquet sink (partitioned - the 100 TB layout knob).
# --------------------------------------------------------------------------

def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: Sequence[str] = ()) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


# --------------------------------------------------------------------------
# G3/S2: Kafka source (option builder; needs the spark-sql-kafka package
# on the classpath of a real deployment).
# --------------------------------------------------------------------------

def kafka_stream(spark: SparkSession, bootstrap_servers: str, topics: str,
                 value_schema: StructType | str | None = None,
                 starting_offsets: str = "latest") -> DataFrame:
    """readStream.format('kafka') with the standard ETL projection:
    key/value as strings plus topic/partition/offset/timestamp; when
    ``value_schema`` is given the JSON value is parsed into columns
    (schema-on-read, SURVEY §2.3 S2)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return _project_kafka(raw, value_schema)


def kafka_batch(spark: SparkSession, bootstrap_servers: str, topics: str,
                value_schema: StructType | str | None = None) -> DataFrame:
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .load()
    )
    return _project_kafka(raw, value_schema)


def _project_kafka(raw: DataFrame, value_schema) -> DataFrame:
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )
    if value_schema is not None:
        out = out.withColumn("data", F.from_json("value", value_schema))
    return out


# --------------------------------------------------------------------------
# G4/S10: Cassandra sink.
# --------------------------------------------------------------------------

def cassandra_writer_options(keyspace: str, table: str) -> dict[str, str]:
    """Options for the spark-cassandra-connector DataSource path
    (df.write.format('org.apache.spark.sql.cassandra'))."""
    return {"keyspace": keyspace, "table": table}


def write_cassandra(df: DataFrame, keyspace: str, table: str,
                    mode: str = "append") -> None:
    """Bulk write through the connector (requires
    com.datastax.spark:spark-cassandra-connector on the classpath)."""
    (
        df.write.format("org.apache.spark.sql.cassandra")
        .options(**cassandra_writer_options(keyspace, table))
        .mode(mode)
        .save()
    )


class CassandraLwtForeachBatch:
    """foreachBatch sink issuing Cassandra LWT statements - the serving
    tier where the CAS semantics of operators/kv.py become *atomic*
    (R5-R7: INSERT IF NOT EXISTS / UPDATE IF owner=? / DELETE IF owner=?,
    CassandraLeaderElection.scala:53-60).

    Each micro-batch row becomes one LWT; Cassandra's Paxos serializes
    contenders exactly as in the reference.  Import-gated: instantiating
    without the ``cassandra-driver`` package raises with guidance, but
    the statement-building is pure and unit-testable via
    :meth:`build_statement`.
    """

    def __init__(self, contact_points: Sequence[str], keyspace: str,
                 table: str, op: str = "insert_if_not_exists",
                 guard_col: str | None = None):
        self.keyspace, self.table, self.op = keyspace, table, op
        self.guard_col = guard_col
        self.contact_points = list(contact_points)
        self._session = None

    def build_statement(self, columns: Sequence[str]) -> str:
        fq = f"{self.keyspace}.{self.table}"
        cols = ", ".join(columns)
        binds = ", ".join("?" for _ in columns)
        if self.op == "insert_if_not_exists":
            return f"INSERT INTO {fq} ({cols}) VALUES ({binds}) IF NOT EXISTS"
        if self.op == "update_if_guard":
            sets = ", ".join(f"{c} = ?" for c in columns[1:])
            return (
                f"UPDATE {fq} SET {sets} WHERE {columns[0]} = ? "
                f"IF {self.guard_col} = ?"
            )
        if self.op == "delete_if_guard":
            return f"DELETE FROM {fq} WHERE {columns[0]} = ? IF {self.guard_col} = ?"
        raise ValueError(f"unknown op {self.op}")

    def _connect(self):
        try:
            from cassandra.cluster import Cluster  # type: ignore
        except ImportError as ex:  # pragma: no cover - gated dependency
            raise NotImplementedError(
                "cassandra-driver not installed; the LWT sink needs it at "
                "deployment time (pip install cassandra-driver)"
            ) from ex
        return Cluster(self.contact_points).connect()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        session = self._session or self._connect()
        self._session = session
        cols = batch_df.columns
        stmt = session.prepare(self.build_statement(cols))
        for row in batch_df.toLocalIterator():
            session.execute(stmt, tuple(row))
