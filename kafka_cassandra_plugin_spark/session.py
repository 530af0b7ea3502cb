"""SparkSession factory with engine defaults.

Mirrors the *semantics* of the reference's config loading
(`/root/reference/src/main/scala/ly/stealth/kafka/plugin/cassandra/util/Config.scala:26-52`:
properties file + override map, typed getters) re-expressed as Spark conf:
a layered dict of defaults < file/env < explicit overrides, applied to the
SparkSession builder.

Scale posture (100 TB target, tested on local[32]):
- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- `spark.sql.shuffle.partitions` default 32 locally; on a real cluster this
  is expected to be overridden (AQE coalesces down, so erring high is safe).
- Arrow enabled for every pandas-UDF path (vectorized python boundary).
- Session timezone pinned to UTC so timestamp semantics are deterministic
  across driver/executors regardless of host TZ.
- `spark.sql.legacy.parquet.nanosAsLong=true`: the events table carries
  nanosecond parquet timestamps which Spark 4 otherwise refuses to read;
  the catalog layer converts the raw long to timestamp_ntz explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Split sizing for CPU-heavy map stages over compact columnar text:
    # Spark floors a file's split size at openCostInBytes (default 4 MB),
    # sized for scan-dominated work.  Text operators cost ~us/row on
    # ~100 compressed bytes/row, so a 6 MB documents file is 8+ seconds
    # of single-task HOF evaluation at the default floor (measured:
    # text_stats at sf1 ran 2-way on 32 cores; the sf10 smoke's "15x at
    # 10x data" was this, not a plan term).  256 KB keeps splits
    # fine-grained when bytes-per-core is small; on real multi-TB inputs
    # totalBytes/minPartitionNum dominates the max() and behavior is
    # unchanged, and many-tiny-file dirs get LESS padding per file (fewer,
    # fuller tasks).  Row-group layout still bounds effective parallelism
    # (scripts/build_sf1.py writes >= 32 groups/table for this reason).
    "spark.sql.files.openCostInBytes": str(256 * 1024),
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


# Reference config contract (Config.scala:57-67 + plugin.properties):
# the six plugin.* keys, with the reference's own defaults where the
# sample file ships one.
REFERENCE_KEYS: dict[str, str | None] = {
    "plugin.cassandra.contact.points": "",
    "plugin.cassandra.keyspace": "kafka_cluster_1",
    "plugin.cassandra.le.executor.threads": "8",
    "plugin.cassandra.le.renew.ttl.period.ms": "500",
    "plugin.cassandra.lr.executor.threads": "8",
    "plugin.cassandra.lr.pull.period.ms": "500",
}

# plugin.* -> engine conf mapping: the poll cadences become the streaming
# trigger default; thread pools become shuffle/parallelism hints.  Keys
# without an engine-side meaning (contact points, keyspace) are kept
# verbatim under spark.kcp.* so sinks can read them from the session conf.
_PLUGIN_TO_ENGINE = {
    "plugin.cassandra.lr.pull.period.ms": "spark.kcp.trigger.ms",
    "plugin.cassandra.le.renew.ttl.period.ms": "spark.kcp.lease.renew.ms",
    "plugin.cassandra.le.executor.threads": "spark.kcp.le.threads",
    "plugin.cassandra.lr.executor.threads": "spark.kcp.lr.threads",
    "plugin.cassandra.contact.points": "spark.kcp.cassandra.contact.points",
    "plugin.cassandra.keyspace": "spark.kcp.cassandra.keyspace",
}


def load_properties(path: str) -> dict[str, str]:
    """Java-properties reader (Config.scala:43-52 loadConfigFile): k=v or
    k:v lines, '#'/'!' comments, surrounding whitespace stripped,
    trailing-backslash line continuations.  No external deps."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        pending = ""
        for raw in f:
            line = pending + raw.strip()
            pending = ""
            if not line or line[0] in "#!":
                continue
            if line.endswith("\\") and not line.endswith("\\\\"):
                pending = line[:-1]
                continue
            # split at the FIRST separator of either kind, like
            # java.util.Properties: 'a:b=c' -> key 'a', value 'b=c'
            cuts = [i for i in (line.find("="), line.find(":")) if i >= 0]
            if cuts:
                i = min(cuts)
                props[line[:i].strip()] = line[i + 1:].strip()
            else:
                props[line.strip()] = ""
    return props


def load_config(file: str | None = None,
                overrides: dict[str, str] | None = None) -> dict[str, str]:
    """The reference's ``Config(file, overrides)`` layering
    (Config.scala:26-41): reference defaults < properties file <
    override map.  Returns the resolved plugin.* map; unknown keys in the
    file ride along untouched (the reference's Properties does the same).
    """
    conf = {k: v for k, v in REFERENCE_KEYS.items() if v is not None}
    if file:
        conf.update(load_properties(file))
    if overrides:
        conf.update(overrides)
    return conf


def engine_confs_from_plugin(plugin_conf: dict[str, str]) -> dict[str, str]:
    """Map resolved plugin.* keys to engine (spark.kcp.*) confs."""
    return {
        _PLUGIN_TO_ENGINE[k]: v
        for k, v in plugin_conf.items()
        if k in _PLUGIN_TO_ENGINE
    }


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "kafka-cassandra-plugin-spark",
    master: str | None = None,
    overrides: dict[str, str] | None = None,
    properties_file: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Layering matches the reference's ``Config(file, overrides)``
    (Config.scala:26-52): engine defaults < ``properties_file``
    (plugin.* keys mapped to spark.kcp.* confs) < explicit ``overrides``.
    """
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or default_master())
    conf = dict(ENGINE_DEFAULTS)
    if properties_file:
        conf.update(engine_confs_from_plugin(load_config(properties_file)))
    if overrides:
        conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally-created
    session (the driver passes us its own SparkSession in ``entry()``)."""
    static = {"spark.driver.memory", "spark.ui.enabled"}
    for k, v in ENGINE_DEFAULTS.items():
        if k in static:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session - keep going
    return spark
