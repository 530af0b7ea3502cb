"""Deterministic shuffle-shard export: training-ready dataset output.

Training loaders want N equal-ish shards whose contents AND row order
are a deterministic function of the data alone - the global "shuffle"
step of an LLM data pipeline.  ``randomSplit``/``rand()`` give neither
(partition-order dependent), and a global ``orderBy`` would be an
all-data sort.  Here both properties come from one portable hash:

- shard = ``pmod(xxhash64(id, seed), n_shards)`` - a pure map-side
  column; changing ``seed`` reshuffles every epoch's shard assignment
  reproducibly.
- within-shard order = ascending ``xxhash64(id, seed+1)`` - an
  order that is pseudo-random with respect to any natural key ordering
  yet stable across runs, cluster sizes, and input partitioning.

Cost shape at 100 TB: exactly ONE shuffle (repartition by shard id into
``n_shards`` partitions) + a partition-local sort (Spark's
sortWithinPartitions spills, never collects); every shard is written by
exactly one task, so each ``shard=K/`` directory holds one file and the
in-shard order is globally deterministic, not per-file deterministic.

Reference provenance: no counterpart in /root/reference; LLM-pipeline
closure (SURVEY §2.5), same determinism discipline as
:func:`.sampling.hash_split`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_assignments(df: DataFrame, n_shards: int, seed: int = 42,
                      id_col: str = "doc_id") -> DataFrame:
    """The input plus ``shard`` and ``__ord`` columns (deterministic
    shard id and within-shard order key).  Exposed separately so tests
    and callers can inspect assignments without writing."""
    h_shard = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    h_ord = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed + 1))
    return df.withColumn("shard", F.pmod(h_shard, F.lit(n_shards))).withColumn(
        "__ord", h_ord
    )


def export_shards(df: DataFrame, path: str, n_shards: int, seed: int = 42,
                  id_col: str = "doc_id", fmt: str = "parquet",
                  compression: str | None = None) -> None:
    """Write ``df`` as ``path/shard=K/``, deterministically sharded and
    ordered (module docstring).  One shuffle, one file per shard,
    readers prune shards via the hive partition column.

    ``fmt="json"`` emits JSON-Lines shards - the format most training
    loaders stream natively - with identical shard assignment and
    in-shard order (the determinism lives in the staging plan, not the
    writer).  ``compression`` passes through to the writer (e.g.
    ``"gzip"`` for ``.jsonl.gz``-style shards); the deterministic
    one-file-per-shard layout is unchanged.  Caveat: the JSON writer
    omits null fields, so a parquet->json switch is not
    schema-faithful - read JSON shards back with an explicit
    ``schema`` (see :func:`read_shards`) or entirely-null columns
    vanish and temporal types come back as strings."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    staged = (
        shard_assignments(df, n_shards, seed, id_col)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__ord")
        .drop("__ord")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression is not None:
        staged = staged.option("compression", compression)
    staged.format(fmt).save(path)


def read_shards(spark: SparkSession, path: str,
                shards: list[int] | None = None,
                fmt: str = "parquet", schema=None) -> DataFrame:
    """Read an exported dataset; ``shards`` statically prunes to those
    partition directories (a worker reads only its own shards).  JSON
    shards need the ``fmt="json"`` they were written with, and SHOULD
    be read with an explicit ``schema`` (a DDL string or StructType):
    JSON-Lines inference is per-read, it widens/narrows types
    (timestamps and dates round-trip as strings), and - because the
    writer omits null fields - a column that is entirely null in the
    read subset silently disappears.  Parquet shards carry their own
    schema; ``schema`` is optional there and skips the footer merge."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.format(fmt).load(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
