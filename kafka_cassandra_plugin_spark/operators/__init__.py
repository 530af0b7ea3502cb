"""Operator library: kv/cas/lease, CDC, dedup, similarity, text,
multimodal - plus shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition UP to the cluster's parallelism when the input has
    fewer partitions - and only then.

    Why: a compute-heavy projection (shingling, hashing, vector math)
    inherits the scan's partitioning; an unsplittable input (one parquet
    row group, a small file) pins the whole map stage to one core.  One
    cheap shuffle of the narrow input buys full-width compute.  On real
    multi-file tables (the 100 TB case) partitions >> target, so this is
    a no-op - it never coalesces.

    The partition probe reads the planned RDD lineage only (no job).
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
