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


def salted_join(big, right, on: str, how: str = "inner", salt: int = 8):
    """Skew-resistant equi-join: salt the big side's key into ``salt``
    sub-keys and replicate the right side once per salt value, so one hot
    key spreads over ``salt`` reducers instead of one straggler task.

    Use when AQE's skew-join splitting isn't available (e.g. the join
    feeds an operator that disables it) or a key is so hot that even
    split shuffle blocks overwhelm a single executor.  Result is
    identical to ``big.join(right, on, how)`` for the supported join
    types (tested); cost is a salt-fold replication of the (smaller)
    right side.

    Only big-side-preserving joins are supported: for right/full-outer
    joins every *unmatched* right row would surface once per salt value
    (``salt`` duplicate null-extended rows), so those types raise.
    """
    from pyspark.sql import functions as F

    supported = {"inner", "left", "leftouter", "left_outer", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "cross"}
    if how not in supported:
        raise ValueError(
            f"salted_join: join type {how!r} is not big-side-preserving; "
            "unmatched right rows would duplicate once per salt value. "
            f"Supported: {sorted(supported)}"
        )
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    salts = big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    right_s = right.crossJoin(F.broadcast(salts))
    joined = big_s.join(right_s, [on, "__salt"], how)
    return joined.drop("__salt")
