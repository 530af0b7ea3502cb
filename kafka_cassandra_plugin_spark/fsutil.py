"""Tiny Hadoop-FS helpers shared by the disk-backed index/model types.

Every batch-partitioned store (BloomIndex, NgramLM, Bm25Index,
MinHashIndex) needs the same three filesystem moves around its
``batch=<id>`` layout: existence checks, recursive deletes, and the
sibling-then-rename swap whose rename result must never be ignored (a
silently failed rename followed by a delete is data loss).  Kept in one
module so the discipline is uniform - and auditable in one place.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(conf), hpath, jvm


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs_and_path(spark, path)
    return fs.exists(hpath)


def delete_dir(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` if it exists; True if something was
    deleted.  The pre-write cleanup a consolidated ``save()`` needs so
    stale ``batch=<id>`` partitions from a previous life of the path
    cannot silently merge into the new model's loaded view."""
    fs, hpath, _ = _fs_and_path(spark, path)
    if fs.exists(hpath):
        return bool(fs.delete(hpath, True))
    return False


def list_batch_ids(spark: SparkSession, path: str) -> list[int]:
    """Sorted batch ids of the ``batch=<id>`` partition dirs under
    ``path`` (empty list when none)."""
    fs, hpath, jvm = _fs_and_path(spark, path)
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/batch=*")
    ids = []
    for status in fs.globStatus(glob) or []:
        name = status.getPath().getName()
        try:
            ids.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(ids)


def rename_or_raise(spark: SparkSession, src: str, dst: str) -> None:
    """``fs.rename`` with the result CHECKED - Hadoop's rename reports
    failure by returning false, not by raising, and ignoring it turns
    the swap's subsequent delete into silent data loss."""
    fs, hsrc, jvm = _fs_and_path(spark, src)
    hdst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename {src} -> {dst} failed")


def tiered_compact_tables(spark: SparkSession, path: str, tables,
                          exclude_batch: int | None = None,
                          max_levels: int = 8) -> str:
    """LSM-style tiered fold of an index's ``batch=<id>`` tables: fold
    ONLY the young (``batch >= 0``, minus ``exclude_batch``) partitions
    into one new negative LEVEL partition, carrying every existing
    level - and the excluded in-flight batch - through the swap as
    verbatim directory renames (no data read).  This is the answer to
    the full ``compact()``'s one growth term: a full fold rewrites the
    whole accumulated history every cadence (measured 111 -> 176 s
    across a 5M-doc campaign), while a tiered fold's write cost is
    bounded by data appended SINCE the last fold - flat per cadence.

    Losslessness rests on the property every caller's ``load()``
    already has: the stored tables are distributive (postings/
    fingerprints concatenate, counts sum, bitsets OR) and the read
    path re-aggregates across batch partitions - so multiple negative
    levels read exactly like multiple positive batches.  Real batch
    ids are non-negative, so ``load(exclude_batch=N)`` can never hide
    a level, and the per-table ``fold`` callables shrink each level to
    its aggregated form using ONLY young rows (O(recent) work).

    ``tables``: sequence of ``(name, schema, partition_cols, fold)``
    where ``schema`` is the declared read schema INCLUDING the
    ``batch int`` column (empty batch dirs have no readable footer),
    ``partition_cols`` the hive sub-partitioning to preserve
    (``fpbucket``/``tbucket``), and ``fold`` an optional
    DataFrame -> DataFrame aggregation applied to the young rows.

    Returns ``"noop"`` (no young batches - nothing written),
    ``"tiered"`` (folded into a new level), or ``"full_needed"``
    (``max_levels`` levels already exist: the caller should run its
    FULL ``compact()`` to merge the levels - the periodic major
    compaction that bounds read-side file counts; with cadence C and
    L levels, only every L-th compaction pays the O(history) cost).

    Same non-atomicity caveat as the full swap: run between batches,
    never concurrently with readers.  Crash recovery: the
    ``__compacting`` sibling is complete before the source dir is
    deleted, so a crash in the swap window leaves either the old dir
    intact or the sibling ready to roll forward."""
    first = f"{path}/{tables[0][0]}"
    ids = list_batch_ids(spark, first)
    excl = None if exclude_batch is None else int(exclude_batch)
    youngs = [i for i in ids if i >= 0 and i != excl]
    levels = [i for i in ids if i < 0]
    if not youngs:
        return "noop"
    if len(levels) >= int(max_levels):
        return "full_needed"
    from pyspark.sql import functions as F

    new_level = min(levels, default=0) - 1
    for name, schema, partition_cols, fold in tables:
        tpath = f"{path}/{name}"
        tmp = f"{tpath}__compacting"
        delete_dir(spark, tmp)
        young = (
            spark.read.schema(schema).parquet(tpath)
            .filter(F.col("batch") >= 0)
        )
        if excl is not None:
            young = young.filter(F.col("batch") != excl)
        young = young.drop("batch")
        if fold is not None:
            young = fold(young)
        w = young.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(f"{tmp}/batch={int(new_level)}")
        keep = [
            i for i in list_batch_ids(spark, tpath)
            if i < 0 or (excl is not None and i == excl)
        ]
        for i in keep:
            rename_or_raise(spark, f"{tpath}/batch={i}", f"{tmp}/batch={i}")
        delete_dir(spark, tpath)
        rename_or_raise(spark, tmp, tpath)
    return "tiered"
