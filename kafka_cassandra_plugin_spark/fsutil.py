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
