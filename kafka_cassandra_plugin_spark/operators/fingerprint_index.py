"""Persisted winnowing-fingerprint index: cross-run MOSS probing.

:mod:`.fingerprint` answers "how much verbatim material do documents in
THIS frame share"; a continuous ingest asks the cross-run form: "is
this new batch substantially copied from anything already in the
corpus" - license-text and code-clone screening at ingest, the MOSS
use case made incremental.  Re-winnowing the corpus per batch would be
O(corpus) daily; :class:`FingerprintIndex` persists the corpus
fingerprint SETS once and lets a batch probe them with O(batch) work:

- the stored ``fps`` table ((doc_id, fp), distinct) is partitioned by
  ``fpbucket = pmod(fp, bucket_partitions)``, so a probe collects its
  own fingerprint values' bucket set (driver-scale: a batch's
  DISTINCT fingerprints, capped at ``bucket_partitions`` values) and
  pushes it as a partition filter - the scan reads only the bucket
  directories the batch's fingerprints hash into, the same FILE-level
  pruning as :meth:`.retrieval.Bm25Index.topk`;
- ``sizes`` ((doc_id, n_fp)) rides along so containment scores need no
  corpus-wide re-aggregation at probe time;
- both tables are batch-partitioned (``batch=<id>``) with the
  D18/D19/D22 replay-exclusion discipline: fingerprint sets are
  distributive over document-disjoint batches, so
  :meth:`append_batch` OVERWRITES its own partitions (exactly-once
  under foreachBatch replay), :meth:`load` with ``exclude_batch``
  hides an uncommitted attempt, and :meth:`compact` folds committed
  history into ``batch=-1`` without closing the replay window.

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fingerprint import winnow_fingerprints

__all__ = ["FingerprintIndex"]


def _require_integral_id(docs: DataFrame, id_col: str) -> None:
    from pyspark.sql import types as T

    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType,
                                T.IntegerType, T.LongType)):
        raise TypeError(
            f"FingerprintIndex requires an integral id column; "
            f"{id_col!r} is {id_type.simpleString()} (the pinned "
            "on-disk schema stores doc_id as long - map string ids "
            "first, same contract as Bm25Index)."
        )


class FingerprintIndex:
    """``fps`` ((doc_id, fp) distinct) + ``sizes`` ((doc_id, n_fp)) as
    DataFrames; disk-backed handles carry ``path`` and
    ``bucket_partitions`` and keep the ``fpbucket`` column on ``fps``
    for partition-pruned probes.  Geometry (k, w, hash_fn) is pinned
    at build/init and persisted in meta - a probe winnows its batch
    under the SAME geometry or shared substrings would never collide."""

    COMPACT_BATCH = -1

    def __init__(self, fps: DataFrame, sizes: DataFrame, k: int, w: int,
                 hash_fn: str, path: str | None = None,
                 bucket_partitions: int | None = None):
        self.fps = fps
        self.sizes = sizes
        self.k = int(k)
        self.w = int(w)
        self.hash_fn = hash_fn
        self.path = path
        self.bucket_partitions = bucket_partitions

    # -- build ---------------------------------------------------------------

    @classmethod
    def build(cls, docs: DataFrame, k: int = 5, w: int = 4,
              text_col: str = "text", id_col: str = "doc_id",
              hash_fn: str = "xxhash64") -> "FingerprintIndex":
        _require_integral_id(docs, id_col)
        fps = winnow_fingerprints(
            docs, k=k, w=w, text_col=text_col, id_col=id_col,
            hash_fn=hash_fn,
        ).select(F.col(id_col).cast("long").alias("doc_id"), "fp").distinct()
        sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
        return cls(fps, sizes, k, w, hash_fn)

    # -- persistence ---------------------------------------------------------
    #
    # Layout: <path>/meta (k, w, hash_fn, bucket_partitions)
    #   <path>/fps/batch=<id>/fpbucket=<b>/    (doc_id, fp)
    #   <path>/sizes/batch=<id>/               (doc_id, n_fp)
    # One partition pair per contributing batch, written with overwrite
    # (the BloomIndex/NgramLM/Bm25Index discipline); fingerprint sets
    # concatenate across document-disjoint batches, so the consolidated
    # view IS the whole-corpus build.

    def _bucket(self, col) -> F.Column:
        return F.pmod(col, F.lit(int(self.bucket_partitions))).cast("int")

    def _tdir(self, table: str, batch_id: int) -> str:
        return f"{self.path}/{table}/batch={int(batch_id)}"

    def _tables(self):
        return (
            ("fps", self.fps.select(
                "doc_id", "fp", self._bucket(F.col("fp")).alias("fpbucket"))),
            ("sizes", self.sizes.select("doc_id", "n_fp")),
        )

    def save(self, path: str,
             bucket_partitions: int = 256) -> "FingerprintIndex":
        """Consolidated history (``batch=-1``) with fps partitioned by
        ``fpbucket``; staged-sibling swap, so saving a loaded handle
        onto its own path is a lossless consolidation."""
        from ..fsutil import delete_dir, rename_or_raise

        spark = self.fps.sparkSession
        staged = FingerprintIndex(self.fps, self.sizes, self.k, self.w,
                                  self.hash_fn, path=path,
                                  bucket_partitions=int(bucket_partitions))
        for table, df in staged._tables():
            delete_dir(spark, f"{path}/{table}__saving")
            writer = df.write.mode("overwrite")
            if table == "fps":
                writer = writer.partitionBy("fpbucket")
            writer.parquet(f"{path}/{table}__saving/batch={self.COMPACT_BATCH}")
        for table in ("fps", "sizes"):
            delete_dir(spark, f"{path}/{table}")
            rename_or_raise(spark, f"{path}/{table}__saving",
                            f"{path}/{table}")
        spark.createDataFrame(
            [(self.k, self.w, self.hash_fn, int(bucket_partitions))],
            "k int, w int, hash_fn string, bucket_partitions int",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return FingerprintIndex.load(spark, path)

    @classmethod
    def init(cls, spark: SparkSession, path: str, k: int = 5, w: int = 4,
             hash_fn: str = "xxhash64",
             bucket_partitions: int = 256) -> "FingerprintIndex":
        """Empty disk-backed index with the geometry pinned - the
        streaming accumulation entry point (init once, then
        :meth:`append_batch` per corpus batch)."""
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError(
                f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}"
            )
        empty = cls(
            spark.createDataFrame([], "doc_id long, fp long"),
            spark.createDataFrame([], "doc_id long, n_fp long"),
            k, w, hash_fn,
        )
        return empty.save(path, bucket_partitions=bucket_partitions)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "FingerprintIndex":
        """Lazy union of the stored batch partitions; ``exclude_batch``
        hides that batch's partitions AT THE SCAN (a partition filter)
        so a replayed foreachBatch caller probes the index as of its
        predecessors.  Load cost: one 1-row meta read (plus one
        exists-check per table that self-heals a post-commit
        compaction crash by finishing the swap)."""
        from ..fsutil import path_exists, recover_tables

        if not path_exists(spark, f"{path}/meta"):
            raise ValueError(
                f"no FingerprintIndex meta table under {path!r} "
                "(build().save() or init() first)"
            )
        recover_tables(spark, path, ("fps", "sizes"))
        meta = spark.read.parquet(f"{path}/meta").first()
        schemas = {
            "fps": "doc_id long, fp long, fpbucket int, batch int",
            "sizes": "doc_id long, n_fp long, batch int",
        }

        def _table(name: str) -> DataFrame:
            t = spark.read.schema(schemas[name]).parquet(f"{path}/{name}")
            if exclude_batch is not None:
                t = t.filter(F.col("batch") != int(exclude_batch))
            return t.drop("batch")

        return cls(_table("fps"), _table("sizes"), meta.k, meta.w,
                   meta.hash_fn, path=path,
                   bucket_partitions=int(meta.bucket_partitions))

    # -- streaming maintenance ----------------------------------------------

    def append_batch(self, docs: DataFrame, batch_id: int,
                     text_col: str = "text", id_col: str = "doc_id",
                     reload: bool = True) -> "FingerprintIndex | None":
        """Fold a document-disjoint corpus batch in by OVERWRITING its
        own ``batch=<id>`` partitions - O(batch) work, exactly-once
        under replay.  ``reload=False`` is write-only (for sinks)."""
        if self.path is None:
            raise ValueError(
                "append_batch requires a saved index (use save()/init())"
            )
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        sub = FingerprintIndex.build(docs, k=self.k, w=self.w,
                                     text_col=text_col, id_col=id_col,
                                     hash_fn=self.hash_fn)
        sub.path = self.path
        sub.bucket_partitions = self.bucket_partitions
        for table, df in sub._tables():
            writer = df.write.mode("overwrite")
            if table == "fps":
                writer = writer.partitionBy("fpbucket")
            writer.parquet(self._tdir(table, batch_id))
        if not reload:
            return None
        return FingerprintIndex.load(self.fps.sparkSession, self.path)

    def compact(self,
                exclude_batch: int | None = None) -> "FingerprintIndex":
        """Fold stored batch partitions into one ``batch=-1`` pair;
        ``exclude_batch`` moves that batch through the swap verbatim so
        ``load(exclude_batch=N)`` keeps working after compaction (the
        in-flight-batch discipline shared with BloomIndex/NgramLM/
        Bm25Index).  The swap runs through
        :func:`..fsutil.staged_fold_swap` (marker-based, crash-
        recoverable at every step); run between batches."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import staged_fold_swap

        spark = self.fps.sparkSession
        consolidated = FingerprintIndex.load(spark, self.path,
                                             exclude_batch=exclude_batch)
        consolidated.bucket_partitions = self.bucket_partitions
        keeps = [] if exclude_batch is None else [int(exclude_batch)]
        for table, df in consolidated._tables():

            def _write(dest: str, df=df, table=table) -> None:
                writer = df.write.mode("overwrite")
                if table == "fps":
                    writer = writer.partitionBy("fpbucket")
                writer.parquet(dest)

            staged_fold_swap(spark, f"{self.path}/{table}",
                             self.COMPACT_BATCH, _write, keeps)
        return FingerprintIndex.load(spark, self.path)

    def compact_tiered(self, exclude_batch: int | None = None,
                       max_levels: int = 8) -> "FingerprintIndex":
        """Tiered (LSM-style) compact: fold only the batch partitions
        appended SINCE the last fold into one new negative level,
        moving existing levels through the swap as verbatim renames -
        O(recent) write cost instead of :meth:`compact`'s O(history)
        rewrite (the one non-flat growth term of the 5M-doc campaign).
        Lossless because fingerprint sets concatenate across document-
        disjoint batches, so levels read exactly like batches; falls
        back to the FULL :meth:`compact` once ``max_levels`` levels
        have accreted (the periodic major compaction that bounds
        read-side file counts).  Same exclude_batch/replay gates.
        Crash-safe: every table swap runs the marker protocol of
        :func:`..fsutil.staged_fold_swap`, so a retry after a crash at
        any point rolls the interrupted swap forward or back - never
        deletes accumulated levels (gated by the fault-injection
        battery in tests/test_tiered_compact.py)."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import tiered_compact_tables

        spark = self.fps.sparkSession
        outcome = tiered_compact_tables(
            spark, self.path,
            [
                ("fps", "doc_id long, fp long, fpbucket int, batch int",
                 ("fpbucket",), None),
                ("sizes", "doc_id long, n_fp long, batch int", (), None),
            ],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(exclude_batch=exclude_batch)
        return FingerprintIndex.load(spark, self.path)

    # -- probe ---------------------------------------------------------------

    def match_batch(self, docs: DataFrame, threshold: float | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    max_fp_docs: int | None = None,
                    broadcast_batch: bool = True) -> DataFrame:
        """(batch_id, corpus_id, shared, n_batch, n_corpus, overlap):
        MOSS containment of each batch document against every stored
        corpus document sharing at least one fingerprint.  ``overlap =
        shared / min(n_batch, n_corpus)``; ``threshold`` filters.

        Scale shape: the batch winnows ALONE (O(batch)); its distinct
        fingerprint set broadcasts; the stored side prunes map-side via
        the fp join - and FILE-level against a saved index (the batch
        fingerprints' bucket set becomes a partition filter, so only
        the touched ``fpbucket=`` directories are read).
        ``max_fp_docs`` drops stored fingerprints present in more than
        N corpus documents - exact even under bucket pruning, because a
        fingerprint's rows all live in its own bucket.
        ``broadcast_batch=False`` is the corpus-vs-corpus escape hatch
        (plain shuffle joins, no file pruning)."""
        _require_integral_id(docs, id_col)
        bfps = winnow_fingerprints(
            docs, k=self.k, w=self.w, text_col=text_col, id_col=id_col,
            hash_fn=self.hash_fn,
        ).select(
            F.col(id_col).cast("long").alias("batch_id"), "fp"
        ).distinct().persist()
        bsizes = bfps.groupBy("batch_id").agg(
            F.count(F.lit(1)).alias("n_batch")
        )
        bc = F.broadcast if broadcast_batch else (lambda df: df)
        stored = self.fps
        if self.bucket_partitions is not None and broadcast_batch:
            # file-level pruning pays for POINTED probes only: a batch
            # with >= bucket_partitions distinct fingerprints touches
            # essentially every bucket (coupon-collector), so the
            # bucket collect + isin filter would be pure overhead
            # (measured at sf10: a 1k-doc probe covers all 256 buckets
            # and the "pruned" path reads 6.7 s vs 5.1 s full-scan,
            # while a 20-doc probe prunes to a fraction of the files).
            # bfps is persisted, so the count is one cheap job.
            if bfps.count() <= self.bucket_partitions:
                buckets = sorted(
                    r[0] for r in bfps.select(
                        self._bucket(F.col("fp")).alias("b")
                    ).distinct().collect()
                )
                stored = stored.filter(
                    F.col("fpbucket").isin(buckets) if buckets
                    else F.lit(False)
                )
        if max_fp_docs is not None:
            rare = stored.groupBy("fp").agg(
                F.count(F.lit(1)).alias("__docs")
            ).filter(F.col("__docs") <= int(max_fp_docs)).select("fp")
            stored = stored.join(rare, "fp", "left_semi")
        pairs = (
            stored.select(F.col("doc_id").alias("corpus_id"), "fp")
            .join(bc(bfps), "fp")
            .groupBy("batch_id", "corpus_id")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        out = (
            pairs.join(bc(bsizes), "batch_id")
            .join(self.sizes.select(F.col("doc_id").alias("corpus_id"),
                                    F.col("n_fp").alias("n_corpus")),
                  "corpus_id")
            .select("batch_id", "corpus_id", "shared", "n_batch",
                    "n_corpus",
                    (F.col("shared")
                     / F.least("n_batch", "n_corpus")).alias("overlap"))
        )
        if threshold is not None:
            out = out.filter(F.col("overlap") >= float(threshold))
        return out

    # -- composition ---------------------------------------------------------

    def merge(self, other: "FingerprintIndex") -> "FingerprintIndex":
        """Union two indexes over DOCUMENT-DISJOINT corpora (the
        distributive-sets property the module doc notes)."""
        if (other.k, other.w, other.hash_fn) != (self.k, self.w,
                                                 self.hash_fn):
            raise ValueError(
                "merge: geometry mismatch "
                f"(k, w, hash_fn) = {(self.k, self.w, self.hash_fn)} vs "
                f"{(other.k, other.w, other.hash_fn)}"
            )
        return FingerprintIndex(
            self.fps.select("doc_id", "fp").unionByName(
                other.fps.select("doc_id", "fp")),
            self.sizes.unionByName(other.sizes),
            self.k, self.w, self.hash_fn,
        )
