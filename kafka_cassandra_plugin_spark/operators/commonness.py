"""Incremental content-commonness index: streaming SoftDedup state.

:func:`.dedup.soft_dedup_weights` (D32) computes duplicate
down-weights in ONE pass over a static corpus.  A continuously
ingesting pipeline needs the same number against ALL of accepted
history — "how many times have we already accepted this content" —
without re-scanning that history per batch.  Content-fingerprint
counts are exact and distributive over document-disjoint batches, so
the state is the same disk shape every incremental model in this
engine uses (:class:`.bloom.BloomIndex`, :class:`.lm.NgramLM`,
:class:`.bpe.WordHistogram`):

- ``counts/batch=<id>/``  (fp, count) — one partition per contributing
  batch, each written with OVERWRITE, so a replayed foreachBatch
  attempt lands exactly-once;
- ``meta`` — (hash_fn, normalize) pinned at init so append and weight
  can never disagree on the fingerprint convention;
- ``load(exclude_batch=N)`` hides an uncommitted first attempt;
- :meth:`compact` folds committed history into ``batch=-1`` with the
  sibling-then-rename swap, carrying an in-flight batch through
  verbatim.

:meth:`weights` prices a batch against accumulated history: the stored
counts table is corpus-scale (one row per DISTINCT content), so the
batch's fingerprint set broadcasts and semi-reduces it first — the
shuffled term is bounded by the batch, never the history (the same
asymmetry as contamination probing).  ``CurationSink(
commonness_path=)`` maintains the index over accepted documents.

SoftDedup provenance: He et al. 2024 (arXiv:2407.06654).  Reference
provenance: no counterpart in /root/reference (string-KV data plane);
LLM-pipeline closure (SURVEY §2.5 D35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import content_fingerprint


class CommonnessIndex:
    COMPACT_BATCH = -1

    def __init__(self, counts: DataFrame, hash_fn: str, normalize: bool,
                 path: str | None = None):
        self.counts = counts  # (fp, count) — possibly multi-batch rows
        self.hash_fn = str(hash_fn)
        self.normalize = bool(normalize)
        self.path = path

    @staticmethod
    def _fp_type(hash_fn: str) -> str:
        return "long" if hash_fn == "xxhash64" else "string"

    @classmethod
    def init(cls, spark: SparkSession, path: str,
             hash_fn: str = "xxhash64",
             normalize: bool = True) -> "CommonnessIndex":
        """Create an EMPTY disk-backed index (fingerprint convention
        pinned in meta)."""
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError(f"unknown hash_fn: {hash_fn!r}")
        t = cls._fp_type(hash_fn)
        spark.createDataFrame([], f"fp {t}, count long").write.mode(
            "overwrite").parquet(f"{path}/counts/batch={cls.COMPACT_BATCH}")
        spark.createDataFrame(
            [(hash_fn, bool(normalize))], "hash_fn string, normalize boolean"
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return cls.load(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "CommonnessIndex":
        """One 1-row meta read; counts read with a DECLARED schema (an
        empty batch dir has no readable footer), ``exclude_batch``
        partitions pruned at the scan.

        Crash recovery: an interrupted compaction swap is healed on
        entry (:func:`..fsutil.recover_fold_swap` via
        ``recover_tables``) — rolled forward past its commit point,
        rolled back before it — so readers never observe a missing or
        double-counted table."""
        from ..fsutil import path_exists, recover_tables

        if not path_exists(spark, f"{path}/meta"):
            raise ValueError(
                f"no CommonnessIndex meta table under {path!r} — "
                "init() it first."
            )
        recover_tables(spark, path, ("counts",))
        meta = spark.read.parquet(f"{path}/meta").first()
        t = cls._fp_type(meta.hash_fn)
        counts = spark.read.schema(f"fp {t}, count long, batch int").parquet(
            f"{path}/counts")
        if exclude_batch is not None:
            counts = counts.filter(F.col("batch") != int(exclude_batch))
        return cls(counts.drop("batch"), meta.hash_fn,
                   bool(meta.normalize), path=path)

    def _fp(self, text_col: str):
        return content_fingerprint(text_col, self.hash_fn, self.normalize)

    def table(self) -> DataFrame:
        """The consolidated (fp, count) view — lazy groupBy-sum over
        the stored batch partitions."""
        return self.counts.groupBy("fp").agg(F.sum("count").alias("count"))

    def append_batch(self, docs: DataFrame, batch_id: int,
                     text_col: str = "text",
                     reload: bool = True) -> "CommonnessIndex | None":
        """Fold batch ``batch_id`` in by OVERWRITING its own counts
        partition — O(batch) work, exactly-once under replay.
        ``reload=False`` makes the append write-only (sink path)."""
        if self.path is None:
            raise ValueError(
                "append_batch requires a saved index (use init())")
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        (
            docs.select(self._fp(text_col).alias("fp"))
            .groupBy("fp").agg(F.count(F.lit(1)).alias("count"))
            .write.mode("overwrite")
            .parquet(f"{self.path}/counts/batch={int(batch_id)}")
        )
        if not reload:
            return None
        return CommonnessIndex.load(self.counts.sparkSession, self.path)

    def compact(self, exclude_batch: int | None = None) -> "CommonnessIndex":
        """Rewrite stored batch partitions into one consolidated
        ``batch=-1`` (marker-based crash-recoverable swap,
        :func:`..fsutil.staged_fold_swap`; run between batches),
        carrying ``exclude_batch``'s partition through VERBATIM so a
        replayed attempt stays hideable — the BloomIndex discipline."""
        if self.path is None:
            raise ValueError("compact requires a saved index")
        from ..fsutil import staged_fold_swap

        spark = self.counts.sparkSession
        consolidated = CommonnessIndex.load(spark, self.path,
                                            exclude_batch=exclude_batch)
        keeps = [] if exclude_batch is None else [int(exclude_batch)]
        staged_fold_swap(
            spark, f"{self.path}/counts", self.COMPACT_BATCH,
            lambda dest: consolidated.table().write.mode(
                "overwrite").parquet(dest),
            keeps,
        )
        return CommonnessIndex.load(spark, self.path)

    def compact_tiered(self, exclude_batch: int | None = None,
                       max_levels: int = 8) -> "CommonnessIndex":
        """Tiered (LSM-style) compact: fold only the batches appended
        SINCE the last fold into one new negative level — O(recent)
        write cost instead of :meth:`compact`'s O(history) rewrite.
        Lossless because counts sum distributively and :meth:`table`
        re-aggregates across partitions, so levels read exactly like
        batches; falls back to the FULL :meth:`compact` once
        ``max_levels`` levels have accreted.  Crash-safe via the
        :func:`..fsutil.staged_fold_swap` marker protocol."""
        if self.path is None:
            raise ValueError("compact requires a saved index")
        from ..fsutil import tiered_compact_tables

        spark = self.counts.sparkSession
        t = self._fp_type(self.hash_fn)
        outcome = tiered_compact_tables(
            spark, self.path,
            [("counts", f"fp {t}, count long, batch int", (),
              lambda df: df.groupBy("fp").agg(
                  F.sum("count").alias("count")))],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(exclude_batch=exclude_batch)
        return CommonnessIndex.load(spark, self.path)

    def weights(self, docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", alpha: float = 1.0) -> DataFrame:
        """(id, commonness, weight) for a batch, priced against the
        ACCUMULATED counts: ``commonness`` = the content's total count
        across appended history (0 for never-seen content) and
        ``weight = max(commonness, 1) ** -alpha`` — never-seen content
        keeps full weight, content accepted N times decays as the
        one-shot :func:`.dedup.soft_dedup_weights` would on the union
        corpus (exact equality once the batch itself is appended —
        gated in tests).

        Scale shape: the stored table has one row per DISTINCT content
        ever accepted; the batch's fingerprint set (bounded by the
        batch) broadcasts and semi-reduces it, then the surviving
        (fp, count) rows — at most one per batch doc — broadcast back
        onto the batch.  Two broadcast joins, zero history-wide
        shuffle."""
        fp = self._fp(text_col)
        batch = docs.select(id_col, fp.alias("fp"))
        relevant = self.table().join(
            F.broadcast(batch.select("fp").distinct()), "fp", "left_semi"
        )
        return (
            batch.join(F.broadcast(relevant), "fp", "left")
            .select(
                id_col,
                F.coalesce("count", F.lit(0)).alias("commonness"),
                F.pow(
                    F.greatest(F.coalesce("count", F.lit(0)), F.lit(1))
                    .cast("double"),
                    F.lit(-float(alpha)),
                ).alias("weight"),
            )
        )
