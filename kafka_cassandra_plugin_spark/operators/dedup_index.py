"""Incremental near-dup detection: a persisted MinHash-LSH corpus index.

The batch tiers in :mod:`.dedup` answer "which pairs inside THIS
dataframe are near-duplicates" - the right shape for a one-shot corpus
build.  A production training-data pipeline has a different recurring
question: *given a 100 TB corpus already deduplicated yesterday, which of
today's N new documents duplicate it (or each other)?*  Re-running the
all-corpus pipeline per batch would re-shingle and re-hash the entire
corpus every day.

:class:`MinHashIndex` makes the corpus side a build-once artifact, the
same way :class:`..similarity.IvfIndex` does for ANN probes:

- ``build(corpus)`` computes the banded LSH table (one row per doc per
  band) and the per-doc shingle sets ONCE.
- ``save(path)`` / ``load(spark, path)`` persist both as parquet - the
  band table partitioned by ``band`` so a probe that only needs some
  bands prunes files - plus a one-row ``meta`` table pinning the
  hash-family parameters (n, num_hashes, bands, hash_fn).  A batch
  hashed with different parameters than the stored index would silently
  match nothing; load restores the exact family.
- ``match_batch(new_docs)`` shingles and hashes ONLY the new batch,
  broadcast-joins its band keys against the stored band table (the
  corpus side never shuffles - one map-side pass per batch), and
  exact-jaccard-verifies the candidates against the stored shingle sets
  (corpus shingles are semi-join-pruned to candidate ids before the
  verify join, so the 100 TB shingle table is touched only where a
  candidate exists).
- ``dedup_batch(new_docs)`` returns the batch rows that survive BOTH
  the corpus check and intra-batch LSH dedup - the drop-in "what do I
  actually append today" operator.

Reference provenance: the reference plugin has no dedup at all (it is a
Cassandra KV/lease layer - `CassandraListenerRegistry.scala:27,52` point
reads plus the `README.md:180-224` Storage CRUD spec); this
module is part of the LLM-pipeline closure the engine adds on top, built
on the same banded-MinHash machinery as
:func:`.dedup.minhash_lsh_dedup_pairs` so the two agree exactly (see
tests/test_dedup_index.py equivalence test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _signatures_from_exploded,
    banded_buckets,
    exploded_shingles,
)


class MinHashIndex:
    """Build-once / probe-many MinHash-LSH index over a document corpus.

    ``bands``: (id, band, bucket) - one row per doc per band; the LSH
    candidate key.  ``shingles``: (id, sh array) - the exact-verify side.
    ``params``: the hash-family contract every probe batch must reuse.
    """

    def __init__(self, bands: DataFrame, shingles: DataFrame,
                 params: dict, path: str | None = None):
        self.bands = bands
        self.shingles = shingles
        self.params = params
        self.path = path

    # -- construction ------------------------------------------------------

    @classmethod
    def build(cls, corpus: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", n: int = 3, num_hashes: int = 64,
              bands: int = 16, hash_fn: str = "xxhash64") -> "MinHashIndex":
        params = {
            "n": n, "num_hashes": num_hashes, "bands": bands,
            "hash_fn": hash_fn,
        }
        exploded = exploded_shingles(corpus, text_col, id_col, n).localCheckpoint()
        band_df = cls._band_table(exploded, params)
        sh = exploded.groupBy("id").agg(F.collect_set("sh").alias("sh"))
        return cls(band_df, sh, params)

    @staticmethod
    def _band_table(exploded: DataFrame, params: dict) -> DataFrame:
        """(id, band, bucket) rows from DISTINCT (id, shingle) rows -
        signatures through :func:`.dedup.banded_buckets` (the ONE
        banding definition, shared with the intra-frame pipeline), with
        the bucket cast to string for a uniform stored schema across
        hash families."""
        num_hashes, bands = params["num_hashes"], params["bands"]
        sigs = _signatures_from_exploded(exploded, num_hashes, params["hash_fn"])
        b = banded_buckets(
            sigs, bands, num_hashes // bands,
            bucket_key="concat" if params["hash_fn"] == "md5" else "xxhash64",
        )
        return b.select("id", "band", F.col("bucket").cast("string").alias("bucket"))

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> "MinHashIndex":
        """Write bands (partitioned by ``band``), shingle sets, and the
        parameter row; returns the loaded (disk-backed) handle."""
        spark = self.bands.sparkSession
        self.bands.write.mode("overwrite").partitionBy("band").parquet(
            f"{path}/bands"
        )
        self.shingles.write.mode("overwrite").parquet(f"{path}/shingles")
        spark.createDataFrame(
            [(self.params["n"], self.params["num_hashes"],
              self.params["bands"], self.params["hash_fn"])],
            "n int, num_hashes int, bands int, hash_fn string",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return MinHashIndex.load(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MinHashIndex":
        from ..fsutil import recover_tables

        # heal an interrupted compact() swap (roll a committed sibling
        # forward, drop an uncommitted one) before resolving file lists
        recover_tables(spark, path, ("bands", "shingles"))
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        params = {
            "n": int(meta["n"]), "num_hashes": int(meta["num_hashes"]),
            "bands": int(meta["bands"]), "hash_fn": meta["hash_fn"],
        }
        bands = spark.read.parquet(f"{path}/bands").select(
            "id", F.col("band").cast("int").alias("band"), "bucket"
        )
        shingles = spark.read.parquet(f"{path}/shingles")
        return cls(bands, shingles, params, path=path)

    # -- probing -----------------------------------------------------------

    def match_batch(self, new_docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    threshold: float = 0.8,
                    max_broadcast_rows: int = 2_000_000) -> DataFrame:
        """Verified near-dup links (new_id, corpus_id, jaccard) between a
        new batch and the indexed corpus.

        Scale shape: only the BATCH is shingled/hashed; its band keys
        (batch_rows x bands - small by assumption) are broadcast against
        the stored band table, so the corpus side is one shuffle-free
        scan.  Exact verify then touches corpus shingle sets only for
        candidate ids (left-semi prune before the join).  Ids shared by
        batch and corpus are treated as the same document and never
        matched to themselves.

        The broadcast is guarded: when the batch's exploded shingle rows
        exceed ``max_broadcast_rows`` (someone fed a corpus-sized
        "batch"), the probe falls back to plain shuffle equi-joins -
        same result, no driver/executor OOM from a giant broadcast.  The
        count is free: the exploded frame is already localCheckpoint'd.

        The stored banding geometry is frozen at build time; probing at
        a ``threshold`` below its S-curve knee silently misses
        candidates no verify stage can recover, so a warning reports
        the stored geometry's candidate recall when it falls below 95%
        (:func:`.dedup.warn_if_low_banding_recall`)."""
        from .dedup import warn_if_low_banding_recall

        warn_if_low_banding_recall(
            self.params["bands"], self.params["num_hashes"], threshold
        )
        exploded = exploded_shingles(
            new_docs, text_col, id_col, self.params["n"]
        ).localCheckpoint()
        batch_fits = exploded.count() <= max_broadcast_rows
        maybe_broadcast = F.broadcast if batch_fits else (lambda df: df)
        new_bands = self._band_table(exploded, self.params).withColumnsRenamed(
            {"id": "new_id"}
        )
        cands = (
            self.bands.join(
                maybe_broadcast(new_bands),
                ["band", "bucket"],
            )
            .filter(F.col("id") != F.col("new_id"))
            .select(F.col("new_id"), F.col("id").alias("corpus_id"))
            .distinct()
        )
        new_sh = exploded.groupBy("id").agg(F.collect_set("sh").alias("sh_new"))
        corpus_sh = self.shingles.join(
            maybe_broadcast(
                cands.select(F.col("corpus_id").alias("id")).distinct()
            ),
            "id",
            "left_semi",
        )
        return (
            cands.join(
                corpus_sh.withColumnsRenamed({"id": "corpus_id", "sh": "sh_c"}),
                "corpus_id",
            )
            .join(
                maybe_broadcast(new_sh.withColumnsRenamed({"id": "new_id"})),
                "new_id",
            )
            .withColumn(
                "__j_raw",
                F.size(F.array_intersect("sh_new", "sh_c"))
                / F.size(F.array_union("sh_new", "sh_c")),
            )
            .filter(F.col("__j_raw") >= threshold)
            # a replayed (at-least-once) add_batch can leave duplicate
            # index rows for an id; identical shingle sets give identical
            # links, and a re-added id with CHANGED text keeps its
            # highest verified similarity - max() makes the surviving
            # jaccard deterministic where dropDuplicates would not be
            .groupBy("new_id", "corpus_id")
            .agg(F.round(F.max("__j_raw"), 4).alias("jaccard"))
        )

    def dedup_batch(self, new_docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    threshold: float = 0.8) -> DataFrame:
        """Batch rows that are near-dups of NEITHER the corpus nor an
        earlier (lower-id) batch row - "what to append today".  Corpus
        matches drop unconditionally; intra-batch near-dup clusters keep
        their min-id row (same survivor rule as
        :func:`.dedup.survivors_from_pairs` on a star-free pair set)."""
        from .dedup import minhash_lsh_dedup_pairs, survivors_from_pairs

        corpus_dupes = self.match_batch(
            new_docs, text_col, id_col, threshold
        ).select(F.col("new_id").alias(id_col)).distinct()
        batch_pairs = minhash_lsh_dedup_pairs(
            new_docs, text_col, id_col,
            n=self.params["n"], num_hashes=self.params["num_hashes"],
            bands=self.params["bands"], threshold=threshold,
            hash_fn=self.params["hash_fn"],
        ).select("id_a", "id_b")
        survivors = survivors_from_pairs(new_docs, batch_pairs, id_col=id_col)
        return survivors.join(F.broadcast(corpus_dupes), id_col, "left_anti")

    def add_batch(self, accepted: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  reload: bool = True) -> "MinHashIndex | None":
        """Index the accepted rows and append them to the stored index
        (disk-backed handles only): tomorrow's batches then dedup against
        corpus + today.  Appends are new parquet files in the existing
        partition layout - no rewrite of the corpus-scale tables.
        ``reload=False`` is write-only (returns None): for sink callers
        that load fresh at the next batch anyway, it skips the reload's
        meta job - the Bm25Index/NgramLM ``append_batch`` convention."""
        if self.path is None:
            raise ValueError("add_batch requires a saved index (use save())")
        exploded = exploded_shingles(
            accepted, text_col, id_col, self.params["n"]
        ).localCheckpoint()
        self._band_table(exploded, self.params).write.mode("append").partitionBy(
            "band"
        ).parquet(f"{self.path}/bands")
        exploded.groupBy("id").agg(
            F.collect_set("sh").alias("sh")
        ).write.mode("append").parquet(f"{self.path}/shingles")
        if not reload:
            return None
        return MinHashIndex.load(self.bands.sparkSession, self.path)

    def compact(self, target_file_mb: int = 256) -> "MinHashIndex":
        """Rewrite the stored bands/shingles into ~``target_file_mb``
        files (bands keep their ``band=`` partition layout so probes
        still prune).  Every :meth:`add_batch` appends new parquet
        files; under a streaming sink at a sub-second trigger that is a
        small-files factory - thousands of KB files turn each probe's
        corpus scan into listing/open overhead.  Runs via
        :func:`..sources.compact_parquet` into a sibling directory,
        then swaps it in (delete + rename through the Hadoop FS, so any
        scheme works).  The swap is not atomic - run it from the ingest
        process between batches (see ``CurationSink(compact_every=)``),
        not concurrently with probes."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import staged_replace
        from ..sources import compact_parquet

        spark = self.bands.sparkSession
        for sub, pby in (("bands", ("band",)), ("shingles", ())):
            src = f"{self.path}/{sub}"
            staged_replace(
                spark, src,
                lambda tmp, src=src, pby=pby: compact_parquet(
                    spark, src, tmp, target_file_mb, partition_by=pby),
            )
        return MinHashIndex.load(spark, self.path)
