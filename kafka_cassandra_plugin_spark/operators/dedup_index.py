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
- ``save(path)`` / ``load(spark, path)`` persist both as parquet, plus
  a one-row ``meta`` table pinning the hash-family parameters
  (n, num_hashes, bands, hash_fn).  A batch hashed with different
  parameters than the stored index would silently match nothing; load
  restores the exact family.
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

On-disk layout (round-13): ``<path>/bands/batch=<id>/band=<b>/`` and
``<path>/shingles/batch=<id>/`` - ONE partition per contributing
batch, written with overwrite, exactly like the engine's other six
disk-backed stores (BloomIndex, NgramLM, Bm25Index, FingerprintIndex,
WordHistogram, CommonnessIndex).  That buys the index the same two
guarantees the light stores already had:

- **exactly-once appends under replay**: a replayed (at-least-once)
  ``add_batch`` overwrites its own ``batch=<id>`` partitions instead
  of appending duplicate band/shingle rows, so the index never grows
  from replays (the pre-round-13 layout appended; duplicates were
  decision-harmless but accreted).
- **as-of-predecessors probes**: ``load(exclude_batch=N)`` hides
  batch N's partitions at the scan, so a REPLAYED micro-batch probes
  the corpus as of its predecessors - without this, a replayed batch
  whose first attempt already appended could see its own sibling rows
  in the "corpus" and reject rows the first attempt accepted
  (near_dup_corpus where the original run said near-dup-free).
  ``COMPACT_BATCH``/levels are negative; real batch ids are
  non-negative, so exclusion can never drop compacted history.

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

    COMPACT_BATCH = -1

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
        # distinct=False (round-15): both consumers (min-fold signatures,
        # collect_set stored shingles) are duplicate-insensitive, so the
        # substrate's dedup Exchange is pure cost - the checkpoint
        # materializes a map-only plan (same argument as
        # dedup.minhash_lsh_dedup_pairs, bit-identity pinned in tests)
        exploded = exploded_shingles(
            corpus, text_col, id_col, n, distinct=False
        ).localCheckpoint()
        band_df = cls._band_table(exploded, params)
        sh = exploded.groupBy("id").agg(F.collect_set("sh").alias("sh"))
        return cls(band_df, sh, params)

    @staticmethod
    def _band_table(exploded: DataFrame, params: dict) -> DataFrame:
        """(id, band, bucket) rows from (id, shingle) rows (either the
        distinct or the occurrence substrate form - the min folds are
        duplicate-insensitive) -
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

    def _write_meta(self, spark: SparkSession, path: str) -> None:
        # id_type rides the meta row so load() can declare read schemas
        # explicitly - a truly empty partition (init, or an accepted-
        # empty micro-batch under partitionBy) has no footer to infer
        id_type = self.bands.schema["id"].dataType.simpleString()
        spark.createDataFrame(
            [(self.params["n"], self.params["num_hashes"],
              self.params["bands"], self.params["hash_fn"], id_type)],
            "n int, num_hashes int, bands int, hash_fn string, "
            "id_type string",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    def save(self, path: str) -> "MinHashIndex":
        """Write bands + shingles as consolidated history
        (``batch=-1``) plus the parameter row; returns the loaded
        (disk-backed) handle.  Pre-existing ``batch=<id>`` partitions
        under ``path`` must not survive (stale partitions from a
        previous index at the same path would silently union into the
        loaded view), but ``self``'s tables may be lazy reads of those
        very partitions (``load(p).save(p)``), so each table stages to
        a ``__saving`` sibling FIRST and then swaps (checked renames),
        never delete-before-write - the NgramLM.save discipline."""
        from ..fsutil import delete_dir, rename_or_raise

        spark = self.bands.sparkSession
        for table, df, pby in (
            ("bands", self.bands, ("band",)),
            ("shingles", self.shingles, ()),
        ):
            delete_dir(spark, f"{path}/{table}__saving")
            w = df.write.mode("overwrite")
            if pby:
                w = w.partitionBy(*pby)
            w.parquet(f"{path}/{table}__saving/batch={self.COMPACT_BATCH}")
        for table in ("bands", "shingles"):
            delete_dir(spark, f"{path}/{table}")
            rename_or_raise(spark, f"{path}/{table}__saving",
                            f"{path}/{table}")
        self._write_meta(spark, path)
        return MinHashIndex.load(spark, path)

    @classmethod
    def init(cls, spark: SparkSession, path: str, n: int = 3,
             num_hashes: int = 64, bands: int = 16,
             hash_fn: str = "xxhash64",
             id_type: str = "long") -> "MinHashIndex":
        """Create an EMPTY disk-backed index (hash family pinned for
        the corpus lifetime) - the from-scratch streaming seeding path:
        init once, then every batch - including the first - goes
        through the same probe-then-append cycle.  ``id_type`` pins the
        document-id column type the stored tables carry (the schema a
        truly empty index cannot infer)."""
        params = {"n": n, "num_hashes": num_hashes, "bands": bands,
                  "hash_fn": hash_fn}
        empty_bands = spark.createDataFrame(
            [], f"id {id_type}, band int, bucket string")
        empty_sh = spark.createDataFrame(
            [], f"id {id_type}, sh array<string>")
        return cls(empty_bands, empty_sh, params).save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "MinHashIndex":
        """The stored batch partitions, read as one union (duplicate
        rows across batches are probe-harmless; ``match_batch`` ends
        with a max() per pair).  ``exclude_batch``: skip that batch's
        partitions (pruned at the scan) - what a foreachBatch caller
        passes so a REPLAYED batch probes the corpus as of its
        predecessors, not as of its own failed first attempt.  Any
        interrupted compaction swap is healed on entry."""
        from ..fsutil import recover_tables

        # heal an interrupted compact() swap (roll a committed sibling
        # forward, drop an uncommitted one) before resolving file lists
        recover_tables(spark, path, ("bands", "shingles"))
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        params = {
            "n": int(meta["n"]), "num_hashes": int(meta["num_hashes"]),
            "bands": int(meta["bands"]), "hash_fn": meta["hash_fn"],
        }
        id_t = meta["id_type"]

        def _table(name: str, schema: str) -> DataFrame:
            # explicit read schema: an empty partition dir (init; an
            # accepted-empty batch) carries no parquet footer to infer
            t = spark.read.schema(schema).parquet(f"{path}/{name}")
            if exclude_batch is not None:
                t = t.filter(F.col("batch") != int(exclude_batch))
            return t.drop("batch")

        bands = _table(
            "bands", f"id {id_t}, bucket string, batch int, band int"
        ).select("id", F.col("band").cast("int").alias("band"), "bucket")
        shingles = _table(
            "shingles", f"id {id_t}, sh array<string>, batch int")
        return cls(bands, shingles, params, path=path)

    # -- probing -----------------------------------------------------------

    def match_batch(self, new_docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    threshold: float = 0.8,
                    max_broadcast_rows: int = 2_000_000,
                    exploded: DataFrame | None = None,
                    exploded_rows: int | None = None) -> DataFrame:
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

        ``exploded``: a precomputed (id, sh) frame for ``new_docs`` at
        this index's ``n`` (the :func:`.dedup.exploded_shingles` shape,
        distinct or occurrence form, ideally checkpointed).
        The curation funnel passes this so the batch is shingled ONCE
        per micro-batch across the intra-batch and corpus stages
        instead of once per consumer - at micro-batch scale the
        repeated explode's fixed job cost, not its row work, was the
        measurable term.

        ``exploded_rows``: a caller-known row count (or upper bound)
        for ``exploded``, skipping the broadcast-fit ``count()`` job
        here entirely (round-14 floor work; the funnel counts its
        substrate once while materializing it).  An UPPER bound is
        safe: it can only demote a broadcastable probe to the
        shuffle-join fallback, never the reverse.

        The stored banding geometry is frozen at build time; probing at
        a ``threshold`` below its S-curve knee silently misses
        candidates no verify stage can recover, so a warning reports
        the stored geometry's candidate recall when it falls below 95%
        (:func:`.dedup.warn_if_low_banding_recall`)."""
        from .dedup import warn_if_low_banding_recall

        warn_if_low_banding_recall(
            self.params["bands"], self.params["num_hashes"], threshold
        )
        if exploded is None:
            # distinct=False: every consumer here (band signatures,
            # collect_set, the broadcast-fit count) is duplicate-
            # insensitive or upper-bound-safe - the occurrence count
            # can only DEMOTE a broadcastable probe to the shuffle
            # fallback, never the reverse (see exploded_rows note)
            exploded = exploded_shingles(
                new_docs, text_col, id_col, self.params["n"], distinct=False
            ).localCheckpoint()
        batch_fits = (
            exploded.count() if exploded_rows is None else exploded_rows
        ) <= max_broadcast_rows
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
            # duplicate index rows for an id (e.g. the same document
            # re-added under two batches) give identical links, and a
            # re-added id with CHANGED text keeps its highest verified
            # similarity - max() makes the surviving jaccard
            # deterministic where dropDuplicates would not be
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

    # -- streaming maintenance ----------------------------------------------

    def _next_batch_id(self, spark: SparkSession) -> int:
        from ..fsutil import list_batch_ids

        ids = [i for i in list_batch_ids(spark, f"{self.path}/bands")
               if i >= 0]
        return (max(ids) + 1) if ids else 0

    def add_batch(self, accepted: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  reload: bool = True,
                  batch_id: int | None = None,
                  exploded: DataFrame | None = None
                  ) -> "MinHashIndex | None":
        """Index the accepted rows and fold them into the stored index
        (disk-backed handles only): tomorrow's batches then dedup against
        corpus + today.  The write OVERWRITES this batch's own
        ``batch=<id>`` partitions - O(batch) work, no rewrite of the
        corpus-scale tables, and exactly-once under replay: a replayed
        batch rewrites its own partitions instead of duplicating rows.

        ``batch_id``: the partition id (non-negative; a foreachBatch
        caller passes its micro-batch id so replays land on the same
        partition).  When None, the next unused id is assigned from the
        stored layout - the one-shot "append today's batch" call; NOT
        safe under concurrent writers (a streaming sink always passes
        its own id).

        ``exploded``: precomputed (id, sh) rows for ``accepted``
        (distinct or occurrence form, see :meth:`match_batch`).  ``reload=False`` is
        write-only (returns None): for sink callers that load fresh at
        the next batch anyway, it skips the reload's meta job - the
        Bm25Index/NgramLM ``append_batch`` convention."""
        if self.path is None:
            raise ValueError("add_batch requires a saved index (use save())")
        spark = self.bands.sparkSession
        if batch_id is None:
            batch_id = self._next_batch_id(spark)
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        if exploded is None:
            # distinct=False: band signatures + collect_set only (both
            # duplicate-insensitive; same substrate argument as build)
            exploded = exploded_shingles(
                accepted, text_col, id_col, self.params["n"], distinct=False
            ).localCheckpoint()

        # the two table writes share the checkpointed exploded frame
        # and write to disjoint paths - run them concurrently (driver
        # threads), same discipline as the CurationSink's append phase
        def _write_bands() -> None:
            self._band_table(exploded, self.params).write.mode(
                "overwrite"
            ).partitionBy("band").parquet(
                f"{self.path}/bands/batch={int(batch_id)}"
            )

        def _write_shingles() -> None:
            exploded.groupBy("id").agg(
                F.collect_set("sh").alias("sh")
            ).write.mode("overwrite").parquet(
                f"{self.path}/shingles/batch={int(batch_id)}"
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(_write_bands), pool.submit(_write_shingles)]
            for f in futs:
                f.result()
        if not reload:
            return None
        return MinHashIndex.load(spark, self.path)

    def compact(self, target_file_mb: int = 256,
                exclude_batch: int | None = None) -> "MinHashIndex":
        """Fold the stored batch partitions into one consolidated
        ``batch=-1`` partition of ~``target_file_mb`` files (bands keep
        their ``band=`` sub-partition layout so probes still prune).
        Every :meth:`add_batch` writes new partition dirs; under a
        streaming sink at a sub-second trigger that is a small-files
        factory - thousands of KB files turn each probe's corpus scan
        into listing/open overhead.

        ``exclude_batch``: leave that batch's partitions UNCOMPACTED
        (moved through the swap verbatim, never folded into history) -
        the same in-flight replay gate as the other six stores: a
        failed attempt's partitions must stay hideable by
        ``load(exclude_batch=N)`` after the fold.  Crash-recoverable
        via the :func:`..fsutil.staged_fold_swap` marker protocol; not
        atomic - run from the ingest process between batches (see
        ``CurationSink(compact_every=)``), never concurrently with
        probes."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import recover_fold_swap, staged_fold_swap

        spark = self.bands.sparkSession
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        excl = None if exclude_batch is None else int(exclude_batch)
        for sub, pby in (("bands", ("band",)), ("shingles", ())):
            src = f"{self.path}/{sub}"
            # heal any interrupted swap BEFORE resolving the read's
            # file listing - a fold that read src while originals still
            # sat in an uncommitted sibling would omit them
            recover_fold_swap(spark, src)
            df = spark.read.parquet(src)
            if excl is not None:
                df = df.filter(F.col("batch") != excl)
            df = df.drop("batch")
            hsrc = jvm.org.apache.hadoop.fs.Path(src)
            fs = hsrc.getFileSystem(conf)
            total = fs.getContentSummary(hsrc).getLength()
            nparts = max(1, -(-int(total) // (int(target_file_mb) << 20)))
            cluster = list(pby) or ["id"]

            def _write(dest: str, df=df, pby=pby, nparts=nparts,
                       cluster=tuple(cluster)) -> None:
                w = df.repartition(int(nparts), *cluster).write.mode(
                    "overwrite")
                if pby:
                    w = w.partitionBy(*pby)
                w.parquet(dest)

            keeps = [] if excl is None else [excl]
            staged_fold_swap(spark, src, self.COMPACT_BATCH, _write, keeps)
        return MinHashIndex.load(spark, self.path)

    def compact_tiered(self, target_file_mb: int = 256,
                       exclude_batch: int | None = None,
                       max_levels: int = 8) -> "MinHashIndex":
        """Tiered (LSM-style) compact: fold only the batches appended
        SINCE the last fold into one new negative level - O(recent)
        write cost instead of :meth:`compact`'s O(history) rewrite of
        the corpus-scale band/shingle tables (the dominant store of the
        round-12 growth campaign).  Lossless because band rows and
        shingle-set rows simply concatenate across partitions and
        :meth:`load` reads the union (probes tolerate duplicate rows;
        ``match_batch`` maxes per pair), so levels read exactly like
        batches; falls back to the FULL :meth:`compact` once
        ``max_levels`` levels accrete.  Same ``exclude_batch`` replay
        gate; crash-safe via the :func:`..fsutil.staged_fold_swap`
        marker protocol."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import tiered_compact_tables

        spark = self.bands.sparkSession
        id_t = self.bands.schema["id"].dataType.simpleString()
        sh_t = self.shingles.schema["sh"].dataType.simpleString()
        outcome = tiered_compact_tables(
            spark, self.path,
            [("bands", f"id {id_t}, bucket string, batch int, band int",
              ("band",), None),
             ("shingles", f"id {id_t}, sh {sh_t}, batch int", (), None)],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(target_file_mb,
                                exclude_batch=exclude_batch)
        return MinHashIndex.load(spark, self.path)
