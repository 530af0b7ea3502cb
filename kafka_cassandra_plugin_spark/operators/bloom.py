"""Bloom-filter membership sketch: cross-run exact dedup without the key set.

The cross-RUN exact-dedup problem at 100 TB: yesterday's corpus has
10^10 document hashes; today's ingest batch must drop anything already
accepted.  A left-anti join against the full key set re-reads (or
permanently pins) terabytes of keys per batch; the
:class:`.dedup_index.MinHashIndex` answers the *near*-dup version but
stores shingle sets - far more state than exact membership needs.  A
Bloom filter answers "definitely new / maybe seen" in
``m = -n ln p / (ln 2)^2`` bits (~1.2 GB per 10^9 keys at 1% fpp),
with the safe asymmetry for dedup: **no duplicate ever passes**; the
cost of approximation is that ~fpp of genuinely-new documents are
dropped as suspected dupes - a bounded, documented recall tax, never a
correctness leak.

Spark-first representation - the filter IS a DataFrame, not a driver
byte array:

- bit positions are ``pmod(xxhash64(key, seed + i), m)`` for
  ``i < k`` - JVM-side, whole-stage-codegen'd, and portable across
  runs/clusters because xxhash64 is a pure function of (value, seed).
- the filter is the sparse word table ``(word: long, bits: long)`` =
  ``groupBy(pos div 64).agg(bit_or(1L << pos mod 64))`` - built-in
  aggregate, map-side partial combine, and the ONLY corpus-wide
  shuffle term is bounded by ``min(n*k, m/64)`` 16-byte rows (the
  sketch size, never the corpus width).
- a probe explodes the batch's k positions and equi-joins the word
  table: broadcast when the filter's dense bound ``m/8`` fits
  (decidable from geometry alone - no counting), shuffle-hash on
  ``word`` when it does not.  A key is "maybe seen" iff ALL k of its
  bits are set (``min(hit)`` over its exploded rows).
- merging two same-geometry filters is ``union -> bit_or`` - which is
  exactly how incremental accumulation (:meth:`BloomIndex.add`) and
  distributed construction compose.  Geometry (m, k, seed) is persisted
  next to the words and validated on every merge/probe, so a filter
  can never be silently probed with the wrong hash family.

No row-at-a-time Python anywhere: build, merge, and probe are
hash/explode/groupBy/join built-ins end to end.

Reference provenance: no counterpart in /root/reference (its Cassandra
layer delegates membership to LWT inserts,
CassandraLeaderElection.scala:57 `INSERT ... IF NOT EXISTS`);
LLM-pipeline closure (SURVEY §2.5 D18).  Bloom parameter formulas are
the standard public ones (Bloom 1970; Broder & Mitzenmacher 2004
survey).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Dense upper bound for auto-broadcast of the word table: m/8 bytes.
# 64 MB of filter (~5.4e8 bits -> ~450 M keys at 1% fpp per GB ratio)
# broadcasts; beyond that the probe shuffles on `word`.
DEFAULT_MAX_BROADCAST_BYTES = 64 * 1024 * 1024


def bloom_parameters(expected_items: int, fpp: float) -> tuple[int, int]:
    """Classic sizing: bits ``m = ceil(-n ln p / (ln 2)^2)`` rounded up
    to whole 64-bit words, hash count ``k = round(m/n ln 2)``."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be > 0, got {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = 64 * math.ceil(max(m, 64) / 64)
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(df: DataFrame, key_col: str, m: int, k: int,
               seed: int) -> DataFrame:
    """One row per (input row, hash function): the bit position column
    ``__pos`` in [0, m).  Keys are hashed as strings so the same value
    probes identically regardless of the column's physical type."""
    key = F.col(key_col).cast("string")
    pos = [F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(m)) for i in range(k)]
    return df.withColumn("__pos", F.explode(F.array(*pos)))


def _word_mask(df: DataFrame) -> DataFrame:
    """``__pos`` -> (word, mask): word index and single-bit mask."""
    return df.withColumn(
        "word", (F.col("__pos") / 64).cast("long")
    ).withColumn(
        "mask", F.expr("shiftleft(1L, cast(pmod(__pos, 64) as int))")
    )


class BloomIndex:
    """Build-once / probe-many / merge-forever Bloom membership filter.

    ``words``: sparse (word, bits) table - the filter itself.
    ``m``/``k``/``seed``: the geometry contract every probe and merge
    must reuse (persisted, validated).
    """

    def __init__(self, words: DataFrame, m: int, k: int, seed: int,
                 path: str | None = None):
        self.words = words
        self.m = m
        self.k = k
        self.seed = seed
        self.path = path

    # -- construction ------------------------------------------------------

    @classmethod
    def build(cls, df: DataFrame, key_col: str = "doc_id",
              expected_items: int = 1_000_000, fpp: float = 0.01,
              seed: int = 42, m: int | None = None,
              k: int | None = None) -> "BloomIndex":
        """Build the filter over ``df[key_col]``.  ``expected_items``
        sizes the geometry (pass the CORPUS-lifetime cardinality, not
        this batch's - the filter saturates, it never resizes); pass
        ``m``/``k`` explicitly to pin a geometry instead."""
        if m is None or k is None:
            m, k = bloom_parameters(expected_items, fpp)
        words = (
            _word_mask(_positions(df.select(key_col), key_col, m, k, seed))
            .groupBy("word")
            .agg(F.expr("bit_or(mask)").alias("bits"))
        )
        return cls(words, m, k, seed)

    CONTENT_KEY = "__content_key"

    @classmethod
    def build_over_content(cls, df: DataFrame, text_col: str = "text",
                           **kwargs) -> "BloomIndex":
        """Build over ``sha2(text, 256)`` instead of an id column - the
        key that makes the filter answer "was this CONTENT ever
        accepted", which is what cross-run dedup needs (a re-ingested
        document arrives under a fresh id; its text does not).  Matches
        the exact-dedup stage's content-identity definition
        (:func:`.pipeline.curate_annotated` stage 3), so the funnel's
        ``seen_before`` gate and its ``exact_dup`` stage agree on what
        "same document" means."""
        keyed = df.select(
            F.sha2(F.col(text_col), 256).alias(cls.CONTENT_KEY)
        )
        return cls.build(keyed, cls.CONTENT_KEY, **kwargs)

    # -- persistence -------------------------------------------------------
    #
    # On-disk layout: <path>/meta plus <path>/words/batch=<id>/ - ONE
    # word-table partition per contributing batch, each written with
    # overwrite (exactly-once per batch, like the sink's output dirs).
    # A probe loads the union consolidated (groupBy word, bit_or); a
    # streaming caller probing DURING batch N loads with
    # ``exclude_batch=N`` so a replayed micro-batch never sees its own
    # first attempt's contribution - without that, a replay would
    # reject its own rows as seen and exactly-once output breaks.
    # COMPACT_BATCH (-1) holds consolidated history; real batch ids are
    # non-negative, so exclusion can never drop compacted history.

    COMPACT_BATCH = -1

    def _batch_dir(self, batch_id: int) -> str:
        return f"{self.path}/words/batch={int(batch_id)}"

    def save(self, path: str) -> "BloomIndex":
        """Write words + geometry; returns the disk-backed handle.
        Pre-existing ``words/batch=<id>`` partitions under ``path``
        must not survive (save() writes a consolidated model; stale
        batch partitions from a previous filter at the same path would
        silently OR into the loaded view) - but ``self.words`` may be
        a lazy read of those very partitions
        (``BloomIndex.load(p).save(p)``), so the consolidated table is
        staged to a ``__saving`` sibling FIRST and then swapped over
        the old directory (checked rename), never
        delete-before-write."""
        from ..fsutil import delete_dir, rename_or_raise

        spark = self.words.sparkSession
        delete_dir(spark, f"{path}/words__saving")
        self.words.write.mode("overwrite").parquet(
            f"{path}/words__saving/batch={self.COMPACT_BATCH}"
        )
        delete_dir(spark, f"{path}/words")
        rename_or_raise(spark, f"{path}/words__saving", f"{path}/words")
        spark.createDataFrame(
            [(self.m, self.k, self.seed)], "m long, k int, seed int"
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return BloomIndex.load(spark, path)

    @classmethod
    def init(cls, spark: SparkSession, path: str,
             expected_items: int = 1_000_000, fpp: float = 0.01,
             seed: int = 42) -> "BloomIndex":
        """Create an EMPTY disk-backed filter (geometry pinned for the
        corpus lifetime).  The streaming seeding path: the sink inits
        once, then every batch - including the first - goes through the
        same probe-then-append cycle."""
        m, k = bloom_parameters(expected_items, fpp)
        empty = spark.createDataFrame([], "word long, bits long")
        return cls(empty, m, k, seed).save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "BloomIndex":
        """The stored batch partitions, consolidated lazily (groupBy
        word, bit_or - folds into the probe plan; :meth:`compact`
        rewrites it away when file count becomes the concern).
        ``exclude_batch``: skip that batch's partition (pruned at the
        scan) - what a foreachBatch caller passes so a REPLAYED batch
        probes the filter as of its predecessors, not as of its own
        failed first attempt."""
        from ..fsutil import recover_tables

        recover_tables(spark, path, ("words",))
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        words = spark.read.parquet(f"{path}/words")
        if exclude_batch is not None:
            words = words.filter(F.col("batch") != int(exclude_batch))
        words = (
            words.drop("batch")
            .groupBy("word")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        return cls(words, int(meta["m"]), int(meta["k"]), int(meta["seed"]),
                   path=path)

    # -- streaming maintenance --------------------------------------------

    def append_batch(self, df: DataFrame, batch_id: int,
                     key_col: str = "doc_id") -> "BloomIndex":
        """Fold batch ``batch_id`` into a DISK-BACKED filter by
        OVERWRITING that batch's word partition (same geometry by
        construction) - O(batch) work, and exactly-once under replay:
        a replayed batch rewrites its own partition instead of
        double-appending.  ``batch_id`` must be non-negative (negative
        ids are reserved for compacted history)."""
        if self.path is None:
            raise ValueError(
                "append_batch requires a saved filter (use save()/init()); "
                "for in-memory composition use add()/merge()"
            )
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        batch = BloomIndex.build(df, key_col, m=self.m, k=self.k,
                                 seed=self.seed)
        batch.words.write.mode("overwrite").parquet(self._batch_dir(batch_id))
        return BloomIndex.load(self.words.sparkSession, self.path)

    def append_content(self, df: DataFrame, batch_id: int,
                       text_col: str = "text") -> "BloomIndex":
        """:meth:`append_batch` over ``sha2(text, 256)`` - the
        streaming twin of :meth:`build_over_content`."""
        keyed = df.select(
            F.sha2(F.col(text_col), 256).alias(self.CONTENT_KEY)
        )
        return self.append_batch(keyed, batch_id, self.CONTENT_KEY)

    def compact(self, target_file_mb: int = 256,
                exclude_batch: int | None = None) -> "BloomIndex":
        """Rewrite the stored batch partitions into one consolidated
        ``batch=-1`` partition (same sibling-then-rename swap
        discipline as :meth:`.dedup_index.MinHashIndex.compact`; not
        atomic - run between batches, never concurrently with probes).

        ``exclude_batch``: leave that batch's partition UNCOMPACTED
        (moved through the swap verbatim, never folded into history).
        A streaming caller compacting before batch N must pass N: if
        batch N's first attempt appended its word partition and then
        failed before the streaming commit, the replay's compaction
        would otherwise fold the uncommitted ``batch=N`` into
        ``batch=-1``, where ``load(exclude_batch=N)`` can no longer
        hide it - the replay would reject its own rows as seen_before.
        With the exclusion, compaction only ever folds durably
        committed predecessors, regardless of what the (volatile)
        caller-side counters say - :class:`..streaming.curate.
        CurationSink` passes the in-flight batch id."""
        if self.path is None:
            raise ValueError("compact requires a saved filter (use save())")
        from ..fsutil import recover_fold_swap, staged_fold_swap

        spark = self.words.sparkSession
        src = f"{self.path}/words"
        # heal any interrupted swap BEFORE resolving the read's file
        # listing - a fold that read src while originals still sat in
        # an uncommitted sibling would omit them from the rewrite
        recover_fold_swap(spark, src)
        words = spark.read.parquet(src)
        if exclude_batch is not None:
            words = words.filter(F.col("batch") != int(exclude_batch))
        consolidated = (
            words.drop("batch")
            .groupBy("word")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        # the marker-based swap carries the in-flight partition through
        # verbatim (a rename, no data read) so exclude_batch probes
        # keep working, and a crash-retry at any point rolls forward or
        # back instead of discarding it
        keeps = [] if exclude_batch is None else [int(exclude_batch)]
        staged_fold_swap(
            spark, src, self.COMPACT_BATCH,
            lambda dest: consolidated.write.mode("overwrite").parquet(dest),
            keeps,
        )
        return BloomIndex.load(spark, self.path)

    def compact_tiered(self, target_file_mb: int = 256,
                       exclude_batch: int | None = None,
                       max_levels: int = 8) -> "BloomIndex":
        """Tiered (LSM-style) compact: fold only the batches appended
        SINCE the last fold into one new negative level — O(recent)
        write cost instead of :meth:`compact`'s O(history) rewrite.
        Lossless because bitsets OR distributively and :meth:`load`
        re-aggregates across partitions, so levels read exactly like
        batches; falls back to the FULL :meth:`compact` once
        ``max_levels`` levels have accreted (``target_file_mb``
        forwards to that fallback - it has no effect on the tiered
        fold itself, whose level is one aggregate write).  Same
        ``exclude_batch`` replay gate; crash-safe via the
        :func:`..fsutil.staged_fold_swap` marker protocol."""
        if self.path is None:
            raise ValueError("compact requires a saved filter (use save())")
        from ..fsutil import tiered_compact_tables

        spark = self.words.sparkSession
        outcome = tiered_compact_tables(
            spark, self.path,
            [("words", "word long, bits long, batch int", (),
              lambda df: df.groupBy("word").agg(
                  F.expr("bit_or(bits)").alias("bits")))],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(target_file_mb, exclude_batch=exclude_batch)
        return BloomIndex.load(spark, self.path)

    # -- composition -------------------------------------------------------

    def _check_geometry(self, other: "BloomIndex") -> None:
        if (self.m, self.k, self.seed) != (other.m, other.k, other.seed):
            raise ValueError(
                "Bloom geometry mismatch: "
                f"(m={self.m}, k={self.k}, seed={self.seed}) vs "
                f"(m={other.m}, k={other.k}, seed={other.seed}); "
                "filters built with different geometry cannot be merged "
                "or cross-probed - rebuild one side."
            )

    def merge(self, other: "BloomIndex") -> "BloomIndex":
        """Bitwise union of two same-geometry filters - equals the
        filter built over the union of their inputs, exactly."""
        self._check_geometry(other)
        words = (
            self.words.unionByName(other.words)
            .groupBy("word")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        return BloomIndex(words, self.m, self.k, self.seed)

    def add(self, df: DataFrame, key_col: str = "doc_id") -> "BloomIndex":
        """The incremental path: fold a new batch's keys in (same
        geometry, by construction)."""
        batch = BloomIndex.build(df, key_col, m=self.m, k=self.k,
                                 seed=self.seed)
        return self.merge(batch)

    # -- probing -----------------------------------------------------------

    def _maybe_broadcast(self, max_broadcast_bytes: int):
        """Broadcast iff the DENSE bound m/8 fits (no counting needed);
        otherwise pin a shuffle-hash join: both sides hash-partition on
        ``word`` (the filter side lands at ~m/8/partitions bytes per
        task) and neither giant side gets sorted, which a sort-merge
        fallback would do."""
        dense_bytes = self.m // 8
        return F.broadcast if dense_bytes <= max_broadcast_bytes else (
            lambda df: df.hint("shuffle_hash")
        )

    def might_contain(
        self, batch: DataFrame, key_col: str = "doc_id",
        max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    ) -> DataFrame:
        """Distinct batch keys annotated with ``might_contain``:
        False is definitive (never inserted), True is "maybe" (inserted,
        or a ~fpp false positive).  Left-join against the sparse word
        table: an absent word row means those bits are zero."""
        hint = self._maybe_broadcast(max_broadcast_bytes)
        probe = _word_mask(
            _positions(batch.select(key_col).distinct(), key_col,
                       self.m, self.k, self.seed)
        )
        return (
            probe.join(hint(self.words), "word", "left")
            .withColumn(
                "__hit",
                F.coalesce(F.expr("(bits & mask) = mask"), F.lit(False)),
            )
            .groupBy(key_col)
            .agg(F.min("__hit").alias("might_contain"))
        )

    def filter_new(
        self, batch: DataFrame, key_col: str = "doc_id",
        max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    ) -> DataFrame:
        """Rows of ``batch`` whose key is DEFINITELY not in the filter.
        Guarantees: every previously-inserted key is dropped (no dup
        leaks); ~fpp of genuinely-new keys are also dropped (the
        documented recall tax).  Batch-internal duplicates are not this
        operator's job - compose with exact dedup first."""
        keys = self.might_contain(batch, key_col, max_broadcast_bytes)
        fresh = keys.filter(~F.col("might_contain")).select(key_col)
        return batch.join(fresh, key_col, "left_semi")
