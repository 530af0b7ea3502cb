"""BM25 full-text retrieval: inverted-index build + top-k search.

Every large-scale data pipeline grows a retrieval surface — "find the
training documents most relevant to this probe" is how contamination
audits, dataset debugging, and retrieval-augmented eval sets are built.
BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond") is the canonical lexical scorer; the idf
variant here is the non-negative one popularized by Lucene:

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q,d) = sum_t  qtf * idf(t) * tf * (k1+1)
                        / (tf + k1 * (1 - b + b * dl / avgdl))

Spark-first shape (never a UDF, never all-pairs):

- **build**: one tokenize+explode pass -> ``postings`` (term key,
  doc_id, tf, dl) with the document length DENORMALIZED onto each
  posting (one extra long per row buys search a corpus-wide doc-length
  join), ``docfreq`` (term key, df) from one groupBy, and a 1-row
  ``stats`` frame (n_docs, avgdl).  The shuffle terms are distinct
  (doc, term) pairs and distinct terms — sub-corpus-width.
- **search**: query terms are driver-scale, so they BROADCAST: a
  left-semi join prunes postings and docfreq map-side to the query
  vocabulary, one broadcast join attaches idf+qtf, the score is pure
  column arithmetic, one (query, doc) groupBy sums term contributions
  (map-side combined), and per-query top-k runs through the
  rank-window path Spark rewrites to WindowGroupLimit — shuffle
  O(tasks x k), like :func:`.sampling.take_per_group`.  Against a
  SAVED index the pruning is FILE-level, not just map-side: save()
  partitions postings and docfreq by a term-bucket column
  (``tbucket = pmod(term key, bucket_partitions)``), and topk()
  collects the query terms' bucket set (driver-scale by the same
  argument that lets the vocabulary broadcast, and capped at
  ``bucket_partitions`` values) into a partition filter — the scan
  reads only the bucket directories the query touches.  At 100 TB
  the difference between "prunes to query-term files" and "scans all
  postings" is the whole point of an inverted index.

Ranking portability: rank orders by ``round(score, 6) DESC, doc_id``
so the float summation-order ulps of different engines cannot flip
neighbors — the same protocol as every float-bearing oracle query.

``hash_fn='xxhash64'`` (default) ships 8-byte term keys through build
shuffles and halves posting width at scale; ``'raw'`` keeps the term
string — the engine-portable DuckDB-oracle twin, same discipline as
:mod:`.substring`.

**Incremental maintenance** (the same discipline as
:class:`.bloom.BloomIndex` / :class:`.lm.NgramLM`): df and tf are
distributive over document-disjoint batches (a doc lives in exactly
one batch), so the stored index is batch-partitioned —
``postings/batch=<id>/tbucket=<b>/``, ``docfreq/batch=<id>/
tbucket=<b>/``, ``stats/batch=<id>/`` — and :meth:`Bm25Index.
append_batch` folds a new corpus batch in by OVERWRITING its own
partitions (exactly-once under foreachBatch replay;
``load(exclude_batch=N)`` hides an uncommitted attempt).
Consolidation is lazy (df sums per term, stats sum — postings need
none: batches are disjoint rows); :meth:`Bm25Index.compact` rewrites
history into ``batch=-1`` when file counts decay.  Stats persist as
EXACT longs (n_docs, total_dl) so accumulate == whole-build is
bit-exact including avgdl (one long/long division either way), and
``merge`` covers the in-memory two-index union.

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D22).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["Bm25Index", "bm25_topk"]


def _terms(text_col: str, lowercase: bool) -> Column:
    t = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    if lowercase:
        t = F.transform(t, F.lower)
    return t


def _term_key(hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64("term")
    if hash_fn == "raw":
        return F.col("term")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'raw', got {hash_fn!r}")


def _tbucket(term_key: Column, hash_fn: str, nb: int) -> Column:
    """The term-bucket partition column: ``pmod`` of the (hashed) term
    key into ``nb`` buckets.  Raw string keys hash first so the bucket
    is uniform either way."""
    h = term_key if hash_fn == "xxhash64" else F.xxhash64(term_key)
    return F.pmod(h, F.lit(int(nb))).cast("int")


def _finalize_stats(stats: DataFrame) -> DataFrame:
    """(n_docs, total_dl) -> + derived ``avgdl``.  total_dl is a LONG,
    so every path (build, merge, batch accumulation) derives avgdl by
    the same single long/long division — bit-exact across them."""
    return stats.select(
        "n_docs", "total_dl",
        F.when(F.col("n_docs") > 0,
               F.col("total_dl") / F.col("n_docs"))
        .otherwise(F.lit(0.0)).alias("avgdl"),
    )


class Bm25Index:
    """Inverted index: ``postings`` (term, doc_id, tf, dl), ``docfreq``
    (term, df), ``stats`` (n_docs, total_dl, avgdl) — all DataFrames,
    so build, save, load, and search are one lazy plan each.
    Disk-backed handles additionally carry ``path`` and
    ``bucket_partitions`` (the tbucket fan-out pinned at save/init
    time), and their postings/docfreq keep the ``tbucket`` column for
    partition-pruned search."""

    COMPACT_BATCH = -1

    def __init__(self, postings: DataFrame, docfreq: DataFrame,
                 stats: DataFrame, hash_fn: str, lowercase: bool,
                 path: str | None = None,
                 bucket_partitions: int | None = None):
        self.postings = postings
        self.docfreq = docfreq
        self.stats = stats
        self.hash_fn = hash_fn
        self.lowercase = lowercase
        self.path = path
        self.bucket_partitions = bucket_partitions

    # -- build / persist ---------------------------------------------------

    @classmethod
    def build(cls, docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", hash_fn: str = "xxhash64",
              lowercase: bool = True) -> "Bm25Index":
        """``id_col`` must be an integral column: the pinned on-disk
        posting schema stores doc_id as long, and a silent cast of a
        string-id corpus would null every id and collapse all scores
        into one (NULL, term) group — so non-integral ids raise here
        instead.  Map string ids first (``F.xxhash64`` or an id
        dictionary join)."""
        from pyspark.sql import types as T

        id_type = docs.schema[id_col].dataType
        if not isinstance(id_type, (T.ByteType, T.ShortType,
                                    T.IntegerType, T.LongType)):
            raise TypeError(
                f"Bm25Index requires an integral id column; "
                f"{id_col!r} is {id_type.simpleString()}. Map string "
                "ids to longs first (F.xxhash64(id) or an id-dictionary "
                "join) — a silent cast would null non-numeric ids and "
                "collapse every document into one posting group."
            )
        toks = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            _terms(text_col, lowercase).alias("__t"),
        ).select(
            "doc_id", F.size("__t").alias("dl"),
            F.explode("__t").alias("term"),
        )
        # dl rides the explode, so ONE (doc, term) shuffle builds the
        # whole posting list — no second per-doc window pass
        postings = (
            toks.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
            .select(_term_key(hash_fn).alias("term"), "doc_id", "tf", "dl")
        )
        docfreq = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        )
        # collection stats over ALL docs (zero-token docs count toward
        # N and pull avgdl down, matching the probabilistic model's
        # collection definition; they can never match a query).  Kept
        # as exact longs; avgdl derives by one division (see
        # _finalize_stats) so batch accumulation is bit-exact.
        stats = _finalize_stats(docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.size(_terms(text_col, lowercase))), F.lit(0)
            ).cast("long").alias("total_dl"),
        ))
        return cls(postings, docfreq, stats, hash_fn, lowercase)

    # -- persistence ---------------------------------------------------------
    #
    # On-disk layout: <path>/meta (hash_fn, lowercase, bucket_partitions)
    #   <path>/postings/batch=<id>/tbucket=<b>/   (term, doc_id, tf, dl)
    #   <path>/docfreq/batch=<id>/tbucket=<b>/    (term, df)
    #   <path>/stats/batch=<id>/                  (n_docs, total_dl)
    # ONE partition triple per contributing batch, each written with
    # overwrite (exactly-once per batch — the BloomIndex/NgramLM
    # discipline).  Postings concatenate across batches (documents are
    # batch-disjoint); df sums per term; stats sum — all distributive,
    # so the consolidated view is BIT-EXACTLY the whole-corpus build.
    # tbucket sub-partitions both term tables so a search's partition
    # filter prunes to the query's bucket directories at the scan.
    # COMPACT_BATCH (-1) holds consolidated history; real batch ids
    # are non-negative, so exclusion can never hide compacted history.

    def _tdir(self, table: str, batch_id: int) -> str:
        return f"{self.path}/{table}/batch={int(batch_id)}"

    def _tables(self) -> tuple[tuple[str, DataFrame], ...]:
        nb = self.bucket_partitions
        return (
            ("postings", self.postings.select(
                "term", "doc_id", "tf", "dl",
                _tbucket(F.col("term"), self.hash_fn, nb).alias("tbucket"))),
            ("docfreq", self.docfreq.select(
                "term", "df",
                _tbucket(F.col("term"), self.hash_fn, nb).alias("tbucket"))),
            ("stats", self.stats.select("n_docs", "total_dl")),
        )

    def save(self, path: str,
             bucket_partitions: int = 1024) -> "Bm25Index":
        """Write the index as consolidated history (``batch=-1``) with
        postings and docfreq partitioned by the ``tbucket`` term-bucket
        column — the layout that makes a loaded-index search's pruning
        FILE-level (topk pushes the query buckets as a partition
        filter).  Each table stages to a ``__saving`` sibling and swaps
        via checked rename, so saving a loaded handle back onto its own
        path is a lossless consolidation, never delete-before-write.
        Returns the disk-backed handle."""
        from ..fsutil import delete_dir, rename_or_raise

        spark = self.postings.sparkSession
        staged = Bm25Index(self.postings, self.docfreq, self.stats,
                           self.hash_fn, self.lowercase, path=path,
                           bucket_partitions=int(bucket_partitions))
        for table, df in staged._tables():
            delete_dir(spark, f"{path}/{table}__saving")
            w = df.write.mode("overwrite")
            if table != "stats":
                w = w.partitionBy("tbucket")
            w.parquet(f"{path}/{table}__saving/batch={self.COMPACT_BATCH}")
        for table in ("postings", "docfreq", "stats"):
            delete_dir(spark, f"{path}/{table}")
            rename_or_raise(spark, f"{path}/{table}__saving",
                            f"{path}/{table}")
        spark.createDataFrame(
            [(self.hash_fn, bool(self.lowercase), int(bucket_partitions))],
            "hash_fn string, lowercase boolean, bucket_partitions int",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return Bm25Index.load(spark, path)

    @classmethod
    def init(cls, spark: SparkSession, path: str,
             hash_fn: str = "xxhash64", lowercase: bool = True,
             bucket_partitions: int = 1024) -> "Bm25Index":
        """Create an EMPTY disk-backed index (term convention and
        bucket fan-out pinned).  The streaming accumulation path: init
        once, then every corpus batch goes through
        :meth:`append_batch`."""
        _term_key(hash_fn)  # validate
        term_t = "long" if hash_fn == "xxhash64" else "string"
        empty = cls(
            spark.createDataFrame(
                [], f"term {term_t}, doc_id long, tf long, dl int"),
            spark.createDataFrame([], f"term {term_t}, df long"),
            _finalize_stats(spark.createDataFrame(
                [(0, 0)], "n_docs long, total_dl long")),
            hash_fn, lowercase,
        )
        return empty.save(path, bucket_partitions=bucket_partitions)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "Bm25Index":
        """The stored batch partitions, consolidated lazily (postings
        concatenate; df sums per (term, tbucket); stats sum — all fold
        into the search plan).  ``exclude_batch``: skip that batch's
        partitions (pruned at the scan) — what a foreachBatch caller
        passes so a REPLAYED batch searches the index as of its
        predecessors, not as of its own failed first attempt.  Load
        cost: one 1-row meta read, no model-wide jobs.  Any
        interrupted compaction swap is healed on entry
        (:func:`..fsutil.recover_fold_swap`)."""
        from ..fsutil import path_exists, recover_tables

        recover_tables(spark, path, ("postings", "docfreq", "stats"))
        if not path_exists(spark, f"{path}/meta"):
            raise ValueError(
                f"no Bm25Index meta table under {path!r}: either the "
                "path is not a saved Bm25Index, or the index predates "
                "the batch-partitioned layout (settings embedded in "
                "stats, no meta dir) — rebuild it with build().save()."
            )
        meta = spark.read.parquet(f"{path}/meta").first()
        term_t = "long" if meta.hash_fn == "xxhash64" else "string"
        # explicit schemas: an EMPTY partitionBy write (init, or an
        # empty batch) leaves a batch dir with no data files, which
        # schema inference cannot read — the declared schema makes
        # such dirs read as zero rows instead of erroring
        schemas = {
            "postings": f"term {term_t}, doc_id long, tf long, dl int, "
                        "tbucket int, batch int",
            "docfreq": f"term {term_t}, df long, tbucket int, batch int",
            "stats": "n_docs long, total_dl long, batch int",
        }

        def _table(name: str) -> DataFrame:
            t = spark.read.schema(schemas[name]).parquet(f"{path}/{name}")
            if exclude_batch is not None:
                t = t.filter(F.col("batch") != int(exclude_batch))
            return t.drop("batch")

        postings = _table("postings")
        # tbucket is a grouping column, so topk's bucket filter pushes
        # through this aggregate down to the scan's PartitionFilters
        docfreq = _table("docfreq").groupBy("term", "tbucket").agg(
            F.sum("df").alias("df")
        )
        stats = _finalize_stats(_table("stats").agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("total_dl"), F.lit(0)).alias("total_dl"),
        ))
        return cls(postings, docfreq, stats, meta.hash_fn,
                   bool(meta.lowercase), path=path,
                   bucket_partitions=int(meta.bucket_partitions))

    # -- streaming maintenance ------------------------------------------------

    def append_batch(self, docs: DataFrame, batch_id: int,
                     text_col: str = "text", id_col: str = "doc_id",
                     reload: bool = True) -> "Bm25Index | None":
        """Fold corpus batch ``batch_id`` into a DISK-BACKED index by
        OVERWRITING that batch's three partitions — O(batch) work (df,
        tf, stats are distributive over document-disjoint batches; no
        history is re-read), exactly-once under replay (a replayed
        batch rewrites its own partitions).  ``batch_id`` must be
        non-negative (negative ids are reserved for compacted
        history).  ``reload=False`` makes the append WRITE-ONLY
        (returns None) for sinks that discard the return value."""
        if self.path is None:
            raise ValueError(
                "append_batch requires a saved index (use save()/init())"
            )
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        sub = Bm25Index.build(docs, text_col=text_col, id_col=id_col,
                              hash_fn=self.hash_fn, lowercase=self.lowercase)
        sub.path = self.path
        sub.bucket_partitions = self.bucket_partitions
        for table, df in sub._tables():
            w = df.write.mode("overwrite")
            if table != "stats":
                w = w.partitionBy("tbucket")
            w.parquet(self._tdir(table, batch_id))
        if not reload:
            return None
        return Bm25Index.load(self.postings.sparkSession, self.path)

    def compact(self, exclude_batch: int | None = None) -> "Bm25Index":
        """Rewrite the stored batch partitions into one consolidated
        ``batch=-1`` triple (sibling-then-rename swap; not atomic —
        run between batches, never concurrently with searches).
        ``exclude_batch``: leave that batch's partitions uncompacted
        (moved through the swap verbatim) so ``load(exclude_batch=N)``
        can still hide an uncommitted first attempt on replay — the
        same discipline as :meth:`.bloom.BloomIndex.compact`."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import staged_fold_swap

        spark = self.postings.sparkSession
        consolidated = Bm25Index.load(spark, self.path,
                                      exclude_batch=exclude_batch)
        consolidated.bucket_partitions = self.bucket_partitions
        keeps = [] if exclude_batch is None else [int(exclude_batch)]
        for table, df in consolidated._tables():

            def _write(dest: str, df=df, table=table) -> None:
                w = df.write.mode("overwrite")
                if table != "stats":
                    w = w.partitionBy("tbucket")
                w.parquet(dest)

            staged_fold_swap(spark, f"{self.path}/{table}",
                             self.COMPACT_BATCH, _write, keeps)
        return Bm25Index.load(spark, self.path)

    def compact_tiered(self, exclude_batch: int | None = None,
                       max_levels: int = 8) -> "Bm25Index":
        """Tiered (LSM-style) compact: fold only the batches appended
        SINCE the last fold into one new negative level per table —
        O(recent) write cost instead of :meth:`compact`'s O(history)
        rewrite of all accumulated postings.  Lossless because
        postings concatenate, df sums, and stats sum distributively
        over document-disjoint batches and :meth:`load` re-aggregates
        across partitions, so levels read exactly like batches; falls
        back to the FULL :meth:`compact` once ``max_levels`` levels
        have accreted (the major compaction that bounds read-side file
        counts per tbucket).  Same ``exclude_batch`` replay gate;
        crash-safe via the :func:`..fsutil.staged_fold_swap` marker
        protocol."""
        if self.path is None:
            raise ValueError("compact requires a saved index (use save())")
        from ..fsutil import tiered_compact_tables

        spark = self.postings.sparkSession
        term_t = "long" if self.hash_fn == "xxhash64" else "string"
        outcome = tiered_compact_tables(
            spark, self.path,
            [
                ("postings",
                 f"term {term_t}, doc_id long, tf long, dl int, "
                 "tbucket int, batch int",
                 ("tbucket",), None),
                ("docfreq",
                 f"term {term_t}, df long, tbucket int, batch int",
                 ("tbucket",),
                 lambda df: df.groupBy("term", "tbucket").agg(
                     F.sum("df").alias("df"))),
                ("stats", "n_docs long, total_dl long, batch int", (),
                 lambda df: df.agg(
                     F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
                     F.coalesce(F.sum("total_dl"),
                                F.lit(0)).alias("total_dl"))),
            ],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(exclude_batch=exclude_batch)
        return Bm25Index.load(spark, self.path)

    # -- composition -----------------------------------------------------------

    def merge(self, other: "Bm25Index") -> "Bm25Index":
        """Union two indexes over DOCUMENT-DISJOINT corpora: tf/dl rows
        concatenate, df sums per term, stats re-derive — the
        distributive-counts property the module doc notes."""
        if other.hash_fn != self.hash_fn:
            raise ValueError("merge: hash_fn mismatch")
        if other.lowercase != self.lowercase:
            # cased and folded term keys are different vocabularies —
            # a silent merge would make corpus B's cased postings
            # unreachable from folded queries (and corrupt df sums)
            raise ValueError("merge: lowercase mismatch")
        cols = ("term", "doc_id", "tf", "dl")
        postings = self.postings.select(*cols).unionByName(
            other.postings.select(*cols))
        docfreq = (
            self.docfreq.select("term", "df")
            .unionByName(other.docfreq.select("term", "df"))
            .groupBy("term").agg(F.sum("df").alias("df"))
        )
        # stats combine distributively over the EXACT longs; avgdl
        # re-derives by the same one division as build — bit-exact
        stats = _finalize_stats(
            self.stats.select("n_docs", "total_dl")
            .unionByName(other.stats.select("n_docs", "total_dl"))
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("total_dl").alias("total_dl"),
            )
        )
        return Bm25Index(postings, docfreq, stats, self.hash_fn,
                         self.lowercase)

    # -- search ------------------------------------------------------------

    def topk(self, queries: DataFrame, k: int = 10, k1: float = 1.2,
             b: float = 0.75, query_id_col: str = "query_id",
             query_text_col: str = "text",
             broadcast_queries: bool = True,
             max_df_ratio: float | None = None) -> DataFrame:
        """(query_id, doc_id, score, rank) — the ``rank <= k`` BM25
        results per query.  Scoring plan per the module doc: broadcast
        query vocabulary -> map-side posting/docfreq pruning -> column
        arithmetic -> one (query, doc) groupBy -> WindowGroupLimit.

        ``broadcast_queries=False`` is the escape hatch for a query set
        too large to broadcast (a corpus-vs-corpus audit): the term
        joins become plain shuffle joins on the term key instead —
        same results, corpus-shuffle cost.

        ``max_df_ratio`` is the at-scale cost governor: the matched-
        postings term is sum over query terms of (df x queries using
        the term), and a STOPWORD (df ~ N) multiplies the whole corpus
        per query — the classic BM25 explosion.  Setting e.g. 0.3
        drops query terms appearing in > 30% of documents from scoring
        (their idf is near ln(1+0.5/0.3N/...) ~ the smallest
        contributions anyway) — the standard df-pruning trade: scores
        change only by the dropped near-zero terms, candidate work
        becomes bounded by rare-term posting lists.  None (default) =
        exact scoring, the oracle-verified semantics."""
        qterms = (
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.explode(
                    _terms(query_text_col, self.lowercase)
                ).alias("term"),
            )
            .groupBy("query_id", "term")
            .agg(F.count(F.lit(1)).alias("qtf"))
            .select("query_id", _term_key(self.hash_fn).alias("term"), "qtf")
        )
        bc = F.broadcast if broadcast_queries else (lambda df: df)
        qvocab = qterms.select("term").distinct()
        postings_src, docfreq_src = self.postings, self.docfreq
        if self.bucket_partitions is not None and broadcast_queries:
            # FILE-level pruning against a saved index: collect the
            # query terms' bucket set (driver-scale by the same
            # argument that lets the vocabulary broadcast, and capped
            # at bucket_partitions values) and push it as a partition
            # filter — the tbucket filter reaches the scan's
            # PartitionFilters (through docfreq's consolidation
            # aggregate too, since tbucket is a grouping column), so
            # only the query's bucket directories are read.
            bks = sorted(
                r[0] for r in qvocab.select(
                    _tbucket(F.col("term"), self.hash_fn,
                             self.bucket_partitions).alias("tb")
                ).distinct().collect()
            )
            bfilter = (F.col("tbucket").isin(bks) if bks
                       else F.lit(False))
            postings_src = postings_src.filter(bfilter)
            docfreq_src = docfreq_src.filter(bfilter)
        matched_df = (
            docfreq_src.join(bc(qvocab), "term", "left_semi")
            .crossJoin(F.broadcast(self.stats))
        )
        if max_df_ratio is not None:
            matched_df = matched_df.filter(
                F.col("df") <= F.lit(max_df_ratio) * F.col("n_docs")
            )
        idf = matched_df.select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
            "avgdl",
        )
        # fold qterms x idf first (both query-vocabulary-sized) so the
        # corpus-side postings pay ONE broadcast probe, and df-pruned
        # terms never touch a posting list at all
        qscore = qterms.join(idf, "term")
        matched = postings_src.join(bc(qscore), "term")
        contrib = matched.select(
            "query_id", "doc_id",
            (
                F.col("qtf") * F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1) * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
        scored = contrib.groupBy("query_id", "doc_id").agg(
            F.sum("part").alias("score")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.round(F.col("score"), 6).desc(), F.col("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id", query_id_col: str = "query_id",
              query_text_col: str = "text", hash_fn: str = "xxhash64",
              lowercase: bool = True) -> DataFrame:
    """One-shot convenience: build a transient index over ``docs`` and
    run :meth:`Bm25Index.topk` — the declared-query shape.  Pipelines
    that search repeatedly should ``Bm25Index.build(...).save(...)``
    once instead."""
    idx = Bm25Index.build(docs, text_col=text_col, id_col=id_col,
                          hash_fn=hash_fn, lowercase=lowercase)
    return idx.topk(queries, k=k, k1=k1, b=b, query_id_col=query_id_col,
                    query_text_col=query_text_col)
