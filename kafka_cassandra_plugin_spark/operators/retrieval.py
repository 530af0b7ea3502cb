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
  vocabulary (at 100 TB the scan reads only matching postings; with
  the index saved partitioned/bucketed by term key the pruning is
  file-level), one broadcast join attaches idf+qtf, the score is pure
  column arithmetic, one (query, doc) groupBy sums term contributions
  (map-side combined), and per-query top-k runs through the
  rank-window path Spark rewrites to WindowGroupLimit — shuffle
  O(tasks x k), like :func:`.sampling.take_per_group`.

Ranking portability: rank orders by ``round(score, 6) DESC, doc_id``
so the float summation-order ulps of different engines cannot flip
neighbors — the same protocol as every float-bearing oracle query.

``hash_fn='xxhash64'`` (default) ships 8-byte term keys through build
shuffles and halves posting width at scale; ``'raw'`` keeps the term
string — the engine-portable DuckDB-oracle twin, same discipline as
:mod:`.substring`.

Incremental maintenance note: df and tf are distributive over
document-disjoint batches (a doc lives in exactly one batch), so the
index admits the same ``batch=<id>`` partitioned accumulation as
:class:`.bloom.BloomIndex` / :class:`.lm.NgramLM`; build here is
fit-once + save/load, with ``merge`` covering the two-index union.

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D22).
"""

from __future__ import annotations

import os

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


class Bm25Index:
    """Inverted index: ``postings`` (term, doc_id, tf, dl), ``docfreq``
    (term, df), ``stats`` (n_docs, avgdl) — all DataFrames, so build,
    save, load, and search are one lazy plan each."""

    def __init__(self, postings: DataFrame, docfreq: DataFrame,
                 stats: DataFrame, hash_fn: str, lowercase: bool):
        self.postings = postings
        self.docfreq = docfreq
        self.stats = stats
        self.hash_fn = hash_fn
        self.lowercase = lowercase

    # -- build / persist ---------------------------------------------------

    @classmethod
    def build(cls, docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", hash_fn: str = "xxhash64",
              lowercase: bool = True) -> "Bm25Index":
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
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
        # collection definition; they can never match a query)
        stats = docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.avg(F.size(_terms(text_col, lowercase))), F.lit(0.0)
            ).alias("avgdl"),
        )
        return cls(postings, docfreq, stats, hash_fn, lowercase)

    def save(self, path: str) -> None:
        """Persist as parquet; postings repartitioned by term key so a
        term's posting list is file-co-located (search-time semi-join
        prunes at file level once bucketed)."""
        self.postings.repartition("term").write.mode(
            "overwrite").parquet(os.path.join(path, "postings"))
        self.docfreq.write.mode("overwrite").parquet(
            os.path.join(path, "docfreq"))
        self.stats.withColumn("hash_fn", F.lit(self.hash_fn)).withColumn(
            "lowercase", F.lit(self.lowercase)
        ).write.mode("overwrite").parquet(os.path.join(path, "stats"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Bm25Index":
        stats = spark.read.parquet(os.path.join(path, "stats"))
        meta = stats.select("hash_fn", "lowercase").first()
        return cls(
            spark.read.parquet(os.path.join(path, "postings")),
            spark.read.parquet(os.path.join(path, "docfreq")),
            stats.select("n_docs", "avgdl"),
            meta.hash_fn, meta.lowercase,
        )

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
        postings = self.postings.unionByName(other.postings)
        docfreq = (
            self.docfreq.unionByName(other.docfreq)
            .groupBy("term").agg(F.sum("df").alias("df"))
        )
        # stats combine distributively: weighted mean of the two avgdl
        stats = (
            self.stats.unionByName(other.stats)
            .agg(
                F.sum("n_docs").alias("n_docs"),
                (F.sum(F.col("avgdl") * F.col("n_docs"))
                 / F.sum("n_docs")).alias("avgdl"),
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
        matched_df = (
            self.docfreq.join(bc(qvocab), "term", "left_semi")
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
        matched = self.postings.join(bc(qscore), "term")
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
