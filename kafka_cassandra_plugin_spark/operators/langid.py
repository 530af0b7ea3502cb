"""Language identification: multinomial NB over hashed character n-grams.

The one published-pipeline stage the engine consumed but could not
produce: every CCNet-derived pretraining pipeline (Wenzek et al. 2020,
arXiv:1911.00359 §3.1) runs language identification over raw text
BEFORE any quality gate, using a fastText-style linear model over
character n-grams (Joulin et al. 2016, arXiv:1607.01759; the public
lid.176 model).  The engine's own ``lang``-column consumers — the
funnel's ``wrong_lang`` gate, ``lang_breakdown``, (lang, split)
partitioned output, stratified sampling — previously assumed a column
only a marker-word heuristic (:func:`.text.lang_id`) could produce.

:class:`LangIdModel` is the learned replacement: multinomial Naive
Bayes over hashed character 1..n-grams.  NB rather than the D24
logistic fit because for langid the fit itself is CLOSED-FORM count
arithmetic — which makes the ENTIRE operator (fit + score) pure
DataFrame algebra, DuckDB-oracle-verifiable end to end with no MLlib
iteration anywhere:

    score(doc, lang) = ln P(lang) + sum over char-gram occurrences g
                       of  ln P(bucket(g) | lang)
    P(bucket | lang) = (count(bucket, lang) + k) / (total_lang + k*B)
    lang_pred        = argmax_lang score   (ties -> first lang)
    lang_conf        = softmax posterior of the argmax

Spark-first shape (zero Python UDFs):

- **featurize**: char n-grams of ``lower(substr(text, 1, max_chars))``
  via a sequence->substring transform + one explode; hashing into B
  buckets bounds the model at B x L rows regardless of corpus size.
  ``max_chars`` (default 400) bounds per-doc cost — langid needs a
  prefix, not the document (the published models score ~1 line).
- **fit**: ONE groupBy((lang, bucket)) count + one per-lang total +
  one doc-count prior — all distributive, shuffle term <= B x L rows
  after map-side combine.  The model IS two DataFrames: a DENSE
  (bucket, lang, logp) table (every bucket in [0, B), so scoring
  joins always hit and unseen buckets price at the smoothed floor)
  and a (lang, logprior) prior table.
- **score**: explode -> BROADCAST join the <= B x L-row table -> one
  (doc, lang) groupBy -> a docs x L seed (broadcast nested loop over
  the L-row priors) so zero-gram docs still score -> window max +
  argmax/softmax.  The (doc) exchange of the window is reused by the
  final aggregate.

Ranking portability (the oracle protocol): the argmax compares
``round(score, 6)`` so cross-engine summation-order ulps cannot flip
near-ties, and genuine ties break to the lexicographically first
language — same discipline as :meth:`.retrieval.Bm25Index.topk`.

``hash_fn='md5'`` (:func:`.dedup.portable_hash52`) is the
engine-portable oracle twin; ``'xxhash64'`` the at-scale default —
same split as every hashed operator in the repo.

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D25).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .selection import _bucket

__all__ = ["LangIdModel", "char_ngram_buckets"]


def _char_grams(text_col: str, ng_max: int,
                max_chars: int) -> tuple[Column, Column]:
    """(gram-array expr over the staged ``__lid_s`` column, the
    ``__lid_s`` staging expr): character 1..``ng_max``-grams over the
    lowercased first ``max_chars`` chars.  Pure substring arithmetic
    (``substring(s, i, n)`` exists verbatim in every SQL engine — the
    oracle-portable formulation); the guarded sequence avoids Spark's
    descending ``sequence(1, 0)`` surprise on short strings."""
    s = F.lower(F.substring(F.col(text_col), 1, max_chars))
    parts = []
    for n in range(1, ng_max + 1):
        parts.append(F.expr(
            f"case when length(__lid_s) >= {n} then "
            f"transform(sequence(1, length(__lid_s) - {n - 1}), "
            f"i -> substring(__lid_s, i, {n})) "
            f"else array() end"
        ))
    return F.concat(*parts), s


def char_ngram_buckets(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", buckets: int = 4096,
                       ng_max: int = 3, max_chars: int = 400,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(id, bucket) — one row per char-gram OCCURRENCE (NB counts
    multiplicity).  The char-level sibling of
    :func:`.selection.hashed_ngram_buckets`."""
    grams, s = _char_grams(text_col, ng_max, max_chars)
    return (
        docs.select(F.col(id_col), s.alias("__lid_s"))
        .select(id_col, F.explode(grams).alias("gram"))
        .select(id_col,
                _bucket(F.col("gram"), buckets, hash_fn).alias("bucket"))
    )


class LangIdModel:
    """A fitted language-ID model: dense ``table`` (bucket, lang, logp)
    + ``priors`` (lang, logprior) DataFrames plus the featurization
    config, with save/load.  Model size is B x L rows — broadcastable
    by construction (4096 x 100 langs ~ 10 MB), independent of corpus
    size."""

    def __init__(self, table: DataFrame, priors: DataFrame, buckets: int,
                 ng_max: int, max_chars: int, hash_fn: str,
                 smooth: float):
        self.table = table
        self.priors = priors
        self.buckets = buckets
        self.ng_max = ng_max
        self.max_chars = max_chars
        self.hash_fn = hash_fn
        self.smooth = float(smooth)

    # -- fit ---------------------------------------------------------------

    @classmethod
    def fit(cls, labeled_docs: DataFrame, text_col: str = "text",
            lang_col: str = "lang", id_col: str = "doc_id",
            buckets: int = 4096, ng_max: int = 3, max_chars: int = 400,
            smooth: float = 1.0,
            hash_fn: str = "xxhash64") -> "LangIdModel":
        """Closed-form NB fit from a labeled (text, lang) corpus — no
        iterative optimizer, so unlike the D24 classifier the FIT is
        itself oracle-checkable DataFrame arithmetic.

        Plan: one gram explode -> groupBy((lang, bucket)) count (the
        only corpus-wide shuffle, <= B x L rows after map-side
        combine); per-lang totals and doc-count priors are two more
        tiny aggregates.  The dense table materializes every (bucket,
        lang) pair via range(B) x langs so an unseen bucket prices at
        the add-``smooth`` floor through the same join path as a seen
        one — no special-case miss logic at score time."""
        spark = labeled_docs.sparkSession
        # featurize with the LABEL riding the explode (not the doc id):
        # the fit never needs per-doc rows, so grams aggregate straight
        # into (lang, bucket) — one corpus-wide shuffle, <= B x L rows
        grams, s = _char_grams(text_col, ng_max, max_chars)
        occ = (
            labeled_docs
            .select(F.col(lang_col).alias("lang"), s.alias("__lid_s"))
            .select("lang", F.explode(grams).alias("gram"))
            .select("lang",
                    _bucket(F.col("gram"), buckets, hash_fn).alias("bucket"))
        )
        counts = occ.groupBy("lang", "bucket").agg(
            F.count(F.lit(1)).alias("cnt"))
        totals = counts.groupBy("lang").agg(F.sum("cnt").alias("tot"))
        # the language SET comes from the labels, not from the gram
        # counts: a language whose training docs are all empty or
        # whitespace contributes priors but no grams, and deriving
        # langs from totals would drop its dense-table rows - its
        # per-doc likelihood would then coalesce to 0.0 at predict and
        # win argmax over every non-empty document.  tot=0 under the
        # left join prices every bucket at the smoothed floor
        # log(1/B) - finite, and dominated by any real evidence.
        langs = (
            labeled_docs.select(F.col(lang_col).alias("lang")).distinct()
            .join(totals, "lang", "left")
            .select("lang", F.coalesce("tot", F.lit(0)).alias("tot"))
        )
        dense = (
            spark.range(buckets)
            .select(F.col("id").cast("int").alias("bucket"))
            .crossJoin(F.broadcast(langs))
            .join(counts, ["bucket", "lang"], "left")
            .select(
                "bucket", "lang",
                F.log(
                    (F.coalesce("cnt", F.lit(0)) + F.lit(float(smooth)))
                    / (F.col("tot") + F.lit(float(smooth) * buckets))
                ).alias("logp"),
            )
        )
        n_total = labeled_docs.select(F.col(lang_col).alias("lang"))
        priors = (
            n_total.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(
                n_total.agg(F.count(F.lit(1)).alias("nt"))))
            .select("lang", F.log(F.col("n") / F.col("nt")).alias("logprior"))
        )
        return cls(dense, priors, buckets, ng_max, max_chars, hash_fn,
                   smooth)

    # -- persist -----------------------------------------------------------

    def save(self, path: str) -> None:
        self.table.write.mode("overwrite").parquet(
            os.path.join(path, "table"))
        self.priors.write.mode("overwrite").parquet(
            os.path.join(path, "priors"))
        spark = self.table.sparkSession
        spark.createDataFrame(
            [(self.buckets, self.ng_max, self.max_chars, self.hash_fn,
              self.smooth)],
            "buckets int, ng_max int, max_chars int, hash_fn string, "
            "smooth double",
        ).write.mode("overwrite").parquet(os.path.join(path, "meta"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LangIdModel":
        meta = spark.read.parquet(os.path.join(path, "meta")).first()
        return cls(
            spark.read.parquet(os.path.join(path, "table")),
            spark.read.parquet(os.path.join(path, "priors")),
            meta.buckets, meta.ng_max, meta.max_chars, meta.hash_fn,
            meta.smooth,
        )

    # -- score -------------------------------------------------------------

    def predict(self, docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
        """``docs`` + ``lang_pred`` (argmax language, ulp-stable via the
        round-6 comparison, ties to the lexicographically first lang) +
        ``lang_conf`` (softmax posterior of the winner).  A doc with no
        char-grams (empty/whitespace text) scores on the priors alone.

        Shuffle audit: occurrences collapse to (doc, lang) with
        map-side combine; the docs x L seed rides a broadcast
        nested-loop over the L-row priors; the window's (doc) exchange
        is reused by the final aggregate."""
        occ = char_ngram_buckets(docs, text_col, id_col, self.buckets,
                                 self.ng_max, self.max_chars, self.hash_fn)
        ll = (
            occ.join(F.broadcast(self.table), "bucket")
            .groupBy(id_col, "lang")
            .agg(F.sum("logp").alias("ll"))
        )
        seed = docs.select(id_col).crossJoin(F.broadcast(self.priors))
        scores = (
            seed.join(ll, [id_col, "lang"], "left")
            .select(
                id_col, "lang",
                (F.col("logprior")
                 + F.coalesce("ll", F.lit(0.0))).alias("score"),
            )
        )
        w = Window.partitionBy(id_col)
        # round-15 (guide §2.4): all three window expressions are written
        # in ONE select over the same spec so CollapseWindow plans ONE
        # Window pass - the earlier withColumn chain interposed a plain
        # projection (rs) between two Window nodes, which blocked the
        # collapse and sorted every (doc, lang) partition twice.
        scored = scores.select(
            "*",
            F.max("score").over(w).alias("m"),
            F.round("score", 6).alias("rs"),
            F.max(F.round("score", 6)).over(w).alias("rm"),
        )
        pred = scored.groupBy(id_col).agg(
            F.min(F.when(F.col("rs") == F.col("rm"), F.col("lang")))
            .alias("lang_pred"),
            (F.lit(1.0) / F.sum(F.exp(F.col("score") - F.col("m"))))
            .alias("lang_conf"),
        )
        return docs.join(pred, id_col, "left")

    def keep(self, docs: DataFrame, langs: tuple[str, ...],
             min_conf: float = 0.0, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
        """The filter posture: rows predicted in ``langs`` with
        confidence >= ``min_conf``."""
        return self.predict(docs, text_col, id_col).filter(
            F.col("lang_pred").isin(*langs)
            & (F.col("lang_conf") >= min_conf)
        )
