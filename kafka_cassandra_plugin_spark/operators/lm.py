"""N-gram language-model perplexity: the model-based quality gate.

The classic corpus-curation step this closes (CCNet, Wenzek et al.
2020; the GPT-3 / Gopher pipelines): score every document by the
perplexity of a small n-gram LM fit on a trusted reference corpus, and
gate on it - low perplexity means "looks like the reference
distribution", extreme perplexity means boilerplate, gibberish, or
wrong-language text.  Public systems use KenLM for the model; a
Kneser-Ney C++ LM does not exist in this container, and at Spark scale
the model does not need to be a driver-side artifact at all - an
add-k-smoothed n-gram LM IS two count DataFrames:

- ``grams``:    (ctx, tok, cnt)  - n-gram counts, one groupBy
- ``contexts``: (ctx, total)     - (n-1)-gram totals, one groupBy
- meta: vocab size V, n, add-k constant - the smoothing contract

  P(tok | ctx) = (cnt + k) / (total + k·V)

with absent (ctx, tok) pairs and absent contexts falling out of LEFT
joins as cnt=0 / total=0 - so an unseen context scores the uniform
1/V, no special cases.  Fitting is map-side tokenization plus two
hash aggregations (the shuffle term is the DISTINCT n-gram count, not
the corpus size; ``prune_min_count`` bounds the stored model the way
KenLM pruning does).  Scoring explodes each document's n-grams once
and equi-joins the two model tables - broadcast when the stored model
is small (decided from the row count recorded at fit time, no runtime
counting), shuffle-hash on the gram key otherwise - then one groupBy
doc for ``exp(-avg(log P))``.  Everything is built-ins; nothing
touches Python row-at-a-time.

The gate (:func:`perplexity_gate`) keeps documents INSIDE a
[min_ppl, max_ppl] band: the CCNet observation is that the lowest
perplexity bucket is boilerplate/templates and the highest is noise -
quality sits in the middle.

Reference provenance: no counterpart in /root/reference (its data
plane is string KV, CassandraListenerRegistry.scala:27); LLM-pipeline
closure (SURVEY §2.5 D19).  Add-k smoothing and perplexity are
textbook-public (Jurafsky & Martin ch. 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

DEFAULT_MAX_BROADCAST_ROWS = 2_000_000


def _doc_ngrams(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """One row per document n-gram: ``ctx`` (the n-1 preceding tokens,
    space-joined; empty string for unigram models) and ``tok``.
    Tokenization is the engine-wide whitespace rule
    (:func:`.text.tokens`), lowercased so the LM is case-insensitive.
    Documents shorter than ``n`` tokens contribute no rows."""
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    out = df.withColumn("__toks", F.transform(toks, lambda t: F.lower(t)))
    # slide a window of n over the token array: positions 1..len-n+1.
    # Spark's sequence(1, 0) is DESCENDING ([1, 0]), so sub-n-token
    # docs must short-circuit to an empty array, not an empty sequence.
    win = F.expr(
        f"case when size(__toks) >= {n} then "
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> struct(array_join(slice(__toks, i, {n - 1}), ' ') AS ctx, "
        f"element_at(__toks, i + {n - 1}) AS tok)) "
        f"else array() end"
    )
    return (
        out.withColumn("__g", F.explode(win))
        .withColumn("ctx", F.col("__g.ctx"))
        .withColumn("tok", F.col("__g.tok"))
        .drop("__toks", "__g")
    )


class NgramLM:
    """Fit-once / score-many add-k n-gram LM as two count tables."""

    def __init__(self, grams: DataFrame, contexts: DataFrame, n: int,
                 k: float, vocab_size: int, gram_rows: int,
                 path: str | None = None):
        self.grams = grams
        self.contexts = contexts
        self.n = n
        self.k = k
        self.vocab_size = vocab_size
        self.gram_rows = gram_rows
        self.path = path

    # -- fitting -----------------------------------------------------------

    @classmethod
    def fit(cls, corpus: DataFrame, text_col: str = "text", n: int = 3,
            k: float = 0.1, prune_min_count: int = 1) -> "NgramLM":
        """Two aggregations over the reference corpus.  ``prune_min_count``
        drops gram rows below the count (KenLM-style model bounding: the
        long tail of hapax n-grams is most of the rows and nearly none
        of the probability mass); context totals and V are computed
        BEFORE pruning so pruned mass degrades smoothly to the smoothed
        floor instead of renormalizing onto survivors."""
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        if k <= 0:
            raise ValueError(f"add-k constant must be > 0, got {k}")
        g = _doc_ngrams(corpus, text_col, n).select("ctx", "tok")
        grams = g.groupBy("ctx", "tok").count().withColumnRenamed(
            "count", "cnt"
        )
        contexts = grams.groupBy("ctx").agg(F.sum("cnt").alias("total"))
        vocab = int(
            grams.agg(F.countDistinct("tok").alias("v")).collect()[0]["v"]
        )
        if prune_min_count > 1:
            grams = grams.filter(F.col("cnt") >= prune_min_count)
        gram_rows = grams.count()
        return cls(grams, contexts, n, k, max(vocab, 1), gram_rows)

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> "NgramLM":
        spark = self.grams.sparkSession
        self.grams.write.mode("overwrite").parquet(f"{path}/grams")
        self.contexts.write.mode("overwrite").parquet(f"{path}/contexts")
        spark.createDataFrame(
            [(self.n, float(self.k), self.vocab_size, self.gram_rows)],
            "n int, k double, vocab_size long, gram_rows long",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return NgramLM.load(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "NgramLM":
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        return cls(
            spark.read.parquet(f"{path}/grams"),
            spark.read.parquet(f"{path}/contexts"),
            int(meta["n"]), float(meta["k"]), int(meta["vocab_size"]),
            int(meta["gram_rows"]), path=path,
        )

    # -- scoring -----------------------------------------------------------

    def _hint(self, max_broadcast_rows: int):
        small = self.gram_rows <= max_broadcast_rows
        return F.broadcast if small else (lambda df: df.hint("shuffle_hash"))

    def perplexity(
        self, docs: DataFrame, text_col: str = "text",
        id_col: str = "doc_id",
        max_broadcast_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
    ) -> DataFrame:
        """(id, n_grams, avg_logp, ppl) per document.  Documents with
        fewer than ``n`` tokens score NULL ppl (no n-grams to judge -
        the gate treats them as out-of-band, it never invents a
        number)."""
        hint = self._hint(max_broadcast_rows)
        smooth_v = float(self.k) * self.vocab_size
        scored = (
            _doc_ngrams(docs.select(id_col, text_col), text_col, self.n)
            .join(hint(self.grams), ["ctx", "tok"], "left")
            .join(hint(self.contexts), "ctx", "left")
            .withColumn(
                "__logp",
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(self.k))
                    / (F.coalesce(F.col("total"), F.lit(0)) + F.lit(smooth_v))
                ),
            )
        )
        per_doc = scored.groupBy(id_col).agg(
            F.count("__logp").alias("n_grams"),
            F.avg("__logp").alias("avg_logp"),
        ).withColumn("ppl", F.exp(-F.col("avg_logp")))
        return docs.select(id_col).distinct().join(
            per_doc, id_col, "left"
        ).withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)))

    def perplexity_gate(
        self, docs: DataFrame, text_col: str = "text",
        id_col: str = "doc_id", max_ppl: float = float("inf"),
        min_ppl: float = 0.0,
        max_broadcast_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
    ) -> DataFrame:
        """Rows of ``docs`` whose perplexity lies in [min_ppl, max_ppl]
        - the CCNet middle band.  NULL-ppl (sub-n-token) documents are
        dropped: a doc too short to score is too short to train on."""
        ppl = self.perplexity(docs, text_col, id_col, max_broadcast_rows)
        keep = ppl.filter(
            F.col("ppl").isNotNull()
            & (F.col("ppl") >= min_ppl) & (F.col("ppl") <= max_ppl)
        ).select(id_col)
        return docs.join(keep, id_col, "left_semi")
