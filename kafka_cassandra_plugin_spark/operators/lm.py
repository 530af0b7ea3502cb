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
1/V, no special cases.  V is the DISTINCT TOKEN COUNT over the whole
reference corpus (every position, not just gram continuations - the
textbook add-k vocabulary).  Fitting is map-side tokenization plus
hash aggregations (the shuffle term is the DISTINCT n-gram count, not
the corpus size; ``prune_min_count`` bounds the stored model the way
KenLM pruning does).  Scoring explodes each document's n-grams once
and equi-joins the two model tables - broadcast when the stored model
is small (decided from the recorded gram-row count, no runtime
counting), shuffle-hash on the gram key otherwise - then one groupBy
doc for ``exp(-avg(log P))``.  Everything is built-ins; nothing
touches Python row-at-a-time.

``digit_bucket=True`` applies the CCNet-style numeral normalization
(every ASCII digit -> ``0``) before gram assembly, at fit AND score
time (the flag is persisted in meta, so a loaded model can never be
probed under the other convention).  Without it, numeric-heavy text
(timestamps, ids, prices) inflates V with single-use pseudo-tokens
and scores near the unseen floor regardless of how natural its prose
is - the reason CCNet normalizes digits before KenLM.

The gate (:func:`perplexity_gate`) keeps documents INSIDE a
[min_ppl, max_ppl] band: the CCNet observation is that the lowest
perplexity bucket is boilerplate/templates and the highest is noise -
quality sits in the middle.

**Incremental maintenance** (the same discipline as
:class:`.bloom.BloomIndex` and :class:`.dedup_index.MinHashIndex`):
exact counts are distributive, so the stored model is batch-partitioned
- ``grams/batch=<id>/``, ``contexts/batch=<id>/``, ``vocab/batch=<id>/``
- and :meth:`NgramLM.append_batch` folds a new reference batch in by
OVERWRITING its own partitions (exactly-once under foreachBatch
replay; ``load(exclude_batch=N)`` hides an uncommitted attempt).
Consolidation is lazy (sum per gram / distinct vocab folded into the
scoring plan); :meth:`NgramLM.compact` rewrites history into
``batch=-1`` when file counts decay, optionally pruning - so a
continuously-ingesting pipeline accumulates the reference LM without
ever refitting over the whole corpus.

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


def _norm_tokens(text_col: str, digit_bucket: bool):
    """The normalized token array column: whitespace tokens
    (:func:`.text.tokens`), lowercased; with ``digit_bucket`` every
    ASCII digit collapses to ``0`` (CCNet numeral normalization)."""
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    if digit_bucket:
        return F.transform(
            toks, lambda t: F.regexp_replace(F.lower(t), "[0-9]", "0")
        )
    return F.transform(toks, lambda t: F.lower(t))


def _doc_ngrams(df: DataFrame, text_col: str, n: int,
                digit_bucket: bool = False) -> DataFrame:
    """One row per document n-gram: ``ctx`` (the n-1 preceding tokens,
    space-joined; empty string for unigram models) and ``tok``.
    Documents shorter than ``n`` tokens contribute no rows."""
    out = df.withColumn("__toks", _norm_tokens(text_col, digit_bucket))
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


def _doc_tokens(df: DataFrame, text_col: str,
                digit_bucket: bool = False) -> DataFrame:
    """One row per token (normalized) - the stream V is counted over."""
    return df.select(
        F.explode(_norm_tokens(text_col, digit_bucket)).alias("tok")
    )


def _count_tables(corpus: DataFrame, text_col: str, n: int,
                  digit_bucket: bool) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(grams, contexts, vocab) count tables for one corpus slice -
    the distributive unit both :meth:`NgramLM.fit` and
    :meth:`NgramLM.append_batch` aggregate."""
    g = _doc_ngrams(corpus, text_col, n, digit_bucket).select("ctx", "tok")
    grams = g.groupBy("ctx", "tok").count().withColumnRenamed("count", "cnt")
    contexts = grams.groupBy("ctx").agg(F.sum("cnt").alias("total"))
    vocab = _doc_tokens(corpus, text_col, digit_bucket).distinct()
    return grams, contexts, vocab


class NgramLM:
    """Fit-once (or accumulate-forever) / score-many add-k n-gram LM
    as two count tables plus a vocabulary table."""

    COMPACT_BATCH = -1

    def __init__(self, grams: DataFrame, contexts: DataFrame, n: int,
                 k: float, vocab_size: int, gram_rows: int,
                 path: str | None = None, digit_bucket: bool = False):
        self.grams = grams
        self.contexts = contexts
        self.n = n
        self.k = k
        self.vocab_size = vocab_size
        self.gram_rows = gram_rows
        self.path = path
        self.digit_bucket = digit_bucket

    @staticmethod
    def _check_params(n: int, k: float) -> None:
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        if k <= 0:
            raise ValueError(f"add-k constant must be > 0, got {k}")

    # -- fitting -----------------------------------------------------------

    @classmethod
    def fit(cls, corpus: DataFrame, text_col: str = "text", n: int = 3,
            k: float = 0.1, prune_min_count: int = 1,
            digit_bucket: bool = False) -> "NgramLM":
        """Aggregations over the reference corpus.  ``prune_min_count``
        drops gram rows below the count (KenLM-style model bounding: the
        long tail of hapax n-grams is most of the rows and nearly none
        of the probability mass); context totals and V are computed
        BEFORE pruning so pruned mass degrades smoothly to the smoothed
        floor instead of renormalizing onto survivors.  V counts
        distinct tokens over EVERY corpus position (the full add-k
        vocabulary, not just gram continuations)."""
        cls._check_params(n, k)
        grams, contexts, vocab = _count_tables(
            corpus, text_col, n, digit_bucket
        )
        vocab_size = vocab.count()
        if prune_min_count > 1:
            grams = grams.filter(F.col("cnt") >= prune_min_count)
        gram_rows = grams.count()
        lm = cls(grams, contexts, n, k, max(vocab_size, 1), gram_rows,
                 digit_bucket=digit_bucket)
        lm._vocab_df = vocab
        return lm

    # -- persistence -------------------------------------------------------
    #
    # On-disk layout: <path>/meta plus batch-partitioned count tables
    #   <path>/grams/batch=<id>/     (ctx, tok, cnt)
    #   <path>/contexts/batch=<id>/  (ctx, total)
    #   <path>/vocab/batch=<id>/     (tok)
    # ONE partition triple per contributing batch, each written with
    # overwrite (exactly-once per batch, exactly like BloomIndex's
    # words/batch=<id> discipline).  Counts are distributive, so the
    # consolidated model (sum per (ctx,tok) / sum per ctx / distinct
    # tok) is BIT-EXACTLY the model fit over the union corpus - the
    # accumulate==refit equivalence tests pin this.  COMPACT_BATCH (-1)
    # holds consolidated history; real batch ids are non-negative, so
    # ``exclude_batch`` can never hide compacted history.

    def _tdir(self, table: str, batch_id: int) -> str:
        return f"{self.path}/{table}/batch={int(batch_id)}"

    def save(self, path: str) -> "NgramLM":
        """Write the model as consolidated history (``batch=-1``)
        plus geometry meta; returns the disk-backed handle (which
        recomputes V / gram_rows from the stored tables - identical
        for a just-fit model, by the distributivity argument above).
        Pre-existing ``batch=<id>`` partitions under ``path`` must not
        survive (the staged write below only materializes ``batch=-1``,
        and stale batch partitions from a previous model at the same
        path would otherwise silently sum into the loaded counts) -
        but the tables of THIS model may be lazy reads of those very
        partitions (``NgramLM.load(p).save(p)``), so each table is
        staged to a ``__saving`` sibling FIRST and only then swapped
        over the old directory (checked renames), never
        delete-before-write."""
        from ..fsutil import delete_dir, rename_or_raise

        spark = self.grams.sparkSession
        for table, df in (
            ("grams", self.grams),
            ("contexts", self.contexts),
            ("vocab", self._vocab),
        ):
            delete_dir(spark, f"{path}/{table}__saving")
            df.write.mode("overwrite").parquet(
                f"{path}/{table}__saving/batch={self.COMPACT_BATCH}"
            )
        # all three staged (source partitions untouched); now swap
        for table in ("grams", "contexts", "vocab"):
            delete_dir(spark, f"{path}/{table}")
            rename_or_raise(spark, f"{path}/{table}__saving",
                            f"{path}/{table}")
        spark.createDataFrame(
            [(self.n, float(self.k), bool(self.digit_bucket))],
            "n int, k double, digit_bucket boolean",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return NgramLM.load(spark, path)

    # fit() computes V as a count but save() needs the token TABLE;
    # keep both without changing the public constructor: fit/load
    # attach it, and anything constructed by hand falls back to the
    # gram continuations (documented approximation for that edge).
    @property
    def _vocab(self) -> DataFrame:
        v = getattr(self, "_vocab_df", None)
        if v is not None:
            return v
        return self.grams.select("tok").distinct()

    @classmethod
    def init(cls, spark: SparkSession, path: str, n: int = 3,
             k: float = 0.1, digit_bucket: bool = False) -> "NgramLM":
        """Create an EMPTY disk-backed model (geometry pinned).  The
        streaming accumulation path: init once, then every reference
        batch goes through :meth:`append_batch`."""
        cls._check_params(n, k)
        empty = cls(
            spark.createDataFrame([], "ctx string, tok string, cnt long"),
            spark.createDataFrame([], "ctx string, total long"),
            n, k, 1, 0, digit_bucket=digit_bucket,
        )
        empty._vocab_df = spark.createDataFrame([], "tok string")
        return empty.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "NgramLM":
        """The stored batch partitions, consolidated lazily (sum per
        gram / per context, distinct vocab - folds into the scoring
        plan).  ``exclude_batch``: skip that batch's partitions (pruned
        at the scan) - what a foreachBatch caller passes so a REPLAYED
        batch scores against the model as of its predecessors, not as
        of its own failed first attempt.  Cost note: load runs two
        small jobs over the MODEL tables (distinct-vocab count for V,
        gram-row count for the broadcast decision) - model-sized, not
        corpus-sized; :meth:`compact` keeps them cheap.  Any
        interrupted compaction swap is healed on entry
        (:func:`..fsutil.recover_fold_swap`)."""
        from ..fsutil import recover_tables

        recover_tables(spark, path, ("grams", "contexts", "vocab"))
        meta = spark.read.parquet(f"{path}/meta").collect()[0]

        def _table(name: str) -> DataFrame:
            t = spark.read.parquet(f"{path}/{name}")
            if exclude_batch is not None:
                t = t.filter(F.col("batch") != int(exclude_batch))
            return t.drop("batch")

        grams = _table("grams").groupBy("ctx", "tok").agg(
            F.sum("cnt").alias("cnt")
        )
        contexts = _table("contexts").groupBy("ctx").agg(
            F.sum("total").alias("total")
        )
        vocab = _table("vocab").distinct()
        lm = cls(
            grams, contexts, int(meta["n"]), float(meta["k"]),
            max(vocab.count(), 1), grams.count(), path=path,
            digit_bucket=bool(meta["digit_bucket"]),
        )
        lm._vocab_df = vocab
        return lm

    # -- streaming maintenance ----------------------------------------------

    def append_batch(self, corpus_batch: DataFrame, batch_id: int,
                     text_col: str = "text",
                     reload: bool = True) -> "NgramLM | None":
        """Fold reference batch ``batch_id`` into a DISK-BACKED model
        by OVERWRITING that batch's three count partitions - O(batch)
        work (counts are distributive: no history is re-read), and
        exactly-once under replay: a replayed batch rewrites its own
        partitions instead of double-counting.  ``batch_id`` must be
        non-negative (negative ids are reserved for compacted
        history).

        ``reload=False`` makes the append WRITE-ONLY (returns None):
        the default reload is two eager model-wide count jobs (V +
        gram rows), which a streaming sink that discards the return
        value would otherwise pay every micro-batch."""
        if self.path is None:
            raise ValueError(
                "append_batch requires a saved model (use save()/init())"
            )
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        grams, contexts, vocab = _count_tables(
            corpus_batch, text_col, self.n, self.digit_bucket
        )
        grams.write.mode("overwrite").parquet(self._tdir("grams", batch_id))
        contexts.write.mode("overwrite").parquet(
            self._tdir("contexts", batch_id)
        )
        vocab.write.mode("overwrite").parquet(self._tdir("vocab", batch_id))
        if not reload:
            return None
        return NgramLM.load(self.grams.sparkSession, self.path)

    def compact(self, prune_min_count: int = 1,
                exclude_batch: int | None = None) -> "NgramLM":
        """Rewrite the stored batch partitions into one consolidated
        ``batch=-1`` triple (sibling-then-rename swap, same discipline
        and same non-atomicity caveats as :meth:`.bloom.BloomIndex.
        compact`: run between batches, never concurrently with
        scoring).  ``prune_min_count`` applies KenLM-style pruning to
        the CONSOLIDATED gram counts (totals and vocab untouched -
        exactly :meth:`fit`'s prune-after-totals semantics).
        ``exclude_batch``: leave that batch's partitions uncompacted
        (moved through the swap verbatim) - a streaming caller
        compacting before batch N passes N so an uncommitted first
        attempt can still be hidden by ``load(exclude_batch=N)`` on
        replay."""
        if self.path is None:
            raise ValueError("compact requires a saved model (use save())")
        from ..fsutil import staged_fold_swap

        spark = self.grams.sparkSession
        consolidated = NgramLM.load(spark, self.path,
                                    exclude_batch=exclude_batch)
        grams = consolidated.grams
        if prune_min_count > 1:
            grams = grams.filter(F.col("cnt") >= prune_min_count)
        # marker-based crash-recoverable swap: the in-flight partition
        # is carried through verbatim, and a crash-retry at any point
        # rolls forward or back instead of discarding it
        keeps = [] if exclude_batch is None else [int(exclude_batch)]
        for table, df in (
            ("grams", grams),
            ("contexts", consolidated.contexts),
            ("vocab", consolidated._vocab),
        ):
            staged_fold_swap(
                spark, f"{self.path}/{table}", self.COMPACT_BATCH,
                lambda dest, df=df: df.write.mode(
                    "overwrite").parquet(dest),
                keeps,
            )
        return NgramLM.load(spark, self.path)

    def compact_tiered(self, exclude_batch: int | None = None,
                       max_levels: int = 8) -> "NgramLM":
        """Tiered (LSM-style) compact: fold only the batches appended
        SINCE the last fold into one new negative level per table —
        O(recent) write cost instead of :meth:`compact`'s O(history)
        rewrite.  Lossless because counts sum (and vocab unions)
        distributively and :meth:`load` re-aggregates across
        partitions, so levels read exactly like batches; falls back
        to the FULL :meth:`compact` once ``max_levels`` levels have
        accreted (that major compaction is also where KenLM-style
        ``prune_min_count`` belongs — pruning needs CONSOLIDATED
        counts, so the tiered path never prunes).  Same
        ``exclude_batch`` replay gate; crash-safe via the
        :func:`..fsutil.staged_fold_swap` marker protocol."""
        if self.path is None:
            raise ValueError("compact requires a saved model (use save())")
        from ..fsutil import tiered_compact_tables

        spark = self.grams.sparkSession
        outcome = tiered_compact_tables(
            spark, self.path,
            [
                ("grams", "ctx string, tok string, cnt long, batch int", (),
                 lambda df: df.groupBy("ctx", "tok").agg(
                     F.sum("cnt").alias("cnt"))),
                ("contexts", "ctx string, total long, batch int", (),
                 lambda df: df.groupBy("ctx").agg(
                     F.sum("total").alias("total"))),
                ("vocab", "tok string, batch int", (),
                 lambda df: df.distinct()),
            ],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(exclude_batch=exclude_batch)
        return NgramLM.load(spark, self.path)

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
            _doc_ngrams(docs.select(id_col, text_col), text_col, self.n,
                        self.digit_bucket)
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


# --------------------------------------------------------------------------
# D30: CCNet perplexity bucketing (head / middle / tail)
# --------------------------------------------------------------------------

PPL_BUCKETS = ("head", "middle", "tail")


def ppl_buckets_by_rank(
    ppl_df: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "ppl",
    id_col: str = "doc_id",
    bucket_col: str = "ppl_bucket",
    round_digits: int = 4,
) -> DataFrame:
    """Per-language perplexity tertile label for every scored row —
    the CCNet split (Wenzek et al. 2020 §4.4: each language's corpus
    is cut into equal thirds by reference-LM perplexity; *head* = the
    lowest-perplexity third, closest to the reference distribution,
    *tail* = the highest).  Published pipelines train on head+middle
    and drop or down-weight tail.

    Assignment is by RANK (``ntile(3)`` per language, ordered by
    ``(round(ppl, round_digits), id)``), not by comparing floats to an
    interpolated percentile cutoff: the rounded sort key is the same
    engine-portable value the D19 oracle hash-matches, and standard
    SQL NTILE semantics make the label a pure integer computation —
    deterministic, tie-stable, and reproducible bit-for-bit by any
    engine with the same window function.  NULL-ppl rows (sub-n-token
    documents) keep a NULL bucket: they are out-of-band, never
    silently "head".

    Scale shape: one hash shuffle on ``lang_col`` plus a per-language
    sort — fine for bucketing a scored SAMPLE or one ingest slice.  To
    bucket a whole 100 TB corpus, derive cutoffs from a sample with
    :func:`ppl_cutoffs` and apply them map-only with
    :func:`apply_ppl_cutoffs` (what CCNet itself does: cutoffs come
    from per-language histograms computed once, not a global sort).
    """
    from pyspark.sql.window import Window

    scored = ppl_df.filter(F.col(ppl_col).isNotNull()).select(
        id_col,
        F.round(F.col(ppl_col), round_digits).alias("__rppl"),
        lang_col,
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("__rppl").asc(), F.col(id_col).asc()
    )
    labels = scored.select(
        id_col,
        F.element_at(
            F.array(*[F.lit(b) for b in PPL_BUCKETS]), F.ntile(3).over(w)
        ).alias(bucket_col),
    )
    return ppl_df.join(labels, id_col, "left")


def ppl_cutoffs(
    ppl_df: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "ppl",
    probs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = True,
    accuracy: int = 10_000,
    round_digits: int = 4,
) -> DataFrame:
    """(lang, head_max, middle_max, n_scored) — per-language
    perplexity cutoffs at ``probs``.  The 100-TB path: compute these
    once (on the full corpus with ``exact=False`` — Spark's
    ``approx_percentile`` sketch, one pass, no sort — or exactly on a
    deterministic sample), then :func:`apply_ppl_cutoffs` is a
    broadcast join + two comparisons, map-only over any amount of
    data.  Mirrors CCNet's deployment: cutoffs are a tiny per-language
    table shipped with the LM, not recomputed per shard."""
    src = ppl_df.filter(F.col(ppl_col).isNotNull()).select(
        lang_col, F.round(F.col(ppl_col), round_digits).alias("__rppl")
    )
    lo, hi = float(probs[0]), float(probs[1])
    if exact:
        q = F.percentile("__rppl", F.array(F.lit(lo), F.lit(hi)))
    else:
        q = F.percentile_approx(
            "__rppl", F.array(F.lit(lo), F.lit(hi)), F.lit(int(accuracy))
        )
    return (
        src.groupBy(lang_col)
        .agg(q.alias("__q"), F.count(F.lit(1)).alias("n_scored"))
        .select(
            lang_col,
            F.col("__q")[0].alias("head_max"),
            F.col("__q")[1].alias("middle_max"),
            "n_scored",
        )
    )


def apply_ppl_cutoffs(
    ppl_df: DataFrame,
    cutoffs: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "ppl",
    bucket_col: str = "ppl_bucket",
    round_digits: int = 4,
) -> DataFrame:
    """Label rows head/middle/tail by comparing perplexity to the
    broadcast per-language ``cutoffs`` table (from
    :func:`ppl_cutoffs`) — zero shuffles on the corpus side, so this
    is the form that scales to the full dataset.  Rows at exactly a
    cutoff value go to the lower bucket (<=), matching the rank form
    up to (a) ties AT the cutoff (a rank split breaks them by id; a
    threshold cannot see ids) and (b) at most ONE document per
    (language, boundary) of interpolation parity — when a language's
    scored count is ≡ 2 (mod 3), the interpolated 2/3 percentile and
    NTILE's ceil/floor tile sizes cut one rank apart.  CCNet
    semantics do not care which third an exact-boundary document
    lands in; both slips are between adjacent buckets (gated in
    tests/test_lm.py).  NULL ppl, or a language absent from
    ``cutoffs``, keeps a NULL bucket.  ``cutoffs`` must hold ONE row
    per language (what :func:`ppl_cutoffs` produces); only its
    (lang, head_max, middle_max) columns are read — extra columns
    are dropped, never leaked into the output."""
    rppl = F.round(F.col(ppl_col), round_digits)
    # project the cutoffs side down to exactly the three columns the
    # labeler reads: a user-supplied table with extra columns must not
    # leak them into the output, and the contract (documented above)
    # is one row per language — duplicate lang rows would fan out the
    # corpus join, so they are a caller error, not silently absorbed.
    cutoffs = cutoffs.select(lang_col, "head_max", "middle_max")
    return ppl_df.join(F.broadcast(cutoffs), on=lang_col, how="left").withColumn(
        bucket_col,
        F.when(F.col(ppl_col).isNull() | F.col("head_max").isNull(), F.lit(None))
        .when(rppl <= F.col("head_max"), F.lit("head"))
        .when(rppl <= F.col("middle_max"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("head_max", "middle_max", "n_scored")
