"""BPE subword tokenizer: distributed histogram, driver merge loop,
broadcast corpus encoding.

Token budgets (D15), sequence packing (D8), and dataset pricing all
need REAL subword token counts, not the regex proxy in
:func:`.text.bpe_ish_token_count` — so the engine grows the tokenizer
itself: byte-pair encoding per Sennrich, Haddow & Birch (ACL 2016,
"Neural Machine Translation of Rare Words with Subword Units"),
char-level symbols with a ``</w>`` end-of-word marker.

Spark-first split of the work — the same hybrid every production
tokenizer trainer uses (HuggingFace ``tokenizers``, SentencePiece:
both train single-node over a word-type histogram):

- **histogram** (:func:`word_histogram`): the corpus-wide pass is ONE
  tokenize+explode+groupBy shuffle producing the (word, count) type
  table.  This is the only stage that touches every byte; at 100 TB
  it is a classic map-side-combined count.  The type table is
  Zipf-bounded, and ``max_types`` caps it deterministically (count
  desc, word asc) — 200k types cover essentially the whole token mass
  of a natural-language corpus, and OOV words still encode fine
  (char-level symbols never go OOV).
- **train** (:meth:`BpeTokenizer.train`): the merge loop runs on the
  DRIVER over the collected histogram — a bounded model-sized
  ``collect()`` (&le; ``max_types`` rows, the same discipline as every
  model table in this repo), incremental pair-count maintenance so
  each merge costs O(affected types), not O(V).  Determinism: best
  pair = highest count, ties by lexicographically smallest (left,
  right) — replicated by the independent reference trainer in tests.
- **encode** (:meth:`BpeTokenizer.encode`): map-only — the ranks
  dict ships in the pandas-UDF closure (vocab-sized, broadcast by
  Spark's task serialization), each batch encodes with a per-word
  memo so Zipf repetition collapses the work to O(distinct words per
  partition).  No shuffle, no driver involvement; this is the
  documented Python slow path (iterative per-word merges cannot be
  expressed as built-in column ops) and the memo is what makes it
  honest at scale.

``token_count_bpe`` (the column form) feeds the D15 mixture planner
the true token budget a trained tokenizer would bill.

Reference provenance: no counterpart in /root/reference (string KV
layer); LLM-pipeline closure (SURVEY §2.5 D27).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["word_histogram", "BpeTokenizer", "WordHistogram"]

END = "</w>"


def word_histogram(docs: DataFrame, text_col: str = "text",
                   lowercase: bool = False,
                   min_count: int = 1,
                   max_types: int | None = None) -> DataFrame:
    """(word, count) type histogram — the one corpus-wide pass of BPE
    training.  One explode + one map-side-combined groupBy; the
    ``max_types`` cap is the deterministic (count desc, word asc)
    top-V, which Spark plans as TakeOrderedAndProject (no global
    sort materialization)."""
    t = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    if lowercase:
        t = F.transform(t, F.lower)
    hist = (
        docs.select(F.explode(t).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        hist = hist.filter(F.col("count") >= int(min_count))
    if max_types is not None:
        hist = hist.orderBy(F.col("count").desc(), F.col("word")).limit(
            int(max_types))
    return hist


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    """Apply one merge to a symbol sequence (left-to-right scan)."""
    out, i, n = [], 0, len(sym)
    a, b = pair
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_merges(hist: list[tuple[str, int]],
                  num_merges: int) -> list[tuple[str, str]]:
    """The driver merge loop with INCREMENTAL pair-count maintenance:
    each iteration touches only the types containing the merged pair.
    Tie-break: count desc, then lexicographically smallest pair — the
    contract the independent reference trainer in tests replicates."""
    words: list[tuple] = []
    counts: list[int] = []
    for w, c in hist:
        words.append(tuple(w) + (END,))
        counts.append(int(c))

    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set[int]] = {}

    def _add(widx: int, sign: int) -> None:
        sym, c = words[widx], counts[widx]
        for j in range(len(sym) - 1):
            p = (sym[j], sym[j + 1])
            pair_counts[p] = pair_counts.get(p, 0) + sign * c
            if sign > 0:
                pair_words.setdefault(p, set()).add(widx)

    for i in range(len(words)):
        _add(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best, best_c = None, 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c <= 0:
            break
        merges.append(best)
        # membership sets keep stale indices (a word may have changed
        # since it was registered for this pair) — the adjacency
        # re-check below is the authority
        for widx in list(pair_words.get(best, ())):
            sym = words[widx]
            has = any(sym[j] == best[0] and sym[j + 1] == best[1]
                      for j in range(len(sym) - 1))
            if not has:
                continue
            _add(widx, -1)
            words[widx] = _merge_word(sym, best)
            _add(widx, +1)
        # spent pairs decay to zero; drop them so the argmax scan
        # stays proportional to the live pair set
        pair_counts = {p: c for p, c in pair_counts.items() if c > 0}
    return merges


class BpeTokenizer:
    """A trained merge list.  ``merges`` is rank-ordered; ``ranks``
    maps pair -> rank for the greedy encoder."""

    def __init__(self, merges: list[tuple[str, str]], lowercase: bool):
        self.merges = [(str(a), str(b)) for a, b in merges]
        self.lowercase = bool(lowercase)
        self.ranks = {p: i for i, p in enumerate(self.merges)}

    # -- train ------------------------------------------------------------

    @classmethod
    def train(cls, docs_or_hist: DataFrame, num_merges: int = 512,
              text_col: str = "text", lowercase: bool = False,
              min_count: int = 1,
              max_types: int = 200_000) -> "BpeTokenizer":
        """Train from a corpus (runs :func:`word_histogram` first) or
        directly from a (word, count) histogram DataFrame.  The
        collect is bounded at ``max_types`` rows by construction."""
        cols = set(docs_or_hist.columns)
        if {"word", "count"} <= cols:
            hist_df = docs_or_hist
            if max_types is not None:
                hist_df = hist_df.orderBy(
                    F.col("count").desc(), F.col("word")).limit(int(max_types))
        else:
            hist_df = word_histogram(docs_or_hist, text_col=text_col,
                                     lowercase=lowercase,
                                     min_count=min_count,
                                     max_types=max_types)
        hist = [(r["word"], r["count"]) for r in hist_df.collect()]
        # collect() order is plan-dependent; the trainer's argmax is
        # order-independent, but sort anyway so iteration order (and
        # thus dict insertion order) is reproducible run-to-run
        hist.sort(key=lambda wc: (-wc[1], wc[0]))
        return cls(_train_merges(hist, num_merges), lowercase)

    # -- persist ----------------------------------------------------------

    def to_frame(self, spark: SparkSession) -> DataFrame:
        """(rank, left, right) — the model as a table (joinable,
        exportable, oracle-registrable)."""
        rows = [(i, a, b) for i, (a, b) in enumerate(self.merges)]
        return spark.createDataFrame(
            rows or [], "rank int, left string, right string")

    def save(self, spark: SparkSession, path: str) -> None:
        self.to_frame(spark).write.mode("overwrite").parquet(
            f"{path}/merges")
        spark.createDataFrame(
            [(self.lowercase,)], "lowercase boolean"
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BpeTokenizer":
        meta = spark.read.parquet(f"{path}/meta").first()
        rows = spark.read.schema(
            "rank int, left string, right string"
        ).parquet(f"{path}/merges").orderBy("rank").collect()
        return cls([(r["left"], r["right"]) for r in rows],
                   bool(meta.lowercase))

    # -- encode -----------------------------------------------------------

    def _encode_word(self, word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        sym = tuple(word) + (END,)
        ranks = self.ranks
        while len(sym) > 1:
            best_r, best_p = None, None
            for j in range(len(sym) - 1):
                r = ranks.get((sym[j], sym[j + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_r, best_p = r, (sym[j], sym[j + 1])
            if best_p is None:
                break
            sym = _merge_word(sym, best_p)
        out = list(sym)
        memo[word] = out
        return out

    def encode(self, docs: DataFrame, text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
        """Append ``out_col: array<string>`` — the BPE token stream of
        each document.  Map-only: ranks ride the UDF closure, a
        per-batch word memo collapses Zipf repetition."""
        merges, lowercase = self.merges, self.lowercase

        @F.pandas_udf("array<string>")
        def _enc(texts: pd.Series) -> pd.Series:
            tok = BpeTokenizer(merges, lowercase)
            memo: dict = {}
            out = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                if lowercase:
                    t = t.lower()
                toks: list[str] = []
                for w in t.split():
                    toks.extend(tok._encode_word(w, memo))
                out.append(toks)
            return pd.Series(out)

        return docs.withColumn(out_col, _enc(F.col(text_col)))

    def token_count(self, docs: DataFrame, text_col: str = "text",
                    out_col: str = "bpe_token_count") -> DataFrame:
        """Append the true subword token count — what the D15 token-
        budget planner should bill instead of the regex proxy."""
        enc = self.encode(docs, text_col=text_col, out_col="__bpe")
        return enc.withColumn(out_col, F.size("__bpe")).drop("__bpe")


class WordHistogram:
    """Disk-backed ACCUMULATED word-type histogram — the sufficient
    statistic for BPE training, maintained incrementally (the same
    batch-partition / replay-exclusion discipline as
    :class:`.bloom.BloomIndex` / :class:`.lm.NgramLM`).

    Word counts are distributive over document-disjoint batches, so
    the stored table is ``counts/batch=<id>/`` (word, count) with ONE
    partition per contributing batch, each written with overwrite —
    exactly-once under foreachBatch replay; ``load(exclude_batch=N)``
    hides an uncommitted first attempt.  Consolidation is lazy (one
    groupBy-sum folds into whatever plan reads the histogram);
    :meth:`compact` rewrites history into ``batch=-1`` when file
    counts decay.  No term-bucket sub-partitioning: unlike BM25
    postings, TRAINING reads every type anyway (then caps at
    ``max_types``), so file-level pruning buys nothing here.

    :meth:`train` re-derives a :class:`BpeTokenizer` from the
    accumulated counts at any point — the streaming answer to "the
    tokenizer should reflect the curated distribution" without ever
    re-scanning accepted history."""

    COMPACT_BATCH = -1

    def __init__(self, counts: DataFrame, lowercase: bool,
                 path: str | None = None):
        self.counts = counts  # (word, count) — possibly multi-batch rows
        self.lowercase = bool(lowercase)
        self.path = path

    @classmethod
    def init(cls, spark: SparkSession, path: str,
             lowercase: bool = False) -> "WordHistogram":
        """Create an EMPTY disk-backed histogram (token-folding
        convention pinned in meta)."""
        empty = spark.createDataFrame([], "word string, count long")
        empty.write.mode("overwrite").parquet(
            f"{path}/counts/batch={cls.COMPACT_BATCH}")
        spark.createDataFrame(
            [(bool(lowercase),)], "lowercase boolean"
        ).write.mode("overwrite").parquet(f"{path}/meta")
        return cls.load(spark, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             exclude_batch: int | None = None) -> "WordHistogram":
        """One 1-row meta read; the counts table reads with a DECLARED
        schema (an empty batch dir has no readable footer) and the
        ``exclude_batch`` partitions pruned at the scan.  Any
        interrupted compaction swap is healed on entry
        (:func:`..fsutil.recover_fold_swap`)."""
        from ..fsutil import path_exists, recover_tables

        if not path_exists(spark, f"{path}/meta"):
            raise ValueError(
                f"no WordHistogram meta table under {path!r} — "
                "init() it first."
            )
        recover_tables(spark, path, ("counts",))
        meta = spark.read.parquet(f"{path}/meta").first()
        t = spark.read.schema("word string, count long, batch int").parquet(
            f"{path}/counts")
        if exclude_batch is not None:
            t = t.filter(F.col("batch") != int(exclude_batch))
        return cls(t.drop("batch"), bool(meta.lowercase), path=path)

    def histogram(self) -> DataFrame:
        """The consolidated (word, count) view — lazy groupBy-sum over
        the stored batch partitions."""
        return self.counts.groupBy("word").agg(
            F.sum("count").alias("count"))

    def append_batch(self, docs: DataFrame, batch_id: int,
                     text_col: str = "text",
                     reload: bool = True) -> "WordHistogram | None":
        """Fold corpus batch ``batch_id`` in by OVERWRITING its own
        counts partition — O(batch) work, exactly-once under replay.
        ``batch_id`` must be non-negative (negative ids are reserved
        for compacted history).  ``reload=False`` makes the append
        write-only for sinks that discard the return value."""
        if self.path is None:
            raise ValueError(
                "append_batch requires a saved histogram (use init())")
        if int(batch_id) < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        word_histogram(docs, text_col=text_col,
                       lowercase=self.lowercase).write.mode(
            "overwrite").parquet(f"{self.path}/counts/batch={int(batch_id)}")
        if not reload:
            return None
        return WordHistogram.load(self.counts.sparkSession, self.path)

    def compact(self, exclude_batch: int | None = None) -> "WordHistogram":
        """Rewrite the stored batch partitions into one consolidated
        ``batch=-1`` (sibling-then-rename swap; run between batches).
        ``exclude_batch``: carry that batch's partition through the
        swap VERBATIM so ``load(exclude_batch=N)`` can still hide an
        uncommitted first attempt on replay — the
        :meth:`.bloom.BloomIndex.compact` discipline."""
        if self.path is None:
            raise ValueError("compact requires a saved histogram")
        from ..fsutil import staged_fold_swap

        spark = self.counts.sparkSession
        consolidated = WordHistogram.load(spark, self.path,
                                          exclude_batch=exclude_batch)
        keeps = [] if exclude_batch is None else [int(exclude_batch)]
        staged_fold_swap(
            spark, f"{self.path}/counts", self.COMPACT_BATCH,
            lambda dest: consolidated.histogram().write.mode(
                "overwrite").parquet(dest),
            keeps,
        )
        return WordHistogram.load(spark, self.path)

    def compact_tiered(self, exclude_batch: int | None = None,
                       max_levels: int = 8) -> "WordHistogram":
        """Tiered (LSM-style) compact: fold only the batches appended
        SINCE the last fold into one new negative level — O(recent)
        write cost instead of :meth:`compact`'s O(history) rewrite.
        Lossless because counts sum distributively and
        :meth:`histogram` re-aggregates across partitions, so levels
        read exactly like batches; falls back to the FULL
        :meth:`compact` once ``max_levels`` levels have accreted.
        Crash-safe via the :func:`..fsutil.staged_fold_swap` marker
        protocol."""
        if self.path is None:
            raise ValueError("compact requires a saved histogram")
        from ..fsutil import tiered_compact_tables

        spark = self.counts.sparkSession
        outcome = tiered_compact_tables(
            spark, self.path,
            [("counts", "word string, count long, batch int", (),
              lambda df: df.groupBy("word").agg(
                  F.sum("count").alias("count")))],
            exclude_batch=exclude_batch, max_levels=max_levels,
        )
        if outcome == "full_needed":
            return self.compact(exclude_batch=exclude_batch)
        return WordHistogram.load(spark, self.path)

    def train(self, num_merges: int = 512,
              max_types: int = 200_000) -> BpeTokenizer:
        """A fresh :class:`BpeTokenizer` from the accumulated counts —
        histogram consolidation folds into the bounded top-``max_types``
        collect that training does anyway."""
        return BpeTokenizer.train(self.histogram(), num_merges=num_merges,
                                  lowercase=self.lowercase,
                                  max_types=max_types)


def tokenizer_fertility(docs: DataFrame, tokenizer: "BpeTokenizer",
                        by: tuple[str, ...] = ("source", "lang"),
                        text_col: str = "text") -> DataFrame:
    """Per-group tokenizer efficiency (SURVEY §2.5 D34): one row per
    ``by`` group with (n_docs, words, bpe_tokens, fertility,
    chars_per_token).  *Fertility* — mean subword tokens per
    whitespace word — is the standard tokenizer-fit metric (reported
    per language in the BLOOM / XLM-R tokenizer analyses): a tokenizer
    trained on the wrong distribution shows fertility blowups on the
    under-represented groups, which directly multiplies training cost
    (every extra subword is a position in the context window).  This
    is the datasheet's (D29) tokenizer-aware column: run it per
    (source, lang) before committing a tokenizer to a mixture.

    Scale shape: the pandas-UDF encode (the declared Python slow path,
    one map pass) plus ONE hash shuffle on the tiny ``by`` key set;
    groups with zero words report NULL fertility (out of band).
    """
    enc = tokenizer.encode(docs, text_col=text_col, out_col="__t")
    words = F.size(F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    ))
    agg = enc.groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(words.cast("long")).alias("words"),
        F.sum(F.size("__t").cast("long")).alias("bpe_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("chars"),
    )
    return agg.select(
        *by, "n_docs", "words", "bpe_tokens",
        F.when(F.col("words") > 0,
               F.col("bpe_tokens").cast("double") / F.col("words"))
        .alias("fertility"),
        F.when(F.col("bpe_tokens") > 0,
               F.col("chars").cast("double") / F.col("bpe_tokens"))
        .alias("chars_per_token"),
    )
