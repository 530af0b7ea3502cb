"""Text-analysis operators for LLM training-data pipelines.

North-star operators (BASELINE.json): language-ID, quality scoring, token
counting, document fingerprinting - all expressed with built-in
``pyspark.sql.functions`` so the hot path stays JVM-side /
whole-stage-codegen'd (no Python UDFs; SURVEY.md §2.2 G56-G58).

Scale posture: each operator is a narrow projection over ``documents`` -
no shuffle at all until an aggregation is requested, so they pipeline with
the parquet scan at any data size.  At 100 TB these run as pure map
stages; the only state is per-row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-language stopword/function-word marker sets for the
# n-gram/stopword-ratio language-ID heuristic.  Deliberately small +
# deterministic (this is a heuristic operator, not a model); real
# deployments swap in fastText etc. via the same column signature.
# Ambiguous function words are listed under every language they belong
# to ('a' is both the English article and the Spanish/Italian
# preposition; 'table'/'part' are French nouns; 'est' is French 'is' and
# Latin-derived) — the argmax then weighs the *whole* evidence vector,
# which is what lets short or domain-skewed documents (like this
# engine's synthetic corpus) still spread across several predicted
# languages instead of collapsing to en/und.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "a", "no"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans", "pour",
           "table", "part"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "zh": ["de5", "shi4", "bu4", "wo3", "le5", "zai4", "ren2", "you3"],
}


def tokens(text_col="text") -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count(text_col="text") -> Column:
    """Whitespace token count - the cheap len() every pipeline needs."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col="text") -> Column:
    """BPE-ish token estimate: count of maximal runs of word chars,
    digits, or single punctuation marks (a regex proxy for subword
    tokenizer output length; deterministic, JVM-side)."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])"), 1
    )
    return F.size(pieces)


def char_count(text_col="text") -> Column:
    return F.length(F.col(text_col))


def punct_ratio(text_col="text") -> Column:
    """Fraction of characters that are neither word chars nor spaces."""
    stripped = F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
    return F.when(
        F.length(text_col) > 0, F.length(stripped) / F.length(text_col)
    ).otherwise(F.lit(0.0))


def stopword_ratio(text_col="text", lang: str = "en") -> Column:
    """Fraction of tokens that are in the language's stopword set."""
    toks = tokens(text_col)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text_col="text") -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length docs, mean
    word length in natural range, low punctuation density.  Deterministic
    arithmetic only (portable to the SQL oracle)."""
    n_tok = token_count(text_col)
    n_chr = char_count(text_col)
    mean_word = F.when(n_tok > 0, n_chr / n_tok).otherwise(F.lit(0.0))
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_term = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    return (len_term + word_term + punct_term) / 3


def lang_scores(text_col="text") -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram language-ID heuristic's
    evidence vector)."""
    return lang_scores_of(F.transform(tokens(text_col), lambda t: F.lower(t)))


def lang_scores_of(ltoks) -> dict[str, Column]:
    """Same, over an already-computed lowercase-token column (stage the
    tokens once - expressions inside filter lambdas re-evaluate per
    element, so passing a raw tokens() expression here re-tokenizes the
    text per language)."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        stop = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(ltoks, lambda t: F.array_contains(stop, t)))
    return out


def lang_id(text_col="text") -> Column:
    """Predicted language = argmax of marker hits (ties -> lexicographically
    first language; 'und' when no marker hits at all)."""
    return lang_id_of(F.transform(tokens(text_col), lambda t: F.lower(t)))


def lang_id_of(ltoks) -> Column:
    scores = lang_scores_of(ltoks)
    pairs = F.array(
        *[
            F.struct(c.alias("score"), F.lit(lang).alias("lang"))
            for lang, c in sorted(scores.items())
        ]
    )
    # array_max on struct: lexicographic (score, lang); ties -> max lang,
    # so negate via sort: pick max score then min lang among maxima.
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("").alias("lang")),
        lambda acc, x: F.when(
            (x["score"] > acc["score"]),
            x,
        ).otherwise(acc),
    )
    return F.when(best["score"] <= 0, "und").otherwise(best["lang"])


def fingerprint(text_col="text") -> Column:
    """Document fingerprint: md5 over the sorted distinct token bag.
    Word-order-insensitive (bag semantics), so trivially reshuffled
    near-copies collide - the cheap first-pass dedup key."""
    return fingerprint_of(F.transform(tokens(text_col), F.lower))


def fingerprint_of(ltoks) -> Column:
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ltoks)), " "))


def rolling_hash(text_col="text", mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Order-sensitive polynomial rolling hash over token lengths+first
    chars (portable arithmetic: identical in the SQL oracle).  Cheap
    order-aware companion to :func:`fingerprint`."""
    return rolling_hash_of(tokens(text_col), mod, base)


def rolling_hash_of(toks, mod: int = 1_000_000_007, base: int = 31) -> Column:
    contrib = F.transform(
        toks, lambda t: (F.length(t) * 131 + F.ascii(F.substring(t, 1, 1)))
    )
    return F.aggregate(
        contrib,
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * base + v) % mod,
    )


def token_ngrams(toks, n: int) -> Column:
    """Array of space-joined token ``n``-grams (empty when the document
    has fewer than ``n`` tokens).  The guard matters: Spark's
    ``sequence(1, stop)`` generates a DESCENDING ``[1, 0]`` when
    ``stop < 1`` instead of an empty array."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


# Gopher repetition thresholds (Rae et al. 2021, table A1) - the subset
# expressible over token n-grams and lines, applied in
# repetition_profile's passes_repetition column.
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_frac": 0.20,
    "top_3gram_frac": 0.18,
    "dup_5gram_frac": 0.15,
}

_REPETITION_FIELDS = tuple(REPETITION_THRESHOLDS)


def _repetition_signal_row(t: "str | None") -> tuple:
    """The five signals + pass flag for ONE document, plain Python.

    Counter-based counting is O(doc length) where the equivalent
    Catalyst higher-order-function formulation is O(grams x distinct
    grams) *interpreted* (nested array lambdas never enter codegen) -
    measured 19 ms/doc vs ~40 us/doc on the sf0.1 corpus, the
    difference between 95 s and ~2 s for one 5k-doc table.  Arithmetic
    mirrors the DuckDB oracle SQL exactly (int x int, then one /double
    per fraction): same IEEE ops in the same order, bit-identical
    doubles.

    Tokenization mirrors ``tokens()``: trim = strip SPACES only (Spark
    ``F.trim`` and DuckDB ``trim`` both strip ' ' alone), then split on
    whitespace runs; an all-space text yields [''] in all three
    engines.  Lines mirror the SQL: split on newline, keep lines
    nonempty after space-strip."""
    import re
    from collections import Counter

    t = t or ""
    lines = [l for l in t.split("\n") if l.strip(" ")]
    if lines:
        lc = Counter(lines)
        dup_line = 1.0 - len(lc) / float(len(lines))
        total_chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) for l in lines if lc[l] > 1)
        dup_line_char = (
            dup_chars / float(total_chars) if total_chars else 0.0
        )
    else:
        dup_line = dup_line_char = 0.0
    toks = re.split(r"\s+", t.strip(" "))
    n = len(toks)

    def grams(k):
        return list(zip(*(toks[i:] for i in range(k))))

    def top_frac(k):
        g = grams(k)
        return max(Counter(g).values()) * k / float(n) if g else 0.0

    def dup_frac(k):
        g = grams(k)
        if not g:
            return 0.0
        c = Counter(g)
        return sum(v for v in c.values() if v > 1) / float(len(g))

    sig = (dup_line, dup_line_char, top_frac(2), top_frac(3), dup_frac(5))
    th = REPETITION_THRESHOLDS
    passes = all(v <= th[f] for v, f in zip(sig, _REPETITION_FIELDS))
    return sig + (1.0 if passes else 0.0,)


def _repetition_udf():
    """Arrow-batched pandas UDF computing all six repetition outputs in
    one pass (built lazily - no SparkSession needed at import)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [StructField(f, DoubleType()) for f in _REPETITION_FIELDS]
        + [StructField("passes", DoubleType())]
    )

    @F.pandas_udf(schema)
    def sig(text: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_repetition_signal_row(t) for t in text],
            columns=list(_REPETITION_FIELDS) + ["passes"],
            dtype="float64",
        )

    return sig


def repetition_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (Gopher-style quality filters,
    Rae et al. 2021 §A1.1): duplicate-line fraction, duplicate-line
    character fraction, top-2/3-gram token fraction, duplicate-5-gram
    fraction, plus a ``passes_repetition`` boolean applying
    :data:`REPETITION_THRESHOLDS`.

    Scale shape: ONE Arrow-batched pandas UDF per row batch - a pure
    map stage, no explode, no shuffle, no state; per-row cost is
    ~linear in document length (Counter counting).  The signals are
    per-document only, so the op pipelines with the scan at any corpus
    size.  Character-fraction signals use token-count proxies where
    Gopher counts characters; the thresholds are the published ones.
    The same arithmetic is SQL-expressible (the DuckDB oracle in
    queries/llm_ops.py runs the nested-lambda formulation), but
    Catalyst evaluates nested array lambdas interpreted at O(grams x
    distinct) per row - measured 500x slower than this kernel at sf0.1
    - so the Spark-side path is the vectorized UDF.

    Reference provenance: no counterpart in /root/reference (Cassandra
    KV/lease code only); LLM-pipeline closure, SURVEY §2.5 D10.
    """
    s = df.withColumn("__sig", _repetition_udf()(F.col(text_col)))
    th = REPETITION_THRESHOLDS
    return s.select(
        *[c for c in df.columns],
        F.size(tokens(text_col)).alias("n_tokens"),
        *[F.col(f"__sig.{f}").alias(f) for f in _REPETITION_FIELDS],
        (F.col("__sig.passes") > 0.5).alias("passes_repetition"),
    )


def repetition_gate(text_col: str = "text") -> Column:
    """Boolean column: the document passes every
    :data:`REPETITION_THRESHOLDS` bound.  The curation funnel's
    ``drop_repetitive`` stage - the pass flag is computed inside the
    same vectorized kernel as :func:`repetition_profile` (one UDF
    evaluation per row, one field access - never five)."""
    return _repetition_udf()(F.col(text_col))["passes"] > 0.5


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document text stats from ONE tokenization.

    The token array is staged as its own projection; every stat column
    references it.  Deriving each stat from ``tokens(text_col)`` directly
    would re-split the text once per column (and once per element for
    the in-lambda uses) - the single-scan-single-tokenize shape is what
    survives a 100 TB corpus."""
    df = df.withColumn("__toks", tokens(text_col)).withColumn(
        "__ltoks", F.transform(F.col("__toks"), F.lower)
    )
    n_tok = F.size(F.col("__toks"))
    n_chr = char_count(text_col)
    mean_word = F.when(n_tok > 0, n_chr / n_tok).otherwise(F.lit(0.0))
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_term = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        punct_ratio(text_col).alias("punct_ratio"),
        ((len_term + word_term + punct_term) / 3).alias("quality"),
        lang_id_of(F.col("__ltoks")).alias("lang_pred"),
        fingerprint_of(F.col("__ltoks")).alias("fp"),
        rolling_hash_of(F.col("__toks")).alias("rhash"),
    ).drop("__toks", "__ltoks")


def quality_report(df: DataFrame, text_col: str = "text",
                   group_cols: tuple[str, ...] = ("source", "lang")) -> DataFrame:
    """Per-group corpus quality dashboard: the table a daily curation
    run reports.  For each ``group_cols`` cell: row count, token-count
    mean, mean composite quality, fraction passing the quality gate
    (>= 0.5, the funnel default), fraction passing every Gopher
    repetition threshold, and the bag-fingerprint distinct ratio (the
    cheap exact-dup-rate proxy: 1.0 = no trivially-reshuffled copies).

    Scale shape: one map stage (the text profile columns + the
    vectorized repetition kernel, evaluated once per row) into one
    partial+final hash aggregate on the group key - the same two-stage
    shape as any groupBy, corpus-size-independent state (#groups x
    counters).  Exact integer sums keep every ratio bit-reproducible
    for the SQL oracle."""
    sig = _repetition_udf()(F.col(text_col))
    staged = df.select(
        *group_cols,
        token_count(text_col).alias("__nt"),
        quality_score(text_col).alias("__q"),
        (sig["passes"] > 0.5).cast("int").alias("__rep"),
        fingerprint(text_col).alias("__fp"),
    )
    n = F.count(F.lit(1))
    return (
        staged.groupBy(*group_cols)
        .agg(
            n.alias("n_docs"),
            F.round(F.sum("__nt") / n, 4).alias("mean_tokens"),
            F.round(F.sum("__q") / n, 4).alias("mean_quality"),
            F.round(F.sum((F.col("__q") >= 0.5).cast("int")) / n, 4).alias(
                "frac_quality_pass"
            ),
            F.round(F.sum("__rep") / n, 4).alias("frac_repetition_pass"),
            F.round(F.count_distinct(F.col("__fp")) / n, 4).alias(
                "fp_distinct_ratio"
            ),
        )
        .orderBy(*group_cols)
    )


# --------------------------------------------------------------------------
# D28: Gopher quality rules (Rae et al. 2021, appendix A1.1) — the
# document-shape filter block that complements the repetition block
# above.  All pure built-in column arithmetic (higher-order array fns
# over ONE staged token array), zero shuffle, zero Python — at 100 TB
# this pipelines with the parquet scan like every operator in this
# module.  Thresholds are the paper's; every one is a keyword arg.
# --------------------------------------------------------------------------

GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_BULLET_RE = r"^(•|-|\*)"


def gopher_signals(text_col: str = "text") -> dict[str, Column]:
    """The seven A1.1 signal columns (shared by the profile, the
    boolean gate, and the funnel stage — one definition, one oracle)."""
    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    lines = F.split(t, "\n")
    nw = F.size(toks).cast("long")
    nl = F.size(lines).cast("long")
    safe_nw = F.when(nw > 0, nw.cast("double"))
    mean_wl = F.coalesce(
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda a, x: a + F.length(x)) / safe_nw,
        F.lit(0.0))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_dots = (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
    n_ell = F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    symbol_ratio = F.coalesce(
        (n_hash + n_dots + n_ell) / safe_nw, F.lit(0.0))
    bullet_frac = F.coalesce(
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(_BULLET_RE)))
        / F.when(nl > 0, nl.cast("double")), F.lit(0.0))
    ellipsis_frac = F.coalesce(
        F.size(F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith(
                "…")))
        / F.when(nl > 0, nl.cast("double")), F.lit(0.0))
    alpha_frac = F.coalesce(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / safe_nw,
        F.lit(0.0))
    ltoks = F.transform(toks, F.lower)
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]),
        lambda s: F.array_contains(ltoks, s))).cast("long")
    return {
        "word_count": nw,
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "alpha_frac": alpha_frac,
        "stop_hits": stop_hits,
    }


def gopher_gate(text_col: str = "text",
                min_words: int = 50,
                max_words: int = 100_000,
                min_mean_word_len: float = 3.0,
                max_mean_word_len: float = 10.0,
                max_symbol_ratio: float = 0.1,
                max_bullet_frac: float = 0.9,
                max_ellipsis_frac: float = 0.3,
                min_alpha_frac: float = 0.8,
                min_stop_hits: int = 2) -> Column:
    """Boolean "document passes every A1.1 quality rule" column — the
    funnel-stage form (thresholds default to the paper's)."""
    s = gopher_signals(text_col)
    return (
        (s["word_count"] >= min_words)
        & (s["word_count"] <= max_words)
        & (s["mean_word_len"] >= min_mean_word_len)
        & (s["mean_word_len"] <= max_mean_word_len)
        & (s["symbol_ratio"] <= max_symbol_ratio)
        & (s["bullet_frac"] <= max_bullet_frac)
        & (s["ellipsis_frac"] <= max_ellipsis_frac)
        & (s["alpha_frac"] >= min_alpha_frac)
        & (s["stop_hits"] >= min_stop_hits)
    )


def gopher_quality_profile(df: DataFrame, text_col: str = "text",
                           **thresholds) -> DataFrame:
    """Append the seven Gopher quality signals + ``passes_gopher_quality``.

    Signals (Rae et al. 2021 A1.1): word count in [min, max]; mean word
    length in [3, 10]; symbol-to-word ratio ('#', '...', '…') <=
    0.1; <= 90% of lines starting with a bullet; <= 30% of lines ending
    with an ellipsis; >= 80% of words containing an alphabetic char;
    >= 2 of the 8 required stop words present.  Ratios are exact
    rationals over the same token split as every text operator here,
    so the whole profile is DuckDB-oracle-portable.  ``thresholds``
    forwards to :func:`gopher_gate` (the paper's defaults)."""
    out = df
    for name, col in gopher_signals(text_col).items():
        out = out.withColumn(name, col)
    return out.withColumn("passes_gopher_quality",
                          gopher_gate(text_col, **thresholds))
