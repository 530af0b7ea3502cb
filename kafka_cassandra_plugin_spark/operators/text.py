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


def _top_gram_frac(grams, n: int, n_tok) -> Column:
    """Fraction of tokens covered by the most frequent ``n``-gram
    (token-count proxy for Gopher's top-n-gram character fraction):
    ``max_count * n / n_tokens``.  O(grams x distinct) per document -
    per-row arithmetic only, no shuffle."""
    counts = F.transform(
        F.array_distinct(grams),
        lambda x: F.size(F.filter(grams, lambda y: y == x)),
    )
    top = F.array_max(counts)
    return F.when(
        F.size(grams) > 0, top * n / n_tok.cast("double")
    ).otherwise(F.lit(0.0))


def _dup_gram_frac(grams) -> Column:
    """Fraction of n-gram occurrences whose gram appears more than once
    in the document (token proxy for Gopher's duplicate-n-gram character
    fraction)."""
    dup_occ = F.size(
        F.filter(
            grams,
            lambda x: F.size(F.filter(grams, lambda y: y == x)) > 1,
        )
    )
    return F.when(
        F.size(grams) > 0, dup_occ / F.size(grams).cast("double")
    ).otherwise(F.lit(0.0))


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


def repetition_signals_for(toks, text_col: str = "text") -> dict[str, Column]:
    """The five Gopher repetition signal expressions over an
    already-staged token-array column ``toks`` (stage it once - deriving
    each signal from ``tokens(text_col)`` directly would re-split the
    text per signal).  Shared by :func:`repetition_profile` (full
    per-document report) and :func:`repetition_gate` (the funnel's
    boolean)."""
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    # chars inside lines that occur more than once, over total line chars
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda a, v: a + v
    )
    dup_line_chars = F.aggregate(
        F.transform(
            F.filter(
                lines,
                lambda l: F.size(F.filter(lines, lambda m: m == l)) > 1,
            ),
            F.length,
        ),
        F.lit(0),
        lambda a, v: a + v,
    )
    dup_line_char_frac = F.when(
        line_chars > 0, dup_line_chars / line_chars.cast("double")
    ).otherwise(F.lit(0.0))

    g2 = token_ngrams(toks, 2)
    g3 = token_ngrams(toks, 3)
    g5 = token_ngrams(toks, 5)
    return {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "top_2gram_frac": _top_gram_frac(g2, 2, F.size(toks)),
        "top_3gram_frac": _top_gram_frac(g3, 3, F.size(toks)),
        "dup_5gram_frac": _dup_gram_frac(g5),
    }


def repetition_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (Gopher-style quality filters,
    Rae et al. 2021 §A1.1): duplicate-line fraction, duplicate-line
    character fraction, top-2/3-gram token fraction, duplicate-5-gram
    fraction, plus a ``passes_repetition`` boolean applying
    :data:`REPETITION_THRESHOLDS`.

    Scale shape: pure map stage - every signal is array arithmetic over
    one tokenization and one line-split of the row, no explode, no
    shuffle, no state.  Per-row cost is O(grams x distinct grams), i.e.
    quadratic in DOCUMENT length, constant in corpus size - the shape
    that survives 100 TB (Gopher applies the same per-document rules
    corpus-wide).  Character-fraction signals use token-count proxies
    where Gopher counts characters; the thresholds are the published
    ones.

    Reference provenance: no counterpart in /root/reference (Cassandra
    KV/lease code only); LLM-pipeline closure, SURVEY §2.5 D10.
    """
    df = df.withColumn("__toks", tokens(text_col))
    t = F.col("__toks")
    sig = repetition_signals_for(t, text_col)
    out = df.select(
        "*",
        F.size(t).alias("n_tokens"),
        *[c.alias(name) for name, c in sig.items()],
    ).drop("__toks")
    th = REPETITION_THRESHOLDS
    return out.withColumn(
        "passes_repetition",
        (F.col("dup_line_frac") <= th["dup_line_frac"])
        & (F.col("dup_line_char_frac") <= th["dup_line_char_frac"])
        & (F.col("top_2gram_frac") <= th["top_2gram_frac"])
        & (F.col("top_3gram_frac") <= th["top_3gram_frac"])
        & (F.col("dup_5gram_frac") <= th["dup_5gram_frac"]),
    )


def repetition_gate(text_col: str = "text") -> Column:
    """Boolean column: the document passes every
    :data:`REPETITION_THRESHOLDS` bound.  The curation funnel's
    ``drop_repetitive`` stage - same arithmetic as
    :func:`repetition_profile`, composed inline (map-only, no staged
    columns left behind)."""
    sig = repetition_signals_for(tokens(text_col), text_col)
    th = REPETITION_THRESHOLDS
    return (
        (sig["dup_line_frac"] <= th["dup_line_frac"])
        & (sig["dup_line_char_frac"] <= th["dup_line_char_frac"])
        & (sig["top_2gram_frac"] <= th["top_2gram_frac"])
        & (sig["top_3gram_frac"] <= th["top_3gram_frac"])
        & (sig["dup_5gram_frac"] <= th["dup_5gram_frac"])
    )


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
