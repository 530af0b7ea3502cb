"""Exact substring-span dedup: remove repeated passages, keep documents.

The Lee et al. 2022 finding ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499): beyond whole-document
near-dups, training corpora carry VERBATIM REPEATED PASSAGES (license
headers, boilerplate, quoted chunks) inside otherwise-distinct
documents, and models memorize them.  The published method removes
every duplicated substring of >= 50 tokens, keeping one copy.  Their
implementation is a single-machine suffix array; a suffix array does
not distribute, but the SAME span set falls out of fixed-width window
hashing, Spark-first:

1. every document's token n-windows (one row per position - the same
   array-side slide as :mod:`.lm`, no self-join),
2. hash each window and count occurrences corpus-wide (ONE groupBy -
   the shuffle term is the DISTINCT window count, never corpus
   width^2),
3. windows whose count >= 2 are duplicated; each duplicated window's
   CANONICAL occurrence (minimum (doc_id, start) - a deterministic
   "keep one copy") is exempted,
4. the remaining occurrences expand to covered token positions
   (``sequence(start, start+n-1)`` - output-bounded: duplicated
   windows only),
5. positions merge into maximal per-document spans with the classic
   gaps-and-islands fold (``pos - row_number()`` groups consecutive
   runs) - :func:`duplicated_ngram_spans`; or the covered tokens are
   dropped and the text reassembled - :func:`remove_duplicated_spans`.

Equivalence note (documented delta from the paper): windows of width n
mark exactly the positions lying inside some duplicated n-token
substring, so the marked SPANS equal the suffix-array method's
duplicated regions for spans of length >= n; the canonical-occurrence
exemption keeps one copy per distinct window rather than one copy per
maximal repeated passage - a conservative difference (never removes
MORE text than the paper's rule... it can retain slightly more, never
less, and never drops a passage's last copy).

``hash_fn``: ``xxhash64`` (default) ships 8-byte window keys through
the shuffle - at 100 TB a raw 50-token string key would multiply
shuffle bytes ~40x; a hash collision marking a false duplicate span is
a ~2^-64-per-pair event, documented as the at-scale trade.  ``raw``
keeps the joined token string as the key (exact, engine-portable) -
the DuckDB-oracle variant, same discipline as
:func:`.contamination.ngram_collision_links`.

This module also carries the other sub-document dedup a pipeline
needs, :func:`dedup_lines` - the CCNet paragraph/line hash dedup
(Wenzek et al. 2020 step 1: drop lines whose normalized hash repeats
across the corpus, which strips navigation bars, cookie banners, and
boilerplate headers before any document-level gate runs).  Same
one-groupBy shape; normalization (lowercase + digit bucketing + trim)
matches the published recipe and is applied to the HASH KEY only - the
surviving lines keep their original text.

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D20/D21).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def _window_grams(docs: DataFrame, text_col: str, id_col: str,
                  n: int) -> DataFrame:
    """One row per token n-window: (id, start, gram) with 0-based
    ``start``.  Array-side slide (no self-join); sub-n-token documents
    contribute no rows."""
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    out = docs.withColumn("__toks", toks)
    win = F.expr(
        f"case when size(__toks) >= {n} then "
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> struct(i - 1 AS start, "
        f"array_join(slice(__toks, i, {n}), ' ') AS gram)) "
        f"else array() end"
    )
    return (
        out.select(id_col, F.explode(win).alias("__w"))
        .select(id_col, F.col("__w.start").alias("start"),
                F.col("__w.gram").alias("gram"))
    )


def _gram_key(hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64("gram")
    if hash_fn == "raw":
        return F.col("gram")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'raw', got {hash_fn!r}")


def _covered_positions(docs: DataFrame, text_col: str, id_col: str,
                       n: int, min_count: int, keep_first: bool,
                       hash_fn: str) -> DataFrame:
    """Distinct (id, pos) token positions lying inside a duplicated
    window's NON-canonical occurrence."""
    occ = _window_grams(docs, text_col, id_col, n).select(
        id_col, "start", _gram_key(hash_fn).alias("key")
    )
    per_key = occ.groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("canon"),
    ).filter(F.col("cnt") >= min_count)
    dup = occ.join(per_key, "key")
    if keep_first:
        dup = dup.filter(
            ~((F.col(id_col) == F.col(f"canon.{id_col}"))
              & (F.col("start") == F.col("canon.start")))
        )
    return (
        dup.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
    )


def duplicated_ngram_spans(docs: DataFrame, n: int = 50,
                           text_col: str = "text", id_col: str = "doc_id",
                           min_count: int = 2, keep_first: bool = True,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """(id, span_start, span_end) maximal token-index spans (0-based,
    end-exclusive) covered by duplicated n-windows, canonical
    occurrences exempted when ``keep_first`` (module doc).  One corpus
    groupBy + one output-bounded explode + one per-doc window fold."""
    covered = _covered_positions(docs, text_col, id_col, n, min_count,
                                 keep_first, hash_fn)
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = covered.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "__grp")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + 1).alias("span_end"))
        .drop("__grp")
    )


def remove_duplicated_spans(docs: DataFrame, n: int = 50,
                            text_col: str = "text", id_col: str = "doc_id",
                            min_count: int = 2, keep_first: bool = True,
                            hash_fn: str = "xxhash64") -> DataFrame:
    """``docs`` with every covered token dropped and the text
    reassembled (single-space joined; the engine's whitespace token
    rule - reassembly NORMALIZES whitespace, so a doc with nothing to
    remove round-trips its token sequence exactly but not its raw
    spacing).  A fully-covered document becomes the empty string, not a
    dropped row; non-text columns ride along."""
    covered = _covered_positions(docs, text_col, id_col, n, min_count,
                                 keep_first, hash_fn)
    toks = docs.select(
        id_col,
        F.posexplode(
            F.filter(tokens(text_col), lambda t: t != F.lit(""))
        ).alias("pos", "tok"),
    )
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("__clean")
    )
    out_cols = [
        F.coalesce(F.col("__clean"), F.lit("")).alias(c) if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return docs.join(rebuilt, id_col, "left").select(*out_cols)


# --------------------------------------------------------------------------
# CCNet line-level dedup (D21)
# --------------------------------------------------------------------------

def _split_lines(text_col: str, sep: str):
    """Split on the LITERAL separator (regex-quoted): F.split takes a
    Java regex, but the docstrings, the array_join reassembly, and the
    DuckDB oracle all treat ``sep`` literally - an unquoted '.' or '|'
    separator would split per character and mangle every document."""
    return F.split(F.col(text_col), "\\Q" + sep + "\\E")


def _line_key(normalize: bool, hash_fn: str) -> Column:
    key = F.trim(F.col("line"))
    if normalize:
        # the CCNet normalization: case- and numeral-insensitive line
        # identity ("Page 3 of 12" == "page 7 of 19")
        key = F.regexp_replace(F.lower(key), "[0-9]", "0")
    if hash_fn == "xxhash64":
        return F.xxhash64(key)
    if hash_fn == "raw":
        return key
    raise ValueError(f"hash_fn must be 'xxhash64' or 'raw', got {hash_fn!r}")


def duplicated_line_counts(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", sep: str = "\n",
                           normalize: bool = True,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """(key, cnt) occurrence counts per normalized line across the
    corpus - the inspection/monitoring surface (a rising head of this
    table is boilerplate creeping into an ingest).  One explode + one
    groupBy; shuffle term = DISTINCT line count."""
    lines = docs.select(
        id_col, F.explode(_split_lines(text_col, sep)).alias("line")
    ).filter(F.trim("line") != "")
    return (
        lines.select(_line_key(normalize, hash_fn).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dedup_lines(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", sep: str = "\n",
                min_count: int = 2, keep_first: bool = True,
                normalize: bool = True,
                hash_fn: str = "xxhash64") -> DataFrame:
    """``docs`` with corpus-duplicated lines removed (CCNet step 1).

    A line whose normalized key occurs >= ``min_count`` times across
    the corpus is dropped from every document except (``keep_first``)
    the canonical occurrence - minimum (doc_id, line_no), the same
    deterministic keep-one-copy rule as the span dedup.  Empty /
    whitespace-only lines pass through untouched (they are structure,
    not content).  Surviving lines keep their ORIGINAL text and order;
    documents reassemble with ``sep``; a fully-boilerplate document
    becomes the empty string, not a dropped row.

    Scale shape: one explode + one groupBy(key) + one broadcast-or-
    shuffle join back on the key + one per-doc rebuild - never
    all-pairs, shuffle term = distinct lines."""
    lines = docs.select(
        id_col,
        F.posexplode(_split_lines(text_col, sep)).alias("line_no", "line"),
    )
    content = lines.filter(F.trim("line") != "").withColumn(
        "key", _line_key(normalize, hash_fn)
    )
    per_key = content.groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("canon"),
    ).filter(F.col("cnt") >= min_count)
    dropped = content.join(per_key, "key")
    if keep_first:
        dropped = dropped.filter(
            ~((F.col(id_col) == F.col(f"canon.{id_col}"))
              & (F.col("line_no") == F.col("canon.line_no")))
        )
    kept = lines.join(
        dropped.select(id_col, "line_no"), [id_col, "line_no"], "left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("__clean")
    )
    out_cols = [
        F.coalesce(F.col("__clean"), F.lit("")).alias(c) if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return docs.join(rebuilt, id_col, "left").select(*out_cols)
