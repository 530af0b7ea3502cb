"""DSIR data selection: hashed n-gram importance resampling.

"Data Selection for Language Models via Importance Resampling" (Xie et
al., NeurIPS 2023, arXiv:2302.03169) is the published recipe for
carving a target-distribution-matched training subset out of a large
raw corpus: featurize every document as a bag of HASHED n-grams
(unigrams + bigrams into B buckets; the paper uses B = 10,000), fit two
bucket-multinomial distributions — p on the target corpus, q on the raw
corpus — weight every raw document by its log importance ratio

    log w(x) = sum over gram occurrences g of x:  ln p[h(g)] - ln q[h(g)]

and take the Gumbel top-k of ``log w + g_i`` (g_i standard Gumbel
noise), which samples k documents WITHOUT replacement proportionally to
the softmax of the importance weights.

Spark-first shape, all JVM-side:

- a bucket distribution is ONE explode + groupBy(bucket) — with
  map-side combine the shuffle term is at most B rows per task, and
  the result is a <= B-row frame (B = 10k -> always broadcastable);
- per-doc log weights are one explode -> bucket -> BROADCAST join
  against the B-row log-ratio table -> one groupBy(doc) sum whose
  map-side combine collapses each doc before the shuffle;
- the Gumbel noise is DETERMINISTIC: u = hash(doc_id : seed) mapped to
  (0,1), g = -ln(-ln u) — reproducible across runs AND engines, which
  is what lets the full selection (weights + sampling) be
  DuckDB-oracle-verified instead of rows-only;
- top-k is a global ``orderBy(key).limit(k)`` — Spark plans
  TakeOrderedAndProject: per-partition heaps of size k, no full sort.

Smoothing: add-s on bucket counts (s = ``smooth``, default 1.0) keeps
unseen buckets finite on both sides: ln((c + s) / (total + s*B)).

``hash_fn='xxhash64'`` is the at-scale bucket hash; ``'md5'`` uses
:func:`.dedup.portable_hash52` — bit-identical in any SQL engine, the
oracle twin (same discipline as the MinHash tiers).

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D23).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash52
from .text import tokens

__all__ = [
    "hashed_ngram_buckets",
    "bucket_distribution",
    "dsir_logweights",
    "dsir_select",
    "dsir_select_threshold",
]

_U_DENOM = float(1 << 52)  # portable_hash52 range


def _bucket(col: Column, buckets: int, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")
    if hash_fn == "md5":
        return F.pmod(portable_hash52(col), F.lit(buckets)).cast("int")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def hashed_ngram_buckets(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", buckets: int = 10_000,
                         ng_max: int = 2,
                         hash_fn: str = "xxhash64") -> DataFrame:
    """(id, bucket) — one row per n-gram OCCURRENCE (not distinct:
    DSIR's bag-of-ngrams counts multiplicity).  The shared explode
    every downstream op builds on."""
    toks = F.transform(
        F.filter(tokens(text_col), lambda t: t != F.lit("")), F.lower
    )
    out = docs.select(F.col(id_col).alias(id_col),
                      toks.alias("__dsir_toks"))
    parts = [F.col("__dsir_toks")]
    for n in range(2, ng_max + 1):
        parts.append(F.expr(
            f"case when size(__dsir_toks) >= {n} then "
            f"transform(sequence(1, size(__dsir_toks) - {n - 1}), "
            f"i -> array_join(slice(__dsir_toks, i, {n}), ' ')) "
            f"else array() end"
        ))
    return out.select(
        id_col, F.explode(F.concat(*parts)).alias("gram")
    ).select(id_col, _bucket(F.col("gram"), buckets, hash_fn).alias("bucket"))


def bucket_distribution(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", buckets: int = 10_000,
                        ng_max: int = 2,
                        hash_fn: str = "xxhash64") -> DataFrame:
    """(bucket, cnt) hashed-ngram occurrence counts over a corpus — the
    multinomial fit for one side of the importance ratio.  <= B rows."""
    return (
        hashed_ngram_buckets(docs, text_col, id_col, buckets, ng_max,
                             hash_fn)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _log_ratio_table(target_dist: DataFrame, raw_dist: DataFrame,
                     buckets: int, smooth: float) -> DataFrame:
    """(bucket, logr) for every OBSERVED bucket: ln p - ln q under
    add-``smooth``; plus the two baseline terms an UNSEEN bucket
    contributes, folded in by the caller via the join miss path."""
    t = target_dist.select("bucket", F.col("cnt").alias("tcnt"))
    r = raw_dist.select("bucket", F.col("cnt").alias("rcnt"))
    tot = (
        t.agg(F.coalesce(F.sum("tcnt"), F.lit(0)).alias("ttot"))
        .crossJoin(
            r.agg(F.coalesce(F.sum("rcnt"), F.lit(0)).alias("rtot"))
        )
    )
    joined = (
        t.join(r, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("tcnt", F.lit(0)).alias("tcnt"),
            F.coalesce("rcnt", F.lit(0)).alias("rcnt"),
        )
        .crossJoin(F.broadcast(tot))
    )
    s, B = float(smooth), buckets
    return joined.select(
        "bucket",
        (
            F.log((F.col("tcnt") + F.lit(s))
                  / (F.col("ttot") + F.lit(s * B)))
            - F.log((F.col("rcnt") + F.lit(s))
                    / (F.col("rtot") + F.lit(s * B)))
        ).alias("logr"),
    )


def dsir_logweights(docs: DataFrame, target_dist: DataFrame,
                    raw_dist: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", buckets: int = 10_000,
                    ng_max: int = 2, smooth: float = 1.0,
                    hash_fn: str = "xxhash64") -> DataFrame:
    """``docs`` + ``logw`` (the per-document log importance weight).

    One explode -> broadcast ratio join -> per-doc sum; documents with
    zero n-grams get logw = 0 (an empty bag is distribution-neutral).
    An occurrence whose bucket appears in NEITHER corpus cannot exist
    when ``raw_dist`` was fit on a superset of ``docs``; when scoring
    out-of-corpus docs the full-outer ratio table still misses, and the
    join's null contributes the two-baseline term via coalesce."""
    occ = hashed_ngram_buckets(docs, text_col, id_col, buckets, ng_max,
                               hash_fn)
    ratio = _log_ratio_table(target_dist, raw_dist, buckets, smooth)
    # unseen-in-both bucket baseline: ln(s/(ttot+sB)) - ln(s/(rtot+sB))
    t_tot = target_dist.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("ttot"))
    r_tot = raw_dist.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("rtot"))
    base = t_tot.crossJoin(r_tot).select(
        (
            F.log(F.lit(float(smooth))
                  / (F.col("ttot") + F.lit(smooth * buckets)))
            - F.log(F.lit(float(smooth))
                    / (F.col("rtot") + F.lit(smooth * buckets)))
        ).alias("base")
    )
    per_doc = (
        occ.join(F.broadcast(ratio), "bucket", "left")
        .crossJoin(F.broadcast(base))
        .groupBy(id_col)
        .agg(F.sum(F.coalesce("logr", F.col("base"))).alias("logw"))
    )
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn("logw", F.coalesce("logw", F.lit(0.0)))
    )


def _gumbel_key(id_col: str, seed: int) -> Column:
    """Deterministic standard Gumbel: u = portable-hash(id:seed) mapped
    into (0,1) (+1/+2 offsets keep u strictly interior), g=-ln(-ln u).
    Hash-derived so runs, retries, AND other engines reproduce it."""
    u = (
        (portable_hash52(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        ).cast("double") + F.lit(1.0))
        / F.lit(_U_DENOM + 2.0)
    )
    return -F.log(-F.log(u))


def dsir_select(raw_docs: DataFrame, target_docs: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 10_000, ng_max: int = 2,
                smooth: float = 1.0, seed: int = 42,
                hash_fn: str = "xxhash64") -> DataFrame:
    """The end-to-end DSIR selection: fit both distributions, weight
    ``raw_docs``, add deterministic Gumbel noise, keep the top ``k``
    (without-replacement softmax sample, per the paper's Appendix).

    Returns the selected rows of ``raw_docs`` + ``logw`` + ``gumbel_key``
    (= logw + g; exposing the key keeps the draw auditable).  Plan:
    two bucket aggregations + one weighted scan + TakeOrderedAndProject
    — no full sort, no driver loop."""
    tdist = bucket_distribution(target_docs, text_col, id_col, buckets,
                                ng_max, hash_fn)
    rdist = bucket_distribution(raw_docs, text_col, id_col, buckets,
                                ng_max, hash_fn)
    weighted = dsir_logweights(raw_docs, tdist, rdist, text_col, id_col,
                               buckets, ng_max, smooth, hash_fn)
    keyed = weighted.withColumn(
        "gumbel_key", F.col("logw") + _gumbel_key(id_col, seed)
    )
    return keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)


def dsir_select_threshold(raw_docs: DataFrame, target_docs: DataFrame,
                          k: int, text_col: str = "text",
                          id_col: str = "doc_id", buckets: int = 10_000,
                          ng_max: int = 2, smooth: float = 1.0,
                          seed: int = 42, hash_fn: str = "xxhash64",
                          rel_err: float = 0.001) -> DataFrame:
    """The at-scale selection path: ``dsir_select``'s global
    ``orderBy().limit(k)`` ends in a single-partition TakeOrdered stage
    — exact and fine for audit-sized k, but a training-subset draw
    (k in the millions over 100 TB) wants a fully DISTRIBUTED cut.

    This variant computes the (1 - k/N) quantile of the Gumbel keys
    with Spark's Greenwald-Khanna ``approxQuantile`` sketch (one
    aggregation pass, driver receives ONE double) and FILTERs on it —
    a map-side predicate, no ordered final stage.  Returns ~k rows:
    off by at most the sketch's rank error (``rel_err`` x N) — the
    documented exactness trade, same spirit as `approx_count_distinct`
    vs `count_distinct`.  Keys are hash-derived (module doc), so the
    draw is still deterministic per seed; ties at the threshold are
    kept (never dropped), so the result is a superset of the exact
    top-(k - rank_err) set."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    tdist = bucket_distribution(target_docs, text_col, id_col, buckets,
                                ng_max, hash_fn)
    rdist = bucket_distribution(raw_docs, text_col, id_col, buckets,
                                ng_max, hash_fn)
    weighted = dsir_logweights(raw_docs, tdist, rdist, text_col, id_col,
                               buckets, ng_max, smooth, hash_fn)
    keyed = weighted.withColumn(
        "gumbel_key", F.col("logw") + _gumbel_key(id_col, seed)
    )
    # the weighting lineage (explode -> broadcast joins -> per-doc sum)
    # is the dominant cost, and three actions would run it three times:
    # persist a NARROW (id, key) projection for the count + quantile
    # pair, then pay the full lineage exactly once in the final filter
    keys = keyed.select(id_col, "gumbel_key").persist()
    try:
        n = keys.count()
        if k >= n:
            return keyed
        q = 1.0 - k / n
        thr = keys.stat.approxQuantile("gumbel_key", [q], rel_err)[0]
    finally:
        keys.unpersist()
    return keyed.filter(F.col("gumbel_key") >= thr)
