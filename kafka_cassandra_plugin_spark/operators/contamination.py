"""Benchmark decontamination: drop corpus documents that near-duplicate
an evaluation set.

The classic LLM training-data operation the dedup tiers don't quite
cover: dedup asks "is this row a copy of another row *in the same
frame*"; decontamination asks "is this corpus row a copy of anything in
a SEPARATE, much smaller benchmark set".  The asymmetry is the whole
design:

- The benchmark side (thousands of eval prompts/answers) is shingled,
  banded, and **broadcast** - it is the dimension table here.
- The corpus side (the 100 TB) is shingled **map-side only** and
  equi-joined against the broadcast bands: no corpus shuffle, no
  all-pairs anything; candidates are then exact-verified by Jaccard on
  shingle sets, with the corpus shingle sets semi-join-pruned to
  candidate ids only (same verify discipline as
  :meth:`~.dedup_index.MinHashIndex.match_batch`, which points the
  OTHER way - small batch vs large stored corpus).

Banding reuses the ONE shared banding definition
(:func:`.dedup.banded_buckets` via :meth:`MinHashIndex._band_table`);
the geometry itself is derived from the caller's ``threshold``
(:func:`.dedup.adaptive_bands`) so the S-curve knee always sits at or
below it - candidate recall >= 95% at the threshold, where a fixed
16x4 banding silently passes ~36% of j=0.5 contamination.

Reference provenance: no counterpart in /root/reference (691 LoC of
Cassandra KV/lease code); this op belongs to the LLM-pipeline closure
(SURVEY §2.5).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import adaptive_bands, exploded_shingles
from .dedup_index import MinHashIndex


def contamination_links(corpus: "DataFrame | MinHashIndex",
                        benchmarks: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, n: int = 3,
                        num_hashes: int = 64, bands: int | None = None,
                        hash_fn: str = "xxhash64") -> DataFrame:
    """(corpus_id, bench_id, jaccard) for every corpus document whose
    shingle-set Jaccard with some benchmark document is >= ``threshold``.

    ``corpus`` may be a :class:`.dedup_index.MinHashIndex` instead of a
    DataFrame: the probe then runs against the index's STORED band and
    shingle tables - the daily-decontamination user who already
    maintains the incremental index pays one broadcast band probe
    instead of a full corpus re-shingle pass (at 100 TB, the difference
    between a dimension-table job and a corpus scan).  The index's
    build-time banding geometry is fixed; when its candidate recall at
    ``threshold`` falls below 95% a warning says so (rebuild the index
    with :func:`.dedup.adaptive_bands` geometry, or accept the
    documented recall).

    ``bands=None`` (default) derives the banding from ``threshold`` via
    :func:`.dedup.adaptive_bands`, so the S-curve knee always sits at or
    below the caller's threshold (candidate recall >= 95% at the
    threshold).  A fixed 16x4 banding proposes only ~64% of j=0.5 pairs
    - silent contamination leakage at the thresholds decontamination is
    actually run at.  Pass ``bands`` explicitly to pin a geometry.

    Scale shape: benchmark bands and shingle sets are broadcast (the
    benchmark set is small by definition); the corpus is scanned once -
    shingle/band map-side, candidate equi-join on (band, bucket) against
    the broadcast, exact verify against corpus shingle sets semi-join
    pruned to candidates.  The corpus-wide terms are the shingle dedup
    inside :func:`.dedup.exploded_shingles` (assembly itself is map-only
    staged-array indexing since round 15; the distinct is one hash
    partition) and a DISK_ONLY persist of the exploded shingles (consumed by
    both the band and verify branches; persist - unlike a checkpoint -
    is recomputable from lineage on executor loss and evictable, so no
    corpus-sized state is pinned to non-replicated local storage).
    """
    if isinstance(corpus, MinHashIndex):
        return _links_from_index(corpus, benchmarks, text_col, id_col,
                                 threshold)
    if bands is None:
        bands = adaptive_bands(threshold, num_hashes)
    params = {"n": n, "num_hashes": num_hashes, "bands": bands,
              "hash_fn": hash_fn}

    bench_ex = exploded_shingles(
        benchmarks, text_col, id_col, n
    ).localCheckpoint()
    bench_bands = MinHashIndex._band_table(bench_ex, params).withColumnsRenamed(
        {"id": "bench_id"}
    )
    bench_sh = bench_ex.groupBy("id").agg(
        F.collect_set("sh").alias("sh_bench")
    ).withColumnsRenamed({"id": "bench_id"})

    corpus_ex = exploded_shingles(corpus, text_col, id_col, n).persist(
        StorageLevel.DISK_ONLY
    )
    corpus_bands = MinHashIndex._band_table(corpus_ex, params).withColumnsRenamed(
        {"id": "corpus_id"}
    )

    cands = (
        corpus_bands.join(F.broadcast(bench_bands), ["band", "bucket"])
        .select("corpus_id", "bench_id")
        .distinct()
    )
    # corpus shingle sets only for candidates (semi-join prune: the
    # verify join never materializes non-candidate corpus sets)
    corpus_sh = (
        corpus_ex.join(
            cands.select(F.col("corpus_id").alias("id")).distinct(),
            "id", "left_semi",
        )
        .groupBy("id")
        .agg(F.collect_set("sh").alias("sh_corpus"))
        .withColumnsRenamed({"id": "corpus_id"})
    )
    return (
        cands.join(corpus_sh, "corpus_id")
        .join(F.broadcast(bench_sh), "bench_id")
        .withColumn(
            "__j_raw",
            F.size(F.array_intersect("sh_corpus", "sh_bench"))
            / F.size(F.array_union("sh_corpus", "sh_bench")),
        )
        .filter(F.col("__j_raw") >= threshold)
        .select(
            "corpus_id", "bench_id",
            F.round("__j_raw", 4).alias("jaccard"),
        )
    )


def _links_from_index(index: MinHashIndex, benchmarks: DataFrame,
                      text_col: str, id_col: str,
                      threshold: float) -> DataFrame:
    """Index-probing contamination links: only the BENCHMARK side is
    shingled/banded (with the index's stored parameters); candidates
    come from a broadcast equi-join against the stored band table and
    the verify join touches stored corpus shingle sets semi-join-pruned
    to candidate ids.  The executed plan contains no corpus-side shingle
    assembly at all (plan-gated in tests) - the corpus terms are two
    partition-pruned parquet scans of the index tables."""
    from .dedup import warn_if_low_banding_recall

    params = index.params
    warn_if_low_banding_recall(
        params["bands"], params["num_hashes"], threshold
    )
    bench_ex = exploded_shingles(
        benchmarks, text_col, id_col, params["n"]
    ).localCheckpoint()
    bench_bands = MinHashIndex._band_table(bench_ex, params).withColumnsRenamed(
        {"id": "bench_id"}
    )
    bench_sh = bench_ex.groupBy("id").agg(
        F.collect_set("sh").alias("sh_bench")
    ).withColumnsRenamed({"id": "bench_id"})

    cands = (
        index.bands.withColumnsRenamed({"id": "corpus_id"})
        .join(F.broadcast(bench_bands), ["band", "bucket"])
        .select("corpus_id", "bench_id")
        .distinct()
    )
    corpus_sh = (
        index.shingles.join(
            cands.select(F.col("corpus_id").alias("id")).distinct(),
            "id", "left_semi",
        )
        .withColumnsRenamed({"id": "corpus_id", "sh": "sh_corpus"})
    )
    return (
        cands.join(corpus_sh, "corpus_id")
        .join(F.broadcast(bench_sh), "bench_id")
        .withColumn(
            "__j_raw",
            F.size(F.array_intersect("sh_corpus", "sh_bench"))
            / F.size(F.array_union("sh_corpus", "sh_bench")),
        )
        .filter(F.col("__j_raw") >= threshold)
        # replayed add_batch can duplicate index rows for an id; max()
        # keeps the surviving jaccard deterministic (same discipline as
        # MinHashIndex.match_batch)
        .groupBy("corpus_id", "bench_id")
        .agg(F.round(F.max("__j_raw"), 4).alias("jaccard"))
    )


def ngram_collision_links(corpus: DataFrame, benchmarks: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          n: int = 13,
                          hash_fn: str = "xxhash64") -> DataFrame:
    """(corpus_id, bench_id, n_shared) for every corpus document sharing
    at least one exact token ``n``-gram with a benchmark document - the
    GPT-3/PaLM decontamination criterion (13-gram collision), the exact
    complement to the Jaccard-threshold :func:`contamination_links`:
    collisions catch verbatim spans embedded in otherwise-different
    documents, which document-level Jaccard dilutes below any threshold.

    ``n_shared`` counts DISTINCT shared n-grams per pair (both sides are
    gram-deduped before the join, so repeated spans inside one document
    don't inflate the count).

    Scale shape: same asymmetry as the Jaccard path - the benchmark
    gram set is deduped and **broadcast** (it is the dimension side);
    the corpus side is a map-only gram explode into a broadcast-hash
    join, so the only corpus-wide term is the final (corpus_id,
    bench_id) pair aggregation, whose size is bounded by actual
    contamination, not the corpus.  ``hash_fn="xxhash64"`` (default)
    joins on a 64-bit gram hash - 8-byte join keys instead of ~80-byte
    gram strings; ``"raw"`` joins on the gram text itself (engine-
    portable - the DuckDB-oracled declared query uses it).

    Reference provenance: no counterpart in /root/reference; LLM-
    pipeline closure (SURVEY §2.5 D11).
    """
    from .text import token_ngrams, tokens

    def gram_table(df: DataFrame, out_id: str) -> DataFrame:
        grams = F.array_distinct(token_ngrams(tokens(text_col), n))
        g = F.explode(grams).alias("__g")
        t = df.select(F.col(id_col).alias(out_id), g)
        if hash_fn == "xxhash64":
            t = t.select(out_id, F.xxhash64("__g").alias("__g"))
        elif hash_fn != "raw":
            raise ValueError(f"hash_fn must be 'xxhash64' or 'raw': {hash_fn}")
        return t

    corpus_g = gram_table(corpus, "corpus_id")
    bench_g = gram_table(benchmarks, "bench_id")
    return (
        corpus_g.join(F.broadcast(bench_g), "__g")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate_ngrams(corpus: DataFrame, benchmarks: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 13,
                         hash_fn: str = "xxhash64") -> DataFrame:
    """The corpus minus every document that shares an exact token
    ``n``-gram with ``benchmarks`` (left-anti against
    :func:`ngram_collision_links` ids).  Schema unchanged."""
    dirty = (
        ngram_collision_links(corpus, benchmarks, text_col, id_col, n,
                              hash_fn)
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")


def decontaminate(corpus: DataFrame, benchmarks: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8, n: int = 3,
                  num_hashes: int = 64, bands: int | None = None,
                  hash_fn: str = "xxhash64",
                  index: MinHashIndex | None = None) -> DataFrame:
    """The corpus minus every document contaminated by ``benchmarks``
    (left-anti join against :func:`contamination_links` ids).  Keeps the
    corpus schema unchanged.  Pass ``index`` (a MinHashIndex of the SAME
    corpus) to probe stored bands instead of re-shingling the corpus -
    one broadcast probe instead of a full corpus pass."""
    dirty = (
        contamination_links(
            index if index is not None else corpus,
            benchmarks, text_col, id_col, threshold,
            n, num_hashes, bands, hash_fn,
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")


# --------------------------------------------------------------------------
# D33: contamination REPORT - the model-card overlap table
# --------------------------------------------------------------------------

def contamination_report(corpus: DataFrame, benchmarks: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 13, min_hits: int = 1,
                         hash_fn: str = "xxhash64") -> DataFrame:
    """One row per BENCHMARK document: (bench_id, n_grams, n_hit,
    overlap_frac, contaminated) - the per-eval-set leakage table model
    cards publish (the GPT-3 appendix C / Llama "benchmark
    contamination" analyses): for each benchmark document, how many of
    its distinct token ``n``-grams occur anywhere in the training
    corpus, and whether it counts as contaminated (``n_hit >=
    min_hits``; 1 = the strict GPT-3 criterion).  The reporting twin
    of :func:`ngram_collision_links` - links answer "WHICH corpus docs
    leak", this answers "HOW MUCH of each benchmark is leaked", which
    is the number that decides whether an eval score is trustworthy.

    Scale shape (the corpus is the big side, so the reduction is
    bench-bounded end to end): benchmark grams - distinct per doc,
    bounded by the benchmark - broadcast; the corpus side is a
    map-only gram explode semi-reduced through that broadcast join, so
    the only shuffled rows are (bench gram) HITS, bounded by the
    benchmark gram count, never the corpus; one distinct + one
    per-bench-doc count finish it.  A benchmark doc with fewer than
    ``n`` tokens has zero grams and reports NULL overlap (out of band,
    never "clean by vacuity").  ``hash_fn="xxhash64"`` joins 8-byte
    gram hashes at scale; ``"raw"`` joins gram text (engine-portable -
    what the DuckDB oracle uses).
    """
    from .text import token_ngrams, tokens

    grams = F.array_distinct(token_ngrams(tokens(text_col), n))
    bench_g = benchmarks.select(
        F.col(id_col).alias("bench_id"), F.explode(grams).alias("__g")
    )
    corpus_g = corpus.select(F.explode(grams).alias("__g"))
    if hash_fn == "xxhash64":
        bench_g = bench_g.select("bench_id", F.xxhash64("__g").alias("__g"))
        corpus_g = corpus_g.select(F.xxhash64("__g").alias("__g"))
    elif hash_fn != "raw":
        raise ValueError(f"hash_fn must be 'xxhash64' or 'raw': {hash_fn}")
    totals = bench_g.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_grams"))
    # distinct BENCH grams seen anywhere in the corpus: the corpus side
    # never aggregates by itself - it filters through the broadcast
    # bench-gram set, so post-join cardinality is bench-bounded
    hit_grams = (
        corpus_g.join(
            F.broadcast(bench_g.select("__g").distinct()), "__g", "left_semi"
        ).distinct()
    )
    hits = (
        bench_g.join(F.broadcast(hit_grams), "__g", "left_semi")
        .groupBy("bench_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    # every join below is benchmark-bounded (eval sets are thousands of
    # docs, the corpus is the only big side and it never re-enters)
    return (
        benchmarks.select(F.col(id_col).alias("bench_id")).distinct()
        .join(F.broadcast(totals), "bench_id", "left")
        .join(F.broadcast(hits), "bench_id", "left")
        .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
        .select(
            "bench_id", "n_grams", "n_hit",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_hit").cast("double") / F.col("n_grams"),
            ).alias("overlap_frac"),
            F.when(
                F.col("n_grams") > 0,
                F.col("n_hit") >= F.lit(int(min_hits)),
            ).alias("contaminated"),
        )
    )
