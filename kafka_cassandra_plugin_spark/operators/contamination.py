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

Banding parameters reuse the ONE shared banding definition
(:func:`.dedup.banded_buckets` via :meth:`MinHashIndex._band_table`), so
threshold semantics match the intra-frame LSH tier exactly.

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


def contamination_links(corpus: DataFrame, benchmarks: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, n: int = 3,
                        num_hashes: int = 64, bands: int | None = None,
                        hash_fn: str = "xxhash64") -> DataFrame:
    """(corpus_id, bench_id, jaccard) for every corpus document whose
    shingle-set Jaccard with some benchmark document is >= ``threshold``.

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
    pruned to candidates.  The corpus-wide terms are the shingle-assembly
    window inside :func:`.dedup.exploded_shingles` (one hash partition
    by id) and a DISK_ONLY persist of the exploded shingles (consumed by
    both the band and verify branches; persist - unlike a checkpoint -
    is recomputable from lineage on executor loss and evictable, so no
    corpus-sized state is pinned to non-replicated local storage).
    """
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


def decontaminate(corpus: DataFrame, benchmarks: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8, n: int = 3,
                  num_hashes: int = 64, bands: int | None = None,
                  hash_fn: str = "xxhash64") -> DataFrame:
    """The corpus minus every document contaminated by ``benchmarks``
    (left-anti join against :func:`contamination_links` ids).  Keeps the
    corpus schema unchanged."""
    dirty = (
        contamination_links(
            corpus, benchmarks, text_col, id_col, threshold,
            n, num_hashes, bands, hash_fn,
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")
