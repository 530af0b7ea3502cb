"""Vector similarity search over embedding columns (array<float>).

North-star operators (BASELINE.json; SURVEY.md §2.2 G59-G61):

- :func:`cosine` / :func:`dot` - column expressions built from zip_with /
  aggregate higher-order functions: JVM-side, codegen'd, no Python.
- :func:`brute_force_topk` - exact top-k neighbors: query-set x corpus
  join + per-query top-k window.  The *baseline* every approximate
  method is recall-tested against.
- :func:`rp_lsh_topk` - random-hyperplane LSH: sign-bit sketches ->
  hamming-bucket candidate join -> exact re-rank of candidates only.
- :func:`ivf_topk` - IVF: KMeans coarse quantizer (seeded), probe the
  ``nprobe`` nearest lists, exact re-rank within probed lists.

Scale posture: brute force is O(Q x N) - fine when Q is small (it's a
broadcast of the query set, no shuffle of the corpus) but not for
all-pairs at 100 TB.  The approximate paths turn the quadratic join into
equi-joins on bucket keys (LSH) or a partition-pruned join on list ids
(IVF), which is exactly how a 1000-executor cluster survives: candidates
per query stay O(N / nlist * nprobe) regardless of total corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ensure_min_parallelism


def dot(a, b) -> Column:
    """Dot product of two array columns (double math via zip_with +
    aggregate; elements cast once)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (never NaN/null).

    Left-fold double math: bit-identical to the DuckDB oracle's
    list_reduce formulation - use this wherever results are hash-matched.
    Higher-order functions are interpreted (no whole-stage codegen), so
    for large candidate streams the vectorized :func:`cosine_pandas` is
    ~5x faster; it sums in numpy order, so only rows-only paths (the
    recall-gated ANN re-ranks) may use it."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_pandas(a, b) -> Column:
    """Vectorized cosine over Arrow batches (numpy row-wise dot/norms).
    NOT bit-identical to :func:`cosine` (SIMD/pairwise summation) - for
    approximate paths only."""

    @F.pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xa = np.stack(xs.to_numpy()).astype("float64")
        ya = np.stack(ys.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", xa, ya)
        na = np.linalg.norm(xa, axis=1)
        nb = np.linalg.norm(ya, axis=1)
        denom = na * nb
        out = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.Series(out)

    return _cos(a, b)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     metric: str = "cosine") -> DataFrame:
    """Exact top-k neighbors of each query vector (excluding itself).

    Plan: broadcast the (small) query set against the corpus - the corpus
    never shuffles; each partition scores its rows against every query and
    the per-query top-k window runs on the (Q x N) scored stream.  Output:
    (query_id, neighbor_id, score, rank) with deterministic ties
    (score desc, neighbor id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    score = (
        cosine(F.col("q_vec"), F.col("c_vec"))
        if metric == "cosine"
        else dot(F.col("q_vec"), F.col("c_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (approximate, scale path #1)
# --------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG - no numpy RNG
    state, reproducible everywhere)."""
    planes = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            v.append(state / 0x7FFFFFFF * 2 - 1)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def rp_sketch(df: DataFrame, dim: int, n_planes: int = 16, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-bit sketch: bit i = sign(v . plane_i), packed into a bigint
    bucket key.  Pure column arithmetic - the hyperplane constants are
    literals folded into codegen."""
    df = ensure_min_parallelism(df)
    bits = []
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(F.col(vec_col), lit_plane)
        bits.append(F.when(d >= 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket.alias("bucket")
    )


def rp_lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                n_planes: int = 6, n_tables: int = 8, multiprobe: bool = True,
                probe_hamming: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent sketch tables;
    candidates = corpus rows sharing a bucket with the query in any table;
    exact cosine re-rank of candidates only.  Equi-join on (table, bucket)
    -> no cross join anywhere; recall grows with n_tables.

    ``multiprobe`` additionally probes every bucket within hamming
    distance ``probe_hamming`` of the query's bucket (classic multi-probe
    LSH): the query side - tiny by assumption - fans out by
    sum(C(n_planes, i) for i <= probe_hamming) per table, while the
    corpus side stays one row per table.  This is what makes sign-bit LSH
    usable on weakly-clustered data without growing the corpus-side
    index.  Defaults (6 planes x 8 tables, hamming-2 probes) are tuned
    for recall@10 >= 0.9 on the synthetic corpus (measured 1.00;
    tests/test_llm_ops.py) while keeping corpus-side fanout at one row
    per table and the probe expression small enough for whole-stage
    codegen (probe structs per query row = n_tables *
    (1 + sum(C(n_planes, i) for 1 <= i <= probe_hamming)); at 8 planes /
    hamming-2 / 16 tables the 592-struct array blew the JVM's 64KB
    method limit and fell back to interpreted eval).  At 100 TB, raise
    ``n_planes`` so 2^n_planes tracks corpus size (candidates per probe
    ~ N / 2^n_planes) - recall is then bought with ``n_tables`` /
    ``probe_hamming``, which scale the tiny query side only."""
    # Hyperplanes travel inside one Arrow-vectorized UDF, not as plan
    # literals: a literal formulation (n_tables x n_planes x dim = 4096
    # constants in the expression tree) produced megabyte codegen units
    # whose compilation dominated wall time AND poisoned the JVM for
    # subsequent queries; the intermediate broadcast-join formulation
    # paid n_planes*n_tables interpreted fold-dots per vector plus a
    # bit-packing shuffle.  Here ALL table buckets for a vector come
    # from a single einsum over one Arrow batch (sign bits -> packed
    # bigint per table) - zero joins, zero shuffles, one map stage.
    # Sign-of-dot is sketch-side only (approximate path): a last-ulp
    # summation difference can at worst flip a boundary bit, which the
    # exact re-rank absorbs.
    planes_np = np.array(
        [_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)],
        dtype="float64",
    )  # (T, P, D)
    weights = (np.uint64(1) << np.arange(n_planes, dtype="uint64")).astype("int64")

    @F.pandas_udf("array<long>")
    def table_buckets(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype("float64")          # (n, D)
        signs = np.einsum("nd,tpd->ntp", X, planes_np) >= 0     # (n, T, P)
        packed = (signs * weights).sum(axis=2).astype("int64")  # (n, T)
        return pd.Series(list(packed))

    def sketch(df: DataFrame) -> DataFrame:
        base = ensure_min_parallelism(df).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        )
        return base.withColumn("__bs", table_buckets(F.col("vec")))

    # XOR masks for multi-probe: every bit pattern with <= probe_hamming
    # bits set (excluding 0 - the home bucket is probed unmasked).
    probe_masks = [
        m for m in range(1, 2**n_planes)
        if bin(m).count("1") <= probe_hamming
    ] if multiprobe else []

    def explode_probes(df: DataFrame, probe: bool) -> DataFrame:
        entries = []
        for t in range(n_tables):
            b = F.element_at(F.col("__bs"), t + 1)
            entries.append(F.struct(F.lit(t).alias("tbl"), b.alias("bucket")))
            if probe:
                # multi-probe: the query also visits every bucket within
                # probe_hamming bit-flips (query side is tiny; corpus
                # side stays one row per table)
                for m in probe_masks:
                    entries.append(F.struct(
                        F.lit(t).alias("tbl"),
                        b.bitwiseXOR(F.lit(m).cast("bigint")).alias("bucket"),
                    ))
        return df.select(
            "id", "vec", F.explode(F.array(*entries)).alias("tb")
        ).select("id", "vec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    def sketch_exploded(df: DataFrame, probe: bool) -> DataFrame:
        return explode_probes(sketch(df), probe)

    cs = sketch_exploded(corpus, probe=False).withColumnsRenamed(
        {"id": "neighbor_id", "vec": "c_vec"}
    )
    qs = sketch_exploded(queries, probe=True).withColumnsRenamed(
        {"id": "query_id", "vec": "q_vec"}
    )
    cands = (
        qs.join(cs, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "score", cosine_pandas(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# --------------------------------------------------------------------------
# IVF (approximate, scale path #2)
# --------------------------------------------------------------------------

def _unit(col) -> Column:
    """L2-normalize an array column (zero vectors pass through as-is)."""
    n = norm(col)
    return F.when(
        n > 0, F.transform(col, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(col, lambda x: x.cast("double")))


class IvfIndex:
    """Built IVF index: corpus rows assigned to inverted lists + the
    centroid table.  Build ONCE, probe many - at 100 TB the assigned
    lists are written out partitioned by list_id (:meth:`save` /
    :meth:`load`) and every query batch reuses them; rebuilding the
    quantizer per query would be the mistake.  In-memory indexes cache
    ``assigned``; loaded indexes rely on the partitioned parquet layout
    so probes prune to ``nprobe`` partitions (see :meth:`topk`).

    Cosine-metric alignment: the quantizer is *spherical* - vectors are
    L2-normalized before the KMeans fit/assignment, so the Euclidean
    assignment metric is monotone in cosine (||u-c||^2 = 1+|c|^2-2u.c),
    and probe-time list ranking uses the SAME Euclidean-on-unit-vectors
    metric as assignment.  Mismatched metrics (Euclidean assignment on
    raw vectors, cosine probing) were measured at recall@10 ~0.79; the
    aligned formulation reaches >=0.9 on the same corpus."""

    def __init__(self, assigned: DataFrame, centroids: DataFrame,
                 path: str | None = None):
        self.assigned = assigned
        self.centroids = centroids
        self.path = path

    @classmethod
    def build(cls, corpus: DataFrame, nlist: int = 16, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding",
              fit_sample_rows: int = 100_000) -> "IvfIndex":
        """Fit the coarse quantizer on a bounded SAMPLE of the corpus
        (capped at ``fit_sample_rows``), then assign every row.  Centroid
        quality converges with a modest sample; fitting KMeans on the
        full corpus would iterate over all 100 TB ``maxIter`` times for
        no recall gain (the assignment pass still sees every row once —
        that part is irreducible).

        The sample is the ``fit_sample_rows`` rows with the smallest
        ``xxhash64(id)`` - a deterministic function of the data alone
        (same index for any partitioning or cluster size; a
        ``sample().limit()`` cap would be partition-order dependent),
        taken as one TakeOrdered pass with no prior ``count()``."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        corpus_v = ensure_min_parallelism(corpus).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            array_to_vector(_unit(F.col(vec_col))).alias("features"),
        )
        fit_df = (
            corpus_v.select(
                F.xxhash64(F.col("neighbor_id").cast("string")).alias("__h"),
                "features",
            )
            .orderBy("__h")
            .limit(fit_sample_rows)
            .select("features")
        )
        model = KMeans(k=nlist, seed=seed, maxIter=5).fit(fit_df)
        assigned = model.transform(corpus_v).select(
            "neighbor_id", "c_vec", F.col("prediction").alias("list_id")
        )
        assigned = assigned.cache()
        centroids = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "list_id int, centroid array<double>",
        )
        return cls(assigned, centroids)

    def save(self, path: str) -> "IvfIndex":
        """Persist the index: assigned lists as parquet partitioned by
        ``list_id`` (so probes scan only ``nprobe`` partitions), the
        centroid table alongside.  Returns a loaded handle."""
        self.assigned.write.mode("overwrite").partitionBy("list_id").parquet(
            f"{path}/assigned"
        )
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        return IvfIndex.load(self.assigned.sparkSession, path)

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        assigned = spark.read.parquet(f"{path}/assigned").select(
            "neighbor_id", "c_vec", F.col("list_id").cast("int").alias("list_id")
        )
        centroids = spark.read.parquet(f"{path}/centroids")
        return cls(assigned, centroids, path=path)

    def _probe_lists(self, q: DataFrame, nprobe: int) -> DataFrame:
        """(query_id, q_vec, list_id) for each query's ``nprobe`` nearest
        lists - ranked by the SAME metric KMeans assigns with (Euclidean
        on unit vectors), so probing and assignment agree."""
        dist = F.aggregate(
            F.zip_with(
                _unit(F.col("q_vec")),
                F.col("centroid"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return (
            q.crossJoin(F.broadcast(self.centroids))
            .withColumn("c_dist", dist)
            .withColumn(
                "c_rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("c_dist").asc(), F.col("list_id")
                    )
                ),
            )
            .filter(F.col("c_rank") <= nprobe)
            .select("query_id", "q_vec", "list_id")
        )

    def topk(self, queries: DataFrame, k: int = 10, nprobe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        q_lists = self._probe_lists(q, nprobe)
        assigned = self.assigned
        if self.path is not None:
            # Loaded (disk-backed) index: resolve the probed list ids
            # driver-side so the parquet scan statically prunes to those
            # partitions.  Bounded by nlist distinct values (a few
            # thousand at most), NOT by corpus size - this is the probe
            # architecture, not a driver-side data loop.
            ids = [
                r["list_id"]
                for r in q_lists.select("list_id").distinct().collect()
            ]
            assigned = assigned.filter(F.col("list_id").isin(ids))
        scored = (
            q_lists.join(assigned, "list_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("score", cosine_pandas(F.col("q_vec"), F.col("c_vec")))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "score", "rank")
        )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             nlist: int = 16, nprobe: int = 8, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-flat: KMeans (seeded) coarse quantizer partitions the corpus
    into ``nlist`` inverted lists; each query probes its ``nprobe``
    nearest centroids and exact-scores only those lists.

    Scale: the corpus is scored once against nlist centroids (map-side,
    centroids broadcast), then the search join is an equi-join on list id
    - candidates per query ~ N * nprobe / nlist.  At 100 TB the lists
    become the partitioning key of the stored index (write once, probe
    many - see :class:`IvfIndex` for the amortized build)."""
    index = IvfIndex.build(corpus, nlist=nlist, seed=seed,
                           id_col=id_col, vec_col=vec_col)
    return index.topk(queries, k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """Mean per-query recall@k of an approximate result vs the exact
    brute-force result (the quality gate for LSH/IVF paths)."""
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = a.join(e, ["query_id", "neighbor_id"], "inner").groupBy("query_id").count()
    denom = e.groupBy("query_id").count().withColumnRenamed("count", "n_exact")
    per_q = denom.join(hits, "query_id", "left").fillna(0, ["count"])
    row = per_q.agg(
        F.avg(F.col("count") / F.col("n_exact")).alias("recall")
    ).collect()[0]
    return float(row["recall"])
