"""Product quantization (PQ): memory-bounded vector search codes.

The ANN paths in :mod:`.similarity` (RP-LSH, IVF) prune WHICH vectors a
query scores; at 100 TB the other wall is HOW MUCH memory each stored
vector costs.  Product quantization (Jegou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 - the design
FAISS ships as IVF-PQ) compresses a D-dim float vector to ``m`` one-byte
codes: split the vector into m subvectors, learn a 256-centroid codebook
per subspace, store each subvector as its nearest centroid id.  A 64-dim
float32 embedding (256 B) becomes 8 B at m=8 - 32x less storage and
shuffle width for the candidate stream.

Search is asymmetric distance computation (ADC): the query stays exact;
per query, one (m x 256) lookup table of query-subvector . centroid
inner products turns scoring a candidate into m table lookups + a sum.
The PQ score is approximate, so the production shape is
shortlist-then-rerank: ADC picks ``r`` candidates per query from codes
alone, exact cosine re-ranks the shortlist (which needs only r full
vectors per query, fetched by an equi-join on id).  Measured on the
synthetic corpus (m=8, 64 codes, shortlist=100): recall@10 = 0.96 at
sf0.01, gate >= 0.85 in tests/test_quantization.py.

Scale shape:

- Codebook fit is driver-side numpy Lloyd iterations on a DETERMINISTIC
  bounded sample (smallest xxhash64(id) rows - same convention as
  :meth:`.similarity.IvfIndex.build`), seeded: the codebook is a pure
  function of (data, seed), identical for any partitioning or cluster
  size.  The codebook itself is tiny (m * 256 * D/m floats).
- Encoding is one Arrow map stage (einsum argmin per subspace) - no
  shuffle.  For a recurring query workload, encode ONCE and persist the
  (id, codes) frame as a parquet table next to the ids (plain
  ``df.write.parquet``); both search entry points take a ``codes``
  argument so probes reuse the stored codes instead of re-encoding the
  corpus per call.
- ADC scoring streams (query_id, id, codes) groups through
  ``applyInPandas`` with the LUT built once per group.  Feed it bounded
  candidate groups - every-code-vs-every-query is only for corpora that
  fit a scan budget; at scale compose with IVF probes
  (:meth:`.similarity.IvfIndex.topk` lists) so each group is one
  query's probed candidates, exactly the FAISS IVF-PQ composition.

Reference provenance: no counterpart in the reference plugin (a
Cassandra KV/lease layer); part of the LLM-pipeline similarity closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import ensure_min_parallelism
from .similarity import cosine


def _kmeans_np(X: np.ndarray, k: int, seed: int, iters: int = 12) -> np.ndarray:
    """Seeded Lloyd iterations (numpy): deterministic k x d centroids.
    Plain seeded-random init, no k-means++ - determinism given the seed
    matters more here than seeding optimality."""
    rng = np.random.RandomState(seed)
    n = len(X)
    centroids = X[rng.choice(n, size=min(k, n), replace=False)].copy()
    if len(centroids) < k:  # tiny fit set: pad with jittered repeats
        reps = X[rng.choice(n, size=k - len(centroids), replace=True)]
        centroids = np.vstack([centroids, reps + rng.normal(0, 1e-6, reps.shape)])
    x2 = (X**2).sum(axis=1, keepdims=True)  # (n, 1), loop-invariant
    for _ in range(iters):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 via one (n, k) matmul -
        # NOT the broadcasted (n, k, d) tensor, which at the default
        # 50k-row fit set would be ~800 MB per iteration
        c2 = (centroids**2).sum(axis=1)  # (k,)
        d2 = x2 - 2.0 * (X @ centroids.T) + c2[None, :]
        assign = d2.argmin(axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                centroids[j] = pts.mean(axis=0)
    return centroids


class PqCodebook:
    """Per-subspace centroid tables: (m, k, D/m) numpy array + params."""

    def __init__(self, centroids: np.ndarray, dim: int, seed: int):
        self.centroids = centroids  # (m, k, sub_dim)
        self.m = centroids.shape[0]
        self.k = centroids.shape[1]
        self.dim = dim
        self.seed = seed

    @classmethod
    def fit(cls, corpus: DataFrame, dim: int, m: int = 8, k: int = 256,
            seed: int = 42, id_col: str = "vec_id",
            vec_col: str = "embedding",
            fit_sample_rows: int = 50_000) -> "PqCodebook":
        """Learn the codebooks from a bounded deterministic sample.
        Vectors are L2-normalized before fitting (the ADC inner product
        then tracks cosine, matching the re-rank metric)."""
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        sample = (
            ensure_min_parallelism(corpus)
            .select(
                F.xxhash64(F.col(id_col).cast("string")).alias("__h"),
                F.col(vec_col).alias("v"),
            )
            .orderBy("__h")
            .limit(fit_sample_rows)
            .select("v")
            .collect()
        )
        X = np.array([r["v"] for r in sample], dtype="float64")
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X = np.where(norms > 0, X / np.where(norms > 0, norms, 1.0), X)
        sub = X.reshape(len(X), m, dim // m)
        cents = np.stack(
            [_kmeans_np(sub[:, j, :], k, seed + j) for j in range(m)]
        )
        return cls(cents, dim, seed)

    # -- persistence (parquet, FS-agnostic like IvfIndex/MinHashIndex) ----

    def save(self, spark: SparkSession, path: str) -> None:
        rows = [
            (j, c, [float(x) for x in self.centroids[j, c]])
            for j in range(self.m)
            for c in range(self.k)
        ]
        spark.createDataFrame(
            rows, "subspace int, code int, centroid array<double>"
        ).write.mode("overwrite").parquet(f"{path}/codebook")
        spark.createDataFrame(
            [(self.dim, self.m, self.k, self.seed)],
            "dim int, m int, k int, seed int",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PqCodebook":
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        cents = np.zeros(
            (meta["m"], meta["k"], meta["dim"] // meta["m"]), dtype="float64"
        )
        for r in spark.read.parquet(f"{path}/codebook").collect():
            cents[r["subspace"], r["code"]] = r["centroid"]
        return cls(cents, int(meta["dim"]), int(meta["seed"]))

    # -- encode / score ----------------------------------------------------

    def encode(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding",
               keep: tuple[str, ...] = ()) -> DataFrame:
        """(id, codes array<int> [, keep...]): each subvector's nearest
        centroid, in one Arrow map stage (normalize -> per-subspace
        argmin).  ``keep`` carries extra columns through (e.g. the IVF
        ``list_id`` so codes stay probe-joinable)."""
        cents = self.centroids
        m, dim = self.m, self.dim

        @F.pandas_udf("array<int>")
        def _enc(vs: pd.Series) -> pd.Series:
            X = np.stack(vs.to_numpy()).astype("float64")
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            X = np.where(norms > 0, X / np.where(norms > 0, norms, 1.0), X)
            sub = X.reshape(len(X), m, dim // m)  # (n, m, d')
            # (n, m, k) squared distances via ||a-b||^2 expansion
            x2 = (sub**2).sum(axis=2, keepdims=True)
            c2 = (cents**2).sum(axis=2)  # (m, k)
            xc = np.einsum("nmd,mkd->nmk", sub, cents)
            codes = (x2 - 2 * xc + c2[None]).argmin(axis=2).astype("int32")
            return pd.Series(list(codes))

        return ensure_min_parallelism(df).select(
            F.col(id_col).alias("id"), _enc(F.col(vec_col)).alias("codes"),
            *[F.col(c) for c in keep]
        )

    def adc_shortlist(self, codes: DataFrame, queries: DataFrame,
                      r: int = 100, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      chunks: int = 16,
                      rank_rounding: int | None = None) -> DataFrame:
        """Top-``r`` candidates per query from codes alone: broadcast the
        (small) query set against the codes stream, then score each
        group with the query's LUT built once.
        Output: (query_id, neighbor_id, adc_score), <= r rows per query.

        Group size is BOUNDED: candidates are salted into ``chunks``
        hash buckets, each (query, chunk) group takes its local top-r,
        and a window merge keeps the global top-r - identical result
        (same (score desc, id asc) order both passes; every global
        top-r row is in its chunk's top-r), but one executor never
        holds more than ~corpus/chunks code rows.  Raise ``chunks``
        with corpus size - or better, bound WHICH candidates each
        query sees at all with IVF probes (:func:`ivf_pq_topk`), the
        composition meant for corpora beyond a full-scan budget.
        ``chunks=1`` restores the single-group path (what
        :func:`ivf_pq_topk` uses - its groups are already bounded).

        ``rank_rounding`` (oracle protocol, default off): take the
        top-``r`` cut on ``round(adc_score, rank_rounding)`` with
        neighbor_id tie-break instead of the raw double - the BM25
        oracle's convention, which makes the shortlist MEMBERSHIP
        reproducible across engines whose floating sums differ in the
        last ulps (numpy einsum here, SQL list folds in DuckDB).  The
        reported ``adc_score`` stays raw either way.  Both Spark-side
        cuts (per-chunk and merge) use numpy's half-even rounding;
        DuckDB's round() is half-away-from-zero, so the cross-engine
        key can differ only for a sum whose double is the exact
        nearest representation of a half-decimal at the rounding digit
        - the same measure-zero class the BM25 oracle's round(score,6)
        protocol accepts."""
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        paired = codes.withColumnsRenamed({"id": "neighbor_id"}).join(
            F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
        )
        if chunks <= 1:
            return self._adc_topr(paired, r, rank_rounding=rank_rounding)
        paired = paired.withColumn(
            "__chunk",
            F.pmod(F.xxhash64(F.col("neighbor_id").cast("string")), F.lit(chunks)),
        )
        per_chunk = self._adc_topr(paired, r,
                                   group_cols=("query_id", "__chunk"),
                                   rank_rounding=rank_rounding)
        if rank_rounding is not None:
            # the merge cut MUST use the same rounding implementation
            # as the per-chunk pandas cut (numpy half-even on the
            # binary double) - mixing it with F.round (HALF_UP on the
            # decimal repr) could admit a boundary candidate in one
            # stage and cut it in the other, making the chunked
            # shortlist diverge from chunks=1 at exact half-decimal
            # boundaries
            nd = int(rank_rounding)

            @F.pandas_udf("double")
            def _np_round(s: pd.Series) -> pd.Series:
                return s.round(nd)

            key = _np_round(F.col("adc_score"))
        else:
            key = F.col("adc_score")
        w = Window.partitionBy("query_id").orderBy(
            key.desc(), F.col("neighbor_id")
        )
        return (
            per_chunk.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= r)
            .select("query_id", "neighbor_id", "adc_score")
        )

    def _adc_topr(self, paired: DataFrame, r: int,
                  group_cols: tuple[str, ...] = ("query_id",),
                  rank_rounding: int | None = None) -> DataFrame:
        """Top-``r`` per query over a (query_id, q_vec, neighbor_id,
        codes) candidate stream: one LUT per query group, m lookups +
        sum per candidate, deterministic (score desc, id asc) cut -
        on the rounded score when ``rank_rounding`` is set (see
        :meth:`adc_shortlist`).  Output id types mirror the input's
        (string/int/... ids all work, like the relational search
        paths)."""
        cents = self.centroids
        m, dim = self.m, self.dim
        qt = paired.schema["query_id"].dataType.simpleString()
        nt = paired.schema["neighbor_id"].dataType.simpleString()
        out_schema = f"query_id {qt}, neighbor_id {nt}, adc_score double"

        def score(pdf: pd.DataFrame) -> pd.DataFrame:
            qv = np.asarray(pdf["q_vec"].iloc[0], dtype="float64")
            n = np.linalg.norm(qv)
            if n > 0:
                qv = qv / n
            lut = np.einsum("md,mkd->mk", qv.reshape(m, dim // m), cents)
            C = np.stack(pdf["codes"].to_numpy()).astype("int64")  # (n, m)
            scores = lut[np.arange(m)[None, :], C].sum(axis=1)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc_score": scores,
                }
            )
            key = (out["adc_score"].round(rank_rounding)
                   if rank_rounding is not None else out["adc_score"])
            return out.assign(__key=key).sort_values(
                ["__key", "neighbor_id"], ascending=[False, True]
            ).head(r).drop(columns="__key")

        return paired.groupBy(*group_cols).applyInPandas(score, out_schema)


def pq_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
            m: int = 8, n_codes: int = 256, shortlist: int = 100,
            seed: int = 42, id_col: str = "vec_id",
            vec_col: str = "embedding",
            codebook: PqCodebook | None = None,
            codes: DataFrame | None = None,
            adc_chunks: int = 16) -> DataFrame:
    """PQ shortlist-then-rerank top-k: fit (or reuse) the codebook,
    encode the corpus (or reuse persisted ``codes`` - an (id, codes)
    frame from :meth:`PqCodebook.encode`), ADC-shortlist ``shortlist``
    candidates per query, exact-cosine re-rank only those (one equi-join
    on id fetches the shortlist's full vectors).  Same output contract
    as :func:`.similarity.brute_force_topk`.

    This path SCANS every code per query (chunked so no single ADC
    group exceeds ~corpus/adc_chunks rows - see
    :meth:`PqCodebook.adc_shortlist`); it is the right tool up to a
    scan budget.  Beyond that, use :func:`ivf_pq_topk`, which bounds
    the candidates per query to the probed IVF lists."""
    cb = codebook or PqCodebook.fit(
        corpus, dim, m=m, k=n_codes, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    if codes is None:
        codes = cb.encode(corpus, id_col, vec_col)
    short = cb.adc_shortlist(codes, queries, r=shortlist, id_col=id_col,
                             vec_col=vec_col, chunks=adc_chunks)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    return _exact_rerank(short, c, q, k)


def _exact_rerank(short: DataFrame, corpus_vecs: DataFrame,
                  queries_named: DataFrame, k: int) -> DataFrame:
    """Exact-cosine top-k over an ADC shortlist.  The shortlist is Q x r
    rows - broadcast it so the corpus-vector fetch streams the corpus
    without a shuffle."""
    rescored = (
        corpus_vecs.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(queries_named), "query_id")
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_pq_topk(index, codebook: PqCodebook, queries: DataFrame,
                k: int = 10, nprobe: int = 10, shortlist: int = 100,
                id_col: str = "vec_id", vec_col: str = "embedding",
                codes: DataFrame | None = None) -> DataFrame:
    """The FAISS-style IVF-PQ composition: IVF probes bound WHICH
    candidates each query sees (nprobe lists of an
    :class:`.similarity.IvfIndex`), PQ codes bound what each candidate
    COSTS to score and ship (m bytes instead of a full vector), and the
    exact re-rank restores metric fidelity on the shortlist.

    Plan shape: the probe table (Q x nprobe rows) is broadcast against
    the encoded lists, so the corpus-side codes never shuffle into the
    join; the only wide exchange is the grouped ADC scoring, whose rows
    carry codes instead of vectors - the shuffle-width win that makes
    this the 100 TB formulation.  Each ADC group is one query's probed
    candidates: ~N * nprobe / nlist rows regardless of corpus size."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    q_lists = index._probe_lists(q, nprobe)
    if codes is None:
        # one-shot convenience; recurring workloads should encode once
        # (keep=("list_id",)) and persist, passing the frame back here
        codes = codebook.encode(
            index.assigned, id_col="neighbor_id", vec_col="c_vec",
            keep=("list_id",),
        )
    codes = codes.withColumnsRenamed({"id": "neighbor_id"})
    paired = (
        codes.join(F.broadcast(q_lists), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "codes")
    )
    short = codebook._adc_topr(paired, shortlist)
    c = index.assigned.select("neighbor_id", "c_vec")
    return _exact_rerank(short, c, q, k)
