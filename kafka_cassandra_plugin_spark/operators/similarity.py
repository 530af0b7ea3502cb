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
        if len(xs) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype="float64")
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
# Corpus-adaptive index geometry
# --------------------------------------------------------------------------

def adaptive_n_planes(corpus_rows: int, target_bucket: int = 32,
                      floor: int = 6, cap: int = 16) -> int:
    """LSH bit-width sized to the corpus: enough sign bits that the
    expected bucket holds ~``target_bucket`` vectors (candidates per
    probe ~ N / 2^planes).  Fixed geometry is the classic LSH scale bug:
    buckets grow linearly with the corpus, so candidate work grows as
    N_queries x N_corpus — measured 71x wall at a 10x scale-up before
    this rule existed.  ``cap`` bounds the hamming-probe fanout
    (masks ~ C(planes, 2)) so the probe expression stays codegen-able."""
    # integer arithmetic, not ceil(log2(...)) (round-15): the portable
    # LSH oracle re-derives this width in DuckDB from count(*), and the
    # smallest-p-with-2^p*target >= N rule is exactly the same integer
    # on every engine, where a float log2 could disagree by an ulp at
    # power-of-two boundaries (equivalent to the old formula for every
    # input)
    x = max(2, corpus_rows)
    planes = 0
    while (1 << planes) * target_bucket < x:
        planes += 1
    return max(floor, min(cap, planes))


def adaptive_nlist(corpus_rows: int, target_list: int = 125,
                   floor: int = 16, cap: int = 4096) -> int:
    """IVF list count sized to the corpus: ~``target_list`` vectors per
    inverted list, so candidates per query stay O(target_list x nprobe)
    at ANY corpus size (the FAISS sizing rule).  A fixed nlist makes
    every probed list grow with the corpus — measured 40x wall at a 10x
    scale-up before this rule existed.  ``cap`` bounds the KMeans fit
    cost; past it, recall is bought with nprobe instead."""
    return max(floor, min(cap, corpus_rows // target_list))


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
    for recall@10 >= 0.9 on the 2k-vector synthetic corpus (measured
    1.00; tests/test_llm_ops.py) while keeping corpus-side fanout at one
    row per table.  Size ``n_planes`` to the corpus with
    :func:`adaptive_n_planes` so candidates per probe (~ N / 2^planes)
    stay bounded - recall is then bought with ``n_tables`` /
    ``probe_hamming``, which scale the tiny query side only (measured at
    a 10x scale-up: adaptive bits cut wall 71x -> ~7x with recall@10
    0.88)."""
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
    table_base = (np.arange(n_tables, dtype="int64") << n_planes)  # (T,)

    # XOR masks for multi-probe: every bit pattern with <= probe_hamming
    # bits set; mask 0 = the home bucket, always probed.
    probe_masks = np.array(
        [0] + ([m for m in range(1, 2**n_planes)
                if bin(m).count("1") <= probe_hamming] if multiprobe else []),
        dtype="int64",
    )
    home_only = np.zeros(1, dtype="int64")

    def keys_udf(masks: np.ndarray):
        """(table, bucket) pairs encoded as ONE bigint key per probe
        (tbl << n_planes | bucket) and emitted straight from the sketch
        einsum.  The earlier formulation built the probe fanout as an
        n_tables x (1 + |masks|) struct-array *expression* - at the
        corpus-adaptive bit-widths (10+ planes -> hundreds of structs)
        it blew the JVM's 64KB codegen method limit and collapsed the
        whole stage to interpreted eval, measured 4x wall on the
        candidate join.  Vectorized here, the fanout is numpy broadcast
        work and the plan carries a single explode over array<long>."""

        @F.pandas_udf("array<long>")
        def _keys(vs: pd.Series) -> pd.Series:
            X = np.stack(vs.to_numpy()).astype("float64")          # (n, D)
            signs = np.einsum("nd,tpd->ntp", X, planes_np) >= 0     # (n, T, P)
            packed = (signs * weights).sum(axis=2).astype("int64")  # (n, T)
            probed = packed[:, :, None] ^ masks[None, None, :]      # (n, T, M)
            keys = (table_base[None, :, None] | probed).reshape(len(X), -1)
            return pd.Series(list(keys))

        return _keys

    def sketch_exploded(df: DataFrame, masks: np.ndarray) -> DataFrame:
        # (id, tb_key) ONLY - vectors do not ride the probe fanout.
        # Shipping the vector with every probe row multiplied candidate-
        # join shuffle bytes by the probe count x vector width; instead
        # the join runs on slim (id, key) rows and vectors re-attach by
        # id once per DISTINCT candidate pair below.
        base = ensure_min_parallelism(df).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        )
        return base.select(
            "id", F.explode(keys_udf(masks)(F.col("vec"))).alias("tb_key")
        )

    cs = sketch_exploded(corpus, home_only).withColumnRenamed("id", "neighbor_id")
    qs = sketch_exploded(queries, probe_masks).withColumnRenamed("id", "query_id")
    pairs = (
        qs.join(cs, ["tb_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cands = pairs.join(F.broadcast(q_vecs), "query_id").join(c_vecs, "neighbor_id")
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
# Portable (oracle-exact) RP-LSH: Rademacher planes + fold-ordered math
# --------------------------------------------------------------------------

def rademacher_planes(dim: int, n_planes: int, n_tables: int,
                      salt: str = "rp") -> list[list[list[float]]]:
    """±1.0 hyperplanes derived from md5 - the vector analogue of
    :func:`.dedup.portable_hash52`: every engine (and every reader of
    the oracle SQL) can re-derive sign(t,p,d) = +1 iff
    ``int(md5(f"{salt}:{t}:{p}:{d}")[:13], 16)`` is even.  Rademacher
    projections are a standard random-projection family (the sign-LSH
    guarantee needs only symmetric zero-mean components), and ±1.0
    multiplication is EXACT in IEEE double - so the sketch dot is a
    pure ordered sum of the input components, bit-identical across
    engines when both fold left-to-right."""
    import hashlib

    def sign(t: int, p: int, d: int) -> float:
        h = hashlib.md5(f"{salt}:{t}:{p}:{d}".encode()).hexdigest()
        return 1.0 if int(h[:13], 16) % 2 == 0 else -1.0

    return [[[sign(t, p, d) for d in range(dim)]
             for p in range(n_planes)] for t in range(n_tables)]


def fold_dot_pandas(vec_col, consts: np.ndarray) -> Column:
    """All K constant-vector dots of an embedding column in one Arrow
    batch, each computed in LEFT-FOLD order: ``acc = 0; for d: acc +=
    v[d]*c[k][d]`` vectorized ACROSS rows but sequential across
    dimensions - elementwise IEEE double adds in exactly the order
    ``((0 + v0*c0) + v1*c1) + ...``, so the result is bit-identical to
    the interpreted :func:`dot` fold AND to DuckDB's
    ``list_reduce(list_transform(...), (a,b) -> a+b)``, at numpy speed
    (D vectorized adds instead of N*K*D interpreted lambda calls).
    Returns ``array<double>`` of length K."""
    C = np.ascontiguousarray(consts, dtype="float64")  # (K, D)

    @F.pandas_udf("array<double>")
    def _dots(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype=object)
        X = np.stack(vs.to_numpy()).astype("float64")  # (n, D)
        acc = np.zeros((len(X), C.shape[0]))
        for d in range(C.shape[1]):
            acc += X[:, d:d + 1] * C[None, :, d]
        return pd.Series(list(acc))

    return _dots(vec_col)


def cosine_foldexact_pandas(a, b, once: bool = False) -> Column:
    """Cosine over Arrow batches with fold-ordered sums: bit-identical
    to the interpreted :func:`cosine` (and the DuckDB oracle's
    list_reduce form) but vectorized across rows.  Use in hash-matched
    paths where :func:`cosine_pandas`'s pairwise/SIMD summation would
    drift the last ulp.

    ``once=True`` marks the UDF non-deterministic (it IS deterministic;
    the marking only constrains the optimizer) so a filter placed
    directly on the output column cannot duplicate the evaluation -
    guide §4.4: the dedup filter-sandwich sites
    (``.withColumn("cos", ...).filter(cos >= t)``) planned TWO
    ArrowEvalPython nodes for one kernel, every row paying the Python
    boundary once and every survivor twice.  Window-ranked sites
    (filter on row_number, not on the score column) never duplicate
    and stay at the default, keeping full optimizer freedom there."""

    @F.pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype="float64")
        xa = np.stack(xs.to_numpy()).astype("float64")
        ya = np.stack(ys.to_numpy()).astype("float64")
        dots = np.zeros(len(xa))
        na = np.zeros(len(xa))
        nb = np.zeros(len(xa))
        for d in range(xa.shape[1]):  # fold order across dims
            dots += xa[:, d] * ya[:, d]
            na += xa[:, d] * xa[:, d]
            nb += ya[:, d] * ya[:, d]
        # mirror cosine()'s guard SHAPE: (sqrt(na) > 0) & (sqrt(nb) > 0),
        # not (denom > 0).  When two subnormal norms' product underflows
        # to 0 this yields d/0.0 = inf - matching the DuckDB oracle's
        # UNGUARDED division (_COS_SQL), which is what the hash-match
        # checks; the interpreted cosine() itself would return NULL
        # there (Spark non-ANSI double/0 is NULL, violating its own
        # "never NaN/null" note).  The divergence needs norms < ~1e-162
        # on both sides - unreachable with real embeddings
        sna, snb = np.sqrt(na), np.sqrt(nb)
        ok = (sna > 0) & (snb > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(ok, dots / (sna * snb), 0.0)
        return pd.Series(out)

    if once:
        _cos = _cos.asNondeterministic()
    return _cos(a, b)


def ivf_topk_portable(corpus: DataFrame, queries: DataFrame, k: int = 10,
                      nprobe: int = 10, sample_mod: int = 125,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      assigned: DataFrame | None = None,
                      sample_cap: int | None = None) -> DataFrame:
    """IVF-flat top-k whose EVERY arithmetic step is cross-engine exact,
    so a static SQL oracle re-derives the cell assignment, the probe
    set, the candidate enumeration AND the re-rank scores - the
    hash-matched IVF row (round-13 verdict #2), completing the ANN
    family's value verification (brute force and RP-LSH went first).

    The coarse quantizer is a DETERMINISTIC SEEDED SAMPLE: the corpus
    vectors with ``id % sample_mod == 0`` ARE the centroids (sample
    initialization without Lloyd iterations - a legitimate coarse
    quantizer; IVF correctness never depends on centroid optimality,
    only recall does, and the geometry gate in tests measures that).
    One-in-125 sampling reproduces the learned index's corpus-adaptive
    ~125-vectors-per-list geometry while staying expressible as a
    static SQL predicate - an ITERATIVE KMeans fit cannot ride a
    static oracle string, which is exactly why the learned
    :class:`IvfIndex` row stayed rows-only for twelve rounds.  The
    learned index remains the at-scale default (better-balanced lists
    -> tighter probe bounds); this is its value-verification twin, the
    ``rp_lsh_topk_portable`` precedent applied to IVF.

    Plan shape (scale posture identical to the learned IVF probe):
    assignment is one broadcast of the centroid table against the
    corpus with a map-side ``max_by`` argmax (one shuffle, partial
    aggregation; the corpus never re-shuffles per query), probing is
    the same broadcast against the (small) query set, candidates are a
    cell equi-join bounded by nprobe/nlist of the corpus, and only
    candidates pay the exact fold-cosine re-rank.

    ``assigned``: a precomputed (cid, neighbor_id, n_vec) cell table
    (the build-once/probe-many handle - callers that probe repeatedly
    checkpoint :func:`ivf_portable_assign`'s output once).  It must
    have been built from IDENTICALLY-capped centroids: an ``assigned``
    from uncapped cents combined with a capped probe set leaves the
    over-cap cells unreachable (their member vectors silently
    unsearchable), so supplying BOTH ``assigned`` and ``sample_cap``
    runs a one-job consistency check (max cid < cap) and raises on
    mismatch.

    ``sample_cap``: also require ``id < sample_cap`` of the sampled
    centroids - the growth governor (round-13 sf10 campaign).  Without
    it the quantizer grows with the corpus (nlist = N/sample_mod), so
    assignment is O(N^2/sample_mod) fold-exact cosine - measured
    2.2 s -> 246 s for a 10x corpus.  A capped sample pins the
    quantizer the way a served index pins its trained quantizer to a
    fit snapshot: assignment becomes O(N * cap/sample_mod) (linear),
    and only per-list candidate counts grow with the corpus.  Callers
    choose the cap so the gated-scale results are unchanged (every
    vec_id < 2000 at sf0.1, so cap=2000 is the identity there).
    """
    cents = corpus.filter(F.col(id_col) % sample_mod == 0)
    if sample_cap is not None:
        cents = cents.filter(F.col(id_col) < sample_cap)
    cents = cents.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cent_vec")
    )
    if assigned is None:
        assigned = ivf_portable_assign(corpus, cents, id_col, vec_col)
    elif sample_cap is not None:
        # consistency check (two small jobs on this rare combination):
        # a precomputed cell table built from UNCAPPED or differently-
        # sampled/seeded cents paired with a capped probe set leaves
        # cells unreachable (or probes cells that don't exist) - wrong
        # top-k with no error.  max-cid alone was necessary but not
        # sufficient (round-14 advice): a differently-sampled build
        # whose max cid lands under the cap still slipped through, so
        # the DISTINCT-cid set of the cell table is fingerprinted
        # (count + order-free xxhash64 fold) against the capped
        # centroid set and any mismatch raises
        fp = (
            assigned.select("cid").distinct()
            .agg(F.count("cid").alias("n"),
                 F.expr("bit_xor(xxhash64(cid))").alias("h"),
                 F.max("cid").alias("m"))
            .collect()[0]
        )
        if fp["m"] is not None and fp["m"] >= sample_cap:
            raise ValueError(
                f"ivf_topk_portable: assigned= contains cell id "
                f"{fp['m']} >= sample_cap={sample_cap}; the cell table "
                "must be built from identically-capped centroids or "
                "its cells are unreachable by the capped probe set"
            )
        cfp = (
            cents.select("cid")
            .agg(F.count("cid").alias("n"),
                 F.expr("bit_xor(xxhash64(cid))").alias("h"))
            .collect()[0]
        )
        if (fp["n"], fp["h"]) != (cfp["n"], cfp["h"]):
            raise ValueError(
                "ivf_topk_portable: assigned= cell-id set does not "
                f"match the capped centroid set ({fp['n']} cells vs "
                f"{cfp['n']} centroids, fingerprint "
                f"{fp['h']}!={cfp['h']}): the cell table was built "
                "from differently-sampled or differently-capped "
                "centroids and would silently return wrong top-k"
            )
    # every score site is the ARROW-BATCHED fold-exact cosine (the
    # rp_lsh_topk_portable precedent: same doubles as the interpreted
    # cosine() and the DuckDB oracle, vectorized across rows) - the
    # interpreted-HOF form here cost ~12 s at sf0.1 / 141 s at sf1 for
    # the identical plan (round-13 campaign)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("p_score").desc(), F.col("cid")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("p_score", cosine_foldexact_pandas(
            F.col("q_vec"), F.col("cent_vec")))
        .withColumn("p_rn", F.row_number().over(pw))
        .filter(F.col("p_rn") <= nprobe)
        .select("query_id", "q_vec", "cid")
    )
    cands = probes.join(assigned, "cid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("score", cosine_foldexact_pandas(
            F.col("q_vec"), F.col("n_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_portable_assign(corpus: DataFrame, cents: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(cid, neighbor_id, n_vec): each corpus vector's nearest-centroid
    cell under fold-exact cosine, ties to the smaller centroid id (the
    same (score DESC, id ASC) convention as every ranked operator here,
    so a SQL ``row_number() = 1`` reproduces it).  ``max_by`` over a
    (score, -cid) ordering struct keeps the argmax map-side partial -
    no N x nlist window shuffle."""
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    # Arrow-batched fold-exact cosine (NOT the interpreted HOF form):
    # same doubles, vectorized - see ivf_topk_portable's note
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "a_score", cosine_foldexact_pandas(
            F.col("n_vec"), F.col("cent_vec"))
    )
    return scored.groupBy("neighbor_id").agg(
        F.first("n_vec").alias("n_vec"),
        F.max_by(
            F.col("cid"),
            F.struct(F.col("a_score"), (-F.col("cid")).alias("nc")),
        ).alias("cid"),
    ).select("cid", "neighbor_id", "n_vec")


def rp_lsh_topk_portable(corpus: DataFrame, queries: DataFrame, dim: int,
                         k: int = 10, n_planes: int = 6, n_tables: int = 4,
                         probe_hamming: int = 1, salt: str = "rp",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """:func:`rp_lsh_topk` with every arithmetic step cross-engine
    exact, so a SQL oracle can re-derive buckets, candidates AND scores
    (the round-10 answer to "oracle one ANN row"): Rademacher md5
    planes (:func:`rademacher_planes`), fold-ordered sketch dots
    (:func:`fold_dot_pandas`), fold-ordered cosine re-rank
    (:func:`cosine_foldexact_pandas`).  Geometry is FIXED (not
    corpus-adaptive) because the oracle SQL is a static string; the
    adaptive :func:`rp_lsh_topk` stays the at-scale default.  Same
    plan shape: map-side sketch, (table,bucket)-key equi-join, exact
    re-rank of candidates only - no cross join anywhere."""
    planes = np.array(rademacher_planes(dim, n_planes, n_tables, salt),
                      dtype="float64")  # (T, P, D)
    flat = planes.reshape(n_tables * n_planes, dim)

    def bucket_expr(t: int):
        # pack sign bits for table t - column arithmetic over the K
        # dots (K = T*P, tiny)
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            bucket = bucket + F.when(
                F.col("__dots")[t * n_planes + p] >= 0,
                F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
        return bucket

    def key_exprs(masks: list[int]) -> list:
        # probe keys from the MATERIALIZED per-table bucket columns:
        # inlining the 24-branch bucket tree into each of the
        # |masks| x n_tables keys (the previous form) built a ~2,600-
        # node expression whose codegen+eval dominated the sketch stage
        # - measured 7.5 s -> sub-second on the tagged frame after this
        # split; each key is now two nodes over __b{t}
        return [
            F.lit(t * 2 ** n_planes).cast("long")
            + F.col(f"__b{t}").bitwiseXOR(F.lit(m).cast("long"))
            for t in range(n_tables) for m in masks
        ]

    probe_masks = [m for m in range(2 ** n_planes)
                   if bin(m).count("1") <= probe_hamming]
    # ONE sketch pass over corpus-union-queries (side-tagged), not one
    # Python stage per side: the sketch kernel is per-row independent,
    # so batching both sides together is bit-identical, and the probe
    # fanout stays a per-side column expression over the shared dots.
    # At bench scale the saving is a whole UDF stage's fixed overhead;
    # at 100 TB it is one corpus scan instead of... still one - the
    # query side is tiny by assumption either side of this choice.
    tagged = (
        ensure_min_parallelism(corpus).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
            F.lit(False).alias("__q"))
        .unionByName(queries.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
            F.lit(True).alias("__q")))
        .withColumn("__dots", fold_dot_pandas(F.col("vec"), flat))
        .withColumns({f"__b{t}": bucket_expr(t) for t in range(n_tables)})
        .select("id", "__q", F.explode(
            F.when(F.col("__q"), F.array(*key_exprs(probe_masks)))
            .otherwise(F.array(*key_exprs([0])))).alias("tb_key"))
        # both candidate-join sides read this frame (a diamond): pin it
        # so the sketch UDF runs exactly once - the rows are slim
        # (id, bool, key), bounded by corpus + |probes| x queries.
        # CAVEATS (portable bench/oracle path only): localCheckpoint()
        # is EAGER (building this plan runs a Spark job) and its blocks
        # are unrecoverable on executor loss / dynamic allocation, and
        # stay pinned until the driver GCs the frame (the round-5b
        # pinned-blocks lesson).  The corpus-adaptive rp_lsh_topk stays
        # the at-scale default; a long-lived-driver deployment of THIS
        # path should swap in persist(MEMORY_AND_DISK)+count with an
        # explicit unpersist at the call site.
        .localCheckpoint()
    )
    cs = tagged.filter(~F.col("__q")).select(
        F.col("id").alias("neighbor_id"), "tb_key")
    qs = tagged.filter(F.col("__q")).select(
        F.col("id").alias("query_id"), "tb_key")
    pairs = (
        qs.join(cs, ["tb_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_vecs = queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("q_vec"))
    c_vecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("c_vec"))
    scored = (
        pairs.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn("score",
                    cosine_foldexact_pandas(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id"))
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

    def list_stats(self) -> DataFrame:
        """(list_id, n_vecs, share) - the index-balance diagnostic.

        Probe cost is ``sum(size of probed lists)``; it stays at
        ~nprobe/nlist of the corpus only while assignment is balanced.
        A degenerate quantizer fit (fit sample unrepresentative of the
        full corpus, heavily duplicated vectors, adversarial inserts
        after build) concentrates rows in few lists and probe cost
        silently degrades toward a scan with NO correctness signal -
        recall stays fine, wall time doesn't.  At 100 TB this is the
        number to alert on: re-fit when ``max(share) >> 1/nlist``.
        One partial+final aggregate over the assigned table; no
        driver-side loop."""
        counts = self.assigned.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n_vecs")
        )
        total = F.sum("n_vecs").over(Window.partitionBy())
        return counts.select(
            "list_id", "n_vecs",
            F.round(F.col("n_vecs") / total, 6).alias("share"),
        )

    def assign(self, batch: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
        """(neighbor_id, c_vec, list_id) for ``batch`` under the FROZEN
        quantizer - the standard IVF insert: new vectors go to their
        nearest existing centroid; nothing refits.  Reuses the
        vectorized probe kernel with nprobe=1, so assignment and
        probing stay metric-aligned by construction (the same ranking
        that picks a query's lists picks an insert's home list).
        Batch-sized map work only - the stored corpus is not touched."""
        b = batch.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        return self._probe_lists(b, nprobe=1).select(
            F.col("query_id").alias("neighbor_id"),
            F.col("q_vec").alias("c_vec"),
            "list_id",
        )

    def add_batch(self, batch: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> "IvfIndex":
        """Grow the index with ``batch`` (continuous-ingest companion to
        :meth:`.dedup_index.MinHashIndex.add_batch`): assign under the
        frozen quantizer, then append - partitioned parquet appends for
        a disk-backed index, a union for an in-memory one.  Same
        at-least-once tolerance as the MinHash index: a replayed append
        duplicates rows, which :meth:`compact` removes (dedup on
        neighbor_id) while rewriting the accreted small files.  The
        quantizer does NOT refit - watch :meth:`list_stats` for the
        balance drift that says re-fit (frozen centroids + drifting
        data concentrate inserts in few lists; probe cost degrades with
        no correctness signal)."""
        assigned_new = self.assign(batch, id_col, vec_col)
        if self.path is None:
            return IvfIndex(
                self.assigned.unionByName(assigned_new), self.centroids
            )
        assigned_new.write.mode("append").partitionBy("list_id").parquet(
            f"{self.path}/assigned"
        )
        return IvfIndex.load(self.assigned.sparkSession, self.path)

    def compact(self, target_mb: int = 256) -> "IvfIndex":
        """Rewrite the assigned table: drop duplicate ``neighbor_id``
        rows (replayed add_batch appends) and coalesce the per-append
        small files to ~``target_mb`` per partition.  Disk-backed
        indexes only; same write-sibling/swap discipline as
        :meth:`MinHashIndex.compact` - run between batches, never
        concurrently with readers.  Restores exact semantics after a
        replay: a duplicated neighbor occupies ranks pre-compact;
        post-compact probe results equal those of a never-replayed
        index (pinned by test)."""
        if self.path is None:
            raise ValueError("compact() needs a disk-backed index "
                             "(save() it first)")
        from ..fsutil import _fs_and_path, recover_fold_swap, staged_replace

        spark = self.assigned.sparkSession
        src = f"{self.path}/assigned"
        # heal any interrupted prior swap BEFORE statting or reading:
        # a retry on the same handle after a mid-swap failure would
        # otherwise stat a deleted dir (raw FileNotFound) or execute a
        # lazy plan whose file index points at pre-swap files.  After
        # recovery, re-read the table fresh rather than trusting
        # self.assigned's captured listing - the other stores' compact
        # paths reload the same way.
        recover_fold_swap(spark, src)
        assigned = spark.read.schema(self.assigned.schema).parquet(src)
        fs, hsrc, _ = _fs_and_path(spark, src)
        total_bytes = fs.getContentSummary(hsrc).getLength()
        nfiles = max(1, -(-total_bytes // (target_mb << 20)))
        staged_replace(
            spark, src,
            lambda tmp: (
                assigned.dropDuplicates(["neighbor_id"])
                .repartition(int(nfiles), "list_id")
                .write.mode("overwrite")
                .partitionBy("list_id")
                .parquet(tmp)
            ),
        )
        return IvfIndex.load(spark, self.path)

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
        from ..fsutil import recover_tables

        # heal an interrupted compact() swap before resolving file lists
        recover_tables(spark, path, ("assigned",))
        assigned = spark.read.parquet(f"{path}/assigned").select(
            "neighbor_id", "c_vec", F.col("list_id").cast("int").alias("list_id")
        )
        centroids = spark.read.parquet(f"{path}/centroids")
        return cls(assigned, centroids, path=path)

    def _probe_lists(self, q: DataFrame, nprobe: int) -> DataFrame:
        """(query_id, q_vec, list_id) for each query's ``nprobe`` nearest
        lists - ranked by the SAME metric KMeans assigns with (Euclidean
        on unit vectors), so probing and assignment agree.

        The centroid table rides into one Arrow-vectorized UDF as a
        numpy matrix (bounded by nlist x dim - driver-collected once per
        plan, NOT per row): each Arrow batch of queries ranks all lists
        with a single BLAS matmul.  The previous formulation - crossJoin
        against a broadcast centroid table with a higher-order-function
        distance expression per (query, centroid) row plus a window rank
        - re-evaluated the interpreted unit-normalize/zip_with/aggregate
        chain nlist times per query and was measured at 116 s for 2000
        queries x 160 lists (vs < 1 s vectorized); it also collapsed the
        whole plan to interpreted eval when the expression blew codegen."""
        cent = sorted(
            (r["list_id"], r["centroid"])
            for r in self.centroids.collect()
        )
        list_ids = np.array([c[0] for c in cent], dtype="int64")
        C = np.array([c[1] for c in cent], dtype="float64")  # (L, D)
        c2 = (C * C).sum(axis=1)                             # |c|^2 term
        n_take = min(nprobe, len(list_ids))

        @F.pandas_udf("array<int>")
        def probe(vs: pd.Series) -> pd.Series:
            X = np.stack(vs.to_numpy()).astype("float64")
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            np.divide(X, norms, out=X, where=norms > 0)
            # ||u - c||^2 = 1 + |c|^2 - 2 u.c  (u unit) - rank by this,
            # tie-break on list_id, exactly like the expression form
            d = c2[None, :] - 2.0 * (X @ C.T)
            order = np.lexsort((list_ids[None, :].repeat(len(X), 0), d), axis=1)
            picked = list_ids[order[:, :n_take]].astype("int32")
            return pd.Series(list(picked))

        return q.select(
            "query_id", "q_vec", F.explode(probe(F.col("q_vec"))).alias("list_id")
        )

    def topk(self, queries: DataFrame, k: int = 10, nprobe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probes: DataFrame | None = None) -> DataFrame:
        """``probes``: optional precomputed (query_id, list_id) frame.
        The oracle path exports the probe choice to DuckDB as a literal
        table; feeding the SAME materialized rows back here guarantees
        both engines score identical candidates even if the BLAS probe
        ranking would tie-break differently across evaluations (the
        per-row summation order of X @ C.T can vary with Arrow batch
        composition)."""
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        q_lists = (
            q.join(probes.select("query_id", "list_id"), "query_id")
            if probes is not None else self._probe_lists(q, nprobe)
        )
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
            # fold-ordered Arrow kernel (round-10): same vectorized
            # speed class as the numpy-order cosine_pandas, but
            # bit-identical to the interpreted fold and DuckDB's
            # list_reduce - which lets the IVF probe/re-rank pipeline
            # be VALUE-verified against a DuckDB oracle on exported
            # probe/cell literal tables (tests/test_llm_ops.py::
            # TestIvfTopkOracle), not recall-gated alone
            .withColumn("score", cosine_foldexact_pandas(
                F.col("q_vec"), F.col("c_vec")))
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
