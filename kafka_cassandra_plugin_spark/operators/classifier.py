"""Quality classifier: hashed-ngram logistic regression (fastText-style).

The quality-filter stage every frontier-model data pipeline documents
(GPT-3, Brown et al. 2020 §A; LLaMA, Touvron et al. 2023): train a
cheap linear classifier to distinguish a REFERENCE corpus (wiki/books-
like "positive" text) from the raw crawl, then keep raw documents the
classifier scores as reference-like.  fastText (Joulin et al. 2016,
arXiv:1607.01759) is the canonical architecture — a linear model over
hashed bag-of-ngram features; logistic regression over the same
features is its binary special case.

Split of responsibility (same philosophy as the IVF/KMeans and PQ
rows): the FIT is a bounded iterative optimization delegated to Spark
MLlib's LogisticRegression — seeded data, property-gated (planted
separable corpora must classify >= threshold), not SQL-expressible —
while everything downstream of the fitted coefficients is pure
DataFrame arithmetic and DuckDB-oracle-verifiable: the model IS a
(bucket, weight) table plus an intercept, and scoring is

    p(doc) = sigmoid(b + sum over doc's buckets of w[bucket] * x[bucket])

with x the log1p'd occurrence count — one explode -> groupBy(doc,
bucket) -> BROADCAST join against the <= B-row weight table -> one
per-doc sum.  Zero Python UDFs anywhere; even the fit features are
assembled JVM-side (counts -> sorted gaps-run flatten -> dense array
-> ``array_to_vector``).

Features reuse :func:`.selection.hashed_ngram_buckets` — the SAME
hashed unigram+bigram featurization DSIR uses, so a pipeline computes
the explode once for both ops.  ``hash_fn='xxhash64'`` at scale,
``'md5'`` (portable) for the oracle twin.

Scale shape: the fit corpus is CAPPED by deterministic sample (a
linear probe converges on a modest sample — the IVF fit-cap
argument); scoring is the production path and touches the full
corpus exactly once.  B (default 4096) bounds the dense fit vector at
32 KB/doc and the broadcast weight table at B rows.

Fit-cost notes: the dense assembly is the SORTED GAPS-RUN flatten —
O(B) per doc.  The tempting per-index form ``transform(sequence(0,
B-1), i -> coalesce(m[i], 0))`` is O(B x nnz) per doc because a
Catalyst map lookup is a linear scan (measured: 238 s vs ~15 s for
the whole sf0.1 fit — the D10 interpreted-HOF lesson's map-typed
sibling).  And each LBFGS iteration costs ~2 Spark stages of fixed
overhead, so ``max_iter``/``tol`` default loose: a quality FILTER
needs a separating direction, not 1e-6 convergence.

Reference provenance: no counterpart in /root/reference (string KV
layer, CassandraListenerRegistry.scala:27); LLM-pipeline closure
(SURVEY §2.5 D24).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .selection import hashed_ngram_buckets

__all__ = ["QualityClassifier"]


def _doc_features(docs: DataFrame, text_col: str, id_col: str,
                  buckets: int, ng_max: int, hash_fn: str) -> DataFrame:
    """(id, bucket, x) with x = log1p(occurrence count) — the sublinear
    tf damping fastText applies; one explode + one groupBy."""
    occ = hashed_ngram_buckets(docs, text_col, id_col, buckets, ng_max,
                               hash_fn)
    return (
        occ.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(id_col, "bucket",
                F.log1p(F.col("cnt").cast("double")).alias("x"))
    )


class QualityClassifier:
    """A fitted quality model: ``weights`` (bucket, weight) DataFrame +
    ``intercept`` + the featurization config, with save/load.  The
    coefficient vector is bounded by B (driver-side meta, like KMeans
    centroids)."""

    def __init__(self, weights: DataFrame, intercept: float,
                 buckets: int, ng_max: int, hash_fn: str):
        self.weights = weights
        self.intercept = float(intercept)
        self.buckets = buckets
        self.ng_max = ng_max
        self.hash_fn = hash_fn

    # -- fit ---------------------------------------------------------------

    @classmethod
    def fit(cls, pos_docs: DataFrame, neg_docs: DataFrame,
            text_col: str = "text", id_col: str = "doc_id",
            buckets: int = 4096, ng_max: int = 2,
            hash_fn: str = "xxhash64", reg: float = 1e-4,
            max_iter: int = 20, tol: float = 1e-4,
            fit_cap: int = 100_000,
            seed: int = 42) -> "QualityClassifier":
        """Label pos=1 / neg=0, assemble dense hashed-ngram vectors
        JVM-side, fit MLlib LogisticRegression (L2 ``reg``,
        ``standardization=False`` so coefficients live in feature
        units and export cleanly).  ``fit_cap`` bounds each side by a
        deterministic per-class sample — the linear-probe-converges-
        on-a-sample argument; scoring still sees every document."""
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.functions import array_to_vector

        def capped(docs: DataFrame, label: float, tag: str) -> DataFrame:
            n = docs.count()
            if n > fit_cap:
                docs = docs.sample(fraction=fit_cap / n, seed=seed)
            # internal fit key prefixed per side: pos and neg corpora
            # routinely carry their OWN sequential doc_ids, and a raw
            # id_col key would merge the two sides' features for every
            # colliding id while keeping both labels — silent garbage
            return docs.select(
                F.concat(F.lit(tag), F.col(id_col).cast("string"))
                .alias("__fit_id"),
                F.col(text_col),
                F.lit(label).alias("label"),
            )

        # localCheckpoint: `labeled` fans into TWO plan branches (the
        # feature assembly and the label join), and docs.sample() would
        # otherwise be free to re-evaluate per branch - with
        # nondeterministically-partitioned inputs the two evaluations
        # can select DIFFERENT rows when fit_cap triggers, mispairing
        # labels with features.  Materializing the capped sample once
        # pins a single draw.
        labeled = capped(pos_docs, 1.0, "p:").unionByName(
            capped(neg_docs, 0.0, "n:")).localCheckpoint()
        feats = _doc_features(labeled, text_col, "__fit_id", buckets,
                              ng_max, hash_fn)
        # dense assembly by SORTED gap runs: for entries
        # [(b1,x1),(b2,x2),...] emit zeros(b1) ++ [x1] ++
        # zeros(b2-b1-1) ++ [x2] ++ ... ++ trailing zeros — O(B) per
        # doc.  (The tempting per-index form `transform(sequence(0,B-1),
        # i -> coalesce(m[i], 0))` is O(B x nnz): Catalyst map lookup
        # is a linear scan — measured 238 s vs ~2 s at sf0.1.)
        assembled = (
            feats.groupBy("__fit_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("bucket", "x"))).alias("e"))
            .select(
                "__fit_id",
                array_to_vector(
                    F.concat(
                        F.flatten(F.transform(
                            "e",
                            lambda s, i: F.concat(
                                F.array_repeat(
                                    F.lit(0.0),
                                    s["bucket"]
                                    - F.coalesce(
                                        F.get("e", i - F.lit(1))["bucket"],
                                        F.lit(-1),
                                    )
                                    - F.lit(1),
                                ),
                                F.array(s["x"]),
                            ),
                        )),
                        F.array_repeat(
                            F.lit(0.0),
                            F.lit(buckets - 1)
                            - F.get("e", F.size("e") - F.lit(1))["bucket"],
                        ),
                    )
                ).alias("features"),
            )
        )
        # left join + zero-vector fill: a featureless doc still trains
        # (its label pulls the intercept, exactly as it should).  The
        # dense side must NEVER broadcast — Catalyst's post-aggregation
        # size estimate wildly undercounts the 8B-per-bucket vectors
        # (fit_cap x 32 KB real width; observed driver OOM at sf1) —
        # so the join is pinned to sort-merge.
        train = (
            labeled.select("__fit_id", "label")
            .join(assembled.hint("merge"), "__fit_id", "left")
            .withColumn(
                "features",
                F.coalesce(
                    "features",
                    array_to_vector(
                        F.array_repeat(F.lit(0.0), F.lit(buckets))),
                ),
            )
        )
        # loose defaults on purpose: each LBFGS iteration is ~2 Spark
        # stages of fixed overhead on a capped sample, and a quality
        # FILTER needs a separating direction, not 1e-6 convergence
        model = LogisticRegression(
            maxIter=max_iter, regParam=reg, tol=tol,
            standardization=False
        ).fit(train)
        coef = model.coefficients.toArray()
        spark = pos_docs.sparkSession
        weights = spark.createDataFrame(
            [(int(i), float(w)) for i, w in enumerate(coef) if w != 0.0],
            "bucket int, weight double",
        )
        return cls(weights, model.intercept, buckets, ng_max, hash_fn)

    # -- persist -----------------------------------------------------------

    def save(self, path: str) -> None:
        """Meta lives in its OWN 1-row parquet: denormalizing it onto
        weight rows would make an intercept-only model (every
        coefficient regularized/converged to exactly 0 — weights frame
        empty) unloadable."""
        self.weights.write.mode("overwrite").parquet(
            os.path.join(path, "weights"))
        spark = self.weights.sparkSession
        spark.createDataFrame(
            [(self.intercept, self.buckets, self.ng_max, self.hash_fn)],
            "intercept double, buckets int, ng_max int, hash_fn string",
        ).write.mode("overwrite").parquet(os.path.join(path, "meta"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "QualityClassifier":
        meta = spark.read.parquet(os.path.join(path, "meta")).first()
        return cls(spark.read.parquet(os.path.join(path, "weights")),
                   meta.intercept, meta.buckets, meta.ng_max, meta.hash_fn)

    # -- score -------------------------------------------------------------

    def score(self, docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
        """``docs`` + ``quality_score`` (the sigmoid probability of the
        reference class).  Pure built-ins: explode -> count -> log1p ->
        broadcast weight join -> per-doc sum -> sigmoid; a document
        with no features (or none in the model's support) scores
        sigmoid(intercept)."""
        feats = _doc_features(docs, text_col, id_col, self.buckets,
                              self.ng_max, self.hash_fn)
        margin = (
            feats.join(F.broadcast(self.weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("weight")).alias("dot"))
        )
        return (
            docs.join(margin, id_col, "left")
            .withColumn(
                "quality_score",
                F.lit(1.0) / (
                    F.lit(1.0)
                    + F.exp(-(F.coalesce(F.col("dot"), F.lit(0.0))
                              + F.lit(self.intercept)))
                ),
            )
            .drop("dot")
        )

    def keep(self, docs: DataFrame, threshold: float = 0.5,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        """The filter posture: rows scoring >= ``threshold``."""
        return self.score(docs, text_col, id_col).filter(
            F.col("quality_score") >= threshold
        )
