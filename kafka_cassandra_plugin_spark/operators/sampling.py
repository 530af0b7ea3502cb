"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB corpus cannot be split with ``df.randomSplit`` (nondeterministic
across reruns, partitionings, and cluster sizes) or materialized split
tables (another copy of the data).  The standard answer is HASH
assignment: each row's split is a pure function of its stable key, so

- the split is reproducible on any cluster, any day, any engine;
- train/holdout never leak rows when the corpus is re-ingested or
  backfilled (a given doc_id always lands in the same split);
- no shuffle, no state - a map-stage filter that composes with pushdown.

The hash is :func:`operators.dedup.portable_hash52` (md5-derived), so the
assignment is reproducible in ANSI SQL on any engine, which also makes
these operators oracle-verifiable (`('0x' || substr(md5(k),1,13))::BIGINT`
in DuckDB).  Salt the key to draw independent splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash52

# assignment granularity: hash buckets per unit interval (1 bp = 0.01%)
BUCKETS = 10_000


def split_bucket(key_col, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) from the row key (+ optional salt):
    ``portable_hash52(salt || key) % BUCKETS``.  Pure column arithmetic."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(
        portable_hash52(F.concat(F.lit(salt), key.cast("string"))),
        F.lit(BUCKETS),
    )


def hash_split(df: DataFrame, key_col: str,
               fractions: dict[str, float] | None = None,
               salt: str = "") -> DataFrame:
    """Assign every row a ``split`` label by hash bucket.

    ``fractions`` maps label -> fraction (must sum to <= 1; any remainder
    is labelled ``holdout``).  Assignment is cumulative over BUCKETS
    buckets in the insertion order of ``fractions``, so a row's label is
    a deterministic function of (key, salt) alone.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = split_bucket(key_col, salt)
    expr = None
    hi = 0
    for label, frac in fractions.items():
        hi += int(round(frac * BUCKETS))
        cond = b < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = expr.otherwise("holdout")
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep a stable ``fraction`` of rows by hash bucket - the
    re-runnable, engine-portable alternative to ``df.sample``.  A row is
    kept or dropped forever (given the salt), so downstream joins against
    the sample stay consistent across pipeline runs."""
    return df.filter(split_bucket(key_col, salt) < int(round(fraction * BUCKETS)))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      fractions: dict, default_fraction: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Deterministic per-stratum sampling: keep ``fractions[stratum]`` of
    each stratum's rows by hash bucket (the re-runnable ``sampleBy``).
    Strata absent from ``fractions`` keep ``default_fraction``.

    Same guarantees as :func:`deterministic_sample` - membership is a
    pure function of (key, salt), so rebalancing a skewed corpus (e.g.
    downsampling an over-represented language) is reproducible across
    runs, clusters, and engines, and still a map-stage filter."""
    b = split_bucket(key_col, salt)
    thresh = None
    for stratum, frac in fractions.items():
        cut = F.lit(int(round(frac * BUCKETS)))
        cond = F.col(strata_col) == stratum
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    thresh = (
        thresh.otherwise(F.lit(int(round(default_fraction * BUCKETS))))
        if thresh is not None
        else F.lit(int(round(default_fraction * BUCKETS)))
    )
    return df.filter(b < thresh)


def mix_sources(df: DataFrame, key_col: str, source_col: str,
                weights: dict, salt: str = "") -> DataFrame:
    """Weighted dataset mixture (the Pile/LLaMA-style recipe): per
    source, ``weights[source]`` is the expected number of EPOCHS of that
    source in the mixture - 0.5 keeps a deterministic half, 2.5 repeats
    every row twice plus a deterministic half, missing sources drop.

    Output adds an ``epoch`` column (0-based repeat index) so each
    repeat is a distinct training row downstream (e.g. for
    :func:`.export.export_shards`, where the shard hash should include
    the epoch: pass a composed id).

    Mechanics are ONE corpus scan, map-only, deterministic: the weight
    rides in as a literal map keyed by source; each row computes its
    epoch count = floor(weight) + (1 if its salted hash slice falls
    inside the fractional part) and explodes a 0..count-1 sequence
    (explode drops the count=0 and unweighted-source rows).  A
    union-of-filters formulation would rescan the corpus once per
    source - at 100 TB that is |sources| scans for one mixture.  The
    hash slice is salted with the source so per-source slices are
    independent, same discipline as :func:`deterministic_sample`.

    Skew bound (stress-tested with a weight-8.0 source): fanout is
    STRUCTURAL - a row emits floor(w) + {0,1} copies, so a heavy source
    multiplies its own rows by at most ceil(max weight) and the plan
    remains a zero-Exchange map stage; there is no shuffle a hot source
    could skew."""
    pairs = []
    for source, w in weights.items():
        if w > 0:
            pairs += [F.lit(source), F.lit(float(w))]
    if not pairs:
        raise ValueError("mix_sources: no source has positive weight")
    w = F.create_map(*pairs)[F.col(source_col)]
    whole = F.floor(w).cast("int")
    frac = w - F.floor(w)
    salted_key = F.concat_ws(
        "|", F.lit(f"{salt}|mix"), F.col(source_col),
        F.col(key_col).cast("string"),
    )
    extra = (split_bucket(salted_key) < frac * BUCKETS).cast("int")
    total = whole + extra
    return df.withColumn(
        "epoch",
        F.explode(F.when(total > 0, F.sequence(F.lit(0), total - 1))),
    )


def take_per_group(df: DataFrame, key_col: str, strata_col: str, k: int,
                   salt: str = "") -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, selected and
    ranked by portable hash order (SURVEY §2.5 D14) — the exact-count
    complement to :func:`stratified_sample`'s rate-based keep ("give me
    10k docs per language" vs "keep 1% of each language").

    Selection adds a ``take_rank`` column (1-based within the stratum):
    rows are ordered by ``md5(salt || key)`` with the raw key as
    tie-break, so membership AND rank are pure functions of (key, salt)
    — reproducible across runs, partitionings, clusters, and engines
    (the same ordering is one ``row_number`` window in ANSI SQL).
    Growing ``k`` only ever ADDS rows (prefix property: the k=100
    sample contains the k=10 sample), which keeps incremental
    re-exports monotone.

    Scale shape: one hash shuffle on the stratum column; the ``rank <=
    k`` predicate is pushed into the shuffle by Spark's
    WindowGroupLimit rewrite (plan-gated in tests), so every map task
    pre-truncates its partition to its local top-k by hash — the
    shuffle carries O(tasks x k) rows per stratum, not the stratum.
    A stratum never materializes on one executor beyond that bound,
    so a skewed language cannot hot-spot the exchange."""
    if k < 1:
        raise ValueError(f"take_per_group: k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    key = F.col(key_col).cast("string")
    order = F.md5(F.concat(F.lit(salt), key))
    w = Window.partitionBy(strata_col).orderBy(order, key)
    return (
        df.withColumn("take_rank", F.row_number().over(w))
        .filter(F.col("take_rank") <= k)
    )


def plan_mixture(df: DataFrame, source_col: str, token_col: str,
                 target_weights: dict, budget_tokens: float,
                 max_epochs: float = 10.0) -> tuple[dict, float]:
    """Solve the mixture-recipe inverse problem (SURVEY §2.5 D15):
    given TARGET token SHARES per source and a total token budget,
    return the per-source epoch factors that :func:`mix_sources`
    should apply — ``({source: epochs}, planned_budget)``.

    :func:`mix_sources` consumes epoch WEIGHTS ("2.5 passes of
    source A"), but a training recipe is stated the other way round:
    "books 30%, web 60%, code 10%, 500B tokens total".  The
    translation needs each source's available token mass, which is
    one tiny aggregate (|sources| rows to the driver — bounded,
    driver-side by design like every planner in this engine):

        epochs_s = budget * share_s / available_tokens_s

    ``max_epochs`` bounds repetition (training on the same document
    tens of times degrades models long before it balances a mixture).
    If any source would exceed it, the WHOLE budget is scaled down to
    the largest feasible value — shares are preserved exactly, the
    budget gives way, and the planned (smaller) budget is returned so
    callers can decide whether to relax shares or accept fewer
    tokens.  Shares are normalized; sources with zero/absent weight
    drop (as in :func:`mix_sources`); a target share on a source with
    no tokens raises.

    The PLAN is exact arithmetic; the realized token count inherits
    the hash-slice binomial variance of the fractional epoch (measured
    in tests at well under 1% on thousand-doc sources).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    shares = {s: w for s, w in target_weights.items() if w > 0}
    if not shares:
        raise ValueError("plan_mixture: no source has positive target share")
    norm = sum(shares.values())
    shares = {s: w / norm for s, w in shares.items()}

    avail = {
        r["s"]: float(r["tok"])
        for r in df.filter(F.col(source_col).isin(*shares))
        .groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(token_col).alias("tok"))
        .collect()
    }
    missing = [s for s in shares if not avail.get(s)]
    if missing:
        raise ValueError(
            f"plan_mixture: target share on source(s) with no tokens: {missing}"
        )
    feasible = min(avail[s] * max_epochs / w for s, w in shares.items())
    planned = min(float(budget_tokens), feasible)
    epochs = {s: planned * w / avail[s] for s, w in shares.items()}
    return epochs, planned


def mix_to_budget(df: DataFrame, key_col: str, source_col: str,
                  token_col: str, target_weights: dict,
                  budget_tokens: float, max_epochs: float = 10.0,
                  salt: str = "") -> DataFrame:
    """:func:`plan_mixture` + :func:`mix_sources` in one step: the
    mixed frame whose expected token shares match ``target_weights``
    within ``budget_tokens`` (scaled down if ``max_epochs`` binds).
    Still one corpus scan: the plan costs one |sources|-row aggregate,
    the application is the same zero-Exchange map stage."""
    epochs, _ = plan_mixture(df, source_col, token_col, target_weights,
                             budget_tokens, max_epochs)
    return mix_sources(df, key_col, source_col, epochs, salt=salt)


def mix_by_weight(df: DataFrame, key_col: str, weight_col: str,
                  salt: str = "") -> DataFrame:
    """Per-DOCUMENT epoch weighting: :func:`mix_sources` mechanics with
    the expected epoch count read from ``weight_col`` instead of a
    per-source map - the application step for
    :func:`.dedup.soft_dedup_weights` (SoftDedup: duplicates survive
    with probability ∝ their down-weight) and for any other per-row
    curriculum weight (quality scores, DSIR importance, decay by age).

    Each row emits ``floor(w)`` copies plus one more iff its salted
    hash slice falls inside the fractional part - deterministic for
    any partitioning/cluster, independent draws per salt, zero
    Exchange (the same structural-fanout bound as mix_sources: at most
    ``ceil(max weight)`` copies per row, no shuffle a heavy weight
    could skew).  Rows with weight <= 0 (or NULL) drop.  Output adds
    ``epoch`` (0-based repeat index); compose the id with the epoch
    downstream exactly as for mix_sources."""
    w = F.col(weight_col).cast("double")
    whole = F.floor(w).cast("int")
    frac = w - F.floor(w)
    salted_key = F.concat_ws(
        "|", F.lit(f"{salt}|wmix"), F.col(key_col).cast("string")
    )
    extra = (split_bucket(salted_key) < frac * BUCKETS).cast("int")
    n = F.when(w > 0, whole + extra).otherwise(F.lit(0))
    return (
        df.withColumn("__n_epochs", n)
        .filter(F.col("__n_epochs") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), F.col("__n_epochs") - 1)),
        )
        .drop("__n_epochs")
    )
