"""Sequence packing: binpack documents into fixed token budgets.

Training consumes fixed-length sequences; feeding one short document per
sequence wastes the budget on padding.  Packing assigns documents to
"packs" whose token sums stay <= the budget, maximizing fill.  Optimal
binpacking is NP-hard and inherently serial - the scale answer is
partition-local first-fit-decreasing (FFD):

- documents are routed to ``num_groups`` groups by a portable hash of
  the id - deterministic for any input partitioning or cluster size
  (``num_groups`` is a SEMANTIC parameter, not the physical partition
  count: changing the cluster must not change the packing);
- each group packs its own documents with FFD in (tokens desc, id)
  order inside one ``applyInPandas`` kernel - embarrassingly parallel,
  no cross-group coordination;
- the waste bound is local: FFD fills >= ~70% worst-case and the only
  cross-group loss is at most one underfull pack per group, negligible
  when groups hold thousands of documents (pick ``num_groups`` so a
  group's documents fit one executor's memory: ~budget x packs_per_group
  tokens).

Documents longer than the budget get a singleton pack flagged
``oversize`` - truncation policy belongs to the caller.

Reference provenance: no counterpart in /root/reference; LLM-pipeline
closure (SURVEY §2.5).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from .text import token_count

_OUT_FIELDS = [
    StructField("group", LongType()),
    StructField("pack", LongType()),
    StructField("slot", LongType()),
    StructField("n_tokens", LongType()),
    StructField("oversize", BooleanType()),
]


def pack_sequences(df: DataFrame, max_tokens: int,
                   id_col: str = "doc_id", tokens_col: str | None = None,
                   text_col: str = "text",
                   num_groups: int | None = None,
                   target_group_docs: int = 4096,
                   max_group_docs: int = 262_144,
                   seed: int = 42) -> DataFrame:
    """(id, group, pack, slot, n_tokens, oversize, num_groups) - a
    deterministic pack assignment for every input document.

    ``pack`` ids are unique across groups (``group * 2^40 + local``);
    ``slot`` is the document's position inside its pack (FFD insertion
    order).  Token counts come from ``tokens_col`` when given, else the
    whitespace :func:`.text.token_count` of ``text_col``.

    Group sizing: ``num_groups=None`` (default) derives
    ``ceil(rows / target_group_docs)`` from one map-only count, so a
    50M-doc corpus gets ~12k groups instead of 64 - a FIXED default
    would route ~800k docs into one applyInPandas kernel and OOM it.
    The chosen value is recorded in every output row (``num_groups``
    column) because it is part of the packing's identity: re-running
    with the same (data, num_groups, seed) reproduces the assignment
    bit-for-bit on any cluster, so pin the recorded value, not the
    derivation, when re-materializing.  Passing ``num_groups``
    explicitly skips the count (the 100 TB caller sizes by hand).
    Either way a kernel-side guard raises when a group exceeds
    ``max_group_docs`` (hash routing is uniform, so this only fires on
    genuinely undersized ``num_groups``) - failing loudly beats an
    executor OOM mid-job.
    """
    if num_groups is None:
        num_groups = max(1, -(-df.count() // int(target_group_docs)))
    num_groups = int(num_groups)
    if tokens_col is None:
        df = df.withColumn("__nt", token_count(text_col).cast("long"))
    else:
        df = df.withColumn("__nt", F.col(tokens_col).cast("long"))
    routed = df.select(
        F.col(id_col).alias("id"),
        "__nt",
        F.pmod(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
            F.lit(num_groups),
        ).alias("group"),
    )
    out_schema = StructType(
        [StructField("id", routed.schema["id"].dataType)] + _OUT_FIELDS
    )
    budget = int(max_tokens)
    group_cap = int(max_group_docs)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        # FFD in (tokens desc, id) order; the linear first-fit scan is
        # O(docs x open packs) - fine at thousands of docs per group
        # (size num_groups so that holds)
        if len(pdf) > group_cap:
            raise ValueError(
                f"pack_sequences: group {int(pdf['group'].iloc[0])} holds "
                f"{len(pdf)} docs > max_group_docs={group_cap}; raise "
                "num_groups (or lower target_group_docs) so each group "
                "fits one executor's applyInPandas kernel"
            )
        pdf = pdf.sort_values(
            ["__nt", "id"], ascending=[False, True], kind="mergesort"
        )
        group = int(pdf["group"].iloc[0])
        rem: list[int] = []    # remaining budget per pack (-1 = closed)
        slots: list[int] = []  # next slot index per pack
        rows = []
        for doc_id, nt in zip(pdf["id"], pdf["__nt"]):
            nt = int(nt)
            if nt > budget:
                rem.append(-1)  # oversize singleton, never refilled
                slots.append(1)
                rows.append((doc_id, group, len(rem) - 1, 0, nt, True))
                continue
            for i, r in enumerate(rem):
                if r >= nt:
                    rows.append((doc_id, group, i, slots[i], nt, False))
                    rem[i] = r - nt
                    slots[i] += 1
                    break
            else:
                rem.append(budget - nt)
                slots.append(1)
                rows.append((doc_id, group, len(rem) - 1, 0, nt, False))
        out = pd.DataFrame(
            rows, columns=["id", "group", "pack", "slot", "n_tokens", "oversize"]
        )
        out["pack"] = group * (1 << 40) + out["pack"]
        return out

    return (
        routed.groupBy("group")
        .applyInPandas(ffd, schema=out_schema)
        .withColumnRenamed("id", id_col)
        .withColumn("num_groups", F.lit(num_groups))
    )


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One row per pack: doc count, token sum, fill ratio.  The
    aggregate tests gate on (`every non-oversize pack <= max_tokens`,
    mean fill) - the packing quality metric."""
    return (
        packed.groupBy("pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.max(F.col("oversize").cast("int")).cast("boolean").alias("oversize"),
        )
        .withColumn("fill", F.round(F.col("tokens") / F.lit(max_tokens), 4))
    )


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into token-window chunks (SURVEY §2.5 D17):
    (id, chunk_idx, chunk_text, n_tokens) with every chunk at most
    ``max_tokens`` whitespace tokens and consecutive chunks sharing
    ``overlap`` tokens of context.

    This is the bridge into :func:`pack_sequences`: the packer flags
    documents longer than the budget as ``oversize`` singletons
    (truncation policy belongs to the caller) — chunking IS that
    policy when the caller wants every token trained on.  Chunk i
    covers tokens [i·stride, i·stride + max_tokens) with stride =
    max_tokens − overlap, so concatenating chunks with the first
    ``overlap`` tokens of each non-initial chunk dropped reconstructs
    the document's token sequence exactly (round-trip-tested).  A doc
    shorter than one window yields one chunk; an empty doc yields
    none.

    Scale shape: pure map stage — tokenize once, a literal-arithmetic
    start sequence, slice+join per window, one posexplode; zero
    Exchange (plan-gated), linear in corpus tokens x (1 +
    overlap/stride).  Engine-portable arithmetic (double ceil +
    1-based inclusive slices), so the op is DuckDB-oracle-checked,
    not rows-only.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    stride = max_tokens - overlap
    # drop empty tokens so whitespace-only/empty docs yield ZERO chunks
    # (a bare split('') returns [''] in both engines)
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(toks)
    n_chunks = F.when(
        n > 0,
        F.greatest(
            F.lit(1),
            F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
        ),
    ).otherwise(F.lit(0))
    # guard the DESCENDING-sequence trap: sequence(0, -1) enumerates
    # downward in Spark, so the empty case must short-circuit
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    windows = F.transform(
        starts,
        lambda i: F.struct(
            F.array_join(
                F.slice(toks, i * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.size(F.slice(toks, i * stride + 1, max_tokens))
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(windows).alias("chunk_idx", "w"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("w.chunk_text").alias("chunk_text"),
            F.col("w.n_tokens").alias("n_tokens"),
        )
    )


def pack_examples(docs: DataFrame, tokenizer, max_tokens: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  eos: str | None = "</s>",
                  **pack_kwargs) -> DataFrame:
    """The last mile of the training-data pipeline (SURVEY §2.5 D31):
    BPE-encode every document, binpack the encoded lengths, and emit
    one row per PACK with the concatenated token stream — the actual
    training example a data loader reads.

    (pack, n_docs, n_tokens, oversize, tokens) where ``tokens`` is the
    slot-ordered concatenation of each member document's BPE stream,
    each document terminated by ``eos`` (pass ``eos=None`` to skip the
    terminator; the packing budget bills the terminator when present,
    so ``n_tokens == len(tokens) <= max_tokens`` holds for every
    non-oversize pack either way).

    Composition, not new machinery: :meth:`.bpe.BpeTokenizer.encode`
    (map-only, ranks in the UDF closure) -> :func:`pack_sequences`
    (deterministic partition-local FFD over the TRUE subword lengths,
    not the whitespace proxy) -> one equi-join back to the encoded
    stream and one groupBy pack whose ``array_sort(collect_list(
    struct(slot, ...)))`` restores FFD insertion order.  Scale shape:
    two shuffles total (the pack assignment's group routing, then the
    pack groupBy; the join key is the doc id both sides already
    carry), and every pack's payload is bounded by ``max_tokens`` —
    collect_list here can never exceed the budget the packer enforced
    upstream.  Feed the result straight to
    :func:`.export.export_shards` keyed by ``pack`` for deterministic
    training shards.

    Oversize documents (longer than the budget INCLUDING the
    terminator — the EOS token occupies a slot in the training
    example, so a doc of exactly ``max_tokens`` pre-EOS bills
    ``max_tokens + 1`` and is oversize; size the budget with that
    headroom in mind) stay singleton packs flagged ``oversize`` with
    their full stream — truncation policy belongs to the caller, exactly as
    in :func:`pack_sequences`; chunk first with
    :func:`chunk_documents` when every token must train.
    """
    if "num_groups" not in pack_kwargs:
        # derive the group count from the RAW doc count, not inside
        # pack_sequences: its own derivation would count() the encoded
        # frame and run the (expensive) encode UDF a second time
        target = pack_kwargs.pop("target_group_docs", 4096)
        pack_kwargs["num_groups"] = max(
            1, -(-docs.count() // int(target))
        )
    enc = tokenizer.encode(docs.select(id_col, text_col),
                           text_col=text_col, out_col="__toks")
    if eos is not None:
        enc = enc.withColumn(
            "__toks", F.concat("__toks", F.array(F.lit(eos)))
        )
    # the encoded frame feeds BOTH the length-only pack assignment and
    # the stream-assembly join; checkpoint so the pandas-UDF encode
    # (the dominant cost) runs exactly once (a 100 TB caller would
    # materialize the encoded corpus to storage here instead)
    enc = enc.select(id_col, "__toks",
                     F.size("__toks").cast("long").alias("__bpe_nt")
                     ).localCheckpoint()
    assign = pack_sequences(
        enc, max_tokens, id_col=id_col, tokens_col="__bpe_nt",
        **pack_kwargs,
    )
    member = assign.join(enc.select(id_col, "__toks"), id_col)
    return (
        member.groupBy("pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.max(F.col("oversize").cast("int")).cast("boolean")
            .alias("oversize"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("slot", "__toks"))
                    ),
                    lambda s: s["__toks"],
                )
            ).alias("tokens"),
        )
    )
