#!/usr/bin/env python
"""Build an sf1-scale dataset (10x sf0.1) for the scale smoke.

The driver generates sf0.001/0.01/0.1 only (TESTDATA.md); every
100x-scale claim in this repo otherwise rests on plan shape alone.
This script upsamples sf0.1 -> sf1 (~6M lineitem rows) inside the repo
workdir so the most expensive queries can be *run* at 10x and their
growth measured (bench.py emits an `sf1_queries` section when the
directory exists).

Upsampling rules (deterministic, replica i in 0..9):

- **Key shifts preserve modulo distributions.** Many declared queries
  select subsets with `key % n` (n <= 10); each table's shift unit is
  max_key+1 rounded up to a multiple of 2520 = lcm(1..10), so
  `(key + i*unit) % n == key % n` and every filter keeps its
  selectivity at sf1.  Foreign keys use the referenced table's unit,
  so joins stay consistent within each replica (fact:dim fanout is
  preserved by also replicating the dims customer/supplier/part).
- **nation/region stay 25/5 rows** — real dims don't grow with fact
  data; the broadcast-join shape at sf1 is the honest one.
- **documents text**: two modes.  ``rotate`` (default, the sf1
  continuity mode) rotates word order per replica - identical
  length/vocabulary distributions, NOT near-dup-free: rotation
  preserves the token bag exactly (replica simhashes are identical)
  and all 3-shingles except the wrap boundary (cross-replica jaccard
  ~1), so the near-dup tiers see every replica group as a genuine
  duplicate clique and their output grows ~replicas^2/2 per doc -
  that run measures DUP-EXPLOSION handling (the sf10 rotate smoke:
  24.7M true pairs processed).  ``perturb`` replica-tags ~30% of
  words - cross-replica jaccard ~0.2 and simhash hamming >> 3, so
  the same smoke measures SCAN/JOIN growth on genuinely distinct
  documents.  Measure both; they answer different questions.
- **embeddings are sign-flipped per replica** (seeded +-1 mask):
  norms and coordinate distributions unchanged, similarity structure
  not replicated, so ANN candidate counts scale like a real 10x
  corpus.
- **events keep their timestamps** (10x density in the same window —
  how a busier stream actually looks); ids shift.

**Clusterable variant** (``--clustered``): the sign-flip upsampling is
adversarially uniform - within-label cosine ~= cross-label ~= 0 - so no
index can beat scanned fraction there and sf1 ANN recall says nothing
about real corpora (BASELINE.md round-4 note).  ``--clustered`` writes a
SEPARATE embeddings-only dataset (``.scale/sf1_clustered/``) with the
same schema and scale (20k x 64-dim) drawn from 200 Gaussian clusters:
unit-norm centers, per-point noise sigma=0.05 => within-cluster cosine
~0.86 vs cross-cluster ~0 +- 0.125 - the geometry real embedding
corpora actually have (label = cluster id).  This is the corpus the
"adaptive geometry holds recall on clusterable data" claim is measured
on (scripts/clustered_recall.py; gated at reduced scale in
tests/test_quantization.py).

Usage: python scripts/build_sf1.py [--src /root/testdata/sf0.1]
                                   [--out /root/repo/.scale/sf1]
                                   [--clustered]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LCM_1_10 = 2520
REPLICAS = 10

# key column -> table that owns it (unit is computed from the owner and
# reused for foreign keys so joins stay replica-consistent)
KEY_OWNERS = {
    "o_orderkey": "orders",
    "l_orderkey": "orders",
    "c_custkey": "customer",
    "o_custkey": "customer",
    "p_partkey": "part",
    "l_partkey": "part",
    "s_suppkey": "supplier",
    "l_suppkey": "supplier",
    "doc_id": "documents",
    "vec_id": "embeddings",
    "event_id": "events",
    "user_id": "events_user",
}

GROWN_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
DIM_TABLES = ["nation", "region"]


def _unit(max_key: int) -> int:
    return ((int(max_key) // LCM_1_10) + 1) * LCM_1_10


def _rotate_words(text: str, i: int) -> str:
    if i == 0:
        return text
    words = text.split(" ")
    if len(words) < 2:
        return text
    k = i % len(words)
    return " ".join(words[k:] + words[:k])


def _perturb_words(text: str, i: int, rate_pct: int = 30) -> str:
    """Replica-tag ~``rate_pct``% of words (deterministic per (word
    position, replica)).  Rotation preserves the token BAG (simhash
    identical across replicas) and nearly all 3-shingles (jaccard ~1
    across replicas) - so a rotated upsample measures true-duplicate
    EXPLOSION in the near-dup tiers, not scan growth.  Tagging 30% of
    words breaks both: cross-replica jaccard ~0.2 (< every threshold in
    use) and simhash hamming >> 3, so the dedup tiers see a corpus of
    genuinely distinct documents."""
    if i == 0:
        return text
    words = text.split(" ")
    if len(words) < 2:
        return text
    return " ".join(
        (w + "r" + str(i))
        if ((j * 2654435761 + i * 98765431) % 100) < rate_pct
        else w
        for j, w in enumerate(words)
    )


def build(src: str, out: str, replicas: int = REPLICAS,
          text_mode: str = "rotate") -> None:
    os.makedirs(out, exist_ok=True)
    tables = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in GROWN_TABLES + DIM_TABLES
    }

    units = {
        "orders": _unit(pc.max(tables["orders"]["o_orderkey"]).as_py()),
        "customer": _unit(pc.max(tables["customer"]["c_custkey"]).as_py()),
        "part": _unit(pc.max(tables["part"]["p_partkey"]).as_py()),
        "supplier": _unit(pc.max(tables["supplier"]["s_suppkey"]).as_py()),
        "documents": _unit(pc.max(tables["documents"]["doc_id"]).as_py()),
        "embeddings": _unit(pc.max(tables["embeddings"]["vec_id"]).as_py()),
        "events": _unit(pc.max(tables["events"]["event_id"]).as_py()),
        "events_user": _unit(pc.max(tables["events"]["user_id"]).as_py()),
    }

    for name in DIM_TABLES:
        pq.write_table(tables[name], os.path.join(out, f"{name}.parquet"))

    for name in GROWN_TABLES:
        base = tables[name]
        parts = []
        for i in range(replicas):
            cols = {}
            for field in base.schema:
                col = base[field.name]
                if field.name in KEY_OWNERS:
                    shift = i * units[KEY_OWNERS[field.name]]
                    col = pc.add(col, pa.scalar(shift, type=field.type))
                elif name == "documents" and field.name == "text":
                    xform = (_perturb_words if text_mode == "perturb"
                             else _rotate_words)
                    col = pa.array(
                        [xform(t, i) for t in col.to_pylist()],
                        type=pa.string(),
                    )
                elif name == "embeddings" and field.name == "embedding":
                    mat = np.array(col.to_pylist(), dtype=np.float32)
                    if i > 0:
                        rng = np.random.default_rng(i)
                        mask = rng.choice(
                            np.array([1.0, -1.0], dtype=np.float32),
                            size=mat.shape[1],
                        )
                        mat = mat * mask
                    col = pa.array(list(mat), type=field.type)
                cols[field.name] = col
            parts.append(pa.table(cols))
        grown = pa.concat_tables(parts)
        # Row-group sizing is the SCAN-PARALLELISM floor: Spark assigns
        # byte-range splits, but a split can only process the row groups
        # whose midpoint it contains - a table written as ONE row group
        # is read by ONE task no matter how many splits or cores exist.
        # The original 1<<20 default left documents (50k-500k rows) as a
        # single group, which serialized every CPU-heavy text map stage
        # onto one core and showed up as text_stats "15x growth at 10x
        # data" in the sf10 smoke - a LAYOUT artifact, not a plan term.
        # Real 100 TB corpora are thousands of files x ~128 MB row
        # groups (always splittable); emulate that here by bounding
        # groups so every table yields >= ~32 splits.
        rg = max(1024, min(1 << 20, grown.num_rows // 32))
        pq.write_table(
            grown,
            os.path.join(out, f"{name}.parquet"),
            row_group_size=rg,
        )
        print(f"{name}: {base.num_rows} -> {grown.num_rows} "
              f"(row_group_size={rg})")


def build_clustered(out: str, n_vecs: int = 20_000, dim: int = 64,
                    n_clusters: int = 200, sigma: float = 0.05,
                    seed: int = 7) -> None:
    """Write a clusterable ANN-recall corpus: ``n_vecs`` points drawn
    around ``n_clusters`` unit-norm Gaussian centers (module docstring).
    Same schema as the driver's embeddings table (vec_id, embedding,
    label), with ``label`` = cluster id so recall analyses can condition
    on cluster membership."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n_vecs)
    mat = centers[labels] + sigma * rng.standard_normal(
        (n_vecs, dim)
    ).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(
        table, os.path.join(out, "embeddings.parquet"), row_group_size=1 << 20
    )
    within = float(
        np.mean(
            np.sum(
                (mat[:500] / np.linalg.norm(mat[:500], axis=1, keepdims=True))
                * centers[labels[:500]],
                axis=1,
            )
        )
    )
    print(f"clustered embeddings: {n_vecs} x {dim}, {n_clusters} clusters, "
          f"mean point-to-own-center cosine {within:.3f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale", "sf1",
        ),
    )
    ap.add_argument("--clustered", action="store_true",
                    help="also write the clusterable ANN-recall corpus "
                         "to <out>_clustered/")
    ap.add_argument("--replicas", type=int, default=REPLICAS,
                    help="upsampling factor (10 = sf1, 100 = sf10); key "
                         "shifts stay modulo-preserving for any count")
    ap.add_argument("--text-mode", choices=["rotate", "perturb"],
                    default="rotate",
                    help="rotate: replicas are genuine near-dups of each "
                         "other (dup-explosion measurement); perturb: "
                         "replica-tagged words break cross-replica "
                         "similarity (scan-growth measurement)")
    args = ap.parse_args()
    if args.clustered:
        build_clustered(args.out.rstrip("/") + "_clustered")
    else:
        build(args.src, args.out, args.replicas, args.text_mode)


if __name__ == "__main__":
    main()
