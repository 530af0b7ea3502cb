#!/usr/bin/env python
"""Same-JVM A/B of dedup_ngram_jaccard's tiers at sf10 (round-16 scale
triage): times (1) the pairs tier as landed, (2) the pairs tier with the
round-15 self-join pair generation, (3) the pairs tier with the post-cap
localCheckpoint restored, and (4) the labels closure over the landed
pairs - so a sf10 wall regression can be attributed to one change.

Usage: python scripts/ngram_sf10_ab.py [sf_dir] [variants...]
  variants: subset of {landed,selfjoin,ckpt,labels}; default all
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators import dedup as D
from kafka_cassandra_plugin_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
variants = sys.argv[2:] or ["landed", "selfjoin", "ckpt", "labels"]


def corpus(spark):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    perturbed = (
        d.filter((F.col("doc_id") % 4 == 0) & (F.instr("text", " ") > 0))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    return d.unionByName(perturbed)


def pairs_variant(c, mode: str):
    """ngram_jaccard_pairs with the declared-query params, pair tier per
    mode: 'landed' = groups, no post-cap ckpt; 'selfjoin' = r15 join;
    'ckpt' = groups + post-cap localCheckpoint."""
    sh = D.exploded_shingles(c, "text", "doc_id", 3, hashed=True)
    sh = sh.localCheckpoint()
    freq_ok = sh.groupBy("sh").count().filter(F.col("count") <= 20)
    sh = sh.join(freq_ok.select("sh"), "sh", "left_semi")
    if mode == "ckpt":
        sh = sh.localCheckpoint()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if mode == "selfjoin":
        a, b = sh.alias("a"), sh.alias("b")
        common = (
            a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        common = D.pair_counts_from_capped_groups(sh, "sh", "id", "n_common")
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}),
                    "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn("__j_raw", F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("__j_raw") >= 0.7)
        .select("id_a", "id_b", F.round(F.col("__j_raw"), 4).alias("jaccard"))
    )


def main() -> None:
    spark = get_spark(
        "kcp-ngram-sf10-ab", master="local[32]",
        overrides={"spark.sql.shuffle.partitions": "64"},
    )
    sc = spark.sparkContext
    c = corpus(spark)
    results = {}
    landed_pairs = None
    for mode in variants:
        if mode == "labels":
            continue
        sc.setJobDescription(f"ngram sf10 pairs [{mode}]")
        j0 = int(sc._jsc.sc().dagScheduler().nextJobId())
        t0 = time.perf_counter()
        p = pairs_variant(c, mode).localCheckpoint()
        n = p.count()
        dt = time.perf_counter() - t0
        jobs = int(sc._jsc.sc().dagScheduler().nextJobId()) - j0
        results[f"pairs[{mode}]"] = (round(dt, 2), jobs, n)
        print(f"pairs[{mode}]: {dt:.2f}s jobs={jobs} n_pairs={n}", flush=True)
        if mode == "landed":
            landed_pairs = p
    if "labels" in variants:
        if landed_pairs is None:
            landed_pairs = pairs_variant(c, "landed").localCheckpoint()
            print(f"(built landed pairs for labels: {landed_pairs.count()})",
                  flush=True)
        nodes = landed_pairs.select(F.col("id_a").alias("doc_id")).unionByName(
            landed_pairs.select(F.col("id_b").alias("doc_id"))
        )
        sc.setJobDescription("ngram sf10 labels closure")
        j0 = int(sc._jsc.sc().dagScheduler().nextJobId())
        t0 = time.perf_counter()
        labels = D.component_labels_auto(nodes, landed_pairs,
                                         id_col="doc_id",
                                         hint_broadcast_result=True)
        out = landed_pairs.join(labels,
                                landed_pairs["id_a"] == labels["node"])
        out.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        jobs = int(sc._jsc.sc().dagScheduler().nextJobId()) - j0
        results["labels"] = (round(dt, 2), jobs, None)
        print(f"labels+join: {dt:.2f}s jobs={jobs}", flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
