#!/usr/bin/env python
"""End-to-end curation pipeline demo — the README's ingest story, run.

One scripted pass over the engine's training-data path:

1. **Seed**: build a MinHashIndex from a seed corpus (documents with
   ``doc_id % 3 == 0``) and save it.
2. **Stream**: feed 3 micro-batches of new documents (including planted
   cross-batch and vs-corpus near-duplicates, plus an eval-benchmark
   set whose originals must never be accepted) through a file-source
   stream into :class:`~kafka_cassandra_plugin_spark.streaming.curate.
   CurationSink` — per batch: quality gate, Gopher repetition gate,
   ingest-time 13-gram decontamination vs the benchmark, exact dedup,
   intra-batch near-dup, near-dup vs the *growing* index; accepted rows
   land hive-partitioned under ``out/ingest_batch=*/lang=*/split=*``
   and join the index so later batches dedup against them.
3. **Compact**: the sink compacts the index every 2 add-batches
   (streaming appends are a small-files factory; compaction bounds the
   file count without changing probe results).
4. **Report**: print the funnel (stage -> rows), the accepted dataset's
   partition profile, and the index file counts.
5. **Decontaminate**: drop accepted docs that near-duplicate a
   benchmark set (planted: perturbed copies of accepted docs;
   threshold-adaptive banding, 32x2 at threshold 0.5).
6. **Mix**: Pile-style weighted language mixture (epoch column; one
   map-only corpus scan) with a composed (doc, epoch) id.
7. **Pack + export**: first-fit-decreasing pack the mixture rows into
   512-token budgets, then write 4 deterministic training shards keyed
   by the composed id.

8. **Day-2 re-ingest**: resend accepted docs under fresh ids through
   the same sink - the maintained content Bloom filter rejects every
   one as ``seen_before`` (id-keyed dedup could not).
9. **LM quality profile**: fit an n-gram LM on the accepted corpus and
   print its perplexity profile, then demonstrate the CCNet band gate
   on structured text where in-domain and gibberish actually separate.

Run:  python scripts/curation_demo.py   (sandbox-green, ~1 min; uses
/root/testdata/sf0.001 by default, override with --sf-dir)
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from kafka_cassandra_plugin_spark.catalog import Catalog  # noqa: E402
from kafka_cassandra_plugin_spark.operators.dedup_index import (  # noqa: E402
    MinHashIndex,
)
from kafka_cassandra_plugin_spark.session import get_spark  # noqa: E402
from kafka_cassandra_plugin_spark.streaming.curate import (  # noqa: E402
    CurationSink,
    accepted_dataset,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--keep", metavar="DIR", default=None,
                    help="keep artifacts under DIR instead of a tempdir")
    args = ap.parse_args()

    work = args.keep or tempfile.mkdtemp(prefix="curation_demo_")
    index_path = os.path.join(work, "index")
    out_path = os.path.join(work, "accepted")
    src_path = os.path.join(work, "incoming")
    ckpt_path = os.path.join(work, "ckpt")

    spark = get_spark("curation-demo")
    docs = Catalog(spark, args.sf_dir).documents.select("doc_id", "text")

    # -- 1. seed corpus -> persisted index --------------------------------
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    n_seed = seed.count()
    index = MinHashIndex.build(seed).save(index_path)
    print(f"[1] seeded index with {n_seed} corpus docs -> {index_path}")

    # -- 2. three micro-batches, with planted duplicates ------------------
    # batch 1: fresh docs; batch 2: fresh + copies of batch-1 docs
    # (cross-batch dups); batch 3: fresh + copies of SEED docs (vs-corpus
    # dups).  Copies get new ids, so only near-dup tiers can catch them.
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == 0)).unionByName(
        b1.filter(F.col("doc_id") % 5 == 1)
        .select((F.col("doc_id") + 7_000_000).alias("doc_id"), "text")
    )
    b3 = docs.filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == 1)).unionByName(
        seed.filter(F.col("doc_id") % 5 == 2)
        .select((F.col("doc_id") + 8_000_000).alias("doc_id"), "text")
    )
    # batch 3 also carries PII-leaky variants of fresh docs (support
    # mailto + phone + host appended): the sink's max_pii gate must
    # reject them as `pii_heavy` before any dedup machinery runs
    b3 = b3.unionByName(
        docs.filter((F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 9 == 4))
        .select(
            (F.col("doc_id") + 8_500_000).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.lit(" contact help@example.com or 555-123-4567 "
                      "from 10.1.2.3"),
            ).alias("text"),
        )
    )
    os.makedirs(src_path, exist_ok=True)
    for i, b in enumerate((b1, b2, b3), start=1):
        b.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_path, f"batch_{i}")
        )
        print(f"[2] staged micro-batch {i}: {b.count()} docs")

    # eval benchmark: verbatim copies of some batch-2 docs (id-shifted)
    # - the sink's ingest-time decontamination must keep every one of
    # their originals out of the accepted dataset
    bench_path = os.path.join(work, "bench")
    bench = b2.filter(F.col("doc_id") % 7 == 2).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    bench.write.mode("overwrite").parquet(bench_path)
    print(f"[2] staged eval benchmark: {bench.count()} docs")

    bloom_path = os.path.join(work, "seen_bloom")
    sink = CurationSink(index_path, out_path, compact_every=2,
                        benchmarks_path=bench_path, drop_repetitive=True,
                        max_pii=2, seen_bloom_path=bloom_path,
                        bloom_expected_items=50_000)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_path, "batch_*"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"[2] stream done: {len(sink.funnel_by_batch)} micro-batches")

    # -- 3 + 4. report ----------------------------------------------------
    print("\n[3] curation funnel (summed over micro-batches):")
    for stage, rows in sink.funnel_totals.items():
        print(f"      {stage:<28s} {rows:>6d}")

    acc = accepted_dataset(spark, out_path)
    print("\n[4] accepted dataset by (ingest_batch, split):")
    for r in (
        acc.groupBy("ingest_batch", "split").count()
        .orderBy("ingest_batch", "split").collect()
    ):
        print(f"      batch={r['ingest_batch']}  {r['split']:<6s} {r['count']:>6d}")

    n_band_files = len(glob.glob(os.path.join(index_path, "bands", "**", "*.parquet"),
                                 recursive=True))
    n_shingle_files = len(glob.glob(os.path.join(index_path, "shingles", "**", "*.parquet"),
                                    recursive=True))
    final_corpus = (
        MinHashIndex.load(spark, index_path)
        .shingles.select("id").distinct().count()
    )
    print(f"\n[4] index after ingest+compaction: {final_corpus} docs, "
          f"{n_band_files} band files / {n_shingle_files} shingle files")

    # -- 5. decontaminate vs a benchmark set ------------------------------
    from kafka_cassandra_plugin_spark.operators.contamination import (
        decontaminate,
    )
    from kafka_cassandra_plugin_spark.operators.export import export_shards
    from kafka_cassandra_plugin_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    clean_docs = acc.select("doc_id", "text")
    bench_set = (
        clean_docs.filter((F.col("doc_id") % 11 == 3) & (F.instr("text", " ") > 0))
        .limit(25)
        .select(
            (F.col("doc_id") + 9_000_000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    decon = decontaminate(clean_docs, bench_set, threshold=0.5)
    n_before, n_after = clean_docs.count(), decon.count()
    print(f"\n[5] decontamination vs {bench_set.count()} benchmark docs: "
          f"{n_before} -> {n_after} (dropped {n_before - n_after})")

    # -- 6. language mixture from a RECIPE (target shares + budget) -------
    # the planner turns "lang shares + token budget" into mix_sources
    # epoch factors (one |langs|-row aggregate); max_epochs bounds
    # repetition by scaling the budget down share-preservingly
    from kafka_cassandra_plugin_spark.operators.sampling import (
        mix_sources,
        plan_mixture,
    )

    with_lang = decon.join(
        acc.select("doc_id", "lang", "n_tokens").distinct(), "doc_id"
    )
    # recipe: upweight the two token-richest languages 3:1 (a share on
    # a rare language would bind the planner's max_epochs clamp and
    # scale the whole budget down - shares are preserved, budget gives)
    sizes = {
        r.lang: r.tok
        for r in with_lang.groupBy("lang")
        .agg(F.sum("n_tokens").alias("tok")).collect()
    }
    langs = sorted(sizes, key=sizes.get, reverse=True)
    # recipes name MAJOR languages; a tail language holding a few dozen
    # tokens cannot feed any share without binding the clamp, so it is
    # left out of the mixture (mix_sources drops unweighted sources)
    major = [l for l in langs if sizes[l] >= 0.05 * sum(sizes.values())]
    target = {l: (3.0 if i < 2 else 1.0) for i, l in enumerate(major)}
    avail_tokens = sum(sizes[l] for l in major)
    epochs, planned = plan_mixture(
        with_lang, "lang", "n_tokens", target,
        budget_tokens=0.8 * avail_tokens, max_epochs=3.0,
    )
    mixed = mix_sources(with_lang, "doc_id", "lang", epochs).withColumn(
        "mix_id", F.concat_ws("#", F.col("doc_id"), F.col("epoch"))
    )
    n_mixed = mixed.count()
    got_tokens = mixed.agg(F.sum("n_tokens")).first()[0]
    print(f"\n[6] mixture recipe over {len(major)} major languages "
          f"(3:1 target shares, budget {int(0.8 * avail_tokens)} tokens, "
          f"planned {int(planned)}): {n_after} docs -> {n_mixed} training "
          f"rows, {got_tokens} tokens realized")

    # -- 7. pack + shard export ------------------------------------------
    # composed (doc, epoch) id: each mixture epoch is its own training
    # row, exactly the mix_sources docstring contract
    packed = pack_sequences(mixed, 512, id_col="mix_id", num_groups=8)
    stats = packing_stats(packed, 512)
    n_packs = stats.count()
    fill = stats.agg(F.avg("fill")).first()[0]
    print(f"[7] packed {n_mixed} mixture rows into {n_packs} x 512-token "
          f"packs (mean fill {fill:.3f})")
    shards_path = os.path.join(work, "shards")
    export_shards(mixed, shards_path, 4, id_col="mix_id")
    for r in (
        spark.read.parquet(shards_path).groupBy("shard").count()
        .orderBy("shard").collect()
    ):
        print(f"      shard={r['shard']}  {r['count']:>6d} docs")

    # -- 8. day-2 re-ingest: the Bloom filter catches accepted CONTENT
    # under brand-new ids - the case id-keyed exact dedup cannot see.
    # (The sink maintained words/batch=<id>/ partitions during the
    # stream; this call probes them and overwrites its own partition.)
    reingest = (
        acc.select("doc_id", "text").orderBy("doc_id").limit(40)
        .select((F.col("doc_id") + 12_000_000).alias("doc_id"), "text")
    )
    sink(reingest, 100)
    day2 = sink.funnel_by_batch[100]
    print(f"\n[8] day-2 re-ingest of 40 accepted docs under fresh ids: "
          f"seen_before={day2.get('seen_before', 0)}, "
          f"accepted={day2.get('accepted', 0)}")

    # -- 9. LM perplexity profile of the accepted corpus + the gate -----
    # (the synthetic corpus is a near-uniform bag of ~31 words, so every
    # real doc's add-k ppl sits just above V and unseen-vocab gibberish
    # lands exactly ON the 1/V floor - band accordingly; on a natural
    # corpus gibberish lands far ABOVE, see tests/test_lm.py)
    from kafka_cassandra_plugin_spark.operators.lm import NgramLM

    # re-list after step 8: the day-2 call crossed compact_every, which
    # rewrote the accepted dirs - earlier lazy plans over them are stale
    corpus_now = accepted_dataset(spark, out_path).select("doc_id", "text")
    lm = NgramLM.fit(corpus_now, n=2, k=0.1)
    ppl = lm.perplexity(corpus_now)
    lo, mid, hi = ppl.agg(
        F.min("ppl"), F.expr("percentile(ppl, 0.5)"), F.max("ppl")
    ).first()
    print(f"\n[9] LM(2-gram, V={lm.vocab_size}) ppl profile of the "
          f"accepted corpus: min {lo:.1f} / median {mid:.1f} / max {hi:.1f} "
          f"(near-uniform synthetic text - everything sits near the 1/V "
          f"floor of {lm.vocab_size}, so no band separates here BY "
          f"CONSTRUCTION)")

    # the gate itself, shown where separation exists: an LM fit on
    # structured text scores unseen-vocab gibberish ~7x above held-out
    # in-domain docs, and the max_ppl band keeps only the latter
    templ = ["the quick brown fox jumps over the lazy dog",
             "a stitch in time saves nine every single day",
             "all that glitters is not gold my friend"]
    structured = spark.createDataFrame(
        [(i, templ[i % 3] + " " + templ[(i + 1) % 3]) for i in range(60)],
        "doc_id long, text string",
    )
    lm2 = NgramLM.fit(structured.filter(F.col("doc_id") % 2 == 0), n=2)
    probe = structured.filter(F.col("doc_id") % 2 == 1).unionByName(
        spark.createDataFrame(
            [(13_000_000, " ".join(f"zq{i} qx{i}" for i in range(25)))],
            "doc_id long, text string",
        )
    )
    in_ppl, soup_ppl = (
        lm2.perplexity(probe)
        .agg(F.avg(F.when(F.col("doc_id") < 1000, F.col("ppl"))),
             F.avg(F.when(F.col("doc_id") >= 1000, F.col("ppl"))))
        .first()
    )
    kept = lm2.perplexity_gate(probe, max_ppl=3 * in_ppl)
    print(f"[9] band gate on structured text: in-domain ppl {in_ppl:.1f} "
          f"vs gibberish {soup_ppl:.1f}; max_ppl={3 * in_ppl:.0f} kept "
          f"{kept.count()}/{probe.count()} (gibberish rejected: "
          f"{kept.filter(F.col('doc_id') == 13_000_000).count() == 0})")

    spark.stop()
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print("\ndemo complete")


if __name__ == "__main__":
    main()
