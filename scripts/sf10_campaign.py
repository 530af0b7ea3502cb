#!/usr/bin/env python
"""Full-declared-set sf10 campaign (round 13).

Prior rounds' sf10 evidence was selective (ANN, dedup tiers, bloom,
lm via scripts/scale_smoke.py); this runs ALL 50 declared queries at
100x the gated scale and records per-query growth vs a TEXT-MODE-
MATCHED sf1 denominator, so the "would this survive 100x" posture is
a table of numbers instead of an extrapolation.

Design choices that matter for reading the artifact:

- **perturb, not rotate, for the ratio pair.** ``build_sf1.py``'s
  rotate mode makes every replica group a true near-dup clique, so a
  rotate sf10 grows near-dup OUTPUT ~replicas^2/2 per doc (the round-5
  smoke measured that regime: 24.7M true pairs).  Growth ratios are
  only meaningful when numerator and denominator sit in the same
  duplication regime, so this campaign runs perturb sf1 (replicas are
  ~jaccard-0.2 distinct docs) against perturb sf10.  The continuity
  sf1 (rotate) stays the per-round bench smoke.
- **Same session, cheapest-first.** Both scales run in one JVM with
  bench.release_session_state() between rows (the round-5 lesson:
  localCheckpoint blocks accrete until a later broadcast build OOMs).
  sf10 rows run cheapest-first by their sf1 wall so a budget
  truncation costs the most-extrapolatable information last.
- **Growth floor.** Rows with sf1 wall < FLOOR_S are dominated by
  fixed job-submission overhead; their ratios are reported but only
  rows with sf1 >= FLOOR_S can be flagged super-linear.  Flag
  threshold: wall growth > 3x the 10x data growth (ratio > 30).

Artifact: .scale/sf10_campaign.json — bench.py attaches it to the
per-round payload as ``sf10_queries`` (recorded campaign, not re-run:
a full sf10 pass is a measurement campaign, not a regression test).

Usage: python scripts/sf10_campaign.py [--sf10 .scale/sf10]
         [--sf1 .scale/sf1_perturb] [--budget 7200] [--only a,b,c]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kafka_cassandra_plugin_spark.queries import load_all  # noqa: E402
from kafka_cassandra_plugin_spark.session import get_spark  # noqa: E402

FLOOR_S = 0.5     # sf1 walls under this are job-overhead-dominated
FLAG_RATIO = 30.0  # >3x super-linear vs the 10x data growth


def run_set(spark, registry, names, sf_dir, budget_s, start, label):
    times, skipped = {}, []
    for name in names:
        if time.perf_counter() - start > budget_s:
            skipped.append(name)
            continue
        bench.release_session_state()
        t0 = time.perf_counter()
        try:
            bench.materialize(registry[name].build(spark, sf_dir))
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"  [{label}] {name}: {times[name]} s", flush=True)
        except Exception as exc:  # record, don't die mid-campaign
            times[name] = None
            print(f"  [{label}] {name}: ERROR {exc}", flush=True)
    return times, skipped


# At-scale-default extras (round-14, verdict #2): a real 100 TB run
# executes the DEFAULT paths, not just the hash-matchable declared
# twins - adaptive-geometry LSH, learned-KMeans IVF, the funnel, the
# governed BM25 serving row, the learned quality/langid gates and DSIR.
# These come from bench.py's extras registry so the campaign measures
# exactly the per-round-benched builders.
DEFAULT_EXTRAS = ("sim_lsh_ann", "sim_ivf_ann_kmeans", "curation_funnel",
                  "bm25_topk[maxdf]", "quality_classifier", "langid",
                  "dsir_select")


def run_extras(spark, fns, names, budget_s, start, label):
    times, skipped = {}, []
    for name in names:
        if time.perf_counter() - start > budget_s:
            skipped.append(name)
            continue
        bench.release_session_state()
        t0 = time.perf_counter()
        try:
            bench.materialize(fns[name](spark))
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"  [{label}] {name}: {times[name]} s", flush=True)
        except Exception as exc:  # record, don't die mid-campaign
            times[name] = None
            print(f"  [{label}] {name}: ERROR {exc}", flush=True)
    return times, skipped


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default="/root/repo/.scale/sf10")
    ap.add_argument("--sf1", default="/root/repo/.scale/sf1_perturb")
    ap.add_argument("--budget", type=float, default=7200.0)
    ap.add_argument("--only", default="",
                    help="comma-separated declared-name subset")
    ap.add_argument("--extras", default=",".join(DEFAULT_EXTRAS),
                    help="comma-separated bench-extras names to run at "
                         "both scales ('' = none, 'all' = every extra)")
    ap.add_argument("--skip-declared", action="store_true",
                    help="run only the extras block (declared set "
                         "untouched; artifact goes to the partial path)")
    args = ap.parse_args()

    registry = load_all()
    names = sorted(registry)
    if args.only.strip():
        want = {n for n in args.only.split(",") if n}
        names = [n for n in names if n in want]
    if args.skip_declared:
        names = []

    spark = get_spark(
        "kcp-sf10-campaign", master="local[32]",
        overrides={
            "spark.sql.shuffle.partitions": "64",
            # one long JVM runs ~115 materializations back to back and
            # localCheckpoint blocks accrete between the gc ticks; the
            # session default 8g heap OOM'd the adaptive-LSH sf10 row
            # (UNABLE_TO_ACQUIRE_MEMORY) on a 125 GB box - give the
            # campaign real headroom (driver.memory is JVM-start-only,
            # and this script owns the first session of its process)
            "spark.driver.memory": "48g",
        },
    )
    registry["agg_pricing_summary"].build(spark, args.sf1).count()  # warmup

    def _calib() -> float:
        from pyspark.sql import functions as F  # noqa: F401
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS s", "count(1) AS n").collect()
        return time.perf_counter() - t0

    calib_s = round(min(_calib(), _calib()), 3)
    start = time.perf_counter()

    sf1_times, sf1_skipped = run_set(
        spark, registry, names, args.sf1, args.budget, start, "sf1")

    # sf10 cheapest-first by the just-measured sf1 wall
    order = sorted((n for n in names if sf1_times.get(n) is not None),
                   key=lambda n: sf1_times[n])
    order += [n for n in names if sf1_times.get(n) is None]
    sf10_times, sf10_skipped = run_set(
        spark, registry, order, args.sf10, args.budget, start, "sf10")

    def growth_table(t1s: dict, t10s: dict, keys) -> tuple[dict, list]:
        growth, flagged = {}, []
        for name in keys:
            t1, t10 = t1s.get(name), t10s.get(name)
            # `is None` (not truthiness): a genuinely sub-ms wall is a
            # legitimate reading and must land in the table under the
            # FLOOR_S rule, not vanish (round-13 advice)
            if t1 is None or t10 is None:
                continue
            ratio = round(t10 / max(t1, 1e-3), 2)
            growth[name] = ratio
            if t1 >= FLOOR_S and ratio > FLAG_RATIO:
                flagged.append(name)
        return growth, flagged

    growth, flagged = growth_table(sf1_times, sf10_times, names)

    # ---- extras block: the at-scale-default paths (adaptive LSH,
    # learned IVF, funnel, governed BM25, learned gates), same budget
    # clock and flag rule as the declared set
    extras_out = {}
    extras_req = [n for n in args.extras.split(",") if n]
    if extras_req:
        x1 = {**bench._xxhash64_variants(args.sf1),
              **bench._depth_ops(args.sf1)}
        x10 = {**bench._xxhash64_variants(args.sf10),
               **bench._depth_ops(args.sf10)}
        xnames = (sorted(x1) if args.extras.strip() == "all"
                  else [n for n in extras_req if n in x1])
        ex1, ex1_skip = run_extras(
            spark, x1, xnames, args.budget, start, "extras-sf1")
        xorder = sorted((n for n in xnames if ex1.get(n) is not None),
                        key=lambda n: ex1[n])
        xorder += [n for n in xnames if ex1.get(n) is None]
        ex10, ex10_skip = run_extras(
            spark, x10, xorder, args.budget, start, "extras-sf10")
        exg, exf = growth_table(ex1, ex10, xnames)
        extras_out = {
            "extras_sf1": ex1, "extras_sf10": ex10,
            "extras_growth": exg, "extras_flagged": exf,
            "extras_skipped": {"sf1": ex1_skip, "sf10": ex10_skip},
        }

    registry_size = len(registry)
    partial = bool(args.only.strip()) or args.skip_declared
    out = {
        "sf1_dir": args.sf1, "sf10_dir": args.sf10, "calib_s": calib_s,
        "text_mode": "perturb", "floor_s": FLOOR_S,
        "flag_ratio": FLAG_RATIO,
        # a subset run is marked as such so bench.py's payload block
        # can never silently shadow a full campaign (round-13 advice)
        "n_queries": len(names), "registry_size": registry_size,
        "only": sorted(set(names)) if partial else None,
        "sf1": sf1_times, "sf10": sf10_times, "growth": growth,
        "flagged": flagged,
        "skipped": {"sf1": sf1_skipped, "sf10": sf10_skipped},
        "sf1_total": round(
            sum(t for t in sf1_times.values() if t is not None), 3),
        "sf10_total": round(
            sum(t for t in sf10_times.values() if t is not None), 3),
        **extras_out,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scale_dir = os.path.dirname(os.path.abspath(args.sf10))
    if partial:
        # never clobber the full-campaign artifacts with a subset
        paths = [os.path.join(scale_dir, "sf10_campaign_partial.json")]
    else:
        paths = [os.path.join(scale_dir, "sf10_campaign.json"),
                 os.path.join(repo, "SF10_CAMPAIGN.json")]
    for p in paths:
        with open(p, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("calib_s", "sf1_total", "sf10_total", "flagged")}))
    if extras_out:
        print(json.dumps({k: extras_out[k] for k in
                          ("extras_growth", "extras_flagged")}))
    print(f"artifact: {paths[0]}")
    spark.stop()


if __name__ == "__main__":
    main()
