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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default="/root/repo/.scale/sf10")
    ap.add_argument("--sf1", default="/root/repo/.scale/sf1_perturb")
    ap.add_argument("--budget", type=float, default=7200.0)
    ap.add_argument("--only", default="",
                    help="comma-separated declared-name subset")
    args = ap.parse_args()

    registry = load_all()
    names = sorted(registry)
    if args.only.strip():
        want = {n for n in args.only.split(",") if n}
        names = [n for n in names if n in want]

    spark = get_spark(
        "kcp-sf10-campaign", master="local[32]",
        overrides={"spark.sql.shuffle.partitions": "64"},
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

    growth, flagged = {}, []
    for name in names:
        t1, t10 = sf1_times.get(name), sf10_times.get(name)
        if not t1 or not t10:
            continue
        ratio = round(t10 / t1, 2)
        growth[name] = ratio
        if t1 >= FLOOR_S and ratio > FLAG_RATIO:
            flagged.append(name)

    out = {
        "sf1_dir": args.sf1, "sf10_dir": args.sf10, "calib_s": calib_s,
        "text_mode": "perturb", "floor_s": FLOOR_S,
        "flag_ratio": FLAG_RATIO,
        "sf1": sf1_times, "sf10": sf10_times, "growth": growth,
        "flagged": flagged,
        "skipped": {"sf1": sf1_skipped, "sf10": sf10_skipped},
        "sf1_total": round(sum(t for t in sf1_times.values() if t), 3),
        "sf10_total": round(sum(t for t in sf10_times.values() if t), 3),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(os.path.dirname(os.path.abspath(args.sf10)),
                        "sf10_campaign.json")
    for p in (path, os.path.join(repo, "SF10_CAMPAIGN.json")):
        with open(p, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("calib_s", "sf1_total", "sf10_total", "flagged")}))
    print(f"artifact: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
