#!/usr/bin/env python
"""Hub-skew evidence for docs/PLANS.md §3 — VERDICT r2 item 9.

Claim under test: map-side partial aggregation (HashAggregate(partial) →
Exchange → HashAggregate(final)) bounds a hub vertex's reduce input to
≤ 1 row per map partition, so the engine's superstep reduces (sum/min/
count on dst) need NO salting even on power-law in-degree. If the claim
held only partially, an explicitly salted two-phase aggregation
(groupBy(dst, salt) → groupBy(dst)) would beat the plain aggregation on a
hub-heavy graph; if the claim holds, salting only adds a second shuffle.

Measures the two superstep shapes the engine actually runs, on the RMAT
graph at the north-rule scale (hubs of ~10^5+ in-degree at scale 23):

  min-superstep (WCC):  edges ⋈ labels(src) → groupBy(dst).min(label)
  cnt-superstep (LPA):  edges ⋈ labels(src) → groupBy(dst, label).count

The engine's default RMAT parameters (reference benchmark a=0.1, b=0.2,
c=0.3) give only mild skew (max in-degree ~1k at scale 23); pass
``--graph500`` (a=0.57, b=0.19, c=0.19) for the hub-heavy regime the claim
actually has to survive — max in-degree ~10^5 at scale 23.

Usage: python scripts/skew_bench.py [--scale 23] [--cpus 32] [--reps 5]
       [--graph500]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=23)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--salts", type=int, default=16)
    ap.add_argument(
        "--graph500", action="store_true",
        help="hub-heavy RMAT a=0.57,b=0.19,c=0.19 instead of the engine "
        "benchmark default a=0.1,b=0.2,c=0.3",
    )
    args = ap.parse_args()
    abc = (0.57, 0.19, 0.19) if args.graph500 else (0.1, 0.2, 0.3)

    from pyspark.sql import functions as F

    from linkgraph.generators import rmat_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="skew-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = rmat_edges(
        spark, args.scale, 16, a=abc[0], b=abc[1], c=abc[2]
    ).cache()
    E = edges.count()
    labels = (
        edges.select(F.col("src").alias("vertex")).distinct()
        .select("vertex", F.col("vertex").alias("lab"))
        .repartition(args.cpus, "vertex")
        .cache()
    )
    labels.count()
    hub = edges.groupBy("dst").count().agg(F.max("count")).collect()[0][0]

    lab_src = labels.select(F.col("vertex").alias("src"), "lab")
    joined = edges.join(lab_src, on="src")
    salt = F.pmod(F.xxhash64("src"), F.lit(args.salts)).alias("salt")

    variants = {
        "min_plain": lambda: joined.groupBy("dst").agg(F.min("lab")).count(),
        "min_salted": lambda: (
            joined.withColumn("salt", salt)
            .groupBy("dst", "salt").agg(F.min("lab").alias("m"))
            .groupBy("dst").agg(F.min("m")).count()
        ),
        "cnt_plain": lambda: (
            joined.groupBy("dst", "lab").agg(F.count("*")).count()
        ),
        "cnt_salted": lambda: (
            joined.withColumn("salt", salt)
            .groupBy("dst", "lab", "salt").agg(F.count("*").alias("c"))
            .groupBy("dst", "lab").agg(F.sum("c")).count()
        ),
    }
    out = {"scale": args.scale, "edges": E, "cpus": args.cpus,
           "max_in_degree": hub, "salts": args.salts,
           "rmat_abc": list(abc)}
    # round-robin the reps across variants: host throughput drifts over a
    # multi-minute run (page cache, JIT, cgroup pressure), and a
    # variant-sequential loop folds that drift into the variant comparison
    # (observed: the last-run variant reads ~30% "faster" on identical
    # shuffle work). Interleaving gives every variant the same drift.
    ts: dict[str, list[float]] = {name: [] for name in variants}
    for name, fn in variants.items():
        fn()  # warm-up (codegen)
    for _ in range(args.reps):
        for name, fn in variants.items():
            t0 = time.time()
            fn()
            ts[name].append(time.time() - t0)
    for name in variants:
        out[name + "_sec_median"] = round(statistics.median(ts[name]), 3)
        out[name + "_sec_all"] = [round(t, 3) for t in ts[name]]
    print(json.dumps(out))
    fname = "skew_bench_g500.json" if args.graph500 else "skew_bench.json"
    with open(os.path.join(REPO, "BENCH", fname), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
