#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule (BASELINE.md §2/§3).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the IDENTICAL PageRank job at local[N] and local[4N] on
the IDENTICAL input (the deterministic, partitioning-independent RMAT graph)
and reporting throughput at both plus efficiency = GTEPS_4N / (4 * GTEPS_N).

Measurement protocol: per level, run one PageRank with per-superstep wall
times collected in-loop; the first 3 supersteps are dropped as warm-up
(codegen, cache population), isolating steady-state superstep throughput —
the quantity that scales with executors on a real cluster.

Usage: python scripts/scaling_bench.py [--scale 19] [--iters 10]
       [--levels 8,32] [--out BENCH]
Child mode (one JVM per parallelism level): --child --cpus N
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, scale: int, iters: int, sp: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F  # noqa: F401

    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.generators import rmat_edges
    from linkgraph.session import get_spark
    from linkgraph.structure.graph import Graph

    # shuffle_partitions is held CONSTANT across parallelism levels so only
    # the thread count varies — per-partition row counts (and therefore
    # partial-agg hash-table sizes / spill behavior) stay identical, making
    # the N-vs-4N ratio a pure parallelism measurement. With sp=cpus the
    # local[2] level ran 16.7M-row partitions that spilled, fabricating a
    # superlinear 2->8 pair.
    spark = get_spark(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=sp
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = rmat_edges(spark, scale, 16).cache()
    E = edges.count()
    g = Graph.from_edgelist(edges, directed=True, renumber=False)

    # one run; per-superstep wall times collected in-loop, first 3 dropped
    # as warm-up (codegen, cache population)
    import statistics

    ts: list = []
    pagerank(g, fixed_iterations=iters + 3, iteration_timings=ts).count()
    steady = ts[3:]
    med = statistics.median(steady)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "shuffle_partitions": sp,
                "scale": scale,
                "edges": E,
                "iters": len(steady),
                "sec_per_iter": round(med, 4),
                "sec_per_iter_mean": round(sum(steady) / len(steady), 4),
                "per_iter_all": [round(x, 3) for x in ts],
                "gteps": round(E / med / 1e9, 6),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=19)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--repeat", type=int, default=1,
                    help="runs per level; best (min sec/iter) kept — "
                         "filters shared-box noise (observed +-25%% run-to-run)")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--sp", type=int, default=32,
                    help="shuffle partitions, constant across levels")
    args = ap.parse_args()
    if args.child:
        child(args.cpus, args.scale, args.iters, args.sp)
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for cpus in levels:
        best = None
        for rep in range(args.repeat):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--cpus", str(cpus), "--scale", str(args.scale),
                 "--iters", str(args.iters), "--sp", str(args.sp)],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            print(line)
            if best is None or r["sec_per_iter"] < best["sec_per_iter"]:
                best = r
        best["runs"] = args.repeat
        results.append(best)

    pairs = []
    for a in results:
        for b in results:
            if b["cpus"] == 4 * a["cpus"]:
                pairs.append(
                    {
                        "n": a["cpus"],
                        "n4": b["cpus"],
                        "efficiency": round(b["gteps"] / (4 * a["gteps"]), 4),
                    }
                )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "scaling.json"), "w") as f:
        json.dump({"levels": results, "pairs_4x": pairs}, f, indent=2)
    lo, hi = results[0], results[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff = hi["gteps"] / (ratio * lo["gteps"])
    with open(os.path.join(args.out, "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE.md — throughput & scaling evidence\n\n"
            f"Workload: PageRank, {args.iters} steady-state supersteps on the "
            f"deterministic RMAT graph (scale={args.scale}, edgefactor=16, "
            f"a/b/c=0.1/0.2/0.3, seed 42 — the reference benchmark generator "
            f"parameters, benchmarks/python_e2e/cugraph_funcs.py:43-50); "
            "identical input bytes at every parallelism level "
            "(partitioning-independent hash-based sampler).\n\n"
            "Steady-state: per-superstep wall times measured in-loop; first 3 "
            "supersteps dropped as warm-up (codegen, cache population).\n\n"
            "| parallelism | edges | sec/superstep | GTEPS |\n|---|---|---|---|\n"
            + "\n".join(
                f"| local[{r['cpus']}] | {r['edges']} | {r['sec_per_iter']} | {r['gteps']} |"
                for r in results
            )
            + "\n\n"
            "**N vs 4N scaling efficiency** (GTEPS_4N / (4 * GTEPS_N); "
            "target >= 0.8 per BASELINE.json; sandbox proxy for N vs 4N "
            "executors):\n\n"
            + "\n".join(
                f"- local[{p['n']}] -> local[{p['n4']}]: **{p['efficiency']:.3f}**"
                for p in pairs
            )
            + "\n"
        )
    for p in pairs:
        print(f"efficiency {p['n']}->{p['n4']}: {p['efficiency']:.3f}")


if __name__ == "__main__":
    main()
