#!/usr/bin/env python
"""N-vs-4N scaling evidence for the round-2 superstep rewrites (SCC,
core_number, Louvain) — VERDICT r2 item 5.

Same protocol as scripts/scaling_bench.py: no real cluster exists in this
sandbox, so the north rule's two-cluster-size criterion is evidenced by
running the IDENTICAL job at local[N] and local[4N] on the IDENTICAL
deterministic RMAT input, one fresh JVM per level, shuffle partitions held
CONSTANT across levels (so per-partition row counts and spill behavior
stay fixed and the ratio isolates parallelism).

Unlike PageRank these algorithms do not expose per-superstep timings, so
the measured quantity is the algorithm wall time after (a) the edge cache
is materialized and (b) a small-graph warm-up run has paid codegen. Round
counts are deterministic per input, hence identical across levels.

Usage: python scripts/algo_scaling.py [--scale 20] [--levels 4,16]
       [--algos scc,core_number,louvain] [--repeat 1]
Child mode: --child --algo scc --cpus N
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

WARMUP_SCALE = 13


def _run_algo(algo: str, g) -> None:
    if algo == "scc":
        from linkgraph.algorithms.scc import strongly_connected_components

        strongly_connected_components(g).count()
    elif algo == "core_number":
        from linkgraph.algorithms.cores import core_number

        core_number(g).count()
    elif algo == "louvain":
        from linkgraph.algorithms.louvain import louvain

        # capped rounds (identical at every level: deterministic input) so
        # the measurement is the move-pass superstep, not level recursion
        res, _q = louvain(g, max_iter=4, max_levels=1)
        res.count()
    else:
        raise ValueError(algo)


def child(algo: str, cpus: int, scale: int, sp: int) -> None:
    from linkgraph.generators import rmat_edges
    from linkgraph.session import get_spark
    from linkgraph.structure.graph import Graph

    directed = algo == "scc"
    spark = get_spark(
        app_name=f"algo-scaling-{algo}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=sp,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # codegen/catalyst warm-up on a tiny graph of the same shape
    w_edges = rmat_edges(spark, WARMUP_SCALE, 16).cache()
    w_edges.count()
    _run_algo(algo, Graph.from_edgelist(w_edges, directed=directed, renumber=False))
    w_edges.unpersist()

    edges = rmat_edges(spark, scale, 16).cache()
    E = edges.count()
    g = Graph.from_edgelist(edges, directed=directed, renumber=False)
    t0 = time.time()
    _run_algo(algo, g)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "algo": algo,
                "cpus": cpus,
                "shuffle_partitions": sp,
                "scale": scale,
                "edges": E,
                "sec": round(dt, 2),
                "meps": round(E / dt / 1e6, 3),  # input edges / sec
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--algos", default="scc,core_number,louvain")
    ap.add_argument("--repeat", type=int, default=1,
                    help="runs per (algo, level); best kept (shared-box noise)")
    ap.add_argument("--sp", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--algo", default="scc")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    if args.child:
        child(args.algo, args.cpus, args.scale, args.sp)
        return

    levels = [int(x) for x in args.levels.split(",")]
    algos = args.algos.split(",")
    table: dict[str, dict[int, dict]] = {}
    for algo in algos:
        table[algo] = {}
        for cpus in levels:
            best = None
            for _ in range(args.repeat):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     "--algo", algo, "--cpus", str(cpus),
                     "--scale", str(args.scale), "--sp", str(args.sp)],
                    capture_output=True, text=True, check=True, cwd=REPO,
                )
                line = [l for l in out.stdout.strip().splitlines()
                        if l.startswith("{")][-1]
                r = json.loads(line)
                print(line, flush=True)
                if best is None or r["sec"] < best["sec"]:
                    best = r
            table[algo][cpus] = best

    pairs = []
    for algo in algos:
        for n in levels:
            if 4 * n in table[algo]:
                a, b = table[algo][n], table[algo][4 * n]
                pairs.append(
                    {
                        "algo": algo,
                        "n": n,
                        "n4": 4 * n,
                        "sec_n": a["sec"],
                        "sec_4n": b["sec"],
                        "efficiency": round(a["sec"] / b["sec"] / 4, 4),
                    }
                )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "algo_scaling.json"), "w") as f:
        json.dump({"levels": table, "pairs_4x": pairs, "scale": args.scale}, f, indent=2)
    for p in pairs:
        print(json.dumps(p))


if __name__ == "__main__":
    main()
