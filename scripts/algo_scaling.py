#!/usr/bin/env python
"""N-vs-4N scaling evidence for the round-2 superstep rewrites (SCC,
core_number, Louvain) — VERDICT r2 item 5.

Same protocol as scripts/scaling_bench.py: no real cluster exists in this
sandbox, so the north rule's two-cluster-size criterion is evidenced by
running the IDENTICAL job at local[N] and local[4N] on the IDENTICAL
deterministic RMAT input, one fresh JVM per level, shuffle partitions held
CONSTANT across levels (so per-partition row counts and spill behavior
stay fixed and the ratio isolates parallelism).

Two modes. Default: whole-algorithm wall time after the edge cache is
materialized and a small-graph warm-up run has paid codegen (round counts
are deterministic per input, hence identical across levels) — honest but
latency-dominated for round-heavy fixpoints. --steady-rounds N: the
PageRank protocol — run exactly N E-scale rounds (core_number h-index
rounds / louvain level-1 move passes, both of which join the FULL edge
set every round) with per-round wall times collected in-loop, first 2
dropped as residual warm-up, median reported. The steady metric is the
quantity that scales with executors on a real cluster; the wall-time
metric additionally pays the per-round driver/scheduling latency floor,
which no executor count removes.

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


def _run_algo_steady(algo: str, g, rounds: int) -> list:
    """Run a FIXED number of E-scale rounds with in-loop per-round wall
    times — the steady-state protocol the PageRank scaling evidence uses.
    core_number joins the full edge set every h-index round; louvain's
    level-1 move passes join the full edge set every pass. Round counts
    are fixed, so both parallelism levels run identical work."""
    ts: list = []
    if algo == "scc":
        from linkgraph.algorithms.scc import strongly_connected_components

        # coloring iterations run to a deterministic fixpoint (identical at
        # both levels); `rounds` is ignored — timings cover round 0's
        # full-edge-set min-coloring supersteps.
        strongly_connected_components(g, round_timings=ts).count()
    elif algo == "core_number":
        from linkgraph.algorithms.cores import core_number

        core_number(g, fixed_iterations=rounds, round_timings=ts).count()
    elif algo == "louvain":
        from linkgraph.algorithms.louvain import louvain

        res, _q = louvain(g, max_iter=rounds, max_levels=1, round_timings=ts)
        res.count()
    elif algo == "harmonic":
        from linkgraph.algorithms.anf import harmonic_centrality

        # each hop is one full-E join + BIT_OR agg + V-row score fold —
        # identical work per hop at every level
        harmonic_centrality(g, max_hops=rounds, num_registers=8,
                            hop_timings=ts).count()
    else:
        raise ValueError(f"no steady mode for {algo}")
    return ts


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
    elif algo == "harmonic":
        from linkgraph.algorithms.anf import harmonic_centrality

        harmonic_centrality(g, max_hops=4, num_registers=8).count()
    elif algo == "coloring":
        from linkgraph.algorithms.coloring import greedy_color

        greedy_color(g).count()
    else:
        raise ValueError(algo)


def child(algo: str, cpus: int, scale: int, sp: int,
          steady_rounds: int = 0) -> None:
    import statistics

    from linkgraph.generators import rmat_edges
    from linkgraph.session import get_spark
    from linkgraph.structure.graph import Graph

    directed = algo in ("scc", "harmonic")
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
    if steady_rounds:
        ts = _run_algo_steady(algo, g, steady_rounds)
        steady = ts[2:] if len(ts) > 4 else ts  # drop warm-up when affordable
        med = statistics.median(steady)
        print(
            json.dumps(
                {
                    "algo": algo,
                    "cpus": cpus,
                    "shuffle_partitions": sp,
                    "scale": scale,
                    "edges": E,
                    "rounds": len(ts),
                    "sec_per_round": round(med, 4),
                    "per_round_all": [round(x, 3) for x in ts],
                    "meps_round": round(E / med / 1e6, 3),
                }
            )
        )
        spark.stop()
        return
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
    ap.add_argument("--steady-rounds", type=int, default=0,
                    help=">0: fixed-round steady-state mode (per-round "
                         "medians instead of whole-run wall time)")
    args = ap.parse_args()
    if args.child:
        child(args.algo, args.cpus, args.scale, args.sp, args.steady_rounds)
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
                     "--scale", str(args.scale), "--sp", str(args.sp),
                     "--steady-rounds", str(args.steady_rounds)],
                    capture_output=True, text=True, check=True, cwd=REPO,
                )
                line = [l for l in out.stdout.strip().splitlines()
                        if l.startswith("{")][-1]
                r = json.loads(line)
                print(line, flush=True)
                k = "sec_per_round" if "sec_per_round" in r else "sec"
                if best is None or r[k] < best[k]:
                    best = r
            table[algo][cpus] = best

    pairs = []
    for algo in algos:
        for n in levels:
            if 4 * n in table[algo]:
                a, b = table[algo][n], table[algo][4 * n]
                key = "sec_per_round" if "sec_per_round" in a else "sec"
                pairs.append(
                    {
                        "algo": algo,
                        "n": n,
                        "n4": 4 * n,
                        "metric": key,
                        "sec_n": a[key],
                        "sec_4n": b[key],
                        "efficiency": round(a[key] / b[key] / 4, 4),
                    }
                )
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "algo_scaling.json")
    merged = {"runs": []}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {"runs": []}
    merged.setdefault("runs", []).append(
        {"levels": table, "pairs_4x": pairs, "scale": args.scale}
    )
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    for p in pairs:
        print(json.dumps(p))


if __name__ == "__main__":
    main()
