#!/usr/bin/env python
"""Scale-up evidence run: PageRank on RMAT-24 (V=2^24, E=268M) at local[32].

VERDICT r5 'Next round' item 4: convert the 100x design argument into a
measurement — per-superstep wall times on a graph ~8x the previous largest
committed run (RMAT-21). Uses the shuffle-state path (V=16.7M >> broadcast
gate) and the session's scale-adaptive partitioning (shuffle_partitions =
2 x cores, the guide §9 cluster-sane setting; pick_partitions caps at it).

Results are appended to BENCH/BASELINE.md by hand (round-6 section).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.algorithms.pagerank import pagerank  # noqa: E402
from linkgraph.generators import rmat_edges  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402
from linkgraph.structure.graph import Graph  # noqa: E402

SCALE = int(os.environ.get("RMAT_SCALE", "24"))
ITERS = int(os.environ.get("RMAT_ITERS", "5"))


def main():
    spark = get_spark(
        app_name=f"rmat{SCALE}-scale",
        master="local[32]",
        shuffle_partitions=64,  # 2x cores — guide §9 cluster-sane setting
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    edges = rmat_edges(spark, SCALE, 16).persist()
    n_e = edges.count()
    t_gen = time.time() - t0
    g = Graph.from_edgelist(edges, directed=True, renumber=False)
    ts: list = []
    t0 = time.time()
    pagerank(g, fixed_iterations=ITERS, iteration_timings=ts).count()
    t_pr = time.time() - t0
    sc = spark.sparkContext._jsc.sc()
    mem = sc.getExecutorMemoryStatus().size()
    out = {
        "scale": SCALE,
        "edges": n_e,
        "vertices": 1 << SCALE,
        "gen_sec": round(t_gen, 1),
        "pagerank_iters": ITERS,
        "pagerank_total_sec": round(t_pr, 1),
        "sec_per_superstep": [round(x, 2) for x in ts],
        "steady_median": round(sorted(ts[1:])[len(ts[1:]) // 2], 2),
        "gteps_steady": round(
            n_e / sorted(ts[1:])[len(ts[1:]) // 2] / 1e9, 4
        ),
        "shuffle_partitions": 64,
        "executors": mem,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
