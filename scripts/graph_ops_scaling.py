#!/usr/bin/env python
"""N-vs-4N scaling evidence for the round-4 graph/curation operators
(densest_subgraph, local_cluster, ccnet_perplexity) — same protocol as
scripts/algo_scaling.py / webtext_scaling.py: the north rule's
two-cluster-size criterion is evidenced by running the IDENTICAL job at
local[N] and local[4N] on the IDENTICAL deterministic input, one fresh
JVM per level, shuffle partitions held CONSTANT across levels.

Inputs are generated INSIDE Spark:

- densest / local_cluster: RMAT graph (skewed web-like degrees, the
  engine's standard scaling input) at --scale with edgefactor 16;
- ccnet: the webtext_scaling document corpus (hash-token docs), with the
  id%20==0 slice as the LM reference.

Usage: python scripts/graph_ops_scaling.py [--levels 8,32] [--scale 20]
       [--n-docs 1500000] [--ops densest,local_cluster,ccnet] [--repeat 1]
Child mode: --child --op densest --cpus N
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

SHUFFLE_PARTITIONS = 64  # constant across levels per the r1 methodology note


def _spark(cpus: int):
    from linkgraph.session import get_spark

    return get_spark(
        app_name=f"graph-ops-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
    )


def _doc_corpus(spark, n_docs: int, doc_len: int = 40, vocab: int = 5000):
    from pyspark.sql import functions as F

    tok = (
        f"transform(sequence(1, {doc_len}), j -> "
        f"concat('t', cast(pmod(hash(id, j), {vocab}) as string)))"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat_ws(' ', {tok})").alias("text"),
    )


def run_child(op: str, cpus: int, scale: int, n_docs: int) -> None:
    from pyspark.sql import functions as F

    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if op in ("densest", "local_cluster"):
        from linkgraph.generators import rmat_edges
        from linkgraph.structure.graph import Graph

        edges = rmat_edges(spark, scale, 16).cache()
        n_edges = edges.count()  # pay generation + cache before timing
        g = Graph.from_edgelist(edges, directed=False, renumber=False)
        if op == "densest":
            from linkgraph.algorithms.densest import densest_subgraph

            # warm-up on a slice for codegen/shuffle paths
            gs = Graph.from_edgelist(edges.limit(50000), directed=False, renumber=False)
            densest_subgraph(gs, epsilon=0.5).count()
            t0 = time.time()
            out = densest_subgraph(g, epsilon=0.5)
            n = out.count()
            wall = time.time() - t0
            print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                              "units": n_edges, "subgraph_v": n}))
        else:
            from linkgraph.algorithms.local_cluster import local_cluster

            gs = Graph.from_edgelist(edges.limit(50000), directed=False, renumber=False)
            local_cluster(gs, seed=0, iterations=3, max_support=100_000).count()
            t0 = time.time()
            # production pattern: bounded sweep (the RMAT walk reaches a
            # large graph fraction; max_support keeps the window M-bounded)
            out = local_cluster(g, seed=0, iterations=6, max_support=100_000)
            n = out.count()
            wall = time.time() - t0
            print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                              "units": n_edges * 6, "cluster_v": n}))
    elif op == "ccnet":
        from linkgraph.text.pipeline import ccnet_perplexity

        df = _doc_corpus(spark, n_docs).cache()
        df.count()
        ref = df.filter(F.col("doc_id") % 20 == 0)
        scores, _t, _c = ccnet_perplexity(df.limit(20000), ref.limit(2000))
        scores.count()  # warm-up
        t0 = time.time()
        scores, _t, _c = ccnet_perplexity(df, ref)
        scores.count()
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_docs * 40}))
    else:
        raise SystemExit(f"unknown op {op}")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--n-docs", type=int, default=1_500_000)
    ap.add_argument("--ops", default="densest,local_cluster,ccnet")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--op")
    ap.add_argument("--cpus", type=int)
    args = ap.parse_args()

    if args.child:
        run_child(args.op, args.cpus, args.scale, args.n_docs)
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for rep in range(args.repeat):
        for op in args.ops.split(","):
            for cpus in levels:
                cmd = [
                    sys.executable, os.path.abspath(__file__), "--child",
                    "--op", op, "--cpus", str(cpus),
                    "--scale", str(args.scale), "--n-docs", str(args.n_docs),
                ]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO, check=True
                )
                line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
                rec = json.loads(line)
                rec["rep"] = rep
                results.append(rec)
                print(json.dumps(rec), flush=True)
    by = {}
    for r in results:
        by.setdefault(r["op"], {}).setdefault(r["cpus"], []).append(r["wall_s"])
    summary = {}
    for op, lv in by.items():
        lo, hi = min(lv), max(lv)
        t_lo = min(lv[lo])
        t_hi = min(lv[hi])
        eff = (t_lo / t_hi) / (hi / lo)
        summary[op] = {
            f"t_{lo}": t_lo, f"t_{hi}": t_hi,
            "speedup": round(t_lo / t_hi, 3),
            "efficiency": round(eff, 3),
        }
    print(json.dumps({"summary": summary}))
    with open(os.path.join(REPO, "BENCH", "graph_ops_scaling.json"), "w") as f:
        json.dump({"results": results, "summary": summary,
                   "shuffle_partitions": SHUFFLE_PARTITIONS,
                   "scale": args.scale, "n_docs": args.n_docs}, f, indent=1)


if __name__ == "__main__":
    main()
