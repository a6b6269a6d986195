#!/usr/bin/env python
"""Probe: fused PPR loop with SHUFFLE state (fully lazy, no per-iteration
broadcast job) vs the broadcast-state variant. Parity + timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from linkgraph.session import get_spark
from linkgraph.structure.graph import Graph
from linkgraph.queries import supply_edges, ALPHA, PPR_SEEDS, PPR_ITERS
from linkgraph.algorithms.ppr import _ppr_state
from linkgraph.algorithms.pagerank import _prepare, no_aqe

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ppr-profile3", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def shuffle_ppr_state(g, seeds, alpha, iterations, truncate_every=4):
    _vtab, ecoef, nparts = _prepare(g, None, part_key="src")
    seed_df = spark.createDataFrame([(s,) for s in sorted(seeds)], ["__ext__"])
    seeds_int = seed_df.select(F.col("__ext__").cast("long").alias("seed"))
    state = seeds_int.select("seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r"))
    ones = seeds_int.select("seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r"))
    with no_aqe(spark, nparts):
        for it in range(1, iterations + 1):
            st_src = state.select(F.col("vertex").alias("src"), "seed", "r").repartition(
                nparts, "src"
            )
            c = F.col("coef") * F.col("r") * F.lit(alpha)
            pairs = (
                ecoef.join(st_src, on="src")
                .select(
                    "seed",
                    F.explode(
                        F.array(
                            F.struct(F.col("dst").alias("vertex"), c.alias("r")),
                            F.struct(F.col("seed").alias("vertex"), (-c).alias("r")),
                        )
                    ).alias("x"),
                )
                .select("seed", F.col("x.vertex").alias("vertex"), F.col("x.r").alias("r"))
            )
            new = pairs.unionByName(ones).groupBy("seed", "vertex").agg(F.sum("r").alias("r"))
            if it % truncate_every == 0 or it == iterations:
                new = new.localCheckpoint(eager=True)
            state = new
    return state


g = Graph.from_edgelist(supply_edges(spark, SF), directed=True, renumber=False)
# parity vs current (broadcast fused) implementation
cur = _ppr_state(g, PPR_SEEDS, alpha=ALPHA, iterations=PPR_ITERS).select(
    "seed", "vertex", F.round(F.col("r") * 1e7).cast("long").alias("e7")
)
sh = shuffle_ppr_state(g, PPR_SEEDS, ALPHA, PPR_ITERS).select(
    "seed", "vertex", F.round(F.col("r") * 1e7).cast("long").alias("e7")
)
o = {(r.seed, r.vertex): r.e7 for r in cur.collect()}
n = {(r.seed, r.vertex): r.e7 for r in sh.collect()}
mism = {k for k in set(o) | set(n) if o.get(k) != n.get(k)}
print(f"parity: rows cur={len(o)} shuffle={len(n)} e7_mismatches={len(mism)}")

for rep in range(4):
    g2 = Graph.from_edgelist(supply_edges(spark, SF), directed=True, renumber=False)
    t0 = time.time()
    shuffle_ppr_state(g2, PPR_SEEDS, ALPHA, PPR_ITERS).count()
    print(f"shuffle rep{rep}: {time.time()-t0:.2f}s")
for rep in range(2):
    g2 = Graph.from_edgelist(supply_edges(spark, SF), directed=True, renumber=False)
    t0 = time.time()
    _ppr_state(g2, PPR_SEEDS, alpha=ALPHA, iterations=PPR_ITERS).count()
    print(f"bcast-fused rep{rep}: {time.time()-t0:.2f}s")
spark.stop()
