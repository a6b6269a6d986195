#!/usr/bin/env python
"""A/B parity + timing probe for the fused PPR superstep: run the NEW
_ppr_state and an inline copy of the OLD (msgs-persist + restart-join)
loop on the same graph, compare e7-rounded outputs exactly, and time
warm reps of the bench query."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.session import get_spark
from linkgraph.structure.graph import Graph
from linkgraph.queries import QUERIES, supply_edges, ALPHA, PPR_SEEDS, PPR_ITERS
from linkgraph.algorithms.ppr import _ppr_state
from linkgraph.algorithms.pagerank import BROADCAST_STATE_MAX_V, _prepare, no_aqe

SFS = ["/root/testdata/sf0.1", "/root/testdata/sf0.01"]

spark = get_spark(app_name="ppr-parity", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def old_ppr_state(graph, seeds, alpha, iterations, truncate_every=4):
    bcast = graph.number_of_vertices() * len(set(seeds)) <= BROADCAST_STATE_MAX_V
    _vtab, ecoef, nparts = _prepare(graph, None, part_key="dst" if bcast else "src")
    seed_df = spark.createDataFrame([(s,) for s in sorted(seeds)], ["__ext__"])
    seeds_int = F.broadcast(
        seed_df.select(F.col("__ext__").cast("long").alias("seed"))
    )
    state = seeds_int.select("seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r"))
    with no_aqe(spark, nparts):
        live_msgs = []
        for it in range(1, iterations + 1):
            st_src = state.select(F.col("vertex").alias("src"), "seed", "r")
            st_src = F.broadcast(st_src) if bcast else st_src.repartition(nparts, "src")
            msgs = (
                ecoef.join(st_src, on="src")
                .groupBy("seed", F.col("dst").alias("vertex"))
                .agg(F.sum(F.col("coef") * F.col("r") * F.lit(alpha)).alias("r"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            restart = (
                seeds_int.join(
                    msgs.groupBy("seed").agg(F.sum("r").alias("m")), on="seed", how="left"
                )
                .select(
                    "seed",
                    F.col("seed").alias("vertex"),
                    (F.lit(1.0) - F.coalesce(F.col("m"), F.lit(0.0))).alias("r"),
                )
            )
            new = msgs.unionByName(restart).groupBy("seed", "vertex").agg(F.sum("r").alias("r"))
            live_msgs.append(msgs)
            if it % truncate_every == 0 or it == iterations:
                new = new.localCheckpoint(eager=True)
                for m in live_msgs:
                    m.unpersist()
                live_msgs.clear()
            else:
                new = new.localCheckpoint(eager=False)
            state = new
    return state


for sf in SFS:
    g = Graph.from_edgelist(supply_edges(spark, sf), directed=True, renumber=False)
    old = old_ppr_state(g, PPR_SEEDS, ALPHA, PPR_ITERS).select(
        "seed", "vertex", F.round(F.col("r") * 1e7).cast("long").alias("e7")
    )
    new = _ppr_state(g, PPR_SEEDS, alpha=ALPHA, iterations=PPR_ITERS).select(
        "seed", "vertex", F.round(F.col("r") * 1e7).cast("long").alias("e7")
    )
    o = {(r.seed, r.vertex): r.e7 for r in old.collect()}
    n = {(r.seed, r.vertex): r.e7 for r in new.collect()}
    mism = {k: (o.get(k), n.get(k)) for k in set(o) | set(n) if o.get(k) != n.get(k)}
    print(f"{sf}: rows old={len(o)} new={len(n)} e7_mismatches={len(mism)}")
    if mism:
        print(dict(list(mism.items())[:5]))

# warm timing of the bench query path (new implementation)
for rep in range(4):
    t0 = time.time()
    QUERIES["ppr"](spark, SFS[0]).count()
    print(f"ppr rep{rep}: {time.time()-t0:.2f}s")
spark.stop()
