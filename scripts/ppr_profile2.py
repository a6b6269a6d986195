#!/usr/bin/env python
"""Fine-grained timing of the fused PPR loop: per-iteration plan build
(DataFrame construction + localCheckpoint call) vs eager materialization."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from linkgraph.session import get_spark
from linkgraph.structure.graph import Graph
from linkgraph.queries import supply_edges, ALPHA, PPR_SEEDS, PPR_ITERS
from linkgraph.algorithms.pagerank import BROADCAST_STATE_MAX_V, _prepare, no_aqe

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ppr-profile2", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()

for rep in range(3):
    g = Graph.from_edgelist(supply_edges(spark, SF), directed=True, renumber=False)
    t0 = time.time()
    bcast = g.number_of_vertices() * len(PPR_SEEDS) <= BROADCAST_STATE_MAX_V
    _vtab, ecoef, nparts = _prepare(g, None, part_key="dst" if bcast else "src")
    t_prep = time.time() - t0
    seed_df = spark.createDataFrame([(s,) for s in sorted(PPR_SEEDS)], ["__ext__"])
    seeds_int = F.broadcast(seed_df.select(F.col("__ext__").cast("long").alias("seed")))
    state = seeds_int.select("seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r"))
    ones = seeds_int.select("seed", F.col("seed").alias("vertex"), F.lit(1.0).alias("r"))
    build_t, ckpt_t = [], []
    with no_aqe(spark, nparts):
        for it in range(1, PPR_ITERS + 1):
            t1 = time.time()
            st_src = state.select(F.col("vertex").alias("src"), "seed", "r")
            st_src = F.broadcast(st_src) if bcast else st_src.repartition(nparts, "src")
            c = F.col("coef") * F.col("r") * F.lit(ALPHA)
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
            eager = it % 4 == 0 or it == PPR_ITERS
            t2 = time.time()
            new = new.localCheckpoint(eager=eager)
            t3 = time.time()
            build_t.append(t2 - t1)
            ckpt_t.append((t3 - t2, eager))
            state = new
    n = state.count()
    print(f"rep{rep}: prep={t_prep:.2f} build={[round(x,2) for x in build_t]}")
    print(f"   ckpt={[(round(x,2), e) for x, e in ckpt_t]} rows={n}")
    j = tracker.getJobIdsForGroup(None)
    print(f"   max job id so far: {max(j) if j else -1}")
spark.stop()
