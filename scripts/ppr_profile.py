#!/usr/bin/env python
"""Profile the ppr bench query: where do its ~31 jobs / ~5s warm go?
Times 3 warm reps of QUERIES['ppr'] and prints Spark job counts, then
times a phase-split run (prepare vs loop vs collect)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark
from linkgraph.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="ppr-profile", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

tracker = sc.statusTracker()

for rep in range(4):
    j0 = tracker.getJobIdsForGroup(None)
    n0 = max(j0) if j0 else -1
    t0 = time.time()
    QUERIES["ppr"](spark, SF).count()
    dt = time.time() - t0
    j1 = tracker.getJobIdsForGroup(None)
    n1 = max(j1) if j1 else -1
    print(f"rep{rep}: {dt:.2f}s jobs={n1 - n0}")

# phase split on the warm session
from pyspark.sql import functions as F
from linkgraph.structure.graph import Graph
from linkgraph.queries import supply_edges, ALPHA, PPR_SEEDS, PPR_ITERS
from linkgraph.algorithms.ppr import _ppr_state

t0 = time.time()
g = Graph.from_edgelist(supply_edges(spark, SF), directed=True, renumber=False)
t1 = time.time()
st = _ppr_state(g, PPR_SEEDS, alpha=ALPHA, iterations=PPR_ITERS)
t2 = time.time()
st.count()
t3 = time.time()
print(f"graph-build {t1-t0:.2f}s  loop(lazy+eager-ckpts) {t2-t1:.2f}s  final count {t3-t2:.2f}s")

# per-iteration wall: run with truncate_every=1 to see eager superstep cost
st = _ppr_state(g, PPR_SEEDS, alpha=ALPHA, iterations=PPR_ITERS, truncate_every=1)
t4 = time.time()
st.count()
print(f"te=1 loop+count {time.time()-t3:.2f}s")
spark.stop()
