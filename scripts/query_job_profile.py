#!/usr/bin/env python
"""Warm-rep job-count + wall profile for selected bench queries."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark
from linkgraph.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = sys.argv[1:] or ["mis", "harmonic", "emb_topk", "doc_dsir", "wcc", "lpa"]

spark = get_spark(app_name="job-profile", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()

for name in NAMES:
    for rep in range(3):
        j0 = tracker.getJobIdsForGroup(None)
        n0 = max(j0) if j0 else -1
        t0 = time.time()
        QUERIES[name](spark, SF).count()
        dt = time.time() - t0
        j1 = tracker.getJobIdsForGroup(None)
        print(f"{name} rep{rep}: {dt:.2f}s jobs={(max(j1) if j1 else -1) - n0}")
spark.stop()
