#!/usr/bin/env python
"""Interleaved A/B: _documents with vs without _spread, per bench doc query.
Also times the bench's bm25 float-tier path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from linkgraph.session import get_spark
import linkgraph.queries as Q

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="spread-ab", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

raw = lambda s, d: s.read.parquet(f"{d}/documents.parquet")
spread = lambda s, d: Q._spread(s.read.parquet(f"{d}/documents.parquet"))


def bm25_float(s, d):
    from linkgraph.text.retrieval import bm25_topk
    dd = Q._documents(s, d)
    toks = F.split(F.trim(F.col("text")), " ")
    qs = dd.filter(F.col("doc_id") % Q.BM25_QMOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 3, 5)).alias("text"),
    )
    return bm25_topk(dd, qs, k=Q.BM25_K, exact_int=False)


NAMES = ["doc_dsir", "doc_shingle_dups", "doc_gopher", "doc_span_dedup",
         "doc_line_dedup", "doc_quality_classifier"]

# warmup both variants once
for v in (raw, spread):
    Q._documents = v
    for n in NAMES:
        Q.QUERIES[n](spark, SF).count()
    bm25_float(spark, SF).count()

res = {}
for rep in range(4):
    for label, v in (("raw", raw), ("spread", spread)):
        Q._documents = v
        for n in NAMES + ["bm25_float"]:
            t0 = time.time()
            if n == "bm25_float":
                bm25_float(spark, SF).count()
            else:
                Q.QUERIES[n](spark, SF).count()
            res.setdefault((n, label), []).append(time.time() - t0)

for n in NAMES + ["bm25_float"]:
    a = sorted(res[(n, "raw")])
    b = sorted(res[(n, "spread")])
    print(f"{n:26s} raw min/med {a[0]:.2f}/{a[len(a)//2]:.2f}  "
          f"spread min/med {b[0]:.2f}/{b[len(b)//2]:.2f}")
spark.stop()
