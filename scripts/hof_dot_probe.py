#!/usr/bin/env python
"""A/B: HOF aggregate(zip_with(...)) integer dot vs unrolled element_at sum
for q_emb_topk. Checks exact row equality and times warm reps."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window
from linkgraph.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="hof-probe", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
dim = len(emb.select("embedding").first()[0])
print("dim =", dim, "rows =", emb.count())


def build(dot):
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("be"))
    pairs = q.join(b, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", dot.alias("dot_q")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "dot_q", "rnk")
    )


hof = F.expr(
    "aggregate(zip_with(qe, be, (x, y) -> "
    "cast(round(cast(x as double)*1000) as bigint) * "
    "cast(round(cast(y as double)*1000) as bigint)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)
terms = " + ".join(
    f"(cast(round(cast(qe[{i}] as double)*1000) as bigint) * "
    f"cast(round(cast(be[{i}] as double)*1000) as bigint))"
    for i in range(dim)
)
unrolled = F.expr(terms)

a = sorted(map(tuple, build(hof).collect()))
bres = sorted(map(tuple, build(unrolled).collect()))
print("identical:", a == bres, "rows:", len(a))

for label, d in (("hof", hof), ("unrolled", unrolled)):
    for rep in range(3):
        t0 = time.time()
        build(d).count()
        print(f"{label} rep{rep}: {time.time()-t0:.2f}s")
spark.stop()
