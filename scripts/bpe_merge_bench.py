#!/usr/bin/env python
"""BPE merge-loop bench: sequential vs batched argmax rounds at >= 1k
merges (VERDICT r5 item 3). The merge loop is vocabulary-scale, so its
cost is driver round-trips x job floor — exactly what batch_merges cuts.
Writes BENCH/bpe_merge_scale.json.

Usage: python scripts/bpe_merge_bench.py [num_merges] [batch]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark
from linkgraph.text.bpe import bpe_train

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

spark = get_spark(app_name="bpe-merge-bench", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()

if os.environ.get("BPE_BENCH_CORPUS", "synthetic") == "docs":
    docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
else:
    # deterministic Zipfian corpus with a vocabulary rich enough to
    # sustain >= 1k merges (the sf0.1 documents table tops out at ~107
    # merges): 4096 distinct words, word i = base-26 alpha encoding of a
    # splitmix-style hash (8-12 chars), frequency ~ 1/(i+1).
    from pyspark.sql import functions as F

    n_vocab = int(os.environ.get("BPE_BENCH_VOCAB", "4096"))
    w = (
        spark.range(n_vocab)
        .select(
            F.col("id"),
            F.expr(
                "concat_ws('', transform(sequence(0, 7 + cast(id % 5 as int)), "
                "j -> char(97 + pmod(hash(id * 2654435761 + j * 40503), 26))))"
            ).alias("word"),
            (F.lit(100000) / (F.col("id") + 1)).cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") >= 1)
    )
    docs = w.select(
        F.col("id").alias("doc_id"),
        F.expr("concat_ws(' ', transform(sequence(1, cast(cnt as int)), x -> word))").alias("text"),
    ).cache()
docs.count()

out = {"sf": SF, "num_merges": K, "batch": B}
for name, kw in (("sequential", {}), (f"batched_{B}", {"batch_merges": B})):
    j0 = max(tracker.getJobIdsForGroup(None) or [-1])
    t0 = time.time()
    merges, vocab = bpe_train(docs, K, **kw)
    got = merges.count()
    dt = time.time() - t0
    jobs = max(tracker.getJobIdsForGroup(None) or [-1]) - j0
    out[name] = {"sec": round(dt, 2), "merges": int(got), "jobs": int(jobs),
                 "sec_per_merge": round(dt / max(got, 1), 4)}
    print(name, out[name])

# exactness cross-check at this scale: the two merge lists must be identical
m_seq, _ = bpe_train(docs, min(K, 256))
m_b, _ = bpe_train(docs, min(K, 256), batch_merges=B)
seq = [tuple(r) for r in m_seq.orderBy("rank").collect()]
bat = [tuple(r) for r in m_b.orderBy("rank").collect()]
out["exactness_256"] = seq == bat
print("exactness_256:", out["exactness_256"])

os.makedirs("BENCH", exist_ok=True)
with open("BENCH/bpe_merge_scale.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps(out))
spark.stop()
