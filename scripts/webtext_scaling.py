#!/usr/bin/env python
"""N-vs-4N scaling evidence for the late-round-3 webtext/curation operators
(span_dedup, kmeans_embeddings) — same protocol as scripts/algo_scaling.py:
no real cluster exists in this sandbox, so the north rule's two-cluster-size
criterion is evidenced by running the IDENTICAL job at local[N] and
local[4N] on the IDENTICAL deterministic synthetic input, one fresh JVM per
level, shuffle partitions held CONSTANT across levels.

Inputs are generated INSIDE Spark (spark.range + pure-JVM expressions), so
there is no driver-side data and the generator itself scales with the
executor count:

- span_dedup corpus: ``n_docs`` documents of ``doc_len`` tokens drawn from a
  ``vocab``-token vocabulary by a per-(doc, pos) LCG — small vocab so w-token
  spans genuinely repeat and the duplicate path does real work.
- kmeans corpus: ``n_vecs`` 64-dim unit-ish vectors from the same LCG.

Usage: python scripts/webtext_scaling.py [--levels 8,32] [--n-docs 1500000]
       [--n-vecs 1500000] [--ops span_dedup,kmeans] [--repeat 1]
Child mode: --child --op span_dedup --cpus N
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
        app_name=f"webtext-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
    )


def _doc_corpus(spark, n_docs: int, doc_len: int = 40, vocab: int = 5000):
    """DF[doc_id, text] — deterministic, generated executor-side. Tokens come
    from murmur3 hash(base, j) (no arithmetic structure), and every 5th doc
    copies its 100-block anchor's text, so ~20% of documents are genuine
    duplicates — the span-dedup duplicate path does real, bounded work."""
    from pyspark.sql import functions as F

    base = f"CASE WHEN id % 5 = 0 THEN id - (id % 100) ELSE id END"
    tok = (
        f"transform(sequence(1, {doc_len}), j -> "
        f"concat('t', cast(pmod(hash({base}, j), {vocab}) as string)))"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat_ws(' ', {tok})").alias("text"),
    )


def _vec_corpus(spark, n_vecs: int, dim: int = 64):
    from pyspark.sql import functions as F

    vec = (
        f"transform(sequence(1, {dim}), j -> "
        f"cast((id * 1103515245 + j * 7919 + 12345) % 2147483648 as double) "
        f"/ 2147483648.0 - 0.5)"
    )
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )


def _line_corpus(spark, n_docs: int, n_lines: int = 20, vocab: int = 50_000):
    """DF[doc_id, text] — docs of ``n_lines`` newline-separated lines drawn
    from a ``vocab``-line universe, so every line repeats ~n_docs*n_lines/
    vocab times corpus-wide and the duplicate path does real work (group
    sizes are duplicate counts — hundreds, never hub-sized)."""
    from pyspark.sql import functions as F

    line = (
        f"transform(sequence(1, {n_lines}), i -> concat('line with token ', "
        f"cast(pmod(hash(id, i), {vocab}) as string)))"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.expr(line), "\n").alias("text"),
    )


def run_child(op: str, cpus: int, n_docs: int, n_vecs: int) -> None:
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if op in ("span_dedup", "span_dedup_hash"):
        from linkgraph.text.dedup import span_dedup

        hashed = op == "span_dedup_hash"
        df = _doc_corpus(spark, n_docs).cache()
        df.count()  # pay generation + cache before timing
        # warm-up: codegen/shuffle-path on a small slice
        span_dedup(df.limit(20000), hash_spans=hashed).count()
        t0 = time.time()
        out = span_dedup(df, hash_spans=hashed)
        removed = out.agg({"n_removed": "sum"}).collect()[0][0]
        wall = time.time() - t0
        units = n_docs * 40  # tokens processed
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": units, "removed": int(removed or 0)}))
    elif op == "kmeans":
        from linkgraph.similarity import kmeans_embeddings

        df = _vec_corpus(spark, n_vecs).cache()
        df.count()
        kmeans_embeddings(df.limit(20000), k=8, iterations=1).count()
        t0 = time.time()
        kmeans_embeddings(df, k=8, iterations=4).count()
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_vecs * 4}))
    elif op == "mix":
        from pyspark.sql import functions as F

        from linkgraph.text.pipeline import token_budget_sample

        df = (
            _doc_corpus(spark, n_docs)
            .withColumn("lang", (F.col("doc_id") % 5).cast("string"))
            .cache()
        )
        df.count()
        token_budget_sample(
            df.limit(20000), {"0": 1000}, default_budget=500
        ).count()
        toks = n_docs * 40
        budgets = {"0": toks // 10, "1": toks // 20}  # boundary inside strata
        t0 = time.time()
        kept = token_budget_sample(
            df, budgets, default_budget=toks // 40
        ).count()
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": toks, "kept": int(kept)}))
    elif op == "qcls":
        from linkgraph.text.pipeline import hashed_linear_quality

        df = _doc_corpus(spark, n_docs).cache()
        df.count()
        hashed_linear_quality(df.limit(20000)).agg({"score": "sum"}).collect()
        t0 = time.time()
        tot = hashed_linear_quality(df).agg({"score": "sum"}).collect()[0][0]
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_docs * 40, "score_sum": int(tot)}))
    elif op == "bm25":
        from pyspark.sql import functions as F

        from linkgraph.text.retrieval import bm25_topk

        df = _doc_corpus(spark, n_docs).cache()
        df.count()
        qtok = (
            "concat_ws(' ', transform(sequence(1, 5), j -> "
            "concat('t', cast(pmod(hash(id * 31 + 7, j), 5000) as string))))"
        )
        qs = spark.range(256).select(
            F.col("id").alias("query_id"), F.expr(qtok).alias("text")
        )
        bm25_topk(df.limit(20000), qs.limit(8), k=10, exact_int=False).count()
        t0 = time.time()
        out = bm25_topk(df, qs, k=10, exact_int=False)
        # cross-level identity: hash the integer ranking (score is float —
        # rank/doc assignment is what must agree), plus the row count
        chk = out.agg(
            F.expr("bit_xor(xxhash64(query_id, rank, doc_id))").alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_docs * 40,
                          "check": f"{int(chk['h'])}/{int(chk['n'])}"}))
    elif op == "line_dedup":
        from pyspark.sql import functions as F

        from linkgraph.text.dedup import line_dedup

        df = _line_corpus(spark, n_docs).cache()
        df.count()
        line_dedup(df.limit(20000)).count()
        t0 = time.time()
        out = line_dedup(df)
        chk = out.agg(
            F.expr("bit_xor(xxhash64(doc_id, text_dedup))").alias("h"),
            F.sum("n_removed").alias("r"),
        ).collect()[0]
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_docs * 20,
                          "check": f"{int(chk['h'])}/{int(chk['r'])}"}))
    elif op == "bpe":
        from pyspark.sql import functions as F

        from linkgraph.text.bpe import bpe_train

        df = _doc_corpus(spark, n_docs).cache()
        df.count()
        bpe_train(df.limit(20000), num_merges=2)
        t0 = time.time()
        merges, vocab = bpe_train(df, num_merges=4)
        rows = sorted(tuple(r) for r in merges.collect())
        wall = time.time() - t0
        import hashlib

        digest = hashlib.md5(repr(rows).encode()).hexdigest()
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_docs * 40, "check": digest}))
    elif op == "pack":
        from pyspark.sql import functions as F

        from linkgraph.text.pipeline import pack_sequences

        df = _doc_corpus(spark, n_docs).cache()
        df.count()
        pack_sequences(df.limit(20000), window=2048).count()
        t0 = time.time()
        out = pack_sequences(df, window=2048)
        chk = out.agg(
            F.expr(
                "bit_xor(xxhash64(chunk_id, doc_id, doc_off, chunk_off, n_toks))"
            ).alias("h"),
            F.sum("n_toks").alias("t"),
        ).collect()[0]
        wall = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_docs * 40,
                          "check": f"{int(chk['h'])}/{int(chk['t'])}"}))
    elif op == "pq":
        from linkgraph.similarity import pq_train_encode

        df = _vec_corpus(spark, n_vecs).cache()
        df.count()
        c0, _, q0 = pq_train_encode(df.limit(20000), m=4, k=16, iterations=1)
        c0.count()
        q0.unpersist()
        t0 = time.time()
        codes, _, q = pq_train_encode(df, m=4, k=16, iterations=2)
        n = codes.count()
        wall = time.time() - t0
        q.unpersist()
        print(json.dumps({"op": op, "cpus": cpus, "wall_s": round(wall, 2),
                          "units": n_vecs * (4 * 2 + 1), "encoded": int(n)}))
    else:
        raise SystemExit(f"unknown op {op}")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--n-docs", type=int, default=1_500_000)
    ap.add_argument("--n-vecs", type=int, default=1_500_000)
    ap.add_argument("--ops", default="span_dedup,kmeans")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--op")
    ap.add_argument("--cpus", type=int)
    args = ap.parse_args()

    if args.child:
        run_child(args.op, args.cpus, args.n_docs, args.n_vecs)
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for rep in range(args.repeat):
        for op in args.ops.split(","):
            for cpus in levels:
                cmd = [
                    sys.executable, os.path.abspath(__file__), "--child",
                    "--op", op, "--cpus", str(cpus),
                    "--n-docs", str(args.n_docs), "--n-vecs", str(args.n_vecs),
                ]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO, check=True
                )
                line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
                rec = json.loads(line)
                rec["rep"] = rep
                results.append(rec)
                print(json.dumps(rec), flush=True)
    # output identity across parallelism levels: every op that emits a
    # "check" value must produce the SAME value at local[N] and local[4N]
    chks: dict = {}
    for r in results:
        if "check" in r:
            chks.setdefault((r["op"], r["rep"]), set()).add(r["check"])
    for key, vals in chks.items():
        assert len(vals) == 1, f"cross-level output mismatch for {key}: {vals}"

    # scaling efficiency per op: (t_N / t_4N) / (4N/N)
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
    with open(os.path.join(REPO, "BENCH", "webtext_scaling.json"), "w") as f:
        json.dump({"results": results, "summary": summary,
                   "shuffle_partitions": SHUFFLE_PARTITIONS}, f, indent=1)


if __name__ == "__main__":
    main()
