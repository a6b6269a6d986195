#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": ..., "value": cold_total_sec, "unit": "sec",
   "queries": {name: sec, ...},               # cold pass (fresh JVM)
   "value_warm": ..., "queries_warm": {...},  # second pass, same JVM
   "sf": ..., "pagerank_gteps_*": ...}

COLD vs WARM (VERDICT r1 item 10): the cold pass includes JVM/codegen
warm-up and first-touch parquet scans — it is what a single-shot driver run
measures. The warm pass repeats the identical work in the same session with
caches hot — it is the steady-state number a long-lived cluster session
sees. Both are emitted so committed claims and driver measurements can be
compared like-for-like.

The PageRank numbers double as the BASELINE.json throughput metric:
GTEPS = E * iterations / elapsed / 1e9 (edges traversed per second), per
BASELINE.md §2/§3. The RMAT workload mirrors the reference e2e benchmark
generator (benchmarks/python_e2e/cugraph_funcs.py:20-58: a=.1 b=.2 c=.3,
edgefactor 16, seed 42).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.algorithms.lpa import label_propagation  # noqa: E402
from linkgraph.algorithms.pagerank import pagerank  # noqa: E402
from linkgraph.algorithms.triangles import triangle_count  # noqa: E402
from linkgraph.algorithms.wcc import weakly_connected_components  # noqa: E402
from linkgraph.corpus import generate_pages  # noqa: E402
from linkgraph.extract import extract_text, pages_to_edges  # noqa: E402
from linkgraph.generators import rmat_edges  # noqa: E402
from linkgraph.queries import QUERIES, link_edges, supply_edges  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402
from linkgraph.structure.graph import Graph  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RMAT_SCALE = int(os.environ.get("BENCH_RMAT_SCALE", "17"))
RMAT_ITERS = int(os.environ.get("BENCH_RMAT_ITERS", "5"))
CORPUS_PAGES = int(os.environ.get("BENCH_CORPUS_PAGES", "5000"))
WARM_PASS = os.environ.get("BENCH_WARM_PASS", "1") != "0"


def main() -> None:
    spark = get_spark(
        app_name="linkgraph-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    extras: dict[str, float] = {}

    # shared cached inputs (built once; the cold pass pays the first scan)
    edges = link_edges(spark, SF_DIR).cache()
    g_dir = Graph.from_edgelist(edges, directed=True, renumber=False)
    g_und = Graph.from_edgelist(edges, directed=False, renumber=False)
    g_sup = Graph.from_edgelist(
        supply_edges(spark, SF_DIR), directed=False, renumber=False
    )
    redges = rmat_edges(spark, RMAT_SCALE, 16).cache()
    g_rmat = Graph.from_edgelist(redges, directed=True, renumber=False)
    E = None
    RE = None
    rmat_name = f"pagerank_rmat_s{RMAT_SCALE}_{RMAT_ITERS}it"

    def run_pass() -> tuple[dict, list]:
        timings: dict[str, float] = {}

        def timed(name, fn):
            t0 = time.time()
            out = fn()
            timings[name] = round(time.time() - t0, 3)
            return out

        def corpus_pipeline():
            pages = generate_pages(spark, CORPUS_PAGES, seed=42)
            ok = pages.filter(extract_text("html") == F.col("text"))
            return pages_to_edges(ok).count()

        extras["corpus_edges"] = timed("corpus_extract", corpus_pipeline)
        timed("pagerank_15it", lambda: pagerank(g_dir, fixed_iterations=15).count())
        timed("wcc", lambda: weakly_connected_components(g_und).count())
        timed("lpa_4it", lambda: label_propagation(g_und, fixed_iterations=4).count())
        timed("triangles", lambda: triangle_count(g_sup))
        ts: list = []
        timed(
            rmat_name,
            lambda: pagerank(
                g_rmat, fixed_iterations=RMAT_ITERS + 3, iteration_timings=ts
            ).count(),
        )
        # r3 added doc_gopher/host_pagerank/doc_span_dedup/ppr; r4 adds
        # harmonic (HyperBall), doc_dsir (data selection), doc_line_dedup
        # (C4 line pass), doc_bm25 (sparse retrieval), mis (Luby), and
        # doc_quality_classifier (hashed linear scorer, pure-codegen map) —
        # the round-over-round comparison stays like-for-like on the shared
        # prefix, new queries are reported per-query. PQ / mix-sampling
        # scale evidence lives in scripts/webtext_scaling.py (their sf0.1
        # tables are too small to stress them here).
        for name in (
            "doc_shingle_dups",
            "emb_topk",
            "events_hourly",
            "doc_gopher",
            "host_pagerank",
            "doc_span_dedup",
            "ppr",
            "harmonic",
            "doc_dsir",
            "doc_line_dedup",
            "mis",
            "doc_quality_classifier",
        ):
            timed(name, lambda n=name: QUERIES[n](spark, SF_DIR).count())

        def bm25_production():
            # the float ln-idf production tier — the exact-int tier the
            # driver oracle checks is a small-corpus dialect and refuses
            # (by design) corpora big enough to overflow its BIGINT
            # saturation chain, which sf0.1 is
            from linkgraph.queries import BM25_K, BM25_QMOD, _documents
            from linkgraph.text.retrieval import bm25_topk

            d = _documents(spark, SF_DIR)
            toks = F.split(F.trim(F.col("text")), " ")
            qs = d.filter(F.col("doc_id") % BM25_QMOD == 0).select(
                F.col("doc_id").alias("query_id"),
                F.concat_ws(" ", F.slice(toks, 3, 5)).alias("text"),
            )
            return bm25_topk(d, qs, k=BM25_K, exact_int=False).count()

        timed("doc_bm25", bm25_production)
        return timings, ts

    # --- cold pass: fresh JVM, first-run codegen, first parquet touch ---
    cold, ts_cold = run_pass()
    E = edges.count()
    RE = redges.count()
    extras["link_graph_edges"] = E
    extras["rmat_edges"] = RE
    extras["pagerank_gteps_linkgraph"] = round(E * 15 / cold["pagerank_15it"] / 1e9, 6)
    extras["pagerank_gteps_rmat_e2e"] = round(
        RE * (RMAT_ITERS + 3) / cold[rmat_name] / 1e9, 6
    )
    med = statistics.median(ts_cold[3:])  # steady state, warmup dropped
    extras["pagerank_gteps_rmat_steady"] = round(RE / med / 1e9, 6)
    extras["pagerank_sec_per_superstep_steady"] = round(med, 4)

    out = {
        "metric": "linkgraph_headline_suite",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "sf": SF_DIR,
        "cpus": CPUS,
        **extras,
    }

    # --- warm passes: identical work, same JVM, caches hot. Three total
    # repetitions (VERDICT r2 item 10): with measured ±40% cross-boot host
    # jitter, single-shot numbers mislead — the JSON carries per-query
    # min and median across all passes alongside the cold/warm pair.
    all_passes = [cold]
    if WARM_PASS:
        warm, ts_warm = run_pass()
        out["value_warm"] = round(sum(warm.values()), 3)
        out["queries_warm"] = warm
        med_w = statistics.median(ts_warm[3:])
        out["pagerank_gteps_rmat_steady_warm"] = round(RE / med_w / 1e9, 6)
        warm2, _ = run_pass()
        all_passes += [warm, warm2]
        out["queries_min"] = {
            q: round(min(p[q] for p in all_passes), 3) for q in cold
        }
        out["queries_median"] = {
            q: round(statistics.median(p[q] for p in all_passes), 3) for q in cold
        }
        out["value_min"] = round(sum(out["queries_min"].values()), 3)
        out["value_median"] = round(sum(out["queries_median"].values()), 3)
        out["n_reps"] = len(all_passes)

    # Full record -> file; stdout gets a COMPACT line. The driver captures
    # only a short stdout tail, and the per-query warm/min/median maps grew
    # past it in round 4 (BENCH_r04 "parsed": null) — so the complete JSON
    # (all passes, all per-query maps) is committed under BENCH/ and the
    # LAST stdout line carries the contract fields + totals + throughput
    # extras with the cold per-query map only (~1.2 kB).
    os.makedirs("BENCH", exist_ok=True)
    full_path = os.path.join("BENCH", "bench_full_latest.json")
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    compact = {
        k: v
        for k, v in out.items()
        if k not in ("queries_warm", "queries_min", "queries_median")
    }
    compact["queries"] = {q: round(s, 2) for q, s in compact["queries"].items()}
    compact["full_json"] = full_path
    line = json.dumps(compact)
    if len(line) > 1900:  # defensive: never outgrow the capture window again
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
