#!/usr/bin/env python
"""Capture .explain('formatted') output for declared queries into
plans/<tag>/<name>_<suffix>.txt (judge evidence for optimization rounds).

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
Defaults to the bench headline queries. Iterative queries execute their
in-loop actions during construction; the captured plan is the final frame's
physical plan (post-checkpoint scan + tail), which is still the shape the
driver's final action executes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.queries import QUERIES  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

HEADLINE = [
    "pagerank", "wcc", "lpa", "triangles", "doc_shingle_dups", "emb_topk",
    "events_hourly", "doc_gopher", "host_pagerank", "doc_span_dedup", "ppr",
    "harmonic", "doc_dsir", "doc_line_dedup", "mis", "doc_quality_classifier",
    "doc_bm25",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}_{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
