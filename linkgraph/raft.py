"""Reference `cugraph.raft` surface.

The reference's `raft_include_test` (tested at tests/test_raft.py:20) is a
build-sanity probe: "is the native RAFT layer linked and callable?". The
Spark-native equivalent asks the same question of this engine's substrate:
is a JVM gateway reachable and does a trivial job run? Kept cheap — one
1-row local-relation count, no shuffle — so it is safe to call at startup.
"""

from __future__ import annotations


def raft_include_test() -> bool:
    """True iff the execution substrate (SparkSession + JVM) is callable."""
    from .session import get_spark

    spark = get_spark()
    return spark.range(1).count() == 1
