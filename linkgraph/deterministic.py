"""Partitioning-independent deterministic draws.

``F.rand()`` seeds per PARTITION, so its stream changes with parallelism
and shuffle layout; every algorithm in this engine that needs a seeded
per-row uniform derives it from ``xxhash64`` of the row's stable key
instead — same draw on 1 core or 1000 executors, which the determinism
suite (tests/test_determinism.py) asserts across parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_P = 1_000_000_007


def hash_uniform(col, seed: int):
    """Uniform(0,1) from xxhash64(col, seed) — stable across partitioning."""
    return (F.abs(F.xxhash64(col, F.lit(seed))) % F.lit(_P)) / F.lit(float(_P))
