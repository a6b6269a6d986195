"""Physical-plan hygiene helpers shared by the iterative algorithms.

Catalyst carries an estimated ``sizeInBytes`` through ``localCheckpoint``
(Spark 4's ``LogicalRDD.fromDataset`` copies the child plan's stats). For a
single pipeline that is harmless, but in an iterative algorithm whose
superstep joins k branches derived from the carried state, the estimate is
a PRODUCT of the branch estimates, so its bit length grows ~k× per
superstep. ``SizeInBytesOnlyStatsPlanVisitor`` then multiplies those
BigIntegers on every later plan — measured on this box as exponential
per-pass planner latency (jstack: ``BigInteger.multiplyToomCook3`` under
``visitJoin``; Louvain pass times 0.6 s → 4.6 → 31 → 225 s with a constant
plan shape). Algorithms whose state feeds only ONE join branch per step
(PageRank, WCC, LPA) grow linearly and never hit this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_plan(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` + reset of the carried Catalyst size estimate.

    Rebuilds the Dataset over the checkpointed internal RDD so the logical
    plan is a fresh ``LogicalRDD`` with the session-default size estimate (a
    constant). Bit growth per superstep is then bounded instead of
    compounding. Lazy mode keeps the lazy-single-consumer contract: the
    first action on the returned frame materializes the checkpoint.

    Falls back to the plain checkpointed frame if the internal-API call is
    unavailable (non-classic sessions / future Spark drift) — correctness is
    unaffected either way.
    """
    ck = df.localCheckpoint(eager=eager)
    handle = None
    try:
        # the RDD localCheckpoint actually persisted — LogicalRDD's field,
        # NOT queryExecution().toRdd() (that is a metrics wrapper whose
        # unpersist would be a no-op). Kept on the returned frame so
        # release_plan can free the block-manager storage deterministically.
        handle = ck._jdf.queryExecution().analyzed().rdd()
    except Exception:
        pass
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        out = DataFrame(new_jdf, spark)
    except Exception:
        out = ck
    out._lg_ck_rdd = handle
    return out


def release_plan(df: DataFrame | None) -> None:
    """Free the block-manager storage of a ``truncate_plan`` frame ONCE IT
    IS SUPERSEDED. ``localCheckpoint`` truncates lineage, so a released
    frame must never be computed again — callers release only frames whose
    successor state is already materialized. The ContextCleaner does this
    eventually (when driver GC collects the plan), but hot iterative loops
    can't wait: measured at RMAT-21 local[16], Louvain move passes degrade
    47 → 200 s/round as each pass's eager E-scale checkpoint (~2.7 GB)
    accumulates in the block manager; with explicit release the per-pass
    cost stays flat. Safe no-op for frames not from ``truncate_plan``."""
    jrdd = getattr(df, "_lg_ck_rdd", None)
    if jrdd is None and df is not None:
        # plain ``df.localCheckpoint(...)`` frame: the persisted RDD is the
        # LogicalRDD's field. Any other plan shape raises and we no-op.
        try:
            jrdd = df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            return
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass
        df._lg_ck_rdd = None
