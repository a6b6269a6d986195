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
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:
        return ck
