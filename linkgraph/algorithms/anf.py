"""ANF — approximate neighborhood function and effective diameter.

Beyond-reference operator (the reference has exact BFS/SSSP but no
neighborhood-function sketch): ANF (Palmer, Gibbons & Faloutsos, KDD'02)
estimates N(t) = #(u,v) pairs with dist(u,v) <= t for ALL t in one pass
family, which is how diameter / effective diameter is measured on
web-scale graphs (HyperANF on Common Crawl / Facebook's four-degrees
study) where exact all-pairs BFS is V * E and impossible.

Method. Each vertex carries r Flajolet-Martin registers; register j of
vertex v starts as a single set bit at position tz(hash(v, j)) (geometric:
P[bit k] = 2^-(k+1)). One superstep ORs each vertex's registers with its
out-neighbors' registers:

    B(v, t+1) = B(v, t) | OR_{v->w} B(w, t)

so after t steps B(v, t) sketches the set of vertices reachable from v in
<= t hops. The ball-size estimate is the FM count 2^R / 0.77351 with R the
mean lowest-zero-bit position across registers; N(t) sums the per-vertex
estimates. Effective diameter at quantile q is the smallest t with
N(t) >= q * N(t_max) (linear interpolation between hops, the standard
HyperANF convention).

Physical plan. Register state is LONG format (vertex, j, mask) — r rows
per vertex — so the superstep is pure JVM hash aggregation:

    union(state, edges_t JOIN state-keyed-dst) -> groupBy(vertex, j).bit_or

One E-scale join (edge side persisted hash-partitioned on dst, state side
shuffled — the pagerank contract) + one map-side-combined BIT_OR shuffle
per superstep; bit_or partial aggregation collapses a hub's messages to
<= 1 row per map partition exactly like the WCC min-reduce, so power-law
skew needs no salting. Per superstep ONE driver action (the r*V-row
register-position sum that doubles as the N(t) curve point). At 100 TB:
state is r*V rows of 3 longs (r=8: ~24 bytes/vertex-register), the same
shuffle volume class as one PageRank iterate; iteration count is the
(effective) diameter, ~16-20 on web graphs.

``hash_mode="lcg"`` replaces xxhash64 with a 31-bit LCG so the whole
pipeline is exact integer arithmetic replicable in ANSI SQL (the driver
oracle unrolls it); production default stays xxhash64.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions

FM_PHI = 0.77351  # Flajolet-Martin bias correction
# 31-bit multiply-seed + xorshift mix: exact BIGINT arithmetic (max
# intermediate < 2^44), replicable operator-for-operator in DuckDB. A bare
# LCG is NOT usable here: its trailing bits are periodic (bit 0 has period
# 2), which destroys the geometric trailing-zero distribution FM needs —
# the xorshift rounds fold the well-mixed high bits back into the low bits.
LCG_A, LCG_C, LCG_M, LCG_J = 2654435761, 12345, 2 ** 31, 40503
LCG_TZ_CAP = 30  # h == 0 would have no set bit; cap the register position


def _tz_pos(h):
    """Bit position of the lowest SET bit of h (h > 0): bit_count((h & -h) - 1)."""
    return F.bit_count((h.bitwiseAND(-h)) - F.lit(1)).cast("int")


def lcg_fm_mask(item, j, seed: int):
    """FM register mask Column for (integer item, register j) in the
    exact-integer dialect: multiply-seed + xorshift mix + single geometric
    bit. Item may be any BIGINT < ~2^31 (product stays under 2^63).
    Shared by the reachability sketches here and the corpus
    distinct-count sketches in text/analysis.py — one dialect, one
    oracle replay."""
    h = (F.lit(LCG_A) * (item + j * F.lit(LCG_J) + F.lit(seed)) + F.lit(LCG_C)) % F.lit(
        LCG_M
    )
    # two-and-a-half xorshift rounds (kept under 2^31 by masking after
    # each left shift)
    h = h.bitwiseXOR(F.shiftleft(h, 13).bitwiseAND(F.lit(LCG_M - 1)))
    h = h.bitwiseXOR(F.shiftright(h, 17))
    h = h.bitwiseXOR(F.shiftleft(h, 5).bitwiseAND(F.lit(LCG_M - 1)))
    pos = F.when(h == 0, F.lit(LCG_TZ_CAP)).otherwise(
        F.least(_tz_pos(h), F.lit(LCG_TZ_CAP))
    )
    # F.shiftleft only takes an int literal for numBits; call the SQL
    # function directly to shift by the pos COLUMN
    return F.call_function("shiftleft", F.lit(1).cast("long"), pos).cast("long")


def _init_masks(vertices: DataFrame, num_registers: int, seed: int,
                hash_mode: str) -> DataFrame:
    """DF[vertex, j, mask]: one geometric FM bit per (vertex, register)."""
    regs = F.explode(F.sequence(F.lit(0), F.lit(num_registers - 1))).alias("j")
    base = vertices.select("vertex", regs)
    if hash_mode == "lcg":
        return base.select(
            "vertex", "j", lcg_fm_mask(F.col("vertex"), F.col("j"), seed).alias("mask")
        )
    else:
        h = F.xxhash64("vertex", "j", F.lit(seed))
        # xxhash64 is signed; use the low 62 bits so h > 0
        h = h.bitwiseAND(F.lit((1 << 62) - 1))
        pos = F.when(h == 0, F.lit(LCG_TZ_CAP)).otherwise(
            F.least(_tz_pos(h), F.lit(LCG_TZ_CAP))
        )
    return base.select("vertex", "j", pos.alias("pos")).select(
        "vertex",
        "j",
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), pos) AS BIGINT)").alias("mask"),
    )


def _lowest_zero_pos(mask):
    """Position of the lowest ZERO bit = count of trailing ones:
    bit_count(mask & ~(mask + 1))."""
    return F.bit_count(
        mask.bitwiseAND(F.bitwise_not(mask + F.lit(1)))
    ).cast("long")


def neighborhood_function(
    graph: Graph,
    max_hops: int = 16,
    num_registers: int = 8,
    seed: int = 42,
    hash_mode: str = "xxhash",
    num_partitions: int | None = None,
    return_sketches: bool = False,
):
    """Estimate N(t) for t = 0..max_hops (directed: ordered reachable pairs).

    Returns (curve, sketches): ``curve`` is a list of dicts
    ``{"hop", "reg_total", "n_est"}`` — ``reg_total`` is the INTEGER sum of
    register lowest-zero positions (exact, SQL-replicable in lcg mode),
    ``n_est`` the float FM estimate of N(t). ``sketches`` is the final
    DF[vertex, j, mask] when ``return_sketches`` else None. Stops early
    when a superstep changes no register (the exact-diameter fixpoint).
    """
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    edges_t = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_t.count()
    V = graph.number_of_vertices()
    bcast = V * num_registers <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    state = truncate_plan(
        _init_masks(graph.vertices(), num_registers, seed, hash_mode), eager=False
    )
    state_ck = state

    def _curve_point(st, hop):
        tot = st.agg(
            F.sum(_lowest_zero_pos(F.col("mask"))).alias("rt")
        ).collect()[0]["rt"]
        mean_pos = tot / (V * num_registers)
        return {
            "hop": hop,
            "reg_total": int(tot),
            "n_est": V * (2.0 ** mean_pos) / FM_PHI,
        }

    curve = [_curve_point(state, 0)]
    with no_aqe(spark, nparts):
        for t in range(1, max_hops + 1):
            msgs = (
                edges_t.join(
                    _state(
                        state.select(
                            F.col("vertex").alias("dst"), "j", "mask"
                        ),
                        "dst",
                    ),
                    on="dst",
                )
                .select(F.col("src").alias("vertex"), "j", "mask")
            )
            new = truncate_plan(
                state.unionByName(msgs)
                .groupBy("vertex", "j")
                .agg(F.bit_or("mask").alias("mask")),
                eager=False,  # single consumer: the curve-point aggregate
            )
            pt = _curve_point(new, t)
            release_plan(state_ck)
            state_ck = new
            state = new
            curve.append(pt)
            if pt["reg_total"] == curve[-2]["reg_total"]:
                break  # no register changed: every ball is closed (exact)
    sketches = None
    if return_sketches:
        sketches = state
        if graph.renumbered:
            sketches = graph.unrenumber(sketches, "vertex")
    edges_t.unpersist()
    return curve, sketches


# --- HyperBall harmonic centrality ------------------------------------------
# Boldi & Vigna, "In-Core Computation of Geometric Centralities with
# HyperBall" (ICDMW 2013): harmonic centrality H(v) = sum_{u != v} 1/d(u, v)
# estimated from per-vertex reachability-sketch ball sizes,
#     H(v) ~= sum_{t >= 1} (|B(v, t)| - |B(v, t-1)|) / t,
# THE centrality the paper ranks the whole web graph with (closeness is
# degenerate on non-strongly-connected graphs; harmonic is not). Reference
# N/A (the fork has Katz/BC/HITS but no distance-based centrality).
#
# Exactness design: every per-vertex ball estimate is computed in scaled
# INTEGER arithmetic so the driver oracle replays it bit-for-bit. With r
# registers and rt = sum of register lowest-zero positions, the FM estimate
# is 2^(rt/r)/phi; we emit ball_e6 = (1 << rt div r) * POW2_FRAC[rt mod r]
# (POW2_FRAC[f] = round(2^(f/r) * 1e6), a shared literal table) and
# harmonic_e = sum_t (ball_e6(t) - ball_e6(t-1)) * HARM_W[t] with
# HARM_W[t] = round(1e3 / t) — exact BIGINTs in both engines (bounded by
# 1e3 * max ball_e6 < 2^63 since register positions are capped at 30).
# The float `harmonic` column is derived from harmonic_e at the end.
POW2_FRAC_SCALE = 1_000_000
HARM_W_SCALE = 1_000


def pow2_frac_table(num_registers: int) -> list[int]:
    """round(2^(f/r) * 1e6) for f in [0, r) — baked into both engines."""
    return [
        int(round((2.0 ** (f / num_registers)) * POW2_FRAC_SCALE))
        for f in range(num_registers)
    ]


def harm_weight(t: int) -> int:
    """round(1e3 / t) — the scaled 1/t harmonic weight literal."""
    return int(round(HARM_W_SCALE / t))


def _ball_e6(num_registers: int):
    """Scaled-integer FM ball estimate from the per-vertex column ``rt``."""
    frac = "array(" + ", ".join(str(v) for v in pow2_frac_table(num_registers)) + ")"
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(rt DIV {num_registers} AS INT)) "
        f"* CAST(element_at({frac}, CAST(rt % {num_registers} AS INT) + 1) AS BIGINT)"
    )


def harmonic_centrality(
    graph: Graph,
    max_hops: int = 16,
    num_registers: int = 8,
    seed: int = 42,
    hash_mode: str = "xxhash",
    mode: str = "in",
    num_partitions: int | None = None,
    hop_timings: list | None = None,
) -> DataFrame:
    """DF[vertex, harmonic_e, harmonic] — HyperBall harmonic centrality.

    ``mode="in"`` (the paper's convention) counts vertices u that REACH v,
    weighting each by 1/d(u, v); ``mode="out"`` uses out-balls instead.
    Stops early at the sketch fixpoint (every ball closed — remaining hop
    terms are exactly zero).

    Physical plan: per hop ONE E-scale join onto the persisted
    dst-partitioned edge table + one map-side-combined BIT_OR aggregation
    (the ANF superstep) + one V-row vertex-keyed aggregation folded into a
    co-partitioned running-score join; ONE scalar driver action per hop (the
    fixpoint total, doubling as the N(t) point). State is r rows of 3 longs
    per vertex — the PageRank shuffle-volume class; hub messages collapse in
    partial aggregation, so power-law skew needs no salting.
    """
    if mode not in ("in", "out"):
        raise ValueError(f"mode must be 'in' or 'out', got {mode!r}")
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    e = graph.edges.select("src", "dst")
    if mode == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges_t = (
        e.filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_t.count()
    V = graph.number_of_vertices()
    bcast = V * num_registers <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    ball = _ball_e6(num_registers)
    state = truncate_plan(
        _init_masks(graph.vertices(), num_registers, seed, hash_mode), eager=False
    )
    state_ck = state
    score = truncate_plan(
        state.groupBy("vertex")
        .agg(F.sum(_lowest_zero_pos(F.col("mask"))).alias("rt"))
        .select(
            "vertex", "rt", ball.alias("ball"),
            F.lit(0).cast("long").alias("acc"),
            F.lit(0).cast("long").alias("sumdist_e"),
        ),
        eager=False,
    )
    score_ck = score
    total_prev = score.agg(F.sum("rt").alias("rt")).collect()[0]["rt"]
    import time as _time

    with no_aqe(spark, nparts):
        for t in range(1, max_hops + 1):
            _t0 = _time.time()
            msgs = edges_t.join(
                _state(state.select(F.col("vertex").alias("dst"), "j", "mask"), "dst"),
                on="dst",
            ).select(F.col("src").alias("vertex"), "j", "mask")
            new = truncate_plan(
                state.unionByName(msgs)
                .groupBy("vertex", "j")
                .agg(F.bit_or("mask").alias("mask")),
                eager=False,
            )
            per_v = new.groupBy("vertex").agg(
                F.sum(_lowest_zero_pos(F.col("mask"))).alias("rt")
            )
            new_score = truncate_plan(
                score.select(
                    "vertex", F.col("ball").alias("ball_prev"), "acc", "sumdist_e"
                )
                .join(per_v, on="vertex")
                .select(
                    "vertex", "rt", ball.alias("ball"), "ball_prev", "acc",
                    "sumdist_e",
                )
                .select(
                    "vertex",
                    "rt",
                    "ball",
                    (
                        F.col("acc")
                        + (F.col("ball") - F.col("ball_prev"))
                        * F.lit(harm_weight(t))
                    ).cast("long").alias("acc"),
                    (
                        F.col("sumdist_e")
                        + (F.col("ball") - F.col("ball_prev")) * F.lit(t)
                    ).cast("long").alias("sumdist_e"),
                ),
                eager=False,
            )
            total = new_score.agg(F.sum("rt").alias("rt")).collect()[0]["rt"]
            if hop_timings is not None:
                hop_timings.append(_time.time() - _t0)
            release_plan(state_ck)
            release_plan(score_ck)
            state = state_ck = new
            score = score_ck = new_score
            if total == total_prev:
                break  # no register changed: every ball closed (exact stop)
            total_prev = total
    out = score.select(
        "vertex",
        F.col("acc").alias("harmonic_e"),
        (
            F.col("acc") / F.lit(float(POW2_FRAC_SCALE) * HARM_W_SCALE * FM_PHI)
        ).alias("harmonic"),
        F.col("sumdist_e"),
        F.col("ball").alias("ball_e6"),
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    edges_t.unpersist()
    return out


def closeness_centrality(
    graph: Graph,
    max_hops: int = 16,
    num_registers: int = 8,
    seed: int = 42,
    hash_mode: str = "xxhash",
    mode: str = "in",
    num_partitions: int | None = None,
) -> DataFrame:
    """DF[vertex, sumdist_e, ball_e6, lin] — Lin's-index closeness from the
    same HyperBall pass (Boldi & Vigna 2013 §2: plain closeness is
    degenerate on graphs that are not strongly connected; Lin's index
    c(v) = |R(v)|² / sum_{u in R(v)} d(u, v) weights by the reachable-set
    size instead). ``sumdist_e`` = sum_t t·(ball_e6(t) − ball_e6(t−1)) and
    ``ball_e6`` (the final reachable-ball estimate) are exact BIGINTs —
    the driver oracle replays both; ``lin`` is the derived float index
    (1.0 for sketch-isolated vertices, the paper's convention)."""
    hc = harmonic_centrality(
        graph, max_hops=max_hops, num_registers=num_registers, seed=seed,
        hash_mode=hash_mode, mode=mode, num_partitions=num_partitions,
    )
    scale = float(POW2_FRAC_SCALE) * FM_PHI
    reach = F.col("ball_e6") / F.lit(scale)  # ~ |R(v)| incl. v itself
    sumd = F.col("sumdist_e") / F.lit(scale)  # ~ sum of distances (hops)
    lin = F.when(F.col("sumdist_e") <= 0, F.lit(1.0)).otherwise(
        reach * reach / sumd
    )
    return hc.select("vertex", "sumdist_e", "ball_e6", lin.alias("lin"))


def effective_diameter(
    graph: Graph,
    q: float = 0.9,
    max_hops: int = 64,
    num_registers: int = 8,
    seed: int = 42,
    hash_mode: str = "xxhash",
    num_partitions: int | None = None,
) -> float:
    """Smallest (interpolated) t with N(t) >= q * N(t_last); runs
    neighborhood_function to its fixpoint (or max_hops)."""
    curve, _ = neighborhood_function(
        graph, max_hops=max_hops, num_registers=num_registers, seed=seed,
        hash_mode=hash_mode, num_partitions=num_partitions,
    )
    target = q * curve[-1]["n_est"]
    for i, pt in enumerate(curve):
        if pt["n_est"] >= target:
            if i == 0:
                return 0.0
            prev = curve[i - 1]["n_est"]
            frac = (target - prev) / ((pt["n_est"] - prev) or 1.0)
            return (i - 1) + max(0.0, min(1.0, frac))
    return float(len(curve) - 1)
