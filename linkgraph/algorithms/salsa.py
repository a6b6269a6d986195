"""SALSA — Stochastic Approach for Link-Structure Analysis.

Beyond-reference operator (the reference stops at HITS,
link_analysis/hits.py:20-91): SALSA (Lempel & Moran 2000) replaces HITS's
mutual reinforcement with a random walk on the hub/authority bipartite
decomposition, which makes it far less topic-drift/TKC-prone and is the
form used in production web/link recommendation (e.g. Twitter WTF). For a
web-scale engine it is the natural companion to pagerank/hits on the same
edge table.

Math. With W the adjacency matrix, W_r row-normalized (1/outdeg) and W_c
column-normalized (1/indeg), SALSA power-iterates

    a' = (W_r)^T W_c a      h' = W_c (W_r)^T h

(the STATIONARY-distribution iteration, i.e. the transpose of the
row-stochastic chain matrices A~ = W_c^T W_r / H~ = W_r W_c^T: every hop
is normalized by the degree of the node being LEFT — 1/indeg leaving an
authority backward, 1/outdeg leaving a hub forward — exactly a random
walk's transition probabilities). Expanded to message-passing form:

    t(i)  = sum_{i->k} a(k) * inv_in(k)       (backward gather)
    a'(j) = sum_{i->j} t(i) * inv_out(i)      (forward push)
    q(j)  = sum_{i->j} h(i) * inv_out(i)      (forward push)
    h'(i) = sum_{i->j} q(j) * inv_in(j)       (backward gather)

On a connected support this converges to the classic SALSA result:
authorities proportional to in-degree, hubs to out-degree (pinned by
tests/test_centrality.py::test_salsa_stationary_is_degree_proportional);
with several components the per-component mass depends on the uniform
start, which is where SALSA's actual ranking signal lives.

Physical plan — identical contract to HITS (hits.py:10-16): TWO persisted
edge copies, src-partitioned for the forward half-step and dst-partitioned
for the backward half-step, so neither half-step reshuffles the edge table.
The two chains run 180 degrees out of phase so each iteration is exactly
two E-scale jobs: the forward job pushes (h, t) together, the backward job
gathers (q, a) together. Degree inverses ride the V-row state as constant
columns (joined once at init, never re-joined). L1 normalization is folded
into the next half-step's expressions as literals; per iteration there are
exactly two driver actions (a-sum; fused h-sum + deltas), matching HITS.

Scale story: per-superstep cost and shuffle shape are exactly pagerank's
(one E-scan + V-row shuffle per half-step); everything said in
docs/PLANS.md section 2 about the pagerank superstep at 100 TB applies
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans import release_plan, truncate_plan
from ..structure.graph import Graph
from .pagerank import BROADCAST_STATE_MAX_V, no_aqe, pick_partitions


def salsa(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, hubs, authorities] (L1-normalized each chain).

    ``fixed_iterations``: run exactly that many iterations and skip the
    convergence test (used for SQL-oracle differential checks).
    Vertices with no out-edges carry no hub mass, vertices with no
    in-edges no authority mass; each chain is L1-renormalized per
    iteration, so the surviving mass always sums to 1 (the standard
    implementation choice for disconnected/dangling structure).
    """
    spark = graph.edges.sparkSession
    nparts = pick_partitions(spark, graph.edges.count(), num_partitions)
    base = graph.edges.select("src", "dst")
    edges = base.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    edges_t = base.repartition(nparts, "dst").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    edges_t.count()
    V = graph.number_of_vertices()
    bcast = V <= BROADCAST_STATE_MAX_V

    def _state(df, key):
        return F.broadcast(df) if bcast else df.repartition(nparts, key)

    outdeg = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("od")
    )
    indeg = edges_t.groupBy(F.col("dst").alias("vertex")).agg(
        F.count("*").alias("idg")
    )
    # degree inverses ride the state as constant columns; 0 for missing
    # degree = that chain drops the vertex's mass (renormalized later)
    init = (
        graph.vertices()
        .join(_state(outdeg, "vertex"), on="vertex", how="left")
        .join(_state(indeg, "vertex"), on="vertex", how="left")
        .select(
            "vertex",
            F.coalesce(1.0 / F.col("od"), F.lit(0.0)).alias("inv_out"),
            F.coalesce(1.0 / F.col("idg"), F.lit(0.0)).alias("inv_in"),
            F.lit(1.0 / V).alias("h"),
            F.lit(1.0 / V).alias("a"),
        )
    )
    # setup half-job: t0(i) = sum_{i->k} a0(k) * inv_in(k)
    t0 = (
        edges_t.join(
            _state(
                init.select(
                    F.col("vertex").alias("dst"),
                    (F.col("a") * F.col("inv_in")).alias("ax"),
                ),
                "dst",
            ),
            on="dst",
        )
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("ax").alias("s"))
    )
    state = truncate_plan(
        init.join(_state(t0, "vertex"), on="vertex", how="left").select(
            "vertex", "inv_out", "inv_in", "h", "a",
            F.coalesce("s", F.lit(0.0)).alias("t"),
        ),
        eager=False,
    )
    state_ck = state
    const_cols = ["inv_out", "inv_in"]
    n_iter = fixed_iterations if fixed_iterations is not None else max_iter
    with no_aqe(spark, nparts):
        for _ in range(n_iter):
            # --- forward job (src-partitioned copy): push h and t together,
            # each pre-scaled by the departing hub's 1/outdeg
            fwd = (
                edges.join(
                    _state(
                        state.select(
                            F.col("vertex").alias("src"),
                            (F.col("h") * F.col("inv_out")).alias("hx"),
                            (F.col("t") * F.col("inv_out")).alias("tx"),
                        ),
                        "src",
                    ),
                    on="src",
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("hx").alias("p"), F.sum("tx").alias("r"))
            )
            s1 = truncate_plan(
                state.join(_state(fwd, "vertex"), on="vertex", how="left").select(
                    "vertex", *const_cols, "h", "a",
                    F.coalesce("r", F.lit(0.0)).alias("a_raw"),
                    F.coalesce("p", F.lit(0.0)).alias("q"),
                ),
                eager=False,  # single consumer: the a-norm aggregate below
            )
            a_sum = float(s1.agg(F.sum("a_raw")).collect()[0][0] or 1.0)
            release_plan(state_ck)

            # --- backward job (dst-partitioned copy): gather q and a_n,
            # each pre-scaled by the departing authority's 1/indeg
            bwd = (
                edges_t.join(
                    _state(
                        s1.select(
                            F.col("vertex").alias("dst"),
                            (F.col("q") * F.col("inv_in")).alias("qx"),
                            (
                                F.col("a_raw") / F.lit(a_sum) * F.col("inv_in")
                            ).alias("ax"),
                        ),
                        "dst",
                    ),
                    on="dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("qx").alias("z"), F.sum("ax").alias("s"))
            )
            s2 = truncate_plan(
                s1.join(_state(bwd, "vertex"), on="vertex", how="left").select(
                    "vertex", *const_cols,
                    (F.col("a_raw") / F.lit(a_sum)).alias("a_n"),
                    F.coalesce("z", F.lit(0.0)).alias("h_raw"),
                    F.coalesce("s", F.lit(0.0)).alias("t_new"),
                    F.col("h").alias("h_old"),
                    F.col("a").alias("a_old"),
                ),
                eager=False,  # single consumer: the fused norm+delta agg
            )
            # ONE fused action for the h-norm and both convergence deltas
            norms = s2.agg(
                F.sum("h_raw").alias("hs"),
                F.sum(F.abs(F.col("a_n") - F.col("a_old"))).alias("da"),
            )
            row = (
                s2.crossJoin(F.broadcast(norms))
                .agg(
                    F.max("hs").alias("hs"),
                    F.max("da").alias("da"),
                    F.sum(
                        F.abs(F.col("h_raw") / F.col("hs") - F.col("h_old"))
                    ).alias("dh"),
                )
                .collect()[0]
            )
            h_sum = float(row["hs"] or 1.0)
            release_plan(s1)
            state_ck = s2
            state = s2.select(
                "vertex", *const_cols,
                (F.col("h_raw") / F.lit(h_sum)).alias("h"),
                F.col("a_n").alias("a"),
                F.col("t_new").alias("t"),
            )
            if fixed_iterations is None and (row["da"] or 0.0) + (row["dh"] or 0.0) < tol:
                break
    out = state.select(
        "vertex", F.col("h").alias("hubs"), F.col("a").alias("authorities")
    )
    if graph.renumbered:
        out = graph.unrenumber(out, "vertex")
    edges.unpersist()
    edges_t.unpersist()
    return out
