"""Top-k maximal-biclique heuristic (`find_bicliques`).

Reference: proto/structure/bicliques.py:32-281 (experimental "proto" API —
the reference itself is a sequential cudf loop, one feature at a time, not
a CUDA kernel). Semantics replicated:

- input edge DataFrame with columns src (machine), dst (feature) and flag
  (1 = "bad" machine); ``offset`` is subtracted from dst first (:78-79);
- features are visited in degree-descending order (:86, deterministic here:
  ties broken by ascending dst — the reference's sort is unstable);
- per feature f: machines M = N(f); candidate features = every g whose
  count among M's incident edges ≥ int(degree(f) · support) (:119-129);
  a biclique is emitted when > min_features candidates and
  |M| ≥ min_machines (:131-137); a feature whose machine set equals the
  PREVIOUS one is skipped (:110, `is_same_as_last`);
- stops after k bicliques (k = -1: unbounded) or max_iter features;
- returns (B, S): B[id, vert, type] with type 0 = machine / 1 = feature,
  S[id, total, machines, features, bad_ratio]. NOTE the reference's
  docstring says bad/machines but its CODE computes bad/total (:278-279)
  — the code behavior is replicated.

Each feature step runs the neighbor expansion and candidate count as
DataFrame joins/aggregations; only the per-feature machine list and the
(small) candidate feature list are collected, mirroring the reference's
own per-feature host loop. This is a proto/experimental surface — the
sequential feature loop is inherited from the reference design, not a
scalable scan (use the LSH/dedup tiers for corpus-scale co-occurrence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def find_bicliques(
    df: DataFrame,
    k: int,
    offset: int = 0,
    max_iter: int = -1,
    support: float = 1.0,
    min_features: int = 1,
    min_machines: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Find up to ``k`` maximal bicliques in a bipartite edge list.

    Returns (B, S) per the reference contract (see module docstring).
    """
    for col in ("src", "dst", "flag"):
        if col not in df.columns:
            raise NameError(f"{col} column not found")
    if support > 1.0 or support < 0.1:
        raise NameError("support must be between 0.1 and 1.0")

    spark = df.sparkSession
    edges = df.select("src", (F.col("dst") - F.lit(offset)).alias("dst"), "flag")
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    f_list_df = (
        edges.groupBy("dst").agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("dst"))
    )
    if max_iter != -1:
        f_rows = f_list_df.limit(max_iter).collect()
    else:
        f_rows = f_list_df.collect()

    b_rows: list = []
    s_rows: list = []
    answer_id = 0
    machine_old: frozenset = frozenset()

    for row in f_rows:
        feature, degree = row["dst"], row["count"]
        m_rows = edges.filter(F.col("dst") == feature).select("src", "flag").collect()
        machines = frozenset(r["src"] for r in m_rows)
        if machines != machine_old:
            m_df = spark.createDataFrame(
                [(s,) for s in machines], "src LONG"
            )
            goal = int(degree * support)
            cand = (
                edges.join(F.broadcast(m_df), on="src")
                .groupBy("dst")
                .agg(F.count("*").alias("count"))
                .filter(F.col("count") >= goal)
                .collect()
            )
            if len(cand) > min_features and len(machines) >= min_machines:
                for r in m_rows:
                    b_rows.append((answer_id, int(r["src"]), 0))
                for c in cand:
                    b_rows.append((answer_id, int(c["dst"]), 1))
                num_m, num_f = len(m_rows), len(cand)
                total = num_m + num_f
                num_bad = sum(1 for r in m_rows if r["flag"] == 1)
                s_rows.append(
                    (answer_id, total, num_m, num_f, num_bad / total)
                )
                answer_id += 1
        machine_old = machines
        if k > -1 and answer_id == k:
            break

    edges.unpersist()
    B = spark.createDataFrame(b_rows, "id LONG, vert LONG, type INT")
    S = spark.createDataFrame(
        s_rows, "id LONG, total LONG, machines LONG, features LONG, bad_ratio DOUBLE"
    )
    return B, S
