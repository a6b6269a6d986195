"""Distributed quantized spherical k-means + SemDeDup — pure-Python exact
replay (the arithmetic is integer/correctly-rounded-double end to end, so
the replay matches bit-for-bit), determinism, and keep-rule semantics."""

import math

import pytest

from linkgraph.similarity import (
    KMEANS_LCG_A,
    KMEANS_LCG_C,
    KMEANS_LCG_M,
    KMEANS_SCALE,
    _round_half_away,
    _unit_quantized,
    kmeans_embeddings,
    semantic_dedup,
)


def _py_kmeans(vecs, k, iters, scale=KMEANS_SCALE):
    """dict[id] -> (cluster, dot_to_centroid); exact replay of _kmeans_full."""
    q = {
        i: [_round_half_away(float(x) * scale) for x in v] for i, v in vecs.items()
    }
    seed_ids = sorted(q, key=lambda i: ((i * KMEANS_LCG_A + KMEANS_LCG_C) % KMEANS_LCG_M, i))[:k]
    cents = [_unit_quantized(q[i], scale) for i in seed_ids]

    def argmax(v):
        best = None
        for c, ct in enumerate(cents):
            d = sum(x * y for x, y in zip(v, ct))
            key = (d, -c)
            if best is None or key > best[0]:
                best = (key, c, d)
        return best[1], best[2]

    for _ in range(iters):
        sums = {}
        for i, v in q.items():
            c, _d = argmax(v)
            s = sums.setdefault(c, [0] * len(v))
            for j, x in enumerate(v):
                s[j] += x
        new = []
        for c in range(len(cents)):
            s = sums.get(c)
            uq = _unit_quantized(s, scale) if s is not None else None
            new.append(uq if uq is not None and any(uq) else cents[c])
        cents = new
    return {i: argmax(v) for i, v in q.items()}, cents


def _lcg_vecs(n, dim, seed=7):
    """Deterministic unit-ish float vectors."""
    vecs = {}
    x = seed
    for i in range(n):
        v = []
        for _ in range(dim):
            x = (x * 1103515245 + 12345) % (2**31)
            v.append((x / 2**31) - 0.5)
        nrm = math.sqrt(sum(t * t for t in v))
        vecs[i] = [t / nrm for t in v]
    return vecs


def test_matches_python_replay(spark):
    dim, k, iters = 16, 4, 3
    vecs = _lcg_vecs(60, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = {
        r.vec_id: r.cluster for r in kmeans_embeddings(df, k=k, iterations=iters).collect()
    }
    want, _cents = _py_kmeans(vecs, k, iters)
    assert got == {i: c for i, (c, _d) in want.items()}
    assert len(set(got.values())) > 1  # non-degenerate


def test_deterministic_across_partitioning(spark):
    vecs = _lcg_vecs(50, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    a = sorted(map(tuple, kmeans_embeddings(df, k=3, iterations=2).collect()))
    b = sorted(
        map(tuple, kmeans_embeddings(df.repartition(7), k=3, iterations=2).collect())
    )
    assert a == b


def test_semdedup_groups_and_keep_rule(spark):
    # two well-separated clusters; cluster axis-0 holds a triple of
    # near-identical vectors, so the pair graph has one 3-member component
    base_a = [1.0] + [0.0] * 7
    base_b = [0.0] * 7 + [1.0]

    def tilt(base, j, eps):
        v = list(base)
        v[j] += eps
        nrm = math.sqrt(sum(t * t for t in v))
        return [t / nrm for t in v]

    rows = [
        (0, tilt(base_a, 1, 0.010)),
        (1, tilt(base_a, 1, 0.012)),
        (2, tilt(base_a, 1, 0.014)),
        (3, tilt(base_a, 2, 0.900)),  # same half-space, not a near-dup
        (10, tilt(base_b, 3, 0.010)),
        (11, tilt(base_b, 4, 0.900)),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.vec_id: (r.cluster, r.keep)
        for r in semantic_dedup(df, threshold=0.99, k=2, iterations=2).collect()
    }
    assert set(out) == {0, 1, 2, 3, 10, 11}
    trio = [out[0], out[1], out[2]]
    assert len({c for c, _ in trio}) == 1  # the triple lands in one cluster
    assert sum(keep for _, keep in trio) == 1  # exactly one representative
    # non-duplicated vectors always kept
    assert out[3][1] and out[10][1] and out[11][1]
    # keep rule: farthest from centroid (min COSINE to the assigned
    # centroid), ties to min id — replay to find which of the triple that is
    vecs = {i: v for i, v in rows}
    assign, _ = _py_kmeans(vecs, 2, 2)

    def n2(v):
        return sum(q * q for q in (_round_half_away(x * KMEANS_SCALE) for x in v))

    far = min((assign[i][1] / math.sqrt(n2(vecs[i])), i) for i in (0, 1, 2))[1]
    kept = next(i for i in (0, 1, 2) if out[i][1])
    assert kept == far


def test_semdedup_no_pairs_keeps_all(spark):
    vecs = _lcg_vecs(30, 12)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    out = semantic_dedup(df, threshold=0.999, k=3, iterations=2).collect()
    assert len(out) == 30 and all(r.keep for r in out)


def test_argument_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        kmeans_embeddings(df, k=0)
    with pytest.raises(ValueError):
        kmeans_embeddings(df, iterations=0)
    empty = df.filter("vec_id < 0")
    with pytest.raises(ValueError):
        kmeans_embeddings(empty, k=2)


def test_k_exceeds_corpus(spark):
    # fewer vectors than k: surplus centroids go empty and persist unchanged
    vecs = _lcg_vecs(3, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    out = kmeans_embeddings(df, k=5, iterations=2).collect()
    assert len(out) == 3
    assert len({r.cluster for r in out}) <= 3


def test_large_k_fallback_matches_literal(spark, monkeypatch):
    """Above KMEANS_LITERAL_MAX_ENTRIES the assignment runs as a broadcast
    numpy argmax inside mapInPandas; it must be bit-identical to the
    k x d literal-expression path."""
    import linkgraph.similarity as sim

    dim, k, iters = 256, 64, 2  # k*d = 16384 > 4096 -> fallback engages
    vecs = _lcg_vecs(80, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    fallback = sorted(map(tuple, kmeans_embeddings(df, k=k, iterations=iters).collect()))

    # the fallback plan must actually be the Arrow/pandas path, not literals
    q = df.selectExpr(
        "vec_id as id",
        f"transform(embedding, x -> cast(round(cast(x as double) * {KMEANS_SCALE}) as bigint)) as qv",
    )
    cents = [[1] * dim for _ in range(k)]
    plan = sim._assign_frame(q, cents)._jdf.queryExecution().toString()
    assert "MapInPandas" in plan or "mapInPandas" in plan

    monkeypatch.setattr(sim, "KMEANS_LITERAL_MAX_ENTRIES", 10**9)
    literal = sorted(map(tuple, kmeans_embeddings(df, k=k, iterations=iters).collect()))
    assert fallback == literal
    lit_plan = sim._assign_frame(q, cents)._jdf.queryExecution().toString()
    assert "MapInPandas" not in lit_plan


def test_corpus_scale_k(spark):
    """k = 2048, d = 256: the SemDeDup corpus-scale regime. The literal path
    would inline ~half a million longs into one Catalyst expression; the
    broadcast-argmax path keeps the plan O(1) in k and completes."""
    import numpy as np

    rng = np.random.default_rng(17)
    n, dim, k = 4096, 256, 2048
    mat = rng.standard_normal((n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(n)],
        ["vec_id", "embedding"],
    )
    out = kmeans_embeddings(df, k=k, iterations=1).collect()
    assert len(out) == n
    cl = {r.cluster for r in out}
    assert all(0 <= c < k for c in cl)
    assert len(cl) > k // 4  # random unit vectors spread across many cells


def test_prototypicality_scores(spark):
    from linkgraph.similarity import prototypicality_scores

    vecs = _lcg_vecs(40, 10)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    out = {r.vec_id: (r.cluster, r.proto) for r in
           prototypicality_scores(df, k=3, iterations=2).collect()}
    assign, cents = _py_kmeans(vecs, 3, 2)
    for i, (c, dot) in assign.items():
        gc, gp = out[i]
        assert gc == c
        n2 = sum(q * q for q in (_round_half_away(x * KMEANS_SCALE) for x in vecs[i]))
        cn = math.sqrt(sum(v * v for v in cents[c]))
        assert gp == dot / (math.sqrt(n2) * cn)  # bit-exact, no approx
        assert -1.01 <= gp <= 1.01
