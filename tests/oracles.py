"""Pure NumPy / pure-Python oracles with exact cuGraph semantics.

Written from the normative spec in SURVEY.md §2.5 (derived from
cpp/src/link_analysis/pagerank_impl.cuh and
cpp/tests/link_analysis/pagerank_test.cpp:43-130's practice of in-test CPU
reference implementations) — not copied from the reference.
"""

from __future__ import annotations

import numpy as np


def oracle_pagerank(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
    V: int,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 500,
    personalization: dict | None = None,
    nstart: dict | None = None,
) -> np.ndarray:
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.ones(len(src)) if weight is None else np.asarray(weight, dtype=np.float64)
    out_w = np.zeros(V)
    np.add.at(out_w, src, w)
    dangling = out_w == 0.0
    if nstart:
        r = np.zeros(V)
        for k, v in nstart.items():
            r[k] = v
        r /= r.sum()
    else:
        r = np.full(V, 1.0 / V)
    p_hat = None
    if personalization:
        p_hat = np.zeros(V)
        for k, v in personalization.items():
            p_hat[k] = v
        p_hat /= p_hat.sum()
    div = np.where(dangling, 1.0, out_w)
    for _ in range(max_iter):
        dangling_sum = r[dangling].sum()
        rr = r / div
        new = np.zeros(V)
        np.add.at(new, dst, w * rr[src])
        new *= alpha
        K = dangling_sum * alpha + (1.0 - alpha)
        if p_hat is not None:
            new += K * p_hat
        else:
            new += K / V
        delta = np.abs(new - r).sum()
        r = new
        if delta < tol:
            return r
    raise RuntimeError("oracle pagerank failed to converge")


def oracle_wcc(src, dst, vertices) -> dict:
    """Union-find; canonical label = min member id per component."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src, dst):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {}
    for v in vertices:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def oracle_lpa(src, dst, vertices, iterations: int) -> dict:
    """Synchronous LPA, argmax neighbor-label count, ties -> min label.
    Assumes the edge list is already symmetrized (both directions)."""
    nbrs: dict[int, list[int]] = {v: [] for v in vertices}
    for u, v in zip(src, dst):
        nbrs[int(v)].append(int(u))  # message flows src -> dst
    labels = {v: v for v in vertices}
    for _ in range(iterations):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                lu = labels[u]
                counts[lu] = counts.get(lu, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def oracle_triangles(src, dst) -> int:
    """Brute force over the undirected simple graph (no self loops)."""
    adj: dict[int, set] = {}
    for u, v in zip(src, dst):
        u, v = int(u), int(v)
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    count = 0  # ordered triples u < v < w
    for u, nu in adj.items():
        for v in nu:
            if v <= u:
                continue
            for w in nu & adj[v]:
                if w > v:
                    count += 1
    return count
