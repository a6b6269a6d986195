"""similarity.py PQ: per-subspace integer L2 codebooks + ADC top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.similarity import (
    KMEANS_LCG_A,
    KMEANS_LCG_C,
    KMEANS_LCG_M,
    _round_half_away,
    pq_adc_topk,
    pq_train_encode,
)

N, DIM = 60, 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=DIM)]) for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>"), rows


def _replay_train_encode(rows, m, k, iterations, scale=1000):
    ds = DIM // m
    q = {
        i: [_round_half_away(float(np.float32(x)) * scale) for x in v]
        for i, v in rows
    }
    order = sorted(q, key=lambda i: ((i * KMEANS_LCG_A + KMEANS_LCG_C) % KMEANS_LCG_M, i))
    seeds = order[:k]
    books = []
    for j in range(m):
        cents = [q[s][j * ds : (j + 1) * ds] for s in seeds]

        def assign(cents):
            out = {}
            for i, vec in q.items():
                sv = vec[j * ds : (j + 1) * ds]
                best = min(
                    range(len(cents)),
                    key=lambda c: (
                        sum((a - b) ** 2 for a, b in zip(sv, cents[c])),
                        c,
                    ),
                )
                out[i] = best
            return out

        for _ in range(iterations):
            a = assign(cents)
            new = []
            for c in range(k):
                mem = [q[i][j * ds : (j + 1) * ds] for i in a if a[i] == c]
                if not mem:
                    new.append(cents[c])
                else:
                    new.append(
                        [
                            _round_half_away(sum(col) / len(mem))
                            for col in zip(*mem)
                        ]
                    )
            cents = new
        books.append((cents, assign(cents)))
    return q, books


@pytest.mark.parametrize("m,k", [(2, 4), (4, 3)])
def test_pq_codes_match_replay(spark, emb, m, k):
    df, rows = emb
    codes, books, qdf = pq_train_encode(df, m=m, k=k, iterations=2)
    got = {r["id"]: list(r["codes"]) for r in codes.collect()}
    qdf.unpersist()
    _, want_books = _replay_train_encode(rows, m, k, 2)
    for j, (cents, assign) in enumerate(want_books):
        assert [list(map(int, c)) for c in books[j]] == cents
        for i in assign:
            assert got[i][j] == assign[i], (j, i)


def test_pq_large_path_matches_literal(spark, emb, monkeypatch):
    df, rows = emb
    codes_small, books_small, q1 = pq_train_encode(df, m=2, k=4, iterations=1)
    small = {r["id"]: list(r["codes"]) for r in codes_small.collect()}
    q1.unpersist()
    import linkgraph.similarity as sim

    monkeypatch.setattr(sim, "PQ_LITERAL_MAX_ENTRIES", 0)
    codes_big, books_big, q2 = pq_train_encode(df, m=2, k=4, iterations=1)
    big = {r["id"]: list(r["codes"]) for r in codes_big.collect()}
    q2.unpersist()
    assert books_small == books_big
    assert small == big


def test_pq_adc_topk_matches_bruteforce(spark, emb):
    df, rows = emb
    m, k, topk = 2, 4, 3
    queries = df.filter(F.col("vec_id") % 20 == 0)
    out = pq_adc_topk(df, queries, m=m, k=k, topk=topk, iterations=2)
    got = [
        (r["query_id"], r["rnk"], r["neighbor_id"], r["score"])
        for r in out.orderBy("query_id", "rnk").collect()
    ]
    q, books = _replay_train_encode(rows, m, k, 2)
    ds = DIM // m
    want = []
    for qid in sorted(i for i, _ in rows if i % 20 == 0):
        scores = []
        for i in q:
            s = 0
            for j, (cents, assign) in enumerate(books):
                cw = cents[assign[i]]
                s += sum(
                    q[qid][j * ds + t] * cw[t] for t in range(ds)
                )
            scores.append((s, i))
        scores.sort(key=lambda t: (-t[0], -t[1]))
        for rnk, (s, i) in enumerate(scores[:topk], start=1):
            want.append((qid, rnk, i, s))
    assert got == want


def test_pq_validation(spark, emb):
    df, _ = emb
    with pytest.raises(ValueError):
        pq_train_encode(df, m=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        pq_train_encode(df, m=0)
    with pytest.raises(ValueError):
        pq_adc_topk(df, df.filter(F.lit(False)), m=2, k=4)


def test_pq_adc_query_batch_cap(spark, emb, monkeypatch):
    import linkgraph.similarity as sim

    df, _ = emb
    monkeypatch.setattr(sim, "PQ_MAX_QUERY_BATCH", 3)
    with pytest.raises(ValueError, match="query batch exceeds"):
        sim.pq_adc_topk(df, df.filter(F.col("vec_id") < 10), m=2, k=4)
    # at the cap exactly: fine
    out = sim.pq_adc_topk(df, df.filter(F.col("vec_id") < 3), m=2, k=4, topk=2)
    assert out.count() == 6


def test_pq_train_fewer_rows_than_k(spark):
    # k larger than the table: the seed list is short (LIMIT k) and the
    # update loop must iterate the actual codebook length, not k
    rows = [(i, [float(i), float(-i), 1.0, 2.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    codes, books, q = pq_train_encode(df, m=2, k=16, iterations=2)
    got = codes.collect()
    q.unpersist()
    assert len(got) == 3
    assert all(len(b) == 3 for b in books)  # one codeword per distinct seed
    assert all(0 <= c < 3 for r in got for c in r["codes"])


def test_pq_adc_rerank_recovers_exact_topk(spark, emb):
    df, rows = emb
    m, k, topk = 2, 4, 3
    queries = df.filter(F.col("vec_id") % 20 == 0)
    out = pq_adc_topk(df, queries, m=m, k=k, topk=topk, iterations=2, rerank=N)
    got = [
        (r["query_id"], r["rnk"], r["neighbor_id"], r["score"])
        for r in out.orderBy("query_id", "rnk").collect()
    ]
    # rerank=N (every vector a candidate) == exact integer-dot brute force
    q, _ = _replay_train_encode(rows, m, k, 2)
    want = []
    for qid in sorted(i for i, _ in rows if i % 20 == 0):
        scores = [
            (sum(q[qid][t] * q[i][t] for t in range(DIM)), i) for i in q
        ]
        scores.sort(key=lambda t: (-t[0], -t[1]))
        for rnk, (s, i) in enumerate(scores[:topk], start=1):
            want.append((qid, rnk, i, s))
    assert got == want


def test_pq_adc_rerank_validation(spark, emb):
    df, _ = emb
    with pytest.raises(ValueError, match="rerank"):
        pq_adc_topk(df, df.limit(1), m=2, k=4, topk=5, rerank=2)


def test_round_half_away_matches_duckdb_on_boundary_doubles():
    """The centroid-update rounding must equal DuckDB's round() ON THE
    DOUBLE VALUE, including the boundary class where floor(x+0.5) rounds
    up in IEEE arithmetic while std::round does not (e.g. the largest
    double below 0.5) — the dialect-divergence class VERDICT r5 flagged
    for the PQ chain."""
    import duckdb

    cases = [
        (1, 2), (-1, 2), (3, 2), (5, 2), (-5, 2), (7, 3), (-7, 3),
        (2000000000000001, 2), (9007199254740991, 2),
    ]
    for s, n in cases:
        dd = duckdb.sql(
            f"select cast(round(cast({s} as bigint) / cast({n} as bigint))"
            " as bigint)"
        ).fetchone()[0]
        assert _round_half_away(s / n) == dd, (s, n)
    # the floor(x+0.5) footgun value itself
    x = 0.49999999999999994  # largest double < 0.5; x + 0.5 == 1.0 in IEEE
    assert _round_half_away(x) == 0
    assert _round_half_away(-x) == 0
    assert _round_half_away(0.5) == 1
    assert _round_half_away(-0.5) == -1
