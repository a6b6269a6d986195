"""BM25 sparse retrieval (text/retrieval.py) — pure-Python integer replay,
float-mode ordering sanity, guard rails."""

import pytest

from linkgraph.text.retrieval import IDF_SCALE, PREC, bm25_topk, build_postings

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and cats"),
    (4, "a completely different sentence entirely here"),
    (5, "cat cat cat cat cat cat"),
]
QS = [(100, "cat sat"), (200, "dogs"), (300, "zzz-not-in-corpus")]


def _py_bm25_int(docs, queries, k1m=1200, bm=750):
    """dict[(qid, doc)] -> integer score, replaying the exact DIV chain."""
    toks = {d: t.strip().split(" ") for d, t in docs}
    n = len(docs)
    tot = sum(len(t) for t in toks.values())
    post, dft = {}, {}
    for d, t in toks.items():
        for w in t:
            if w:
                post[(w, d)] = post.get((w, d), 0) + 1
    for (w, d), _ in post.items():
        dft[w] = dft.get(w, 0) + 1
    out = {}
    for qid, qt in queries:
        for w in set(x for x in qt.strip().split(" ") if x):
            if w not in dft:
                continue
            for d, t in toks.items():
                tf = post.get((w, d), 0)
                if not tf:
                    continue
                idf = IDF_SCALE * (2 * (n - dft[w]) + 1) // (2 * dft[w] + 1)
                numer = tf * (k1m + 1000) * 1000 * PREC * tot
                denom = tf * 1_000_000 * tot + k1m * (
                    (1000 - bm) * tot + bm * len(t) * n
                )
                out[(qid, d)] = out.get((qid, d), 0) + idf * (numer // denom)
    return out


def test_bm25_int_matches_python_replay(spark):
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(
            spark.createDataFrame(DOCS, ["doc_id", "text"]),
            spark.createDataFrame(QS, ["query_id", "text"]),
            k=10,
        ).collect()
    }
    assert got == _py_bm25_int(DOCS, QS)
    # unmatched query yields no rows
    assert not any(q == 300 for q, _ in got)


def test_bm25_rank_and_k(spark):
    rows = bm25_topk(
        spark.createDataFrame(DOCS, ["doc_id", "text"]),
        spark.createDataFrame(QS, ["query_id", "text"]),
        k=1,
    ).collect()
    by_q = {r.query_id: r for r in rows}
    assert all(r.rank == 1 for r in rows)
    # 'cat sat': doc 5 is saturated-tf 'cat'; exact winner pinned by replay
    ref = _py_bm25_int(DOCS, QS)
    best100 = max(
        (s, -d) for (q, d), s in ref.items() if q == 100
    )
    assert by_q[100].doc_id == -best100[1]


def test_bm25_float_mode_orders_sensibly(spark):
    rows = bm25_topk(
        spark.createDataFrame(DOCS, ["doc_id", "text"]),
        spark.createDataFrame([(1, "completely different")], ["query_id", "text"]),
        k=2,
        exact_int=False,
    ).collect()
    assert rows[0].doc_id == 4 and rows[0].score > 0


def test_bm25_validates_and_guards(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    q = spark.createDataFrame(QS, ["query_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(d, q, k=0)
    with pytest.raises(ValueError):
        bm25_topk(d, q, b_milli=2000)
    with pytest.raises(ValueError, match="overflow"):
        # absurd k1 pushes the numerator bound past 2^63
        bm25_topk(d, q, k1_milli=2**40)


def test_build_postings(spark):
    post, dl = build_postings(spark.createDataFrame(DOCS, ["doc_id", "text"]))
    tf = {(r.term, r.doc): r.tf for r in post.collect()}
    assert tf[("the", 1)] == 2 and tf[("cat", 5)] == 6
    assert {r.doc: r.dl for r in dl.collect()}[3] == 5
