"""Exact duplicate-span removal (ExactSubstr, Lee et al. 2021 re-expressed
relationally) — handcrafted cases plus a pure-Python replay oracle on a
deterministic LCG corpus."""

import pytest

from linkgraph.text.dedup import span_dedup

W = 8


def _py_span_dedup(docs, w=W):
    """Reference replay: dict[id] -> (text, n_tokens, n_removed)."""
    toks = {d: t.strip().split(" ") for d, t in docs}
    occ = []  # (doc, i0) 0-based
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - w + 1):
            occ.append((d, i, " ".join(t[i : i + w])))
    by_span = {}
    for d, i, s in occ:
        by_span.setdefault(s, []).append((d, i))
    covered = {d: set() for d, _ in docs}
    for s, places in by_span.items():
        if len(places) >= 2:
            places.sort()
            for d, i in places[1:]:
                covered[d].update(range(i, i + w))
    out = {}
    for d, t in docs:
        keep = [tok for j, tok in enumerate(toks[d]) if j not in covered[d]]
        out[d] = (" ".join(keep), len(toks[d]), len(toks[d]) - len(keep))
    return out


def test_handcrafted(spark):
    docs = [
        (1, "a b c d e f g h tail one"),
        (2, "x y a b c d e f g h z"),  # non-canonical copy of the 8-span
        (3, "short doc only"),
        (4, "a b c d e f g h"),  # the bare span, also non-canonical
    ]
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_removed)
        for r in span_dedup(spark.createDataFrame(docs, ["doc_id", "text"])).collect()
    }
    # doc 1 holds the canonical (min doc, min pos) occurrence -> untouched
    assert got[1] == ("a b c d e f g h tail one", 10, 0)
    assert got[2] == ("x y z", 11, 8)
    assert got[3] == ("short doc only", 3, 0)
    assert got[4] == ("", 8, 8)


def test_within_doc_repeat(spark):
    body = "p q r s t u v w"
    docs = [(7, body + " mid " + body)]
    got = span_dedup(spark.createDataFrame(docs, ["doc_id", "text"])).collect()[0]
    # second occurrence of the 8-token span inside the SAME doc is removed
    assert got.text_dedup == body + " mid"
    assert got.n_removed == 8


def test_overlapping_spans_union_coverage(spark):
    # 9 shared tokens -> two overlapping duplicated 8-spans; coverage is the
    # union (9 tokens), not 16
    shared = "a b c d e f g h i"
    docs = [(1, shared + " end"), (2, "pre " + shared)]
    got = {r.doc_id: r for r in
           span_dedup(spark.createDataFrame(docs, ["doc_id", "text"])).collect()}
    assert got[1].n_removed == 0
    assert got[2].text_dedup == "pre"
    assert got[2].n_removed == 9


def test_lcg_corpus_matches_python_replay(spark):
    # deterministic synthetic corpus with a tiny vocab so spans repeat
    docs = []
    x = 1
    for d in range(40):
        n = 12 + (d * 7) % 20
        toks = []
        for _ in range(n):
            x = (x * 1103515245 + 12345) % (2**31)
            toks.append(f"t{x % 6}")
        docs.append((d, " ".join(toks)))
    want = _py_span_dedup(docs)
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_removed)
        for r in span_dedup(spark.createDataFrame(docs, ["doc_id", "text"])).collect()
    }
    assert got == want
    # sanity: the vocab is small enough that something was actually removed
    assert sum(v[2] for v in want.values()) > 0


def test_partitioning_invariance(spark):
    docs = [(i, " ".join(f"w{(i * 3 + j) % 5}" for j in range(15))) for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = sorted(map(tuple, span_dedup(df).collect()))
    b = sorted(map(tuple, span_dedup(df.repartition(7)).collect()))
    assert a == b


@pytest.mark.parametrize("w", [2, 4])
def test_width_parameter(spark, w):
    docs = [(1, "a b c d"), (2, "c d e f"), (3, "z z z z")]
    want = _py_span_dedup(docs, w=w)
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_removed)
        for r in span_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), w=w
        ).collect()
    }
    assert got == want


def test_w_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bad in (0, -3, 1):
        with pytest.raises(ValueError):
            span_dedup(df, w=bad)


def test_hash_spans_tier_matches_exact(spark):
    # xxhash64 key tier: same result as the exact-string tier on a corpus
    # whose span domain is far below any collision concern
    docs = [(i, " ".join(f"w{(i * 3 + j) % 7}" for j in range(20))) for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = sorted(map(tuple, span_dedup(df).collect()))
    b = sorted(map(tuple, span_dedup(df, hash_spans=True).collect()))
    assert a == b
