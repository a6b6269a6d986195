"""ngram_lm_counts vs a pure-Python Kneser-Ney count replay."""

from collections import Counter

import pytest

from linkgraph.text.lm import ngram_lm_counts

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "the cat the cat the cat"),
    (4, "on"),
    (5, "  The   Cat  "),  # lower+trim, but split(' ') keeps empty tokens
]


def _py_counts(n_max, min_count):
    grams = Counter()
    for _, text in DOCS:
        toks = text.strip().lower().split(" ")
        for k in range(1, n_max + 1):
            for i in range(len(toks) - k + 1):
                grams[(k, " ".join(toks[i : i + k]))] += 1
    cont = Counter()
    for (k, g), _ in grams.items():
        if k >= 2:
            cont[(k - 1, g.split(" ", 1)[1])] += 1
    return {
        (k, g): (c, cont.get((k, g), 0))
        for (k, g), c in grams.items()
        if c >= min_count
    }


@pytest.mark.parametrize("n_max,min_count", [(1, 1), (3, 1), (3, 2), (4, 1)])
def test_matches_python_replay(spark, n_max, min_count):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.ord, r.gram): (r.cnt, r.cont_cnt)
        for r in ngram_lm_counts(df, n_max=n_max, min_count=min_count).collect()
    }
    assert got == _py_counts(n_max, min_count)


def test_continuation_ignores_min_count(spark):
    # "the cat" occurs 4x (docs 0,3) but each distinct bigram counts ONCE
    # toward cont_cnt("cat"); min_count must not filter the bigram table
    # feeding continuation counts.
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        (r.ord, r.gram): r.cont_cnt
        for r in ngram_lm_counts(df, n_max=2, min_count=3).collect()
    }
    # left contexts of "cat": {the, a, ""} -> 3 (doc 5's double space keeps
    # an empty token, the CCNet split(' ') dialect), even though "a cat"
    # (cnt 1) is itself filtered out of the output
    assert rows[(1, "cat")] == 3


def test_short_docs_yield_no_high_order_grams(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    out = ngram_lm_counts(df, n_max=3).collect()
    assert {(r.ord, r.gram, r.cnt, r.cont_cnt) for r in out} == {(1, "solo", 1, 0)}


def test_validates_knobs(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_lm_counts(df, n_max=0)
    with pytest.raises(ValueError):
        ngram_lm_counts(df, min_count=0)
