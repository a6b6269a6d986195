"""Gopher-style repetition metrics vs a pure-Python oracle (integer-exact)."""

from collections import Counter

from linkgraph.text.analysis import repetition_metrics

DOCS = [
    (0, "spam spam spam spam"),                      # maximal repetition
    (1, "the quick brown fox jumps over the dog"),   # mild repetition
    (2, "a b a b a b a b"),                          # bigram-repetitive
    (3, "one"),                                      # single word: no bigrams
    (4, "x y"),                                      # exactly one bigram
]


def _oracle(text):
    words = text.strip().split(" ")
    n = len(words)
    wc = Counter(words)
    bigrams = Counter(
        f"{a} {b}" for a, b in zip(words, words[1:])
    )
    top_bg = (100000 * max(bigrams.values())) // max(n - 1, 1) if bigrams else 0
    return {
        "n_words": n,
        "top_word_e5": (100000 * max(wc.values())) // n,
        "distinct_e5": (100000 * len(wc)) // n,
        "top_bigram_e5": top_bg,
    }


def test_repetition_metrics_vs_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {r.doc_id: r.asDict() for r in repetition_metrics(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        expect = _oracle(text)
        row = got[doc_id]
        for k, v in expect.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_repetition_flags_rank_spamminess(spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert got[0].top_word_e5 == 100000          # all-same-word doc
    assert got[0].distinct_e5 == 25000
    assert got[2].top_bigram_e5 > got[1].top_bigram_e5
