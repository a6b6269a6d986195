"""skipgram_pairs vs a brute-force window replay."""

from collections import Counter

import pytest

from linkgraph.algorithms.random_walks import skipgram_pairs

WALKS = [(0, [1, 2, 3, 4, 5]), (1, [7, 2, 7]), (2, [9]), (3, [4, 4, 4])]


@pytest.mark.parametrize("window", [1, 2, 4])
def test_matches_bruteforce(spark, window):
    rows = [(w, s, v) for w, seq in WALKS for s, v in enumerate(seq)]
    df = spark.createDataFrame(rows, "walk_id long, step long, vertex long")
    got = {
        (r.center, r.context): r.cnt
        for r in skipgram_pairs(df, window=window).collect()
    }
    exp = Counter()
    for _, seq in WALKS:
        for i, a in enumerate(seq):
            for j in range(max(0, i - window), min(len(seq), i + window + 1)):
                if j != i:
                    exp[(a, seq[j])] += 1
    assert got == dict(exp)


def test_counts_are_symmetric(spark):
    rows = [(w, s, v) for w, seq in WALKS for s, v in enumerate(seq)]
    df = spark.createDataFrame(rows, "walk_id long, step long, vertex long")
    got = {
        (r.center, r.context): r.cnt for r in skipgram_pairs(df, window=3).collect()
    }
    assert all(got[(b, a)] == c for (a, b), c in got.items())


def test_validates_window(spark):
    df = spark.createDataFrame([(0, 0, 1)], "walk_id long, step long, vertex long")
    with pytest.raises(ValueError):
        skipgram_pairs(df, window=0)
