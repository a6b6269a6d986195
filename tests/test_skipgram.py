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


# --- negative_samples ---------------------------------------------------------


def _neg_replay(vocab, n, seed):
    """Naive inverse-CDF replay of negative_samples' documented rule."""
    A, C, M = 1103515245, 12345, 2**31
    order = sorted(vocab, key=lambda t: ((t[0] * A + C) % M, t[0]))
    total = sum(w for _, w in vocab)
    out = {}
    for i in range(n):
        pos = ((i + seed) * A + C) % M % total
        s = 0
        for v, w in order:
            if s <= pos < s + w:
                out[i] = v
                break
            s += w
    return out


def test_negative_samples_match_replay(spark):
    from linkgraph.algorithms.random_walks import negative_samples

    vocab = [(3, 7), (10, 1), (4, 12), (99, 3)]
    df = spark.createDataFrame(vocab, "vertex long, weight long")
    for chunk in (4, 8, 1 << 16):  # spans straddle chunks at 4; one chunk at 2^16
        got = {
            r.sample_id: r.vertex
            for r in negative_samples(df, 200, seed=5, chunk=chunk).collect()
        }
        assert got == _neg_replay(vocab, 200, 5), chunk


def test_negative_samples_proportional(spark):
    from linkgraph.algorithms.random_walks import negative_samples

    # total weight 16 divides the draw count: LCG mod 16 is exactly uniform,
    # so counts are exactly weight-proportional
    df = spark.createDataFrame(
        [(1, 10), (2, 1), (3, 5)], "vertex long, weight long"
    )
    got = {
        r.vertex: r["count"]
        for r in negative_samples(df, 1600, seed=7, chunk=8)
        .groupBy("vertex").count().collect()
    }
    assert got == {1: 1000, 2: 100, 3: 500}


def test_negative_samples_validation(spark):
    from linkgraph.algorithms.random_walks import negative_samples

    df = spark.createDataFrame([(1, 2)], "vertex long, weight long")
    with pytest.raises(ValueError):
        negative_samples(df, 0)
    with pytest.raises(ValueError):
        negative_samples(df, 5, chunk=0)
    empty = spark.createDataFrame([], "vertex long, weight long")
    with pytest.raises(ValueError, match="positive total"):
        negative_samples(empty, 5)
