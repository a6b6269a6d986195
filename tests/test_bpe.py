"""BPE vocabulary training (text/bpe.py) vs a pure-python replay."""

from collections import Counter

import pytest

from linkgraph.text.bpe import EOW, bpe_encode, bpe_train


def _replay(texts, k, passes=3, min_count=1):
    """Naive replay of the documented dialect: adjacent-pair counts on the
    word histogram, (count desc, lhs, rhs) argmax, leftmost-nonoverlapping
    replace applied `passes` times."""
    hist = Counter(w for t in texts for w in t.strip().split(" ") if w)
    state = {w: " " + " ".join(list(w) + [EOW]) + " " for w in hist}
    merges = []
    for rank in range(1, k + 1):
        pairs = Counter()
        for w, cnt in hist.items():
            syms = state[w].split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((rank, l, r, l + r, c))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        for w in state:
            s = state[w]
            for _ in range(passes):
                s = s.replace(pat, rep)
            state[w] = s
    return merges, state


def _train(spark, texts, k, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df, *bpe_train(df, k, **kw)


def test_bpe_matches_replay_classic(spark):
    texts = ["low low low lower lowest", "new newer newest new", "low new"]
    df, merges, vocab = _train(spark, texts, 10)
    got = [tuple(r) for r in merges.orderBy("rank").collect()]
    want, state = _replay(texts, 10)
    assert got == want
    assert {r["word"]: r["s"] for r in vocab.collect()} == state


def test_bpe_repeat_chain_dialect(spark):
    # 'aaaa' exercises the replace-consumption rule on (a, a) runs: both
    # engines (and the replay) leave the same fixed point after 3 passes
    texts = ["aaaa aaaa aaaa baa"]
    df, merges, vocab = _train(spark, texts, 4)
    want, state = _replay(texts, 4)
    assert [tuple(r) for r in merges.orderBy("rank").collect()] == want
    assert {r["word"]: r["s"] for r in vocab.collect()} == state


def test_bpe_early_stop_and_min_count(spark):
    # two distinct chars total: only ~3 merges are learnable
    texts = ["ab ab"]
    df, merges, _ = _train(spark, texts, 50)
    n = merges.count()
    assert 0 < n < 50
    df2, merges2, _ = _train(spark, ["ab cd"], 50, min_pair_count=2)
    # every pair occurs once: min_pair_count=2 stops immediately
    assert merges2.count() == 0


def test_bpe_encode_roundtrip_and_oov(spark):
    texts = ["low lower low", "newest newer"]
    df, merges, vocab = _train(spark, texts, 6)
    enc = bpe_encode(df, vocab)
    rows = enc.collect()
    # concatenating tokens per doc (stripping EOW) reconstructs the text
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["pos"])):
        by_doc.setdefault(r["doc_id"], []).append(r["token"])
    for i, t in enumerate(texts):
        joined = "".join(by_doc[i]).replace(EOW, " ").strip()
        assert joined == t
    # OOV word falls back to characters + EOW
    oov = spark.createDataFrame([(9, "zq")], "doc_id long, text string")
    toks = [r["token"] for r in bpe_encode(oov, vocab).orderBy("pos").collect()]
    assert toks == ["z", "q", EOW]


def test_bpe_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(df, 0)
    with pytest.raises(ValueError):
        bpe_train(df, 2, min_pair_count=0)
    with pytest.raises(ValueError):
        bpe_train(df, 2, apply_passes=0)


def test_bpe_batched_equals_sequential(spark):
    """batch_merges > 1 must reproduce the sequential merge list and final
    segmentation EXACTLY (the batch rule only admits a prefix it can prove
    replays the argmax order — see _exact_batch). Covers the classic
    corpus, tie-heavy/overlapping chains, and the shared-symbol /
    merged-symbol-collision cases the proof gates on."""
    corpora = [
        ["low low low low low", "lower lower", "newest " * 6, "widest " * 3],
        # back-to-back chains, ties, a pre-existing 'ab' symbol colliding
        # with the (a, b) concatenation, and single-symbol words
        ["a b a b a b a b", "b a b a", "x y x y", "ab z ab z",
         "q a b w", "z a b", "aa aa aa", "a a a a a"],
    ]
    for texts in corpora:
        _, m_seq, v_seq = _train(spark, texts, 12)
        want = [tuple(r) for r in m_seq.orderBy("rank").collect()]
        want_v = {r["word"]: r["s"] for r in v_seq.collect()}
        for b in (3, 8):
            _, m_b, v_b = _train(spark, texts, 12, batch_merges=b)
            assert [tuple(r) for r in m_b.orderBy("rank").collect()] == want
            assert {r["word"]: r["s"] for r in v_b.collect()} == want_v


def test_bpe_batched_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="batch_merges"):
        bpe_train(df, 1, batch_merges=0)
