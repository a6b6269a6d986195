"""Dedup tiers, text analysis, and ANN similarity search."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from linkgraph import (
    cosine_topk,
    exact_dedup,
    language_id,
    lsh_cosine_topk,
    minhash_dedup,
    ngram_jaccard_pairs,
    quality_metrics,
    simhash_near_pairs,
    simhash_signatures,
    token_count,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into the woods "
    "while the hunter watches quietly from a distance near the old mill"
)


@pytest.fixture(scope="module")
def docs(spark):
    near_dup = BASE.replace("quietly", "silently")  # ~1 token of ~25 changed
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = [
        (0, BASE),
        (1, BASE),              # exact dup of 0
        (2, near_dup),          # near dup of 0
        (3, "der hund und der mann und der wagen und der baum gehen weit"),
        (4, "les chats et les chiens et les oiseaux vont tres loin ensemble"),
    ]
    for i in range(5, 25):
        rows.append((i, " ".join(rng.choice(vocab, size=30))))
    # long near-dup pair for simhash: 1 token changed out of 200 unique
    long_doc = " ".join(f"w{i:03d}" for i in range(200))
    rows.append((30, long_doc))
    rows.append((31, long_doc.replace("w100", "zzz")))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()


def test_exact_dedup(docs):
    res = {r.doc_id: r.keep for r in exact_dedup(docs).collect()}
    assert res[0] is True and res[1] is False  # min id kept
    assert res[2] is True  # near dup is NOT an exact dup


def test_ngram_jaccard_pairs(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(a >= 3 and b >= 3 and a < 5 for a, b in pairs)  # 3,4 unrelated


def test_minhash_dedup_clusters(docs):
    res = {r.doc_id: (r.cluster, r.keep) for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert len(res) == 27
    assert res[30] == (30, True) and res[31] == (30, False)  # near-dup pair
    # 0,1,2 one cluster with representative 0
    assert res[0] == (0, True)
    assert res[1] == (0, False)
    assert res[2] == (0, False)
    # unrelated docs are their own clusters
    assert res[3] == (3, True) and res[4] == (4, True)


def test_minhash_deterministic(docs):
    a = sorted((r.doc_id, r.cluster) for r in minhash_dedup(docs, threshold=0.5).collect())
    b = sorted((r.doc_id, r.cluster) for r in minhash_dedup(docs, threshold=0.5).collect())
    assert a == b


def test_simhash_near_pairs(docs):
    sigs = simhash_signatures(docs)
    assert sigs.count() == 27
    same = {r.doc_id: r.simhash for r in sigs.collect()}
    assert same[0] == same[1]  # identical text -> identical simhash
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(sigs, max_hamming=6).collect()}
    assert pairs.get((0, 1)) == 0
    assert (30, 31) in pairs  # 1-token-in-200 near dup has small hamming


def test_text_analysis_ops(docs, spark):
    tc = docs.select("doc_id", token_count("text").alias("n")).collect()
    base_tokens = len(BASE.split(" "))
    got = {r.doc_id: r.n for r in tc}
    assert got[0] == base_tokens
    lid = {r.doc_id: r.lang for r in docs.select("doc_id", language_id("text").alias("lang")).collect()}
    assert lid[0] == "en" and lid[3] == "de" and lid[4] == "fr"
    q = quality_metrics(docs)
    row = {r.doc_id: r for r in q.collect()}[0]
    assert row.n_tokens == base_tokens and row.is_low_quality is False


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    # 4 well-separated clusters of 25 vectors each
    centers = rng.standard_normal((4, 32)) * 5
    rows = []
    for i in range(100):
        v = centers[i % 4] + rng.standard_normal(32) * 0.1
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>").cache()


def _numpy_topk(emb_rows, qid, k):
    vecs = {r.vec_id: np.array(r.embedding) for r in emb_rows}
    q = vecs[qid]
    sims = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in vecs.items()
        if i != qid
    }
    return sorted(sims, key=lambda i: (-sims[i], i))[:k]


def test_cosine_topk_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    res = cosine_topk(emb, queries, k=5)
    rows = emb.collect()
    for qid in range(3):
        got = [
            r.neighbor_id
            for r in sorted(
                res.filter(F.col("query_id") == qid).collect(), key=lambda r: r.rnk
            )
        ]
        exp = _numpy_topk(rows, qid, 5)
        # same cluster membership; exact order can differ on fp ties
        assert set(got) == set(exp)
        assert all(n % 4 == qid % 4 for n in got)  # neighbors from same cluster


def test_lsh_topk_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_cosine_topk(emb, queries, k=5, nbits=8)
    rows_e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    rows_a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(rows_e & rows_a) / len(rows_e)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_minhash_recall_vs_bruteforce(spark):
    """Pin MinHash-LSH recall against the exact (brute-force) tier at a
    fixed seed (VERDICT r1: verification-depth gap for doc_minhash_dedup).

    100-doc corpus with 20 planted near-dup pairs (1-2 token edits in
    60-token docs -> true Jaccard ~0.85-0.95, comfortably above the 0.7
    threshold). Recall = fraction of exact-tier pairs whose endpoints land
    in one minhash cluster. Precision is exact by construction (candidates
    are verified with exact Jaccard before clustering) and asserted too.
    """
    import random

    rng = random.Random(7)
    words = [f"tok{i:03d}" for i in range(400)]
    rows = []
    for d in range(60):  # 60 unrelated docs
        rows.append((d, " ".join(rng.choice(words) for _ in range(60))))
    for p in range(20):  # 20 near-dup pairs
        base = [rng.choice(words) for _ in range(60)]
        a = " ".join(base)
        mut = list(base)
        mut[rng.randrange(60)] = "zz" + str(p)
        b = " ".join(mut)
        rows.append((100 + 2 * p, a))
        rows.append((101 + 2 * p, b))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()

    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    assert len(exact) >= 18, f"fixture: expected >=18 true pairs, got {len(exact)}"
    res = {r.doc_id: r.cluster for r in minhash_dedup(docs, threshold=0.7).collect()}
    hit = sum(1 for a, b in exact if res[a] == res[b])
    recall = hit / len(exact)
    assert recall >= 0.9, f"minhash recall {recall} over {len(exact)} true pairs"
    # precision: co-clustered docs must be exact-tier similar (verify step)
    from collections import defaultdict

    clusters = defaultdict(list)
    for d, c in res.items():
        clusters[c].append(d)
    for c, members in clusters.items():
        if len(members) > 1:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    assert (ms[i], ms[j]) in exact, (
                        f"cluster {c} contains non-similar pair {(ms[i], ms[j])}"
                    )


def test_ivf_topk_recall(spark, emb):
    from linkgraph.similarity import ivf_cosine_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_cosine_topk(emb, queries, k=5, n_cells=8, nprobe=2)
    rows_e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    rows_a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(rows_e & rows_a) / len(rows_e)
    # 4 well-separated clusters vs 8 trained cells + 2 probes: near-exact
    assert recall >= 0.9, f"IVF recall {recall}"


def test_ivf_deterministic_across_runs(spark, emb):
    from linkgraph.similarity import ivf_cosine_topk

    queries = emb.filter(F.col("vec_id") < 5)
    a = {(r.query_id, r.rnk, r.neighbor_id)
         for r in ivf_cosine_topk(emb, queries, k=3, n_cells=8).collect()}
    b = {(r.query_id, r.rnk, r.neighbor_id)
         for r in ivf_cosine_topk(emb, queries, k=3, n_cells=8).collect()}
    assert a == b


def _numpy_near_dup_pairs(emb_rows, threshold):
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb_rows}
    ids = sorted(vecs)
    out = set()
    for i, a in enumerate(ids):
        va = vecs[a] / np.linalg.norm(vecs[a])
        for b in ids[i + 1:]:
            vb = vecs[b] / np.linalg.norm(vecs[b])
            if float(va @ vb) >= threshold:
                out.add((a, b))
    return out


def test_embedding_near_dup_exact(spark, emb):
    from linkgraph.similarity import embedding_near_dup

    got = {
        (r.a_id, r.b_id)
        for r in embedding_near_dup(emb, threshold=0.95, method="exact").collect()
    }
    exp = _numpy_near_dup_pairs(emb.collect(), 0.95)
    assert got == exp
    # the fixture's 4 tight clusters: every pair is within-cluster
    assert all(a % 4 == b % 4 for a, b in got)
    assert len(got) > 1000  # 4 * C(25,2) = 1200 modulo noise


def test_embedding_near_dup_lsh_recall(spark, emb):
    from linkgraph.similarity import embedding_near_dup

    exact = {
        (r.a_id, r.b_id)
        for r in embedding_near_dup(emb, threshold=0.95, method="exact").collect()
    }
    approx = {
        (r.a_id, r.b_id)
        for r in embedding_near_dup(
            emb, threshold=0.95, method="lsh", nbits=8, ntables=4
        ).collect()
    }
    # precision is exact by construction (cosine verify inside)
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"near-dup LSH recall {recall}"


def test_embedding_near_dup_deterministic(spark, emb):
    from linkgraph.similarity import embedding_near_dup

    a = sorted(
        (r.a_id, r.b_id, round(r.cosine, 9))
        for r in embedding_near_dup(emb, threshold=0.95, method="lsh").collect()
    )
    b = sorted(
        (r.a_id, r.b_id, round(r.cosine, 9))
        for r in embedding_near_dup(
            emb.repartition(7), threshold=0.95, method="lsh"
        ).collect()
    )
    assert a == b


def test_minhash_lcg_mode_matches_blake2b_clusters(docs):
    """hash_mode='lcg' (the SQL-replicable driver variant) must produce the
    same verified clusters as the default blake2b tier on the fixture docs
    (both verify candidates with exact Jaccard, so any difference would be
    a candidate-recall gap)."""
    a = sorted(
        (r.doc_id, r.cluster, r.keep)
        for r in minhash_dedup(docs, threshold=0.5).collect()
    )
    b = sorted(
        (r.doc_id, r.cluster, r.keep)
        for r in minhash_dedup(docs, threshold=0.5, hash_mode="lcg").collect()
    )
    assert a == b


def test_minhash_lcg_deterministic_across_partitioning(docs):
    a = sorted(
        (r.doc_id, r.cluster)
        for r in minhash_dedup(docs, threshold=0.5, hash_mode="lcg").collect()
    )
    b = sorted(
        (r.doc_id, r.cluster)
        for r in minhash_dedup(
            docs.repartition(7), threshold=0.5, hash_mode="lcg"
        ).collect()
    )
    assert a == b


def test_tfidf_top_terms(spark):
    from linkgraph import tfidf_top_terms

    rows = [
        (0, "apple banana apple apple common common"),
        (1, "banana cherry common common"),
        (2, "durian common common common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    res = {
        (r.doc_id, r.rnk): (r.term, r.tf)
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    import math

    # doc 0: apple tf=3 idf=ln(3/1) beats banana tf=1 idf=ln(3/2)
    assert res[(0, 1)] == ("apple", 3)
    # doc 2: durian (unique) beats common (df=3 -> idf=0, score 0)
    assert res[(2, 1)] == ("durian", 1)
    # 'common' appears in all docs: idf = ln(1) = 0 -> score exactly 0
    zero = [
        r for r in tfidf_top_terms(docs, k=5).collect() if r.term == "common"
    ]
    assert zero and all(r.score_e6 == 0 for r in zero)


def test_simhash_lcg_signatures_properties(spark):
    from linkgraph.text.dedup import (
        SIMHASH_BITS,
        simhash_lcg_signatures,
        simhash_near_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact duplicate -> identical signature
            (2, base.replace("lazy", "sleepy")),  # near duplicate
            (3, "completely different content about spark shuffles and parquet"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in simhash_lcg_signatures(docs).collect()}
    assert len(sigs) == 4
    assert all(0 <= s < (1 << SIMHASH_BITS) for s in sigs.values())
    assert sigs[0] == sigs[1]
    ham01 = bin(sigs[0] ^ sigs[2]).count("1")
    ham03 = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham01 < ham03
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(simhash_lcg_signatures(docs)).collect()
    }
    assert pairs[(0, 1)] == 0


def test_fm_distinct_estimate_tracks_exact(spark):
    """FM sketch estimate within the expected error band of the exact
    distinct count, and registers identical under recomputation."""
    from pyspark.sql import functions as F

    from linkgraph.text.analysis import (
        fm_distinct_estimate,
        fm_distinct_sketches,
        word_shingles,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = word_shingles(d, "text", "doc_id", 3).join(
        d.select("doc_id", "lang"), on="doc_id"
    )
    sk = fm_distinct_sketches(sh, "lang", "shingle", num_registers=8, seed=7)
    est = {
        r["lang"]: r["distinct_est"]
        for r in fm_distinct_estimate(sk, "lang").collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in sh.groupBy("lang")
        .agg(F.countDistinct("shingle").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        # r=8 FM: std error ~0.3 in log2 space -> generous 2.5x band
        assert n / 2.5 < est[lang] < n * 2.5, (lang, n, est[lang])
    # determinism: same registers on recomputation
    a = {(r["lang"], r["j"]): r["mask"] for r in sk.collect()}
    b = {
        (r["lang"], r["j"]): r["mask"]
        for r in fm_distinct_sketches(
            sh, "lang", "shingle", num_registers=8, seed=7
        ).collect()
    }
    assert a == b


def test_fm_distinct_validation(spark):
    import pytest as _pytest

    from linkgraph.text.analysis import fm_distinct_sketches

    d = spark.createDataFrame([(1, "a", "en")], "doc_id LONG, text STRING, lang STRING")
    with _pytest.raises(ValueError):
        fm_distinct_sketches(d, "lang", "text", num_registers=0)
