"""text/pipeline.py: PII redaction, decontamination, stratified sampling,
shard planning/writing."""

import pytest
from pyspark.sql import functions as F

from linkgraph.text.pipeline import (
    LCG_M,
    decontaminate,
    pii_redact,
    shard_assignment,
    shard_plan,
    stratified_sample,
    write_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "reach me at a.b@x.io or 555-123-4567 from 10.0.0.1 ok", "en"),
        (2, "no pii here at all just words and more words", "en"),
        (3, "two mails p@q.org r@s.net and ip 192.168.0.254 end", "de"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "fr"),
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def test_pii_redact_counts_and_text(docs):
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 1)
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 0, 0)
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1
    assert out[1]["redacted"] == (
        "reach me at <PII:email> or <PII:phone> from <PII:ipv4> ok"
    )
    assert out[2]["redacted"] == out[2]["redacted"]  # untouched text survives
    assert "<PII:email>" in out[3]["redacted"] and "@" not in out[3]["redacted"]


def test_decontaminate_flags_overlap(docs):
    # doc 5 is a verbatim copy of doc 4 -> sharing every 8-gram with a
    # benchmark containing doc 4; docs 1-3 share none
    bench = docs.filter(F.col("doc_id") == 4)
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=8).collect()}
    assert len(out) == 5  # every doc gets a row
    assert out[4]["contaminated"] == 1 and out[5]["contaminated"] == 1
    assert out[5]["n_contaminated"] == 3  # 10 words -> 3 distinct 8-grams
    assert all(out[i]["contaminated"] == 0 for i in (1, 2, 3))


def test_stratified_sample_deterministic_and_stable(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    a = stratified_sample(df, rates, key_col="doc_id")
    b = stratified_sample(df, rates, key_col="doc_id")
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())
    n_en = a.filter(F.col("lang") == "en").count()
    n_de = a.filter(F.col("lang") == "de").count()
    assert abs(n_en / 5000 - 0.5) < 0.05 and abs(n_de / 5000 - 0.1) < 0.05
    # growing the corpus keeps previously-kept rows (incremental stability)
    grown = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    rg = sorted(
        r["doc_id"]
        for r in stratified_sample(grown, rates, key_col="doc_id")
        .filter(F.col("doc_id") < 10_000)
        .collect()
    )
    assert rg == ra


def test_shard_assignment_balance(spark):
    df = spark.range(0, 8_000).select(F.col("id").alias("doc_id"))
    plan = shard_plan(df, 8, key_col="doc_id").collect()
    assert len(plan) == 8
    counts = [r["n_docs"] for r in plan]
    assert sum(counts) == 8_000
    assert max(counts) < 1.2 * min(counts)  # LCG decorrelates range-clustered keys
    # assignment is a pure projection: no exchange in the plan
    explained = shard_assignment(df, 8, "doc_id")._sc._jvm  # noqa: F841
    plan_str = shard_assignment(df, 8, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str


def test_write_shards_roundtrip(spark, tmp_path):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
    )
    path = str(tmp_path / "shards")
    write_shards(df, path, 4, key_col="doc_id")
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(r["shard"] for r in back.select("shard").distinct().collect()) == [
        0, 1, 2, 3,
    ]
    # shard dirs prune: reading one shard touches one directory
    one = spark.read.parquet(path).filter(F.col("shard") == 2)
    expected = shard_assignment(df, 4, "doc_id").filter(F.col("shard") == 2).count()
    assert one.count() == expected
    # reproducible assignment against the library function
    got = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    want = {
        (r["doc_id"], r["shard"])
        for r in shard_assignment(df, 4, "doc_id").select("doc_id", "shard").collect()
    }
    assert got == want


def test_lcg_threshold_edges(spark):
    # rate 1.0 keeps everything; rate 0.0 keeps nothing
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    assert stratified_sample(df, {"en": 1.0}, key_col="doc_id").count() == 1000
    assert stratified_sample(df, {"en": 0.0}, key_col="doc_id").count() == 0
    # unknown stratum falls to default_rate
    assert (
        stratified_sample(df, {"xx": 1.0}, key_col="doc_id", default_rate=0.0).count()
        == 0
    )
    assert LCG_M == 2**31


def test_bloom_decontaminate_matches_exact(docs):
    """Bloom tier == plain decontaminate, even under heavy false-positive
    pressure (bits_per_item=1 -> most prefilter survivors are false) —
    the exact-confirm join must scrub every one."""
    from linkgraph.text.pipeline import bloom_decontaminate, decontaminate

    bench = docs.filter(F.col("doc_id") >= 4)  # docs 4 and 5 are identical
    exact = {
        r.doc_id: (r.n_contaminated, r.contaminated)
        for r in decontaminate(docs, bench, n=5).collect()
    }
    for bpi in (1, 14):
        got = {
            r.doc_id: (r.n_contaminated, r.contaminated)
            for r in bloom_decontaminate(docs, bench, n=5, bits_per_item=bpi).collect()
        }
        assert got == exact, f"bits_per_item={bpi}"
    assert any(v[1] == 1 for v in exact.values())  # scenario non-trivial


def test_bloom_decontaminate_empty_benchmark(docs, spark):
    from linkgraph.text.pipeline import bloom_decontaminate

    bench = docs.filter(F.lit(False))
    out = bloom_decontaminate(docs, bench, n=5)
    assert out.filter(F.col("contaminated") != 0).count() == 0
    assert out.count() == docs.count()


# --- DSIR -----------------------------------------------------------------


def _py_dsir(corpus, target, num_buckets, alpha, n_max):
    """Pure-Python replay of dsir_weights (exact ints)."""
    import math

    A, B, P = 1103515245, 12345, 2147483647

    def code(g):
        acc = 0
        for i, ch in enumerate(g, start=1):
            acc = (acc + ord(ch) * ((A * i + B) % P)) % P
        return acc

    def buckets_of(text):
        words = text.strip().split(" ")
        out = {}
        for n in range(1, n_max + 1):
            hi = max(len(words) - (n - 1), 1)
            for i in range(hi):
                g = " ".join(words[i:i + n])
                if g:
                    b = code(g) % num_buckets
                    out[b] = out.get(b, 0) + 1
        return out

    cr, ct = {}, {}
    per_doc = {}
    for doc_id, text in corpus:
        bs = buckets_of(text)
        per_doc[doc_id] = bs
        for b, c in bs.items():
            cr[b] = cr.get(b, 0) + c
    for _, text in target:
        for b, c in buckets_of(text).items():
            ct[b] = ct.get(b, 0) + c
    Ct = sum(ct.values()) + alpha * num_buckets
    Cr = sum(cr.values()) + alpha * num_buckets
    s = {
        b: int(round(1_000_000 * (
            math.log((ct.get(b, 0) + alpha) / Ct)
            - math.log((cr.get(b, 0) + alpha) / Cr)
        )))
        for b in range(num_buckets)
    }
    return {
        doc_id: sum(c * s[b] for b, c in bs.items())
        for doc_id, bs in per_doc.items()
    }


def test_dsir_weights_match_python_replay(spark):
    from linkgraph.text.pipeline import dsir_weights

    corpus = [
        (0, "the cat sat on the mat"),
        (1, "spark shuffles the hash join"),
        (2, "the cat chased the spark"),
        (3, "mat cat the on sat"),
        (4, "join order scan window batch"),
    ]
    target = [(0, "the cat sat on the mat"), (2, "the cat chased the spark")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    w, buckets = dsir_weights(cdf, tdf, num_buckets=64, alpha=1.0, n_max=2)
    got = {r.doc_id: r.dsir_w_e for r in w.collect()}
    want = _py_dsir(corpus, target, 64, 1.0, 2)
    assert got == want
    # target-like docs must outrank the unrelated one
    assert got[0] > got[4] and got[2] > got[4]
    # bucket table is complete and its counts cover every gram occurrence:
    # n words yield n unigrams + max(n-1, 1) bigrams under the shingle rule
    assert len(buckets) == 64 and [b[0] for b in buckets] == list(range(64))
    n_grams = sum(
        len(t.split()) + max(len(t.split()) - 1, 1) for _, t in corpus
    )
    assert sum(b[2] for b in buckets) == n_grams
    n_target = sum(
        len(t.split()) + max(len(t.split()) - 1, 1) for _, t in target
    )
    assert sum(b[1] for b in buckets) == n_target


def test_dsir_gumbel_topk_deterministic(spark):
    from linkgraph.text.pipeline import dsir_gumbel_topk, dsir_weights

    corpus = [(i, f"w{i} w{(i*3) % 7} w{(i*5) % 11} common words here") for i in range(30)]
    target = [(0, "common words here w1 w2")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    w, _ = dsir_weights(cdf, tdf, num_buckets=32)
    a = [r.doc_id for r in dsir_gumbel_topk(w, 5, seed=7).collect()]
    b = [r.doc_id for r in dsir_gumbel_topk(w, 5, seed=7).collect()]
    assert a == b and len(a) == 5
    c = [r.doc_id for r in dsir_gumbel_topk(w, 5, seed=8).collect()]
    assert len(c) == 5  # different seed still yields a full, valid sample


def test_dsir_validation(spark):
    from linkgraph.text.pipeline import dsir_gumbel_topk, dsir_weights

    cdf = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_weights(cdf, cdf, num_buckets=0)
    with pytest.raises(ValueError):
        dsir_weights(cdf, cdf, alpha=0.0)
    w, _ = dsir_weights(cdf, cdf, num_buckets=8)
    with pytest.raises(ValueError):
        dsir_gumbel_topk(w, 0)
    with pytest.raises(ValueError):
        dsir_gumbel_topk(w, 1, temperature=0.0)


def test_ccnet_perplexity_orders_reference_like_docs_first(spark):
    from linkgraph.text.pipeline import ccnet_perplexity

    ref_text = "the cat sat on the mat and the dog sat on the rug " * 4
    docs = spark.createDataFrame(
        [
            (0, ref_text),                     # reference member
            (1, "the cat sat on the mat"),     # reference-like
            (2, "zxq qvw jkl pqr mno abc"),    # unseen junk
            (3, "one"),                        # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    ref = docs.filter("doc_id = 0")
    scores, trans, ctx = ccnet_perplexity(docs, ref, num_buckets=64)
    rows = {r.doc_id: r for r in scores.collect()}
    assert rows[3].n_terms == 0 and rows[3].avg_nlogp_e6 is None
    # reference-like doc scores strictly better (lower nlogp) than junk
    assert rows[1].avg_nlogp_e6 < rows[2].avg_nlogp_e6
    # model invariants: context totals equal the sum of their transitions
    c1 = {bp: c for bp, c, _ in ctx}
    agg = {}
    for bp, _bc, c2, _s in trans:
        agg[bp] = agg.get(bp, 0) + c2
    assert agg == c1
    # exact integer consistency: sum_e equals a manual replay
    assert rows[1].avg_nlogp_e6 == round(-rows[1].sum_e / rows[1].n_terms)


def test_ccnet_perplexity_validates_knobs(spark):
    from linkgraph.text.pipeline import ccnet_perplexity

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ccnet_perplexity(docs, docs, num_buckets=1)
    with _pytest.raises(ValueError):
        ccnet_perplexity(docs, docs, alpha=0)


# --- token_budget_sample ------------------------------------------------------


def _mix_replay(rows, budgets, default):
    """Naive greedy-fill replay: order by (lcg, key) per stratum, keep while
    prefix-before < budget."""
    from linkgraph.text.pipeline import LCG_A, LCG_C, LCG_M

    kept = set()
    by_stratum = {}
    for key, text, stratum in rows:
        by_stratum.setdefault(stratum, []).append(
            ((LCG_A * key + LCG_C) % LCG_M, key, len(text.strip().split(" ")))
        )
    for stratum, docs in by_stratum.items():
        budget = budgets.get(stratum, default)
        prefix = 0
        for u, key, toks in sorted(docs):
            if prefix < budget:
                kept.add(key)
            prefix += toks
    return kept


@pytest.fixture(scope="module")
def mix_rows():
    # 40 docs across 3 strata with irregular token counts
    return [
        (i, " ".join(f"w{j}" for j in range((i * 7) % 13 + 1)),
         ["en", "de", "zh"][i % 3])
        for i in range(40)
    ]


@pytest.mark.parametrize("bucket_bits", [1, 4, 12])
def test_token_budget_sample_matches_replay(spark, mix_rows, bucket_bits):
    from linkgraph.text.pipeline import token_budget_sample

    df = spark.createDataFrame(mix_rows, "doc_id LONG, text STRING, lang STRING")
    budgets = {"en": 30, "de": 11}
    out = token_budget_sample(
        df, budgets, default_budget=7, bucket_bits=bucket_bits
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == _mix_replay(mix_rows, budgets, 7)
    # original columns survive, helpers dropped
    assert set(out.columns) == {"doc_id", "text", "lang"}


def test_token_budget_sample_edges(spark, mix_rows):
    from linkgraph.text.pipeline import token_budget_sample

    df = spark.createDataFrame(mix_rows, "doc_id LONG, text STRING, lang STRING")
    assert token_budget_sample(df, {}, default_budget=0).count() == 0
    assert token_budget_sample(df, {}, default_budget=10**9).count() == len(mix_rows)
    # overshoot bounded: kept-total minus budget < the last kept doc's tokens
    out = token_budget_sample(df, {"en": 25}, default_budget=10**9)
    en = out.filter(F.col("lang") == "en").withColumn(
        "t", F.size(F.split(F.trim("text"), " "))
    )
    total = en.agg(F.sum("t")).collect()[0][0]
    biggest = en.agg(F.max("t")).collect()[0][0]
    assert 25 <= total < 25 + biggest
    with pytest.raises(ValueError):
        token_budget_sample(df, {"en": -1})
    with pytest.raises(ValueError):
        token_budget_sample(df, {}, bucket_bits=40)


# --- hashed_linear_quality ----------------------------------------------------


def _qcls_replay(rows, num_buckets):
    from linkgraph.text.dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P
    from linkgraph.text.pipeline import LCG_A, LCG_C, LCG_M

    def bucket(tok):
        acc = 0
        for i, ch in enumerate(tok, start=1):
            acc = (acc + ord(ch) * ((MH_LCG_A * i + MH_LCG_B) % MH_LCG_P)) % MH_LCG_P
        return acc % num_buckets

    def weight(f):
        return ((LCG_A * f + LCG_C) % LCG_M) % 257 - 128

    out = {}
    for key, text, _ in rows:
        toks = text.strip().split(" ")
        bs = [bucket(t) for t in toks]
        feats = bs + [bp * num_buckets + bc for bp, bc in zip(bs, bs[1:])]
        out[key] = (len(feats), sum(weight(f) for f in feats))
    return out


def test_hashed_linear_quality_matches_replay(spark, mix_rows):
    from linkgraph.text.pipeline import hashed_linear_quality

    df = spark.createDataFrame(mix_rows, "doc_id LONG, text STRING, lang STRING")
    got = {
        r["id"]: (r["n_features"], r["score"], r["keep"])
        for r in hashed_linear_quality(df, num_buckets=64).collect()
    }
    want = _qcls_replay(mix_rows, 64)
    assert set(got) == set(want)
    for k, (nf, sc) in want.items():
        assert got[k][0] == nf and got[k][1] == sc
        assert got[k][2] == (1 if sc * 1000 >= 0 else 0)


def test_hashed_linear_quality_unigram_only_and_validation(spark):
    from linkgraph.text.pipeline import hashed_linear_quality

    df = spark.createDataFrame([(1, "solo", "en")], "doc_id LONG, text STRING, lang STRING")
    r = hashed_linear_quality(df, use_bigrams=False).collect()[0]
    assert r["n_features"] == 1
    # single-token doc: bigram path contributes nothing
    r2 = hashed_linear_quality(df, use_bigrams=True).collect()[0]
    assert r2["n_features"] == 1 and r2["score"] == r["score"]
    with pytest.raises(ValueError):
        hashed_linear_quality(df, num_buckets=1)


def test_token_budget_sample_window_input_is_filtered(spark, mix_rows):
    """The scale claim: the per-doc running-sum Window must sit above the
    straddling-bucket FILTER (base < budget < base+bsum), never above the
    full stratum — and the keep-all branch must carry no Window at all."""
    from linkgraph.text.pipeline import token_budget_sample

    df = spark.createDataFrame(mix_rows, "doc_id LONG, text STRING, lang STRING")
    out = token_budget_sample(df, {"en": 30, "de": 11}, default_budget=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly three Windows: the tiny (stratum, bucket) offsets window
    # appears once under each union arm (broadcast build side, bucket-count
    # sized) plus ONE boundary-bucket running sum — never a window over the
    # full per-stratum doc stream
    assert plan.count("Window") == 3, plan
    # the boundary filter predicate reaches the physical plan
    assert "_budget" in plan and "_base" in plan
    import re

    # the union's keep-all arm is windowless: strip the two window subtrees
    # and a filtered-window arm must remain
    assert re.search(r"Filter .*_base.*_budget", plan), plan


def test_token_budget_sample_null_stratum(spark):
    from linkgraph.text.pipeline import token_budget_sample

    # NULL stratum is a real stratum with the default budget (naive-window /
    # PARTITION BY semantics) — a plain equi-join would drop these rows
    rows = [
        (1, "a b c", "en"), (2, "a b", None), (3, "a", None),
        (4, "a b c d", None), (5, "a b", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = token_budget_sample(df, {"en": 100}, default_budget=3)
    got = {r["doc_id"] for r in out.collect()}
    null_rows = [(k, t, s) for k, t, s in rows if s is None]
    want_null = _mix_replay(null_rows, {}, 3)
    assert got == {1, 5} | want_null
    assert want_null  # the NULL stratum kept at least its first LCG doc
    # with default_budget=0 the NULL stratum drops entirely
    out0 = token_budget_sample(df, {"en": 100}, default_budget=0)
    assert {r["doc_id"] for r in out0.collect()} == {1, 5}


# --- pack_sequences -----------------------------------------------------------


def _pack_rows(spark, rows, window, **kw):
    from linkgraph.text.pipeline import pack_sequences

    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    return pack_sequences(df, window=window, **kw).collect()


@pytest.mark.parametrize("bucket_bits", [1, 8])
def test_pack_sequences_covers_every_token_once(spark, mix_rows, bucket_bits):
    rows = [(k, t) for k, t, _ in mix_rows]
    toks = {k: len(t.strip().split(" ")) for k, t in rows}
    out = _pack_rows(spark, rows, 16, bucket_bits=bucket_bits)
    # per doc: spans tile [0, toks) exactly, in chunk order
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    for d, spans in by_doc.items():
        spans.sort(key=lambda r: r.chunk_id)
        assert spans[0].doc_off == 0
        assert sum(s.n_toks for s in spans) == toks[d]
        for a, b in zip(spans, spans[1:]):
            assert b.chunk_id == a.chunk_id + 1  # contiguous chunks
            assert b.doc_off == a.doc_off + a.n_toks
    # per chunk: positions tile [0, window) exactly (ragged tail allowed)
    by_chunk = {}
    for r in out:
        by_chunk.setdefault(r.chunk_id, []).append(r)
    total = sum(toks.values())
    assert set(by_chunk) == set(range((total + 15) // 16))
    for c, parts in by_chunk.items():
        parts.sort(key=lambda r: r.chunk_off)
        assert parts[0].chunk_off == 0
        fill = sum(p.n_toks for p in parts)
        assert fill == (16 if c < max(by_chunk) else total - 16 * c)
        for a, b in zip(parts, parts[1:]):
            assert b.chunk_off == a.chunk_off + a.n_toks


def test_pack_sequences_bucket_bits_invariant(spark, mix_rows):
    rows = [(k, t) for k, t, _ in mix_rows]
    a = sorted(map(tuple, _pack_rows(spark, rows, 16, bucket_bits=2)))
    b = sorted(map(tuple, _pack_rows(spark, rows, 16, bucket_bits=12)))
    assert a == b


def test_pack_sequences_validation(spark):
    from linkgraph.text.pipeline import pack_sequences

    df = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        pack_sequences(df, window=0)
    with pytest.raises(ValueError):
        pack_sequences(df, window=8, bucket_bits=40)


def test_pack_sequences_zero_weight_spans_dropped(spark):
    """A zero-valued weight_col row contributes nothing to the concatenated
    stream: the manifest must not emit n_toks=0 rows for it (and must not
    trip F.sequence's descending mode when its _start is an exact window
    multiple), and all other rows must be identical to the same input with
    the zero row absent."""
    from linkgraph.text.pipeline import pack_sequences

    with_zero = spark.createDataFrame(
        [(1, 8), (2, 0), (3, 5)], "doc_id LONG, n LONG"
    )
    without = spark.createDataFrame([(1, 8), (3, 5)], "doc_id LONG, n LONG")
    a = sorted(
        map(tuple, pack_sequences(with_zero, window=8, weight_col="n").collect())
    )
    b = sorted(
        map(tuple, pack_sequences(without, window=8, weight_col="n").collect())
    )
    assert a == b
    assert all(r[-1] > 0 for r in a)  # no n_toks=0 manifest rows


def test_pack_sequences_plan_no_corpus_scale_single_partition(spark):
    """The corpus-scale prefix-sum window must be PARTITIONED by the LCG
    bucket; the only SinglePartition exchange allowed is the tiny
    (<= 2**bucket_bits row) bucket-offset window that feeds the broadcast."""
    from linkgraph.text.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(200)], "doc_id LONG, text STRING"
    )
    plan = (
        pack_sequences(df, window=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(_bkt" in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    # the single-partition subtree is the broadcast-side offsets frame
    assert "BroadcastExchange" in plan[: plan.index("Exchange SinglePartition")], plan


def test_negative_samples_plan_no_range_join(spark):
    """Draw location is ONE equi-join on the weight-stream chunk id — the
    plan must contain no nested-loop / cartesian range join and no
    broadcast of the (vertex-scale) vocabulary spans is required for
    correctness; the containment filter runs map-side post-join."""
    from linkgraph.algorithms.random_walks import negative_samples

    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(300)], "vertex LONG, weight LONG"
    )
    plan = (
        negative_samples(df, 1000, seed=3, chunk=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan
