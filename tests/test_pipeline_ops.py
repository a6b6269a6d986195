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
