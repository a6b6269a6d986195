"""M0: corpus generation + extraction parity (the input_hint invariant)."""

import pyspark.sql.functions as F
import pytest

from linkgraph import extract_links, extract_text, generate_pages, pages_to_edges

N_PAGES = 300


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N_PAGES, seed=42).cache()
    df.count()
    return df


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
    ]
    assert pages.count() == N_PAGES
    assert pages.select("url").distinct().count() == N_PAGES


def test_extract_text_byte_identical(pages):
    """extract_text(html) == text, byte-identical per url (BASELINE.json
    input_hint; the reference has no HTML path — this is our input boundary)."""
    mismatches = pages.filter(extract_text("html") != F.col("text")).count()
    assert mismatches == 0


def test_determinism(spark, pages):
    again = generate_pages(spark, N_PAGES, seed=42)
    a = sorted(pages.select("url", "text", "lang").collect())
    b = sorted(again.select("url", "text", "lang").collect())
    assert a == b
    h1 = sorted(r["h"] for r in pages.select(F.md5(F.col("html")).alias("h")).collect())
    h2 = sorted(r["h"] for r in again.select(F.md5(F.col("html")).alias("h")).collect())
    assert h1 == h2


def test_dangling_pages_have_no_links(pages):
    n_links = pages.select(
        "url", F.size(extract_links("html")).alias("n")
    )
    # pages i % 100 == 7 are dangling (FIXTURES.md §1)
    dangling = n_links.filter(F.col("url").rlike("page000(07)$|page001(07)$|page002(07)$"))
    assert dangling.count() == 3
    assert dangling.filter(F.col("n") > 0).count() == 0
    # everything else has EDGEFACTOR links
    assert n_links.filter(F.col("n") == 16).count() == N_PAGES - 3


def test_edges_extraction(pages):
    edges = pages_to_edges(pages)
    assert edges.columns == ["src", "dst"]
    n = edges.count()
    assert n == (N_PAGES - 3) * 16
    # self-links exist (pages i % 200 == 11)
    assert edges.filter(F.col("src") == F.col("dst")).count() >= 2
    # all dst urls are valid corpus urls
    urls = pages.select(F.col("url").alias("dst"))
    assert edges.join(urls, on="dst", how="left_anti").count() == 0
