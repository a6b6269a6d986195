"""Anchor extraction + anchor-text index vs a python oracle on the corpus."""

import re

import pyspark.sql.functions as F

from linkgraph import (
    anchor_text_index,
    extract_anchors,
    extract_text,
    generate_pages,
    pages_to_edges,
    top_anchor_terms,
)
from linkgraph.corpus import anchor_words

_A = re.compile(r'<a href="([^"]+)"\s*>([^<]*)</a>', re.S)


def _collect_pages(spark, n=400):
    pages = generate_pages(spark, n, seed=7).cache()
    rows = pages.select("url", "html").collect()
    return pages, rows


def test_extract_anchors_matches_regex_and_links(spark):
    pages, rows = _collect_pages(spark)
    got = {
        r.url: [(a.dst, a.anchor) for a in r.a]
        for r in pages.select("url", extract_anchors("html").alias("a")).collect()
    }
    for r in rows:
        want = _A.findall(r.html.decode("utf-8"))
        assert got[r.url] == want
    # href streams agree with pages_to_edges' extractor
    edges = pages_to_edges(pages).groupBy("src").agg(F.count("*").alias("n"))
    n_by_src = {r.src: r.n for r in edges.collect()}
    for r in rows:
        hrefs = [d for d, _ in _A.findall(r.html.decode("utf-8"))]
        assert n_by_src.get(r.url, 0) == len(hrefs)


def test_corpus_anchors_vary_and_text_parity_holds(spark):
    pages, rows = _collect_pages(spark)
    texts = {a for r in rows for _, a in _A.findall(r.html.decode("utf-8"))}
    assert len(texts) > 50  # hash-derived anchors, not a constant
    assert all(len(a.split(" ")) == 2 for a in texts)
    # the corpus invariant is untouched by the anchor change
    assert pages.filter(extract_text("html") != F.col("text")).count() == 0


def test_anchor_words_is_rng_free_hash():
    assert anchor_words(3, 0, 5) == anchor_words(3, 0, 5)
    assert anchor_words(3, 0, 5) != anchor_words(3, 1, 5)


def test_anchor_index_matches_brute(spark):
    pages, rows = _collect_pages(spark)
    brute = {}
    for r in rows:
        for dst, anchor in _A.findall(r.html.decode("utf-8")):
            if dst == r.url:
                continue
            for term in anchor.lower().strip().split():
                if term:
                    brute[(dst, term)] = brute.get((dst, term), 0) + 1
    idx = anchor_text_index(pages, min_count=2)
    got = {(r.dst, r.term): r.cnt for r in idx.collect()}
    assert got == {k: v for k, v in brute.items() if v >= 2}
    # top-k ranks are deterministic (cnt desc, term asc) and bounded
    top = top_anchor_terms(idx, k=3).collect()
    per_dst = {}
    for r in top:
        per_dst.setdefault(r.dst, []).append((r.rank, -r.cnt, r.term))
    for dst, lst in per_dst.items():
        assert sorted(lst) == lst and len(lst) <= 3
        assert [x[0] for x in sorted(lst)] == list(range(1, len(lst) + 1))
