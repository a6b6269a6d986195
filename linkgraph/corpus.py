"""Deterministic synthetic Common-Crawl-style web-page corpus (FIXTURES.md §1).

Schema matches BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is fully distributed (``mapInPandas`` over ``spark.range``) and
deterministic per page id — every executor produces byte-identical rows for a
given (seed, n_pages), which is what makes extraction-parity and resume tests
exact. The outlink sampler is RMAT-style recursive bisection with the
reference benchmark parameters a=0.1, b=0.2, c=0.3
(reference: benchmarks/python_e2e/cugraph_funcs.py:43-50), so in-degree is
power-law with hub pages (exercises skew handling); a fixed 1% of pages are
dangling (reference: cpp/src/link_analysis/pagerank_impl.cuh:203-212 is the
dangling-mass path this exercises) and a fixed 0.5% of pages carry a
self-link (reference: simpleGraph.py:771-782 keeps self-loops).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)
PARA_SEP = "\n\n"
EDGEFACTOR = 16
# marginal P(dst bit = 1) for RMAT a,b,c,d = .1,.2,.3,.4 is b+d = 0.6
_RMAT_P1 = 0.6

_SYLLABLES = [
    "lo", "rem", "ip", "sum", "do", "lor", "sit", "am",
    "et", "con", "sec", "te", "tur", "ad", "pis", "cing",
]


def _vocab() -> list[str]:
    """Fixed deterministic 512-word lorem-like vocabulary."""
    words = []
    for i in range(512):
        a, b, c = _SYLLABLES[i % 16], _SYLLABLES[(i // 16) % 16], _SYLLABLES[(i // 256) % 16]
        words.append(a + b + c if i >= 256 else a + b)
    return words


VOCAB = _vocab()


def n_sites(n_pages: int) -> int:
    return max(4, n_pages // 50)


def url_of(i: int, n_pages: int) -> str:
    return f"https://site{i % n_sites(n_pages):04d}.example/page{i:05d}"


def _page_text(rng: np.random.Generator) -> str:
    n_tok = int(rng.integers(20, 201))
    toks = [VOCAB[j] for j in rng.integers(0, 512, size=n_tok)]
    paras = [" ".join(toks[k : k + 40]) for k in range(0, n_tok, 40)]
    return PARA_SEP.join(paras)


def _rmat_dst(rng: np.random.Generator, nbits: int, n_pages: int) -> int:
    """One RMAT-marginal destination draw: bits high→low, P(bit)=0.6.

    One vectorized uniform draw instead of nbits Python-level rng.random()
    calls — ``Generator.random(size=n)`` consumes the identical doubles in
    the identical order, so generated pages stay byte-for-byte unchanged
    (guide §4.2: batch work inside the Python boundary; this map was ~60%
    per-bit RNG call overhead)."""
    bits = rng.random(nbits) < _RMAT_P1
    v = 0
    for b in bits.tolist():
        v = (v << 1) | b
    return v % n_pages


def _outlinks(i: int, n_pages: int, rng: np.random.Generator) -> list[int]:
    if i % 100 == 7:  # dangling page: no outlinks (1%)
        return []
    ns = n_sites(n_pages)
    nbits = max(1, int(np.ceil(np.log2(max(2, n_pages)))))
    dsts: list[int] = []
    for _ in range(EDGEFACTOR):
        if rng.random() < 0.5:  # intra-site locality link
            per_site = max(1, (n_pages - 1 - (i % ns)) // ns + 1)
            d = (i % ns) + ns * int(rng.integers(0, per_site))
        else:  # RMAT-skewed global link
            d = _rmat_dst(rng, nbits, n_pages)
        dsts.append(int(d) % n_pages)
    if i % 200 == 11:  # self-link page (0.5%)
        dsts[0] = i
    return dsts


def anchor_words(src_id: int, pos: int, dst_id: int) -> str:
    """Deterministic 2-word anchor text for link #pos of page src -> dst.

    Pure hash of the link coordinates (does NOT consume the page rng stream,
    so adding anchors left every other generated column bit-identical)."""
    h = (src_id * 1_000_003 + pos * 8_191 + dst_id * 131_071) & 0x7FFFFFFF
    return f"{VOCAB[h % 512]} {VOCAB[(h // 512) % 512]}"


def _render_html(
    title_toks: str,
    paras: list[str],
    out_urls: list[str],
    anchors: list[str] | None = None,
) -> str:
    anchors = anchors or ["link"] * len(out_urls)
    links = "".join(
        f'<li><a href="{u}">{a}</a></li>' for u, a in zip(out_urls, anchors)
    )
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        f"<html><head><title>{title_toks}</title></head><body>"
        f"{body}<ul>{links}</ul></body></html>"
    )


def _lang_of(i: int, rng: np.random.Generator) -> str:
    r = rng.random()
    return "en" if r < 0.90 else ("de" if r < 0.95 else "fr")


def generate_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic page-corpus generator."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                i = int(i)
                rng = np.random.default_rng([seed, i])
                text = _page_text(rng)
                paras = text.split(PARA_SEP)
                out_ids = _outlinks(i, n_pages, rng)
                out_urls = [url_of(d, n_pages) for d in out_ids]
                anchors = [
                    anchor_words(i, k, d) for k, d in enumerate(out_ids)
                ]
                title = " ".join(paras[0].split(" ")[:5])
                html = _render_html(title, paras, out_urls, anchors).encode("utf-8")
                rows.append(
                    (
                        url_of(i, n_pages),
                        _EPOCH + _dt.timedelta(seconds=17 * i),
                        html,
                        text,
                        _lang_of(i, rng),
                    )
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_pages, 1, parts).mapInPandas(gen, PAGE_SCHEMA)
