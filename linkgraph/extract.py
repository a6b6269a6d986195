"""Vectorized (Arrow/pandas) HTML extraction UDFs — the input boundary.

The reference ingests ready-made edge lists (cudf.read_csv, e.g.
python/cugraph/cugraph/tests/utils.py:231-243); our input is raw
Common-Crawl-style pages, so link/text extraction replaces that ingestion
step. Per BASELINE.json input_hint these are pandas UDFs only — no per-row
Python anywhere. The extractor is the exact inverse of the corpus template
(FIXTURES.md §1), which makes ``extract_text(html) == text`` byte-identical
per url — the per-row invariant the driver/tests check.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .corpus import PARA_SEP

_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_A_RE = re.compile(r'<a href="([^"]+)"')
_ANCHOR_RE = re.compile(r'<a href="([^"]+)"\s*>([^<]*)</a>', re.S)


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """binary html -> extracted text (concatenated <p> blocks)."""

    def one(b) -> str:
        if b is None:
            return ""
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b)
        return PARA_SEP.join(_P_RE.findall(s))

    return html.map(one)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """binary html -> array of outlink urls (href targets, in order)."""

    def one(b) -> list[str]:
        if b is None:
            return []
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b)
        return _A_RE.findall(s)

    return html.map(one)


_ANCHOR_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("dst", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@pandas_udf(_ANCHOR_T)
def extract_anchors(html: pd.Series) -> pd.Series:
    """binary html -> array<struct<dst, anchor>>: (href, anchor text) pairs
    in document order. Same Arrow-batched boundary as extract_links; the
    anchor text is the raw inner text of the <a> element."""

    def one(b) -> list[tuple[str, str]]:
        if b is None:
            return []
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b)
        return _ANCHOR_RE.findall(s)

    return html.map(one)


def pages_to_edges(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> edge table (src:string url, dst:string url).

    ``explode`` (not explode_outer): dangling pages contribute no edge rows —
    they re-enter the graph as isolated/dangling vertices via the vertex
    universe (Graph.from_edgelist(vertices=...)), matching the reference rule
    that the vertex set is independent of edge presence
    (simpleGraph.py:497-499).
    """
    return (
        pages.select(F.col("url").alias("src"), F.explode(extract_links("html")).alias("dst"))
    )


def anchor_text_index(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_count: int = 1,
    drop_self: bool = True,
) -> DataFrame:
    """Per-target anchor-term inverted index: DF[dst, term, cnt].

    The classic web-search signal (anchor text describes the TARGET better
    than the target's own text — Brin & Page 1998 §2.2): aggregate, per
    linked-to url, the lowercase whitespace terms of every anchor whose
    href points at it.

    Physical plan: one Arrow-batched extraction map (extract_anchors) +
    explode, then ONE map-side-combined shuffle keyed (dst, term) — hub
    targets (the skew axis: everything links to the homepage) collapse in
    the partial aggregate, so reducer-side rows are bounded by distinct
    (dst, term), not in-degree. ``min_count`` floors emitted terms in the
    same job.
    """
    a = pages.select(
        F.col(url_col).alias("src"),
        F.explode(extract_anchors(html_col)).alias("lnk"),
    ).select("src", F.col("lnk.dst").alias("dst"), F.col("lnk.anchor").alias("anchor"))
    if drop_self:
        a = a.filter(F.col("src") != F.col("dst"))
    terms = a.select(
        "dst",
        F.explode(F.split(F.lower(F.trim("anchor")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("dst", "term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def top_anchor_terms(index: DataFrame, k: int = 3) -> DataFrame:
    """DF[dst, term, cnt, rank]: top-k anchor terms per target url.

    Rank by (cnt desc, term asc) — fully deterministic. The window is
    hash-partitioned per dst (never a global sort); per-partition top-k
    would prune first at extreme term fan-out, but the index is already
    aggregated so groups are |distinct terms per dst|-sized.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        index.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
