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
