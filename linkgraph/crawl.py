"""Crawl-snapshot maintenance over (url, warc_ts, html, text, lang) pages.

The recrawl loop every production link-graph pipeline runs between crawls:
resolve each url to its LATEST capture, classify urls across two crawls
(added / removed / changed / unchanged by content hash), and derive the
signed edge delta — running the link-extraction UDF ONLY on the pages whose
content actually moved. The delta feeds `structure.delta.apply_edge_delta`
(op=+1/-1) and the warm-restart PageRank / incremental-WCC family.

Reference N/A (the 2021 cuGraph fork has no crawl layer); the input shape
is the BASELINE input hint (url, warc_ts, html, text, lang).

Physical shape at 100 TB:
- `latest_snapshot` is ONE url-keyed max-of-struct aggregation — max()
  combines map-side, so a url recrawled 10^4 times collapses inside its
  input partitions before the shuffle;
- `crawl_delta` projects each side to (url, 16-byte md5) BEFORE its join:
  the html/text bodies are never shuffled, only url + hash;
- `edge_delta_from_crawls` semi-joins each crawl down to the moved urls
  FIRST, so the Arrow-batched extraction UDF touches ~|delta| pages, not
  the corpus (a 1% recrawl extracts 1% of the pages), then diffs the two
  per-page link sets with one (src, dst) full-outer join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import pages_to_edges

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def latest_snapshot(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per url: the capture with the greatest ``ts_col`` (ties fall
    through to the remaining columns of the packed struct, so the result is
    deterministic under any partitioning). Column order is preserved."""
    if url_col not in pages.columns or ts_col not in pages.columns:
        raise ValueError(f"pages must carry {url_col!r} and {ts_col!r}")
    rest = [c for c in pages.columns if c not in (url_col, ts_col)]
    packed = F.max(F.struct(F.col(ts_col), *[F.col(c) for c in rest])).alias("p")
    out = pages.groupBy(url_col).agg(packed)
    return out.select(
        *[
            F.col(url_col) if c == url_col
            else F.col(f"p.{ts_col}").alias(ts_col) if c == ts_col
            else F.col(f"p.{c}").alias(c)
            for c in pages.columns
        ]
    )


def crawl_delta(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    content_col: str = "html",
) -> DataFrame:
    """DF[url, status] for every url in either crawl: ``added`` (new only),
    ``removed`` (old only), ``changed`` / ``unchanged`` (both, by md5 of
    ``content_col``). Inputs must be snapshot-resolved (one row per url —
    run `latest_snapshot` first when a crawl carries recaptures)."""
    for df, name in ((old_pages, "old_pages"), (new_pages, "new_pages")):
        if url_col not in df.columns or content_col not in df.columns:
            raise ValueError(f"{name} must carry {url_col!r} and {content_col!r}")
    h = F.md5(F.col(content_col).cast("binary"))
    o = old_pages.select(F.col(url_col).alias("url"), h.alias("h_old"))
    n = new_pages.select(F.col(url_col).alias("url"), h.alias("h_new"))
    return o.join(n, on="url", how="full_outer").select(
        "url",
        F.when(F.col("h_old").isNull(), F.lit(ADDED))
        .when(F.col("h_new").isNull(), F.lit(REMOVED))
        .when(F.col("h_old") == F.col("h_new"), F.lit(UNCHANGED))
        .otherwise(F.lit(CHANGED))
        .alias("status"),
    )


def edge_delta_from_crawls(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    content_col: str = "html",
    statuses: DataFrame | None = None,
) -> DataFrame:
    """DF[src, dst, op] — the signed link-graph delta between two resolved
    crawls: op=+1 for edges that exist only in the new crawl, op=-1 for
    edges that exist only in the old one. Edges are DISTINCT (src, dst) per
    snapshot (the simple-graph identity `apply_edge_delta` expects; feed it
    with weight="op").

    Unchanged pages have byte-identical html, hence identical link sets —
    they are excluded BEFORE extraction, so the UDF cost is proportional to
    the moved-page count, not the crawl size.
    """
    st = statuses if statuses is not None else crawl_delta(
        old_pages, new_pages, url_col=url_col, content_col=content_col
    )
    old_moved = st.filter(F.col("status").isin(REMOVED, CHANGED)).select("url")
    new_moved = st.filter(F.col("status").isin(ADDED, CHANGED)).select("url")

    def edges_of(pages: DataFrame, moved: DataFrame) -> DataFrame:
        sel = pages.select(F.col(url_col).alias("url"), content_col).join(
            moved, on="url", how="left_semi"
        )
        return pages_to_edges(
            sel.select(F.col("url"), F.col(content_col).alias("html"))
        ).distinct()

    oe = edges_of(old_pages, old_moved).withColumn("in_old", F.lit(1))
    ne = edges_of(new_pages, new_moved).withColumn("in_new", F.lit(1))
    return (
        oe.join(ne.select("src", "dst", "in_new"), on=["src", "dst"], how="full_outer")
        .filter(F.col("in_old").isNull() | F.col("in_new").isNull())
        .select(
            "src",
            "dst",
            F.when(F.col("in_old").isNull(), F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("op"),
        )
    )
