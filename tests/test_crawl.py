"""crawl.py: snapshot resolution, status classification, edge delta, and
composition with apply_edge_delta + warm-restart PageRank."""

import pytest
from pyspark.sql import functions as F

from linkgraph.crawl import (
    crawl_delta,
    edge_delta_from_crawls,
    latest_snapshot,
)


def _page(url, ts, links, body="x"):
    html = (
        f"<html><body><p>{body}</p><ul>"
        + "".join(f'<li><a href="{d}">l</a></li>' for d in links)
        + "</ul></body></html>"
    )
    return (url, ts, html)


SCHEMA = "url string, warc_ts long, html string"


def test_latest_snapshot_picks_max_ts(spark):
    rows = [
        _page("a", 1, ["b"], body="old"),
        _page("a", 3, ["c"], body="new"),
        _page("a", 2, ["d"], body="mid"),
        _page("b", 9, ["a"]),
    ]
    out = latest_snapshot(spark.createDataFrame(rows, SCHEMA)).collect()
    got = {r.url: (r.warc_ts, "new" in r.html) for r in out}
    assert got == {"a": (3, True), "b": (9, False)}
    # column order preserved
    assert latest_snapshot(spark.createDataFrame(rows, SCHEMA)).columns == [
        "url", "warc_ts", "html",
    ]


def test_latest_snapshot_validates_columns(spark):
    df = spark.createDataFrame([("a", 1)], "url string, x long")
    with pytest.raises(ValueError):
        latest_snapshot(df)


def test_crawl_delta_statuses(spark):
    old = spark.createDataFrame(
        [_page("keep", 1, ["x"]), _page("gone", 1, ["x"]), _page("mut", 1, ["x"])],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [_page("keep", 2, ["x"]), _page("mut", 2, ["y"]), _page("born", 2, ["x"])],
        SCHEMA,
    )
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {
        "keep": "unchanged",
        "gone": "removed",
        "mut": "changed",
        "born": "added",
    }


def test_edge_delta_only_moved_pages(spark):
    old = spark.createDataFrame(
        [
            _page("keep", 1, ["t1", "t2"]),
            _page("gone", 1, ["t1", "t3"]),
            _page("mut", 1, ["t1", "t2", "t2"]),  # dup link -> one edge
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            _page("keep", 2, ["t1", "t2"]),
            _page("mut", 2, ["t2", "t4"]),
            _page("born", 2, ["t1"]),
        ],
        SCHEMA,
    )
    got = {(r.src, r.dst): r.op for r in edge_delta_from_crawls(old, new).collect()}
    assert got == {
        ("gone", "t1"): -1,
        ("gone", "t3"): -1,
        ("mut", "t1"): -1,   # dropped link
        ("mut", "t4"): 1,    # new link; (mut, t2) survives -> no row
        ("born", "t1"): 1,
    }


def test_composes_with_apply_edge_delta_and_pagerank(spark):
    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.structure.delta import apply_edge_delta
    from linkgraph.structure.graph import Graph

    old = spark.createDataFrame(
        [
            _page("a", 1, ["b", "c"]),
            _page("b", 1, ["c"]),
            _page("c", 1, ["a"]),
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            _page("a", 2, ["b"]),      # drops a->c
            _page("b", 2, ["c", "a"]),  # adds b->a
            _page("c", 2, ["a"]),
        ],
        SCHEMA,
    )
    from linkgraph.extract import pages_to_edges

    g_old = Graph.from_edgelist(
        pages_to_edges(old).distinct(), directed=True, renumber=True
    )
    delta = edge_delta_from_crawls(old, new)
    g_inc = apply_edge_delta(g_old, delta, weight="op")
    g_cold = Graph.from_edgelist(
        pages_to_edges(new).distinct(), directed=True, renumber=True
    )
    inc = {r.vertex: r.pagerank for r in pagerank(g_inc, fixed_iterations=20).collect()}
    cold = {
        r.vertex: r.pagerank for r in pagerank(g_cold, fixed_iterations=20).collect()
    }
    assert inc.keys() == cold.keys()
    for v in cold:
        assert inc[v] == pytest.approx(cold[v], abs=1e-12)


def test_extraction_touches_only_moved_pages(spark):
    # the unchanged page's url must not appear in either side's extraction
    # input: assert via the plan that a left-semi join gates pages_to_edges
    old = spark.createDataFrame([_page("keep", 1, ["x"])], SCHEMA)
    new = spark.createDataFrame([_page("keep", 2, ["x"])], SCHEMA)
    out = edge_delta_from_crawls(old, new)
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
