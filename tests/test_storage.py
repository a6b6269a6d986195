"""Bucketed edge storage: round-trip + planner proof of exchange elimination."""

import io
import contextlib

import pyspark.sql.functions as F
import pytest

from linkgraph import Graph, pagerank
from linkgraph.storage import graph_from_bucketed, load_edges_bucketed, save_edges_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    e = spark.range(5000).select(
        (F.col("id") % 300).alias("src"), ((F.col("id") * 7 + 3) % 300).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    save_edges_bucketed(e, "edges_bucketed_test", buckets=8)
    return e


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")  # node + args on one line: "Exchange hashpartitioning(...)"
    return buf.getvalue()


def test_roundtrip(spark, bucketed):
    t = load_edges_bucketed(spark, "edges_bucketed_test")
    assert sorted(map(tuple, t.collect())) == sorted(map(tuple, bucketed.collect()))


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    t = load_edges_bucketed(spark, "edges_bucketed_test")
    plan = _plan(t.groupBy("src").count())
    assert "Exchange hashpartitioning" not in plan
    # the same agg over the raw (unbucketed) frame DOES shuffle
    raw_plan = _plan(bucketed.groupBy("src").count())
    assert "Exchange hashpartitioning" in raw_plan


def test_bucketed_self_join_has_no_shuffle(spark, bucketed):
    t = load_edges_bucketed(spark, "edges_bucketed_test")
    j = t.alias("a").join(
        t.alias("b").hint("merge"), F.col("a.src") == F.col("b.src")
    )
    plan = _plan(j)
    assert "Exchange hashpartitioning" not in plan


def test_graph_from_bucketed_runs_pagerank(spark, bucketed):
    g = graph_from_bucketed(spark, "edges_bucketed_test", directed=True)
    pr = pagerank(g, fixed_iterations=3)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    # same result as the unbucketed graph
    g2 = Graph.from_edgelist(bucketed, directed=True, renumber=False)
    pr2 = {r.vertex: r.pagerank for r in pagerank(g2, fixed_iterations=3).collect()}
    for r in pr.collect():
        assert abs(pr2[r.vertex] - r.pagerank) < 1e-12


def test_db_qualified_overwrite_keeps_unrelated_table(spark):
    """ADVICE r2: overwriting db.tbl must not delete an unrelated table that
    shares the bare name in another database."""
    e1 = spark.range(100).select(
        (F.col("id") % 20).alias("src"), ((F.col("id") + 1) % 20).alias("dst")
    )
    e2 = spark.range(60).select(
        (F.col("id") % 10).alias("src"), ((F.col("id") + 3) % 10).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    spark.sql("CREATE DATABASE IF NOT EXISTS lgtest")
    # unrelated table with the SAME bare name in the default database
    save_edges_bucketed(e1.filter(F.col("src") != F.col("dst")), "shared_name", buckets=4)
    before = spark.table("shared_name").count()
    # overwrite the db-qualified twin twice (second write exercises cleanup)
    save_edges_bucketed(e2, "lgtest.shared_name", buckets=4)
    save_edges_bucketed(e2, "lgtest.shared_name", buckets=4)
    assert spark.table("shared_name").count() == before
    assert spark.table("lgtest.shared_name").count() == e2.count()
    spark.sql("DROP TABLE IF EXISTS lgtest.shared_name")
    spark.sql("DROP TABLE IF EXISTS shared_name")
    spark.sql("DROP DATABASE IF EXISTS lgtest")
