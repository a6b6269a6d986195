"""Reference public-name compatibility layer (linkgraph/compat.py)."""

import numpy as np
import pandas as pd
import pytest

from conftest import load_csv_edges
from linkgraph import (
    Graph,
    from_edgelist,
    is_weighted,
    jaccard,
    jaccard_coefficient,
    strong_connected_component,
    strongly_connected_components,
    subgraph,
    symmetrize_df,
    to_numpy_array,
    to_pandas_adjacency,
    to_pandas_edgelist,
    triangle_count,
    triangles,
)


@pytest.fixture(scope="module")
def karate(spark):
    return Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=False,
    )


def test_triangles_alias(karate):
    assert triangles(karate) == triangle_count(karate)


def test_jaccard_coefficient_alias(karate):
    a = sorted(map(tuple, jaccard(karate).collect()))
    b = sorted(map(tuple, jaccard_coefficient(karate).collect()))
    assert a == b


def test_symmetrize_df_dedup_min(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (1, 0, 2.0), (0, 1, 9.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    got = {(r.src, r.dst): r.weight for r in symmetrize_df(df).collect()}
    assert got == {(0, 1): 2.0, (1, 0): 2.0}


def test_from_edgelist_dispatch(spark):
    pdf = pd.DataFrame({"source": [0, 1], "destination": [1, 2]})
    g1 = from_edgelist(pdf, spark=spark)
    assert g1.number_of_vertices() == 3
    sdf = spark.createDataFrame([(0, 1), (1, 2)], "source LONG, destination LONG")
    g2 = from_edgelist(sdf)
    assert sorted(map(tuple, g1.edges.collect())) == sorted(
        map(tuple, g2.edges.collect())
    )


def test_subgraph_and_is_weighted(spark, karate):
    assert is_weighted(karate)
    sub = subgraph(karate, [0, 1, 2, 3])
    verts = {r.src for r in sub.edges.collect()} | {
        r.dst for r in sub.edges.collect()
    }
    assert verts <= {0, 1, 2, 3}
    assert sub.edges.count() > 0


def test_dense_sinks(spark):
    df = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    g = Graph.from_edgelist(df, weight="weight", renumber=False, directed=True)
    a = to_numpy_array(g)
    assert a.shape == (3, 3) and a[0][1] == 2.0 and a[1][2] == 3.0
    pa = to_pandas_adjacency(g)
    assert np.allclose(pa.to_numpy(), a)
    pe = to_pandas_edgelist(g)
    assert len(pe) == 2


def test_strong_connected_component_alias(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 3)], "src LONG, dst LONG"
    )
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    a = sorted(map(tuple, strong_connected_component(g).collect()))
    b = sorted(map(tuple, strongly_connected_components(g).collect()))
    assert a == b
