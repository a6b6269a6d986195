"""Multimodal column plumbing, random walks, k-truss."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from conftest import load_csv_edges
from linkgraph import Graph
from linkgraph.algorithms.ktruss import ktruss_subgraph
from linkgraph.algorithms.random_walks import random_walks
from linkgraph.multimodal import (
    audio_features,
    decode_image_stats,
    generate_media,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = generate_media(spark, 60, seed=42).cache()
    df.count()
    return df


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 60
    kinds = {r.kind: r.cnt for r in media.groupBy("kind").agg(F.count("*").alias("cnt")).collect()}
    assert kinds == {"image": 20, "audio": 20, "video": 20}
    again = generate_media(spark, 60, seed=42)
    a = sorted((r.media_id, bytes(r.data)) for r in media.collect())
    b = sorted((r.media_id, bytes(r.data)) for r in again.collect())
    assert a == b
    # typed metadata matches the payload
    row = media.filter("kind = 'image'").first()
    assert row.meta.width is not None and row.meta.codec == "fakeimg"


def test_decode_image_stats(media):
    stats = decode_image_stats(media).collect()
    assert len(stats) == 20
    for r in stats:
        assert r.width > 0 and r.height > 0
        assert 100 < r.mean_r < 160  # uniform bytes -> mean ~127.5


def test_resize_images(media):
    thumbs = resize_images(media, size=8).collect()
    assert len(thumbs) == 20
    assert all(len(r.thumb) == 64 for r in thumbs)
    assert all(0 <= v <= 255 for v in thumbs[0].thumb)


def test_video_frame_sampling(media):
    frames = sample_video_frames(media, every=2)
    rows = frames.collect()
    assert {r.media_id % 3 for r in rows} == {2}  # only video rows
    assert all(r.frame_idx % 2 == 0 for r in rows)


def test_audio_features(media):
    feats = audio_features(media).collect()
    assert len(feats) == 20
    assert all(r.sample_rate == 16000 and r.rms > 0 for r in feats)


def test_decode_strict_stub_raises(spark):
    """The real-codec boundary is a clearly-marked NotImplementedError."""
    bad = spark.createDataFrame(
        [(0, "image", bytearray(b"\x89PNG....."), (1, 1, None, None, "png"))],
        "media_id LONG, kind STRING, data BINARY, "
        "meta STRUCT<width:INT,height:INT,frames:INT,sample_rate:INT,codec:STRING>",
    )
    with pytest.raises(Exception) as ei:
        decode_image_stats(bad, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "unavailable" in str(ei.value)


def test_random_walks(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    res = random_walks(g, [0, 1, 2], max_depth=5)
    rows = res.collect()
    paths = {}
    for r in rows:
        paths.setdefault(r.walk_id, {})[r.step] = r.vertex
    assert set(paths) == {0, 1, 2}
    adj = {}
    for e in g.edges.collect():
        adj.setdefault(e.src, set()).add(e.dst)
    for wid, p in paths.items():
        assert p[0] == [0, 1, 2][wid]
        for s in range(1, max(p) + 1):
            assert p[s] in adj[p[s - 1]], "walk must follow edges"
    # determinism across runs
    again = {(r.walk_id, r.step): r.vertex for r in random_walks(g, [0, 1, 2], max_depth=5).collect()}
    assert again == {(r.walk_id, r.step): r.vertex for r in rows}


def test_random_walks_sink_truncation(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    res = {(r.walk_id, r.step): r.vertex for r in random_walks(g, [0], max_depth=9).collect()}
    assert res == {(0, 0): 0, (0, 1): 1, (0, 2): 2}  # truncated at sink


def test_random_walks_edge_weights_and_rw_path(spark):
    """Edge-weight path entries must equal the graph's weight for each
    traversed edge; rw_path reproduces the reference's offset layout."""
    from linkgraph.algorithms.random_walks import rw_path

    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False,
        directed=False,
    )
    res = random_walks(g, [0, 1, 33], max_depth=5)
    rows = sorted(res.collect(), key=lambda r: (r.walk_id, r.step))
    wmap = {(e.src, e.dst): e.weight for e in g.edges.collect()}
    paths = {}
    for r in rows:
        paths.setdefault(r.walk_id, []).append(r)
    for wid, p in paths.items():
        assert p[0].edge_weight is None  # step 0 has no inbound edge
        for a, b in zip(p, p[1:]):
            assert b.edge_weight == wmap[(a.vertex, b.vertex)]
    meta = {r.walk_id: r for r in rw_path(res).collect()}
    off = 0
    for wid in sorted(paths):
        assert meta[wid].path_size == len(paths[wid])
        assert meta[wid].weight_size == len(paths[wid]) - 1
        assert meta[wid].vertex_offset == off
        off += len(paths[wid])


def test_random_walks_padding(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=True)
    res = {
        (r.walk_id, r.step): (r.vertex, r.edge_weight)
        for r in random_walks(g, [0, 2], max_depth=4, use_padding=True).collect()
    }
    # every walk padded to max_depth+1 rows
    assert set(res) == {(w, s) for w in (0, 1) for s in range(5)}
    assert res[(0, 0)] == (0, None) and res[(0, 1)] == (1, 1.0) and res[(0, 2)] == (2, 1.0)
    assert res[(0, 3)] == (-1, 0.0) and res[(0, 4)] == (-1, 0.0)  # pad
    assert res[(1, 0)] == (2, None) and res[(1, 1)] == (-1, 0.0)  # sink start


def test_random_walks_weighted_bias(spark):
    """With weight 999 vs 1 on the two out-edges, the A-Res pick must choose
    the heavy edge for nearly all of 64 seeded walks."""
    e = spark.createDataFrame(
        [(0, 1, 999.0), (0, 2, 1.0)], "src LONG, dst LONG, weight DOUBLE"
    )
    g = Graph.from_edgelist(e, weight="weight", renumber=False, directed=True)
    res = random_walks(g, [0] * 64, max_depth=1)
    picks = [r.vertex for r in res.filter("step = 1").collect()]
    assert len(picks) == 64
    assert picks.count(1) >= 60, f"heavy edge picked only {picks.count(1)}/64"


def oracle_ktruss(edges, k):
    es = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    changed = True
    while changed and es:
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        keep = {
            (u, v) for (u, v) in es if len(adj[u] & adj[v]) >= k - 2
        }
        changed = keep != es
        es = keep
    return es


def test_ktruss_karate(spark):
    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), weight="weight", renumber=False, directed=False
    )
    raw = [(r.src, r.dst) for r in g.edges.collect()]
    for k in (3, 4, 5):
        expected = oracle_ktruss(raw, k)
        sub = ktruss_subgraph(g, k)
        got = {(r.src, r.dst) for r in sub.edges.collect() if r.src < r.dst}
        assert got == expected, f"k={k}"


def test_ktruss_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    dg = Graph.from_edgelist(e, renumber=False, directed=True)
    with pytest.raises(ValueError):
        ktruss_subgraph(dg, 3)
    ug = Graph.from_edgelist(e, renumber=False, directed=False)
    with pytest.raises(ValueError):
        ktruss_subgraph(ug, 2)


def _replay_node2vec_lcg(adj, weights, starts, max_depth, p, q, seed):
    """Pure-python replay of node2vec_walks(rank_mode='lcg') — identical
    draw arithmetic and min-struct tie-break."""
    import math

    from linkgraph.algorithms.random_walks import (
        RW_LCG_A,
        RW_LCG_B,
        RW_LCG_C,
        RW_LCG_P,
    )

    out = {}
    for wid, s in enumerate(starts):
        path = [s]
        prev = None
        cur = s
        for step in range(1, max_depth + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                break
            best = None
            for dst in nbrs:
                r_int = (
                    RW_LCG_A * wid + RW_LCG_B * step + RW_LCG_C * dst + seed
                ) % RW_LCG_P
                u = (r_int + 1) / float(RW_LCG_P + 2)
                w = weights.get((cur, dst), 1.0)
                if prev is None:
                    bias = 1.0
                elif dst == prev:
                    bias = 1.0 / p
                elif dst in adj.get(prev, ()):
                    bias = 1.0
                else:
                    bias = 1.0 / q
                rnd = -math.log(u) / (bias * w)
                key = (rnd, dst, w)
                if best is None or key < best:
                    best = key
            prev, cur = cur, best[1]
            path.append(cur)
        out[wid] = path
    return out


def _karate_adj(g):
    adj, weights = {}, {}
    for e in g.edges.collect():
        adj.setdefault(e.src, set()).add(e.dst)
        weights[(e.src, e.dst)] = e.weight if "weight" in e.__fields__ else 1.0
    return adj, weights


def test_node2vec_lcg_exact_replay(spark):
    from linkgraph import node2vec_walks

    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv"), renumber=False, directed=False
    )
    adj, _w = _karate_adj(g)
    starts = [0, 5, 33]
    p_, q_ = 0.5, 2.0
    res = node2vec_walks(
        g, starts, max_depth=6, p=p_, q=q_, seed=11, rank_mode="lcg"
    )
    got = {}
    for r in res.collect():
        got.setdefault(r.walk_id, {})[r.step] = r.vertex
    exp = _replay_node2vec_lcg(adj, {}, starts, 6, p_, q_, 11)
    for wid, path in exp.items():
        assert [got[wid][s] for s in range(len(path))] == path


def test_node2vec_bias_direction(spark):
    """p << 1 makes walks return; q << 1 makes them explore (star graph:
    from a leaf, step 2 either returns to the leaf or jumps to another
    leaf through the hub — leaves are mutual non-neighbors)."""
    from linkgraph import node2vec_walks

    n_leaves = 30
    rows = [(0, i) for i in range(1, n_leaves + 1)]
    e = spark.createDataFrame(rows, "src LONG, dst LONG")
    g = Graph.from_edgelist(e, renumber=False, directed=False)
    starts = [1] * 40  # 40 independent walks (draws keyed by walk_id)
    returned = {}
    for p_, q_ in [(1e-6, 1.0), (1.0, 1e-6)]:
        res = node2vec_walks(g, starts, max_depth=2, p=p_, q=q_, seed=3)
        steps = {}
        for r in res.collect():
            steps.setdefault(r.walk_id, {})[r.step] = r.vertex
        returned[(p_, q_)] = sum(
            1 for s in steps.values() if s.get(2) == 1
        ) / len(steps)
    assert returned[(1e-6, 1.0)] >= 0.9  # tiny p: return to start
    assert returned[(1.0, 1e-6)] <= 0.1  # tiny q: explore outward


def test_node2vec_deterministic_across_partitioning(spark):
    from linkgraph import node2vec_walks

    g = Graph.from_edgelist(
        load_csv_edges(spark, "karate.csv").repartition(9),
        renumber=False,
        directed=False,
    )
    a = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(g, [0, 1], max_depth=4, p=0.5, q=2.0).collect()
    )
    b = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(g, [0, 1], max_depth=4, p=0.5, q=2.0).collect()
    )
    assert a == b
