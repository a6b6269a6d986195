"""find_bicliques heuristic vs planted bicliques (proto/structure/bicliques.py)."""

import pytest

from linkgraph.structure.bicliques import find_bicliques


def _bipartite(spark):
    rows = []
    # planted biclique: machines 0..9 x features 100..104 (complete)
    for m in range(10):
        for f in range(100, 105):
            rows.append((m, f, 1 if m < 2 else 0))
    # noise: machines 20..24 each with a private feature
    for m in range(20, 25):
        rows.append((m, 200 + m, 0))
    return spark.createDataFrame(rows, "src LONG, dst LONG, flag INT")


def test_finds_planted_biclique(spark):
    df = _bipartite(spark)
    B, S = find_bicliques(df, k=3, support=1.0, min_features=2, min_machines=5)
    s = S.collect()
    # all 5 planted features share the same machine set: the first is
    # emitted, consecutive identical machine-sets are skipped
    assert len(s) == 1
    st = s[0]
    assert st.machines == 10 and st.features == 5 and st.total == 15
    assert st.bad_ratio == pytest.approx(2 / 15)  # reference divides by total
    b = B.collect()
    assert {r.vert for r in b if r.type == 0} == set(range(10))
    assert {r.vert for r in b if r.type == 1} == set(range(100, 105))
    assert all(r.id == 0 for r in b)


def test_k_and_guards(spark):
    df = _bipartite(spark)
    with pytest.raises(NameError):
        find_bicliques(df.select("src", "dst"), k=1)
    with pytest.raises(NameError):
        find_bicliques(df, k=1, support=0.01)
    # min_machines too high: nothing qualifies
    B, S = find_bicliques(df, k=3, min_machines=50)
    assert S.count() == 0 and B.count() == 0


def test_offset_and_support(spark):
    df = _bipartite(spark)
    # offset shifts dst; support < 1 admits partial-overlap features
    shifted = df.selectExpr("src", "dst + 1000 AS dst", "flag")
    B, S = find_bicliques(
        shifted, k=1, offset=1000, support=0.5, min_features=2, min_machines=5
    )
    assert S.count() == 1
    assert {r.vert for r in B.collect() if r.type == 1} == set(range(100, 105))


def test_driver_rounds_bounded_by_tiers(spark):
    """r3 batch rewrite: 10^4 features must cost O(#tiers) driver actions,
    not O(#features)."""
    n_feat = 10_000
    rows = []
    # each feature i owned by machines {i%50 .. i%50+4}: 5 edges/feature
    for i in range(n_feat):
        base = i % 50
        for m in range(base, base + 5):
            rows.append((m, 1_000 + i, 0))
    df = spark.createDataFrame(rows, "src LONG, dst LONG, flag INT")
    B, S = find_bicliques(
        df, k=3, support=1.0, min_features=0, min_machines=5, batch_size=2048
    )
    # 1 summary + <= ceil(10k/2048)=5 tiers (early-stop may use fewer) + 1 assembly
    assert find_bicliques.last_driver_rounds <= 1 + 5 + 1
    assert S.count() == 3


def test_batch_matches_visit_order_semantics(spark):
    """Tier boundaries must not change which bicliques are emitted: compare
    batch_size=2 against one big tier on a mixed graph."""
    rows = []
    for m in range(10):
        for f in (100, 101, 102):  # identical machine sets -> 1 emission
            rows.append((m, f, 1 if m == 0 else 0))
    for m in range(4, 12):
        rows.append((m, 103, 0))  # overlapping, distinct machine set
    for m in range(20, 26):
        for f in (104, 105):
            rows.append((m, f, 0))
    df = spark.createDataFrame(rows, "src LONG, dst LONG, flag INT")
    kw = dict(k=-1, support=0.5, min_features=0, min_machines=5)
    small = find_bicliques(df, batch_size=2, **kw)
    big = find_bicliques(df, batch_size=10_000, **kw)
    for a, b in zip(small, big):
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_max_features_bounds_driver_summary(spark):
    """max_iter=-1 over 1e5 features must NOT collect 1e5 summary rows:
    the cap keeps driver state bounded and warns loudly."""
    import warnings

    from pyspark.sql import functions as F

    df = (
        spark.range(100_000)
        .select(
            (F.col("id") % 50).alias("src"),
            (F.lit(1_000) + F.col("id")).alias("dst"),
            F.lit(0).alias("flag"),
        )
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        B, S = find_bicliques(
            df, k=-1, support=1.0, min_features=0, min_machines=10,
            max_features=500, batch_size=512,
        )
        assert any("max_features" in str(w.message) for w in caught)
    assert find_bicliques.last_summary_rows <= 500
    assert find_bicliques.last_driver_rounds <= 1 + 2 + 1
    with pytest.raises(ValueError):
        find_bicliques(df, k=1, max_features=0)
