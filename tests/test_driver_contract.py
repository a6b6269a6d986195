"""Mini-driver: run every queries() entry and its DuckDB oracle and compare
row multisets exactly (the same gate the real driver applies at sf0.01,
minus the hashing). Default scale is sf0.001; set LINKGRAPH_CONTRACT_SF01=1
to ALSO run the whole gate at sf0.01 — the driver's own scale — before a
round ends."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIRS = ["/root/testdata/sf0.001"]
if os.environ.get("LINKGRAPH_CONTRACT_SF01"):
    SF_DIRS.append("/root/testdata/sf0.01")
SF_DIR = SF_DIRS[0]  # rows-only + smoke tests run at the small scale
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module", params=SF_DIRS, ids=lambda d: d.rsplit("/", 1)[-1])
def sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        vals = []
        for c in sorted(d):
            v = d[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


QUERY_NAMES = sorted(entrymod.queries())


def test_every_query_has_oracle():
    from linkgraph.queries import NO_ORACLE

    missing = [
        n for n in QUERY_NAMES if n not in entrymod.oracle_sql() and n not in NO_ORACLE
    ]
    assert not missing, f"queries without oracle SQL: {missing}"


from linkgraph.queries import NO_ORACLE as _NO_ORACLE


@pytest.mark.parametrize("name", sorted(_NO_ORACLE))
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    from linkgraph.queries import NO_ORACLE

    if name in NO_ORACLE:
        pytest.skip("rows-only query (randomized internals); covered elsewhere")
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir)
    cols = sorted(sdf.columns)
    spark_rows = _norm(sdf.collect(), sdf.columns)
    rel = ddb.sql(entrymod.oracle_sql()[name])
    duck_rows = _norm(rel.fetchall(), rel.columns)
    assert sorted(c.lower() for c in rel.columns) == [c.lower() for c in cols], (
        f"{name}: column mismatch spark={cols} duck={sorted(rel.columns)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first diffs {mismatches}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert df.columns == ["vertex", "pr_e7"]
    assert all(r.pr_e7 > 0 for r in rows)


def test_driver_window_carries_unattested_queries():
    """The driver's correctness artifact snapshots the first 50 registered
    queries. Standing rotation rule (VERDICT r5 item 2), pinned here:
    the window = 8 pinned structure/[core] rows + EVERY query without a
    driver-green row in any committed CORRECTNESS_r0x.json (red or
    never-run) + round-robin refresh slots for the queries whose newest
    driver-green row is oldest — so each query re-attests roughly every
    other round."""
    import glob
    import json

    from linkgraph.queries import DRIVER_WINDOW, ORACLES, QUERIES

    names = list(QUERIES)
    assert names[:50] == DRIVER_WINDOW
    assert list(ORACLES)[:50] == [n for n in DRIVER_WINDOW if n in ORACLES]
    for pinned in (
        "graph_edges_sym", "graph_degrees", "graph_renumber_map",
        "graph_two_hop", "pagerank", "wcc", "lpa", "triangles",
    ):
        assert pinned in DRIVER_WINDOW

    # every query with NO driver-green row in any committed artifact must
    # be in the window (that is the only way it can ever earn one)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            ):
                green.add(name)
    never_green = [n for n in names if n not in green]
    missing = [n for n in never_green if n not in DRIVER_WINDOW]
    assert not missing, f"never-driver-green queries outside the window: {missing}"
