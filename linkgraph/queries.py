"""Driver-contract query surface: named queries + exactly-equivalent DuckDB SQL.

Each entry in QUERIES runs the engine on the driver's parquet tables at
``sf_dir``; ORACLES[name] is ANSI-ish SQL (DuckDB dialect, MATERIALIZED CTEs
for the unrolled iterative oracles) that computes the same result. Design
rules that make the differential exact:

- graph queries derive integer edge tables from ``lineitem`` arithmetically
  (``l_orderkey % 1000 -> 1000 + l_partkey % 1000`` etc.) — deterministic and
  identical in both engines, no hashing;
- graph queries run with renumber=False so label values / tie-breaks are the
  external ids in both engines (the renumber map itself is checked by its own
  query); the vertex universe is the reference's max+1 rule
  (simpleGraph.py:497-499) in both;
- every float output is emitted as a scaled BIGINT (e.g. round(pr*1e7)) in
  BOTH engines — cross-engine float sums agree to ~1e-13, so scaled-int
  equality is robust while still checking ~7 significant digits;
- iterative algorithms are compared at a FIXED superstep count (PageRank 15,
  LPA 4) or at convergence with a generous unrolled bound (WCC: 24 rounds ≫
  graph diameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .algorithms.lpa import label_propagation
from .algorithms.pagerank import pagerank
from .algorithms.triangles import triangle_count
from .algorithms.wcc import weakly_connected_components
from .structure.graph import Graph
from .structure.renumber import build_number_map

ALPHA = 0.85
PR_ITERS = 15
WCC_ORACLE_ROUNDS = 24
LPA_ITERS = 4

# Sidecar directory for oracle inputs that a query materializes itself
# (community labelings, IVF candidate lists, media manifests). Process-
# unique: queries() writes the sidecar and oracle_sql() embeds the SAME
# path (both resolve in the importing process), so a parallel driver run
# or a stale file from a previous round can never feed this run's oracle.
# (The per-run sf_dir would be the other natural home, but the test data
# tree is read-only.)
import tempfile as _tempfile

SIDECAR_DIR = _tempfile.mkdtemp(prefix="linkgraph_sidecar_")

# ---------------------------------------------------------------------------
# shared edge derivations (MUST stay in sync with the SQL fragments below)
# ---------------------------------------------------------------------------

LINK_EDGES_SQL = (
    "SELECT DISTINCT l_orderkey % 1000 AS src, 1000 + (l_partkey % 1000) AS dst "
    "FROM lineitem"
)
SUPPLY_EDGES_SQL = (
    "SELECT DISTINCT l_orderkey % 400 AS src, l_suppkey % 400 AS dst "
    "FROM lineitem WHERE l_orderkey % 400 <> l_suppkey % 400"
)


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deliberately NOT _spread: measured A/B (scripts/spread_ab_probe.py)
    # shows the extra full-text exchange costs more than the 1-split
    # scan's serial map work saves on every doc query at bench scale
    # (e.g. doc_gopher 0.5 -> 1.1 s, doc_dsir 2.3 -> 3.4 s warm)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Unlock map-side parallelism behind tiny scans (guide §2.2/§6.2).

    Bench-scale parquet inputs are single-row-group files, so the scan
    yields 1-3 splits and every downstream NARROW stage (tokenization,
    shingle explodes, per-pair dot products) runs on 1-3 cores while the
    rest idle. Repartition to the session's core count ONLY when the scan
    has fewer splits than cores — the branch is decided at plan-build
    time, so on a real corpus (splits >= cores) NO exchange appears in
    the plan and nothing is ever shuffled at scale."""
    t = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(t) if df.rdd.getNumPartitions() < t else df


def link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order->part bipartite link graph (power-law-ish in-degree, all part
    vertices dangling — exercises PageRank's dangling redistribution)."""
    li = _lineitem(spark, sf_dir)
    return li.select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 1000).alias("dst"),
    ).distinct()


def weighted_raw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return li.select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 1000).alias("dst"),
        F.col("l_quantity").alias("weight"),
    )


def supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order->supplier graph on one id domain (non-bipartite: has triangles)."""
    li = _lineitem(spark, sf_dir)
    return (
        li.select(
            (F.col("l_orderkey") % 400).alias("src"),
            (F.col("l_suppkey") % 400).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# graph structure queries
# ---------------------------------------------------------------------------

def q_graph_edges_sym(spark, sf_dir):
    g = Graph.from_edgelist(
        weighted_raw_edges(spark, sf_dir), weight="weight", directed=False, renumber=False
    )
    return g.edges.select("src", "dst", "weight")


def q_graph_degrees(spark, sf_dir):
    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    o = g.out_degree().withColumnRenamed("degree", "out_degree")
    i = g.in_degree().withColumnRenamed("degree", "in_degree")
    return o.join(i, on="vertex").select("vertex", "out_degree", "in_degree")


def q_graph_renumber_map(spark, sf_dir):
    nm = build_number_map(link_edges(spark, sf_dir))
    return nm.map.select(
        F.col("key").alias("vertex"), "vid", F.col("out_degree").cast("long").alias("out_degree")
    )


def q_graph_two_hop(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return g.two_hop_neighbors().filter(F.col("first") < 10).select("first", "second")


# ---------------------------------------------------------------------------
# core algorithms
# ---------------------------------------------------------------------------

def q_pagerank(spark, sf_dir):
    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    pr = pagerank(g, alpha=ALPHA, fixed_iterations=PR_ITERS)
    return pr.select(
        "vertex", F.round(F.col("pagerank") * 1e7).cast("long").alias("pr_e7")
    )


def q_wcc(spark, sf_dir):
    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=False, renumber=False)
    return weakly_connected_components(g).select("vertex", "labels")


def q_lpa(spark, sf_dir):
    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=False, renumber=False)
    return label_propagation(g, fixed_iterations=LPA_ITERS).select("vertex", "labels")


def q_triangles(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    n = triangle_count(g)
    return spark.createDataFrame([(n,)], "triangles LONG")


# ---------------------------------------------------------------------------
# documents: training-data-pipeline text ops
# ---------------------------------------------------------------------------

def q_doc_token_count(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tokens")
    )


def q_doc_dedup_exact(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_cnt"))
    )


_LANG_MARKERS = [("en", " the "), ("de", " der "), ("fr", " les "), ("es", " los ")]


def q_doc_langid(spark, sf_dir):
    """Marker-occurrence language heuristic (all markers 5 chars; argmax with
    fixed priority en>de>fr>es, 'unknown' when no marker occurs)."""
    d = _documents(spark, sf_dir)
    cols = [
        ((F.length("text") - F.length(F.replace(F.col("text"), F.lit(m)))) / 5)
        .cast("long")
        .alias(f"c_{lang}")
        for lang, m in _LANG_MARKERS
    ]
    scored = d.select("doc_id", *cols)
    mx = F.greatest(*[F.col(f"c_{lang}") for lang, _ in _LANG_MARKERS])
    pred = F.when(mx <= 0, F.lit("unknown"))
    for lang, _ in _LANG_MARKERS:
        pred = pred.when(F.col(f"c_{lang}") == mx, F.lit(lang))
    return scored.select("doc_id", pred.alias("predicted_lang"))


def q_doc_quality(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tokens"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("a")))).cast("long").alias("n_a"),
    )


def q_doc_fingerprint(spark, sf_dir):
    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fingerprint"),
    )


def q_doc_shingle_dups(spark, sf_dir):
    """Word-5-gram Jaccard near-dup pairs at tau=0.5, integer-exact filter
    2*common >= union (avoids float compare)."""
    d = _documents(spark, sf_dir).select("doc_id", F.split(F.trim("text"), " ").alias("w"))
    sh = (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - 4)).alias("i"),
            F.col("w"),
        )
        .select("doc_id", F.concat_ws(" ", F.slice("w", F.col("i"), 5)).alias("shingle"))
        .distinct()
    )
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(per_doc.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), on="doc_a")
        .join(per_doc.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), on="doc_b")
        .withColumn("union_sh", F.col("na") + F.col("nb") - F.col("common"))
        .filter(2 * F.col("common") >= F.col("union_sh"))
        .select("doc_a", "doc_b", "common", "union_sh")
    )


# ---------------------------------------------------------------------------
# embeddings: quantized max-inner-product top-k (integer-exact differential)
# ---------------------------------------------------------------------------

def q_emb_topk(spark, sf_dir):
    # base side spread across cores: the per-pair integer dot is the
    # compute and the scan is a single split at bench scale (_spread is a
    # plan-time no-op on real inputs); row_number orders by (dot desc,
    # neighbor asc) and the dot is integer-exact, so partitioning cannot
    # change the result
    emb = _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("be"))
    dot = F.expr(
        "aggregate(zip_with(qe, be, (x, y) -> "
        "cast(round(cast(x as double)*1000) as bigint) * "
        "cast(round(cast(y as double)*1000) as bigint)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    pairs = (
        q.join(b, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot.alias("dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "dot_q", "rnk")
    )


# ---------------------------------------------------------------------------
# events: hourly rollup (batch analogue of the streaming module)
# ---------------------------------------------------------------------------

def q_events_hourly(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100).cast("long").alias("value_sum_e2"),
        )
    )


# ---------------------------------------------------------------------------
# SQL oracle builders
# ---------------------------------------------------------------------------

def _pagerank_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({LINK_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "outdeg AS (SELECT src AS v, count(*) AS od FROM edges GROUP BY src)",
        "vt AS MATERIALIZED (SELECT u.v, coalesce(o.od, 0) AS od "
        "FROM univ u LEFT JOIN outdeg o ON u.v = o.v)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM vt)",
        "r0 AS MATERIALIZED (SELECT v, od, 1.0/(SELECT n FROM nv) AS r FROM vt)",
    ]
    a, one_m_a = ALPHA, 1.0 - ALPHA
    for k in range(1, PR_ITERS + 1):
        p = f"r{k-1}"
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT b.v, b.od, "
            f"((SELECT sum(CASE WHEN od = 0 THEN r ELSE 0 END) FROM {p}) * {a} + {one_m_a})"
            f" / (SELECT n FROM nv) + {a} * coalesce(m.s, 0.0) AS r "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, sum(p.r / p.od) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )

    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(r * 1e7) AS BIGINT) AS pr_e7 FROM r{PR_ITERS}"
    )


def _wcc_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({LINK_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges))",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "l0 AS MATERIALIZED (SELECT v, v AS l FROM univ)",
    ]
    for k in range(1, WCC_ORACLE_ROUNDS + 1):
        p = f"l{k-1}"
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT b.v, least(b.l, coalesce(m.ml, b.l)) AS l "
            f"FROM {p} b LEFT JOIN (SELECT s.dst AS v, min(p.l) AS ml "
            f"FROM sym s JOIN {p} p ON s.src = p.v GROUP BY s.dst) m ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, l AS labels FROM l{WCC_ORACLE_ROUNDS}"
    )


def _lpa_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({LINK_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges))",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "lab0 AS MATERIALIZED (SELECT v, v AS l FROM univ)",
    ]
    for k in range(1, LPA_ITERS + 1):
        p = f"lab{k-1}"
        parts.append(
            f"lab{k} AS MATERIALIZED (SELECT b.v, coalesce(w.nl, b.l) AS l FROM {p} b "
            f"LEFT JOIN (SELECT v, l AS nl FROM (SELECT c.v, c.l, row_number() OVER "
            f"(PARTITION BY c.v ORDER BY c.cnt DESC, c.l ASC) AS rn FROM "
            f"(SELECT s.dst AS v, p.l, count(*) AS cnt FROM sym s JOIN {p} p "
            f"ON s.src = p.v GROUP BY s.dst, p.l) c) t WHERE rn = 1) w ON b.v = w.v)"
        )
    return (
        ",\n".join(parts) + f"\nSELECT v AS vertex, l AS labels FROM lab{LPA_ITERS}"
    )


ORACLES: dict[str, str] = {
    "graph_edges_sym": f"""
        WITH raw AS (SELECT l_orderkey % 1000 AS src, 1000 + (l_partkey % 1000) AS dst,
                            l_quantity AS weight FROM lineitem),
        bidir AS (SELECT src, dst, weight FROM raw
                  UNION ALL SELECT dst AS src, src AS dst, weight FROM raw)
        SELECT src, dst, min(weight) AS weight FROM bidir GROUP BY src, dst
    """,
    "graph_degrees": f"""
        WITH e AS ({LINK_EDGES_SQL}),
        univ AS (SELECT unnest(generate_series(0, (SELECT max(greatest(src,dst)) FROM e))) AS vertex),
        o AS (SELECT src AS vertex, count(*) AS c FROM e GROUP BY src),
        i AS (SELECT dst AS vertex, count(*) AS c FROM e GROUP BY dst)
        SELECT u.vertex, CAST(coalesce(o.c,0) AS BIGINT) AS out_degree,
               CAST(coalesce(i.c,0) AS BIGINT) AS in_degree
        FROM univ u LEFT JOIN o ON u.vertex=o.vertex LEFT JOIN i ON u.vertex=i.vertex
    """,
    "graph_renumber_map": f"""
        WITH e AS ({LINK_EDGES_SQL}),
        verts AS (SELECT DISTINCT vertex FROM
                  (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
        od AS (SELECT src AS vertex, count(*) AS c FROM e GROUP BY src),
        m AS (SELECT v.vertex, CAST(coalesce(od.c,0) AS BIGINT) AS out_degree
              FROM verts v LEFT JOIN od ON v.vertex = od.vertex)
        SELECT vertex,
               CAST(row_number() OVER (ORDER BY out_degree DESC, vertex ASC) - 1 AS BIGINT) AS vid,
               out_degree
        FROM m
    """,
    "graph_two_hop": f"""
        WITH e AS ({SUPPLY_EDGES_SQL})
        SELECT DISTINCT a.src AS first, b.dst AS second
        FROM e a JOIN e b ON a.dst = b.src
        WHERE a.src <> b.dst AND a.src < 10
    """,
    "pagerank": _pagerank_oracle(),
    "wcc": _wcc_oracle(),
    "lpa": _lpa_oracle(),
    "triangles": f"""
        WITH raw AS ({SUPPLY_EDGES_SQL}),
        sym AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
        deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
        orient AS (SELECT e.src, e.dst FROM sym e
                   JOIN deg a ON e.src = a.v JOIN deg b ON e.dst = b.v
                   WHERE a.d < b.d OR (a.d = b.d AND e.src < e.dst))
        SELECT count(*) AS triangles
        FROM orient e1 JOIN orient e2 ON e1.dst = e2.src
        JOIN orient e3 ON e1.src = e3.src AND e2.dst = e3.dst
    """,
    "doc_token_count": """
        SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    "doc_dedup_exact": """
        SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_cnt
        FROM documents GROUP BY md5(text)
    """,
    "doc_langid": """
        WITH s AS (SELECT doc_id,
            CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS c_en,
            CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS BIGINT) AS c_de,
            CAST((length(text) - length(replace(text, ' les ', ''))) / 5 AS BIGINT) AS c_fr,
            CAST((length(text) - length(replace(text, ' los ', ''))) / 5 AS BIGINT) AS c_es
            FROM documents)
        SELECT doc_id, CASE
            WHEN greatest(c_en, c_de, c_fr, c_es) <= 0 THEN 'unknown'
            WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
            WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
            WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
            ELSE 'es' END AS predicted_lang
        FROM s
    """,
    "doc_quality": """
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT) AS n_a
        FROM documents
    """,
    "doc_fingerprint": r"""
        SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
    """,
    "doc_shingle_dups": """
        WITH words AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i FROM words),
        sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle FROM idx),
        per_doc AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
        SELECT c.doc_a, c.doc_b, c.common, pa.n_sh + pb.n_sh - c.common AS union_sh
        FROM common c
        JOIN per_doc pa ON c.doc_a = pa.doc_id
        JOIN per_doc pb ON c.doc_b = pb.doc_id
        WHERE 2 * c.common >= pa.n_sh + pb.n_sh - c.common
    """,
    "emb_topk": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        pairs AS (
            SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                   CAST(sum(CAST(round(CAST(q.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
                     * CAST(round(CAST(b.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS dot_q
            FROM q, embeddings b, generate_series(1, 64) AS t(i)
            WHERE b.vec_id <> q.vec_id
            GROUP BY q.vec_id, b.vec_id),
        ranked AS (SELECT query_id, neighbor_id, dot_q,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
                   FROM pairs)
        SELECT query_id, neighbor_id, dot_q, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               CAST(round(sum(value) * 100) AS BIGINT) AS value_sum_e2
        FROM events GROUP BY 1, 2
    """,
}

QUERIES = {
    "graph_edges_sym": q_graph_edges_sym,
    "graph_degrees": q_graph_degrees,
    "graph_renumber_map": q_graph_renumber_map,
    "graph_two_hop": q_graph_two_hop,
    "pagerank": q_pagerank,
    "wcc": q_wcc,
    "lpa": q_lpa,
    "triangles": q_triangles,
    "doc_token_count": q_doc_token_count,
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_langid": q_doc_langid,
    "doc_quality": q_doc_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_shingle_dups": q_doc_shingle_dups,
    "emb_topk": q_emb_topk,
    "events_hourly": q_events_hourly,
}


# ---------------------------------------------------------------------------
# extended operator surface (round 1, M6): jaccard, bfs, katz, hits, egonet,
# hypergraph — each with an unrolled/relational DuckDB oracle; plus
# rows-only queries (NO_ORACLE) for ops whose randomized internals
# (hash seeds, hyperplanes) cannot be replicated in SQL.
# ---------------------------------------------------------------------------

from .algorithms.egonet import batched_ego_graphs as _bego  # noqa: E402
from .algorithms.hits import hits as _hits  # noqa: E402
from .algorithms.katz import katz_centrality as _katz  # noqa: E402
from .algorithms.link_prediction import jaccard as _jaccard  # noqa: E402
from .algorithms.traversal import bfs as _bfs  # noqa: E402
from .algorithms.cores import core_number as _core_number  # noqa: E402
from .structure.hypergraph import hypergraph as _hypergraph  # noqa: E402

KATZ_ALPHA, KATZ_ITERS = 0.05, 8
HITS_ITERS = 5
BFS_ORACLE_ROUNDS = 20
EGO_SEEDS, EGO_RADIUS = [0, 1, 2, 3, 4], 2


def q_jaccard(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    return _jaccard(g).select(
        "source",
        "destination",
        F.round(F.col("jaccard_coeff") * 1e6).cast("long").alias("jc_e6"),
    )


def q_bfs(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return _bfs(g, 0).select("vertex", "distance")


def q_katz(spark, sf_dir):
    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    res = _katz(
        g, alpha=KATZ_ALPHA, beta=1.0, normalized=False, fixed_iterations=KATZ_ITERS
    )
    return res.select(
        "vertex", F.round(F.col("katz_centrality") * 1e7).cast("long").alias("katz_e7")
    )


def q_hits(spark, sf_dir):
    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    res = _hits(g, fixed_iterations=HITS_ITERS)
    return res.select(
        "vertex",
        F.round(F.col("hubs") * 1e7).cast("long").alias("hubs_e7"),
        F.round(F.col("authorities") * 1e7).cast("long").alias("auth_e7"),
    )


SALSA_ITERS = 5
ANF_HOPS, ANF_REGS, ANF_SEED = 3, 4, 42


def q_anf(spark, sf_dir):
    """ANF/Flajolet-Martin reachability sketches (beyond-reference;
    algorithms/anf.py) in hash_mode="lcg": the multiply+xorshift register
    init and the bit_or supersteps are exact BIGINT arithmetic, so the
    DuckDB oracle replays every register mask value-for-value."""
    from .algorithms.anf import neighborhood_function

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    _curve, sketches = neighborhood_function(
        g, max_hops=ANF_HOPS, num_registers=ANF_REGS, seed=ANF_SEED,
        hash_mode="lcg", return_sketches=True,
    )
    return sketches.select("vertex", "j", "mask")


def q_salsa(spark, sf_dir):
    """SALSA hub/authority random walk (beyond-reference; algorithms/
    salsa.py) — fixed iterations so the DuckDB oracle can replay the
    degree-normalized message passing exactly."""
    from .algorithms.salsa import salsa as _salsa

    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    res = _salsa(g, fixed_iterations=SALSA_ITERS)
    return res.select(
        "vertex",
        F.round(F.col("hubs") * 1e7).cast("long").alias("hubs_e7"),
        F.round(F.col("authorities") * 1e7).cast("long").alias("auth_e7"),
    )


def q_ego_graph(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return _bego(g, EGO_SEEDS, radius=EGO_RADIUS).select("seed", "vertex", "distance")


def q_hypergraph_edges(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hg = _hypergraph(
        orders, columns=["o_custkey", "o_orderpriority"], event_id_col="o_orderkey"
    )
    return hg["edges"].select("src", "dst")


# --- rows-only queries (randomized internals; verified in pytest instead) ---

def q_core_number(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    return _core_number(g).select("vertex", "core_number")


def q_doc_minhash_dedup(spark, sf_dir):
    """Full MinHash-LSH dedup pipeline in hash_mode="lcg": shingle codes,
    permutations, band buckets, Jaccard verify, and WCC clustering are all
    exact integer/rational arithmetic, so the DuckDB oracle replays the
    pipeline end to end (recursive-CTE closure replaces WCC). The blake2b
    production tier keeps its pytest recall/precision pin
    (tests/test_text_similarity.py::test_minhash_recall_vs_bruteforce)."""
    from .text.dedup import minhash_dedup

    d = _documents(spark, sf_dir)
    return minhash_dedup(d, threshold=0.5, hash_mode="lcg").select(
        "doc_id", "cluster", "keep"
    )


EMB_LSH_NBITS = 8


def q_emb_lsh_topk(spark, sf_dir):
    """Full LSH ANN pipeline — SQL-replicable variant: LCG-plane sign
    buckets (exact BIGINT arithmetic, linkgraph/similarity.py
    lcg_hyperplane_buckets), Hamming<=1 multiprobe candidates, quantized
    integer-dot rerank. Value-checked end to end by the DuckDB oracle
    (the production xxhash/Gaussian tier keeps its pytest recall pin)."""
    from .similarity import lcg_hyperplane_buckets

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    buckets = lcg_hyperplane_buckets(emb, nbits=EMB_LSH_NBITS, dim=64)
    probes = (
        buckets.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(EMB_LSH_NBITS)
                    ],
                )
            ).alias("bucket"),
        )
    )
    cand = (
        probes.join(
            buckets.select(F.col("vec_id").alias("neighbor_id"), "bucket"),
            on="bucket",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = F.expr(
        "transform(embedding, x -> cast(round(cast(x as double)*1000) as bigint))"
    )
    e = emb.select(F.col("vec_id"), qv.alias("qv"))
    dot = F.expr(
        "aggregate(zip_with(ae, be, (x, y) -> x * y), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    dots = (
        cand.join(
            e.select(F.col("vec_id").alias("query_id"), F.col("qv").alias("ae")),
            on="query_id",
        )
        .join(
            e.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("be")),
            on="neighbor_id",
        )
        .select("query_id", "neighbor_id", dot.alias("dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        dots.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "dot_q", "rnk")
    )


def _jaccard_oracle() -> str:
    return f"""
        WITH raw AS ({SUPPLY_EDGES_SQL}),
        sym AS (SELECT DISTINCT src, dst FROM
                (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
        deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
        pairs AS (SELECT src AS f, dst AS s FROM sym WHERE src <= dst),
        cn AS (SELECT p.f, p.s, count(*) AS cn
               FROM pairs p JOIN sym a ON a.src = p.f JOIN sym b ON b.src = p.s AND b.dst = a.dst
               GROUP BY p.f, p.s)
        SELECT p.f AS source, p.s AS destination,
               CAST(round((CAST(coalesce(cn.cn, 0) AS DOUBLE)
                           / (da.d + db.d - coalesce(cn.cn, 0))) * 1000000.0) AS BIGINT) AS jc_e6
        FROM pairs p
        JOIN deg da ON p.f = da.v JOIN deg db ON p.s = db.v
        LEFT JOIN cn ON p.f = cn.f AND p.s = cn.s
    """


def _bfs_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "d0 AS MATERIALIZED (SELECT v, CASE WHEN v = 0 THEN CAST(0 AS BIGINT) END AS dist FROM univ)",
    ]
    for k in range(1, BFS_ORACLE_ROUNDS + 1):
        p = f"d{k-1}"
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT b.v, CASE "
            f"WHEN m.md IS NULL THEN b.dist WHEN b.dist IS NULL THEN m.md "
            f"ELSE least(b.dist, m.md) END AS dist "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, min(p.dist + 1) AS md "
            f"FROM edges e JOIN {p} p ON e.src = p.v WHERE p.dist IS NOT NULL "
            f"GROUP BY e.dst) m ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, dist AS distance FROM d{BFS_ORACLE_ROUNDS}"
    )


def _katz_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({LINK_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "c0 AS MATERIALIZED (SELECT v, CAST(0.0 AS DOUBLE) AS c FROM univ)",
    ]
    for k in range(1, KATZ_ITERS + 1):
        p = f"c{k-1}"
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT b.v, "
            f"{KATZ_ALPHA} * coalesce(m.s, 0.0) + 1.0 AS c "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, sum(p.c) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(c * 1e7) AS BIGINT) AS katz_e7 FROM c{KATZ_ITERS}"
    )


def _hits_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({LINK_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM univ)",
        "s0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS h, "
        "1.0/(SELECT n FROM nv) AS a FROM univ)",
    ]
    for k in range(1, HITS_ITERS + 1):
        p = f"s{k-1}"
        parts.append(
            f"araw{k} AS MATERIALIZED (SELECT b.v, b.h, coalesce(m.s, 0.0) AS a_new "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, sum(p.h) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )
        parts.append(
            f"anorm{k} AS MATERIALIZED (SELECT v, h, "
            f"a_new / (SELECT sum(a_new) FROM araw{k}) AS a FROM araw{k})"
        )
        parts.append(
            f"hraw{k} AS MATERIALIZED (SELECT b.v, coalesce(m.s, 0.0) AS h_new, b.a "
            f"FROM anorm{k} b LEFT JOIN (SELECT e.src AS v, sum(p.a) AS s "
            f"FROM edges e JOIN anorm{k} p ON e.dst = p.v GROUP BY e.src) m ON b.v = m.v)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT v, "
            f"h_new / (SELECT sum(h_new) FROM hraw{k}) AS h, a FROM hraw{k})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(h * 1e7) AS BIGINT) AS hubs_e7, "
        f"CAST(round(a * 1e7) AS BIGINT) AS auth_e7 FROM s{HITS_ITERS}"
    )


def _salsa_oracle() -> str:
    """Unrolled replay of salsa.py's exact recurrence: per iteration a
    forward job (push h and t to dst, scale by inv_in) then a backward job
    (gather q and the L1-normalized a to src, scale by inv_out), with each
    chain renormalized where the engine folds its norm literal."""
    parts = [
        f"WITH edges AS MATERIALIZED ({LINK_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM univ)",
        # degree inverses ride the state; 0 when the degree is 0 (that
        # chain drops the vertex's mass, matching salsa.py's coalesce)
        "deg AS MATERIALIZED (SELECT u.v, "
        "CASE WHEN o.c IS NULL THEN 0.0 ELSE 1.0/o.c END AS inv_out, "
        "CASE WHEN i.c IS NULL THEN 0.0 ELSE 1.0/i.c END AS inv_in "
        "FROM univ u "
        "LEFT JOIN (SELECT src AS v, count(*) AS c FROM edges GROUP BY src) o "
        "ON u.v = o.v "
        "LEFT JOIN (SELECT dst AS v, count(*) AS c FROM edges GROUP BY dst) i "
        "ON u.v = i.v)",
        # every hop is scaled by the degree of the node being LEFT:
        # t0(i) = sum_{i->k} a0(k) * inv_in(k) with a0 uniform = 1/n
        "s0 AS MATERIALIZED (SELECT d.v, d.inv_out, d.inv_in, "
        "1.0/(SELECT n FROM nv) AS h, 1.0/(SELECT n FROM nv) AS a, "
        "coalesce(t.s, 0.0) AS t FROM deg d LEFT JOIN "
        "(SELECT e.src AS v, sum(1.0/(SELECT n FROM nv) * p.inv_in) AS s "
        "FROM edges e JOIN deg p ON e.dst = p.v GROUP BY e.src) t "
        "ON d.v = t.v)",
    ]
    for k in range(1, SALSA_ITERS + 1):
        p = f"s{k-1}"
        parts.append(
            f"f{k} AS MATERIALIZED (SELECT b.v, b.inv_out, b.inv_in, b.h, b.a, "
            f"coalesce(m.r, 0.0) AS a_raw, "
            f"coalesce(m.p, 0.0) AS q "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, "
            f"sum(p.h * p.inv_out) AS p, sum(p.t * p.inv_out) AS r "
            f"FROM edges e JOIN {p} p ON e.src = p.v "
            f"GROUP BY e.dst) m ON b.v = m.v)"
        )
        parts.append(
            f"an{k} AS MATERIALIZED (SELECT v, inv_out, inv_in, h, q, "
            f"a_raw / (SELECT sum(a_raw) FROM f{k}) AS a_n FROM f{k})"
        )
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT b.v, b.inv_out, b.inv_in, b.a_n, "
            f"coalesce(m.z, 0.0) AS h_raw, "
            f"coalesce(m.s, 0.0) AS t_new "
            f"FROM an{k} b LEFT JOIN (SELECT e.src AS v, "
            f"sum(p.q * p.inv_in) AS z, sum(p.a_n * p.inv_in) AS s "
            f"FROM edges e JOIN an{k} p ON e.dst = p.v "
            f"GROUP BY e.src) m ON b.v = m.v)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT v, inv_out, inv_in, "
            f"h_raw / (SELECT sum(h_raw) FROM b{k}) AS h, a_n AS a, "
            f"t_new AS t FROM b{k})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(h * 1e7) AS BIGINT) AS hubs_e7, "
        f"CAST(round(a * 1e7) AS BIGINT) AS auth_e7 FROM s{SALSA_ITERS}"
    )


def _anf_oracle() -> str:
    """Operator-for-operator replay of anf.py's lcg mode: 31-bit multiply
    seed, two-and-a-half xorshift rounds (masked to 31 bits after each
    left shift), FM single-bit register init, then ANF_HOPS bit_or
    supersteps over the out-neighbor gather."""
    from .algorithms.anf import LCG_A, LCG_C, LCG_J, LCG_M, LCG_TZ_CAP

    mask31 = LCG_M - 1
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT src, dst FROM ({SUPPLY_EDGES_SQL}) "
        "WHERE src <> dst)",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        f"regs AS (SELECT unnest(generate_series(0, {ANF_REGS - 1})) AS j)",
        f"h0 AS (SELECT v, j, (({LCG_A} * (v + j * {LCG_J} + {ANF_SEED}) "
        f"+ {LCG_C}) % {LCG_M}) AS h FROM univ CROSS JOIN regs)",
        f"h1 AS (SELECT v, j, xor(h, (h << 13) & {mask31}) AS h FROM h0)",
        "h2 AS (SELECT v, j, xor(h, h >> 17) AS h FROM h1)",
        f"h3 AS (SELECT v, j, xor(h, (h << 5) & {mask31}) AS h FROM h2)",
        "s0 AS MATERIALIZED (SELECT v, j, (CAST(1 AS BIGINT) << "
        f"(CASE WHEN h = 0 THEN {LCG_TZ_CAP} "
        f"ELSE least(bit_count((h & -h) - 1), {LCG_TZ_CAP}) END)) AS mask "
        "FROM h3)",
    ]
    for k in range(1, ANF_HOPS + 1):
        p = f"s{k-1}"
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT v, j, bit_or(mask) AS mask FROM ("
            f"SELECT v, j, mask FROM {p} "
            f"UNION ALL "
            f"SELECT e.src AS v, p.j, p.mask FROM edges e "
            f"JOIN {p} p ON e.dst = p.v) GROUP BY v, j)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, j, mask FROM s{ANF_HOPS}"
    )


def _ego_oracle() -> str:
    seeds = ", ".join(str(s) for s in EGO_SEEDS)
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        f"m0 AS MATERIALIZED (SELECT s AS seed, s AS vertex, CAST(0 AS BIGINT) AS distance "
        f"FROM (SELECT unnest([{seeds}]) AS s))",
    ]
    for k in range(1, EGO_RADIUS + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT seed, vertex FROM m{j}" for j in range(k)
        )
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT f.seed, e.dst AS vertex, "
            f"CAST({k} AS BIGINT) AS distance "
            f"FROM m{k-1} f JOIN edges e ON e.src = f.vertex "
            f"WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) x "
            f"WHERE x.seed = f.seed AND x.vertex = e.dst) "
            f"GROUP BY f.seed, e.dst)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM m{j}" for j in range(EGO_RADIUS + 1))
    return ",\n".join(parts) + f"\nSELECT seed, vertex, distance FROM ({union}) t"


ORACLES.update(
    {
        "jaccard": _jaccard_oracle(),
        "bfs": _bfs_oracle(),
        "katz": _katz_oracle(),
        "hits": _hits_oracle(),
        "salsa": _salsa_oracle(),
        "anf": _anf_oracle(),
        "ego_graph": _ego_oracle(),
        "hypergraph_edges": """
            SELECT 'event::' || CAST(o_orderkey AS VARCHAR) AS src,
                   'o_custkey::' || CAST(o_custkey AS VARCHAR) AS dst
            FROM orders WHERE o_custkey IS NOT NULL
            UNION ALL
            SELECT 'event::' || CAST(o_orderkey AS VARCHAR) AS src,
                   'o_orderpriority::' || o_orderpriority AS dst
            FROM orders WHERE o_orderpriority IS NOT NULL
        """,
    }
)

QUERIES.update(
    {
        "jaccard": q_jaccard,
        "bfs": q_bfs,
        "katz": q_katz,
        "hits": q_hits,
        "salsa": q_salsa,
        "anf": q_anf,
        "ego_graph": q_ego_graph,
        "hypergraph_edges": q_hypergraph_edges,
        "core_number": q_core_number,
        "doc_minhash_dedup": q_doc_minhash_dedup,
        "emb_lsh_topk": q_emb_lsh_topk,
    }
)

# queries exercised by pytest oracles instead of SQL (randomized internals:
# hash permutations / hyperplanes, or loop-carried peeling)
NO_ORACLE: set = set()

# doc_minhash_dedup (hash_mode="lcg"): every pipeline stage is exact-integer
# and mirrored here verbatim — shingle codes (position-weighted char sums),
# the 64 LCG permutations, 16 base-31 band buckets, candidate band-join,
# integer-cross-multiplied Jaccard verify at threshold 0.5, and the WCC
# clustering as a recursive-CTE transitive closure.
ORACLES["doc_minhash_dedup"] = """
    WITH RECURSIVE
    words AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    idx AS (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i
            FROM words),
    sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle
           FROM idx),
    chpos AS (
        SELECT doc_id, shingle,
               unnest(generate_series(1, length(shingle))) AS i
        FROM sh),
    codes AS (
        SELECT doc_id, shingle,
               sum(ascii(substring(shingle, i, 1)) *
                   ((1103515245::BIGINT * i + 12345) % 2147483647))
                 % 2147483647 AS code
        FROM chpos
        GROUP BY doc_id, shingle),
    mh AS (
        SELECT c.doc_id, j.j,
               min(((1 + ((1103515245::BIGINT * (j.j + 1) + 12345) % 2147483646))
                     * code
                    + ((2654435761::BIGINT * (j.j + 1) + 42) % 2147483647))
                   % 2147483647) AS mh
        FROM codes c, generate_series(0, 63) j(j)
        GROUP BY c.doc_id, j.j),
    bands AS (
        SELECT doc_id, j // 4 AS band,
               sum(mh * (CASE j % 4 WHEN 0 THEN 29791 WHEN 1 THEN 961
                                    WHEN 2 THEN 31 ELSE 1 END)) AS bucket
        FROM mh GROUP BY doc_id, j // 4),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    per_doc AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b),
    verified AS (
        SELECT cm.id_a, cm.id_b
        FROM common cm
        JOIN per_doc pa ON pa.doc_id = cm.id_a
        JOIN per_doc pb ON pb.doc_id = cm.id_b
        WHERE cm.common * 1000000 >= 500000 * (pa.n_sh + pb.n_sh - cm.common)),
    und AS (SELECT id_a AS u, id_b AS v FROM verified
            UNION SELECT id_b AS u, id_a AS v FROM verified),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
    cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster
           FROM reach GROUP BY u)
    SELECT d.doc_id,
           CAST(coalesce(cl.cluster, d.doc_id) AS BIGINT) AS cluster,
           coalesce(cl.cluster, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
"""

# emb_lsh_topk: the whole LSH pipeline in exact integer arithmetic —
# LCG-plane sign buckets, Hamming<=1 probes, quantized-dot rerank.
ORACLES["emb_lsh_topk"] = f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
    bits AS (
        SELECT e.vec_id, j.j,
               CASE WHEN sum(qv[t.i] *
                    ((1103515245::BIGINT * (j.j * 64 + t.i)
                      + 2654435761 + 42) % 2147483647 - 1073741823)) > 0
                    THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        FROM e, generate_series(0, {8 - 1}) j(j), generate_series(1, 64) t(i)
        GROUP BY e.vec_id, j.j),
    bk AS (SELECT vec_id, CAST(sum(bit << j) AS BIGINT) AS bucket
           FROM bits GROUP BY vec_id),
    cand AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM bk q JOIN bk b ON bit_count(xor(q.bucket, b.bucket)) <= 1
        WHERE q.vec_id < 20 AND b.vec_id <> q.vec_id),
    dots AS (
        SELECT c.query_id, c.neighbor_id,
               CAST(sum(a.qv[t.i] * b.qv[t.i]) AS BIGINT) AS dot_q
        FROM cand c
        JOIN e a ON a.vec_id = c.query_id
        JOIN e b ON b.vec_id = c.neighbor_id,
             generate_series(1, 64) t(i)
        GROUP BY c.query_id, c.neighbor_id),
    ranked AS (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM dots)
    SELECT query_id, neighbor_id, dot_q, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
"""

CORE_ORACLE_ROUNDS = 30


def _core_number_oracle() -> str:
    """Unrolled h-index iteration (same fixpoint as peeling; see
    linkgraph/algorithms/cores.py). Idempotent once converged, so the round
    count just needs to exceed convergence at the driver's scale factors."""
    parts = [
        f"WITH raw AS ({SUPPLY_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw))",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM raw))) AS v)",
        "c0 AS MATERIALIZED (SELECT u.v, CAST(coalesce(d.d, 0) AS BIGINT) AS c "
        "FROM univ u LEFT JOIN (SELECT src AS v, count(*) AS d FROM sym GROUP BY src) d "
        "ON u.v = d.v)",
    ]
    for k in range(1, CORE_ORACLE_ROUNDS + 1):
        p = f"c{k-1}"
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT v, max(least(cap, ge)) AS h FROM ("
            f"SELECT v, cap, sum(n) OVER (PARTITION BY v ORDER BY cap DESC) AS ge "
            f"FROM (SELECT e.dst AS v, least(cu.c, cv.c) AS cap, count(*) AS n "
            f"FROM sym e JOIN {p} cu ON e.src = cu.v JOIN {p} cv ON e.dst = cv.v "
            f"GROUP BY e.dst, least(cu.c, cv.c)) t) t2 GROUP BY v)"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT b.v, CAST(coalesce(h.h, b.c) AS BIGINT) AS c "
            f"FROM {p} b LEFT JOIN h{k} h ON b.v = h.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, c AS core_number FROM c{CORE_ORACLE_ROUNDS}"
    )


ORACLES["core_number"] = _core_number_oracle()

KCORE_K = 3


def q_k_core(spark, sf_dir):
    """Edge list of the k-core subgraph (induced on vertices with
    core_number >= k). Oracle: the core_number CTE chain + an edge
    semi-join on both endpoints' cores."""
    from .algorithms.cores import k_core as _k_core

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    return _k_core(g, k=KCORE_K).edges.select("src", "dst")


ORACLES["k_core"] = (
    _core_number_oracle().rsplit("\nSELECT", 1)[0]
    + f"""
SELECT e.src, e.dst FROM sym e
JOIN c{CORE_ORACLE_ROUNDS} a ON e.src = a.v
JOIN c{CORE_ORACLE_ROUNDS} b ON e.dst = b.v
WHERE a.c >= {KCORE_K} AND b.c >= {KCORE_K}
"""
)
QUERIES["k_core"] = q_k_core


# --- round-1 late additions: k-truss (unrolled-peeling oracle), plus
# rows-only random walks and multimodal decode coverage ---

from .algorithms.ktruss import ktruss_subgraph as _ktruss  # noqa: E402

KTRUSS_K, KTRUSS_ORACLE_ROUNDS = 4, 6


def q_ktruss(spark, sf_dir):
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    sub = _ktruss(g, KTRUSS_K)
    return sub.edges.filter(F.col("src") < F.col("dst")).select("src", "dst")


def _ktruss_oracle() -> str:
    need = KTRUSS_K - 2
    parts = [
        f"WITH raw AS ({SUPPLY_EDGES_SQL})",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, "
        "greatest(src, dst) AS dst FROM raw)",
    ]
    for k in range(1, KTRUSS_ORACLE_ROUNDS + 1):
        p = f"e{k-1}"
        parts.append(
            f"sup{k} AS MATERIALIZED (SELECT src, dst, count(*) AS sup FROM ("
            f"SELECT ab.src, ab.dst FROM {p} ab JOIN {p} bc ON ab.dst = bc.src "
            f"JOIN {p} ac ON ac.src = ab.src AND ac.dst = bc.dst "
            f"UNION ALL "
            f"SELECT ab.dst AS src, bc.dst AS dst FROM {p} ab JOIN {p} bc ON ab.dst = bc.src "
            f"JOIN {p} ac ON ac.src = ab.src AND ac.dst = bc.dst "
            f"UNION ALL "
            f"SELECT ac.src, ac.dst FROM {p} ab JOIN {p} bc ON ab.dst = bc.src "
            f"JOIN {p} ac ON ac.src = ab.src AND ac.dst = bc.dst "
            f") t GROUP BY src, dst)"
        )
        parts.append(
            f"e{k} AS MATERIALIZED (SELECT e.src, e.dst FROM {p} e "
            f"JOIN sup{k} s ON e.src = s.src AND e.dst = s.dst WHERE s.sup >= {need})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT src, dst FROM e{KTRUSS_ORACLE_ROUNDS}"
    )


RW_STARTS = 5
RW_DEPTH = 4


def q_random_walks(spark, sf_dir):
    """rank_mode="lcg" makes the per-step next-hop draw plain BIGINT
    arithmetic, so the DuckDB oracle replays the ENTIRE walk (frontier join,
    argmin pick, early sink truncation) value-for-value; the xxhash default
    and weighted sampling stay pytest-verified (test_multimodal_walks)."""
    from .algorithms.random_walks import random_walks

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return random_walks(
        g, list(range(RW_STARTS)), max_depth=RW_DEPTH, rank_mode="lcg"
    ).select("walk_id", "step", "vertex")


def _random_walks_oracle() -> str:
    from .algorithms.random_walks import RW_LCG_A, RW_LCG_B, RW_LCG_C, RW_LCG_P

    seed = 42
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        f"p0 AS (SELECT CAST(w AS BIGINT) AS walk_id, 0 AS step, "
        f"CAST(w AS BIGINT) AS vertex FROM "
        f"(SELECT unnest(generate_series(0, {RW_STARTS - 1})) AS w))",
    ]
    for k in range(1, RW_DEPTH + 1):
        parts.append(
            f"c{k} AS (SELECT p.walk_id, e.dst, "
            f"({RW_LCG_A} * p.walk_id + {RW_LCG_B * k} + {RW_LCG_C} * e.dst "
            f"+ {seed}) % {RW_LCG_P} AS r "
            f"FROM p{k-1} p JOIN edges e ON e.src = p.vertex)"
        )
        parts.append(
            f"p{k} AS (SELECT walk_id, {k} AS step, CAST(dst AS BIGINT) AS vertex "
            f"FROM (SELECT *, row_number() OVER (PARTITION BY walk_id "
            f"ORDER BY r, dst) AS rn FROM c{k}) WHERE rn = 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, vertex FROM p{k}" for k in range(RW_DEPTH + 1)
    )
    return ",\n".join(parts) + f"\n{union}"


def q_media_image_stats(spark, sf_dir):
    """Value-checked (VERDICT r2 item 7): the distributed path is
    generate_media -> binary encode -> Arrow-batched decode ->
    integer-exact stats + payload checksum; the oracle recomputes every
    value from the generator-DEFINITION manifest (seeded rng redraw,
    no byte path) written as a sidecar. Pure function of (n, seed), so
    the sidecar is run-order independent."""
    import os

    from .multimodal import generate_media, image_manifest, image_stats_checked

    os.makedirs(SIDECAR_DIR, exist_ok=True)
    image_manifest(90, seed=42).to_parquet(
        f"{SIDECAR_DIR}/media_manifest.parquet", index=False
    )
    media = generate_media(spark, 90, seed=42)
    return image_stats_checked(media)


ORACLES["ktruss"] = _ktruss_oracle()
ORACLES["random_walks"] = _random_walks_oracle()

# node2vec: p=1/2 and q=2 make every bias a power of two, so the only
# non-exact float op in the replay is ln() itself (libm, ±1 ulp — far
# below any plausible argmin gap).
N2V_P, N2V_Q = 0.5, 2.0


def q_node2vec(spark, sf_dir):
    """Second-order biased walks (node2vec_walks, rank_mode="lcg"): the
    oracle replays the full second-order pipeline — frontier join,
    return/in-out bias via a (prev, dst) adjacency probe, A-Res argmin —
    step by step."""
    from .algorithms.random_walks import node2vec_walks

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return node2vec_walks(
        g, list(range(RW_STARTS)), max_depth=RW_DEPTH, p=N2V_P, q=N2V_Q,
        rank_mode="lcg",
    ).select("walk_id", "step", "vertex")


def _node2vec_oracle() -> str:
    from .algorithms.random_walks import RW_LCG_A, RW_LCG_B, RW_LCG_C, RW_LCG_P

    seed = 42
    inv_p, inv_q = 1.0 / N2V_P, 1.0 / N2V_Q
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        f"p0 AS (SELECT CAST(w AS BIGINT) AS walk_id, 0 AS step, "
        f"CAST(w AS BIGINT) AS vertex, CAST(NULL AS BIGINT) AS prev FROM "
        f"(SELECT unnest(generate_series(0, {RW_STARTS - 1})) AS w))",
    ]
    for k in range(1, RW_DEPTH + 1):
        parts.append(
            f"c{k} AS (SELECT p.walk_id, p.vertex AS cur, e.dst, "
            f"-ln((({RW_LCG_A} * p.walk_id + {RW_LCG_B * k} "
            f"+ {RW_LCG_C} * e.dst + {seed}) % {RW_LCG_P} + 1) "
            f"/ {float(RW_LCG_P + 2)}) / "
            f"(CASE WHEN p.prev IS NULL THEN 1.0 "
            f" WHEN e.dst = p.prev THEN {inv_p} "
            f" WHEN n.src IS NOT NULL THEN 1.0 ELSE {inv_q} END) AS r "
            f"FROM p{k-1} p JOIN edges e ON e.src = p.vertex "
            f"LEFT JOIN (SELECT DISTINCT src, dst FROM edges) n "
            f"ON n.src = p.prev AND n.dst = e.dst)"
        )
        parts.append(
            f"p{k} AS (SELECT walk_id, {k} AS step, CAST(dst AS BIGINT) AS vertex, "
            f"CAST(cur AS BIGINT) AS prev "
            f"FROM (SELECT *, row_number() OVER (PARTITION BY walk_id "
            f"ORDER BY r, dst) AS rn FROM c{k}) WHERE rn = 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, vertex FROM p{k}" for k in range(RW_DEPTH + 1)
    )
    return ",\n".join(parts) + f"\n{union}"


ORACLES["node2vec"] = _node2vec_oracle()
QUERIES["node2vec"] = q_node2vec
QUERIES.update(
    {
        "ktruss": q_ktruss,
        "random_walks": q_random_walks,
        "media_image_stats": q_media_image_stats,
    }
)
ORACLES["media_image_stats"] = f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           (200 * sum_r + width * height) // (2 * width * height) AS mean_r_e2,
           CAST(chk AS BIGINT) AS chk
    FROM read_parquet('{SIDECAR_DIR}/media_manifest.parquet')
"""


# --- clustering-quality metrics over a deterministic labeling ---------------

def q_clustering_metrics(spark, sf_dir):
    from .algorithms.clustering_metrics import (
        analyze_clustering_edge_cut,
        analyze_clustering_modularity,
        analyze_clustering_ratio_cut,
    )

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    labels = g.vertices().select("vertex", (F.col("vertex") % 10).alias("labels"))
    q = analyze_clustering_modularity(g, labels)
    cut = analyze_clustering_edge_cut(g, labels)
    rc = analyze_clustering_ratio_cut(g, labels)
    return spark.createDataFrame(
        [(int(round(q * 1e9)), int(round(cut * 100)), int(round(rc * 1e6)))],
        "modularity_e9 LONG, edge_cut_e2 LONG, ratio_cut_e6 LONG",
    )


ORACLES["clustering_metrics"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
    ut AS (SELECT src, dst, 1.0 AS w, src % 10 AS c_src, dst % 10 AS c_dst
           FROM sym WHERE src <= dst),
    m AS (SELECT sum(w) AS m FROM ut),
    inside AS (SELECT c_src AS c, sum(w) AS in_w FROM ut WHERE c_src = c_dst GROUP BY c_src),
    tot AS (SELECT c, sum(w) AS tot_w FROM
            (SELECT c_src AS c, w FROM ut UNION ALL SELECT c_dst AS c, w FROM ut) t
            GROUP BY c),
    univ AS (SELECT unnest(generate_series(0, (SELECT max(greatest(src,dst)) FROM raw))) AS v),
    sizes AS (SELECT v % 10 AS c, count(*) AS n FROM univ GROUP BY v % 10),
    cutper AS (SELECT c, sum(w) AS cut_w FROM
               (SELECT c_src AS c, w FROM ut WHERE c_src <> c_dst
                UNION ALL SELECT c_dst AS c, w FROM ut WHERE c_src <> c_dst) t
               GROUP BY c),
    q AS (SELECT sum(coalesce(i.in_w, 0.0) / (SELECT m FROM m)
                 - (t.tot_w / (2.0 * (SELECT m FROM m))) * (t.tot_w / (2.0 * (SELECT m FROM m)))) AS q
          FROM tot t LEFT JOIN inside i ON t.c = i.c),
    cut AS (SELECT coalesce(sum(w), 0.0) AS cut FROM ut WHERE c_src <> c_dst),
    rc AS (SELECT sum(coalesce(cp.cut_w, 0.0) / s.n) AS rc
           FROM sizes s LEFT JOIN cutper cp ON s.c = cp.c)
    SELECT CAST(round((SELECT q FROM q) * 1e9) AS BIGINT) AS modularity_e9,
           CAST(round((SELECT cut FROM cut) * 100) AS BIGINT) AS edge_cut_e2,
           CAST(round((SELECT rc FROM rc) * 1e6) AS BIGINT) AS ratio_cut_e6
"""
QUERIES["clustering_metrics"] = q_clustering_metrics


# --- community-label self-consistency oracles --------------------------------
#
# Louvain/Leiden/ECG labels are not SQL-replicable (the move sequence isn't a
# relational program), but modularity OF THE EMITTED LABELS is: the query
# writes its (vertex, partition) rows to a sidecar parquet and appends a
# quantized modularity column computed by the engine's own metric; the DuckDB
# oracle reads the sidecar back and RE-DERIVES modularity from the raw edge
# table + those labels in SQL. A broken flatten/relabel/unrenumber changes the
# emitted labels' modularity on one side only -> hash mismatch. The sidecar is
# a test-harness channel (V rows on the fixed 400-vertex supply graph), not an
# engine code path.

# SIDECAR_DIR (oracle-input sidecar protocol) is defined near the top of
# this module so that module-level ORACLES f-strings can embed it.


def _community_result(spark, g: Graph, labels, name: str, label_col: str,
                      engine_q: float | None = None):
    """Materialize labels once, write the sidecar, return DF[vertex,
    <label_col>, q_e6] built from the SAME pandas frame (so the driver
    collects exactly the sidecar's rows even if the algorithm had any
    run-to-run freedom). When the algorithm reports its own best
    modularity (``engine_q``), assert it equals the modularity of the
    EMITTED labels — a broken flatten/relabel makes the two diverge and
    the query fails loudly instead of hashing a consistent-but-wrong
    answer."""
    import os

    from .algorithms.clustering_metrics import analyze_clustering_modularity

    pdf = labels.toPandas().sort_values("vertex").reset_index(drop=True)
    pdf["vertex"] = pdf["vertex"].astype("int64")
    pdf[label_col] = pdf[label_col].astype("int64")
    lab_df = spark.createDataFrame(pdf).select(
        "vertex", F.col(label_col).alias("labels")
    )
    q = analyze_clustering_modularity(g, lab_df)
    if engine_q is not None and abs(engine_q - q) > 1e-6:
        raise AssertionError(
            f"{name}: reported modularity {engine_q} != modularity of "
            f"emitted labels {q} — flatten/relabel is broken"
        )
    os.makedirs(SIDECAR_DIR, exist_ok=True)
    pdf.to_parquet(f"{SIDECAR_DIR}/{name}.parquet", index=False)
    pdf["q_e6"] = int(round(q * 1e6))
    return spark.createDataFrame(pdf)


def _modularity_of_sidecar_sql(name: str, label_col: str) -> str:
    """DuckDB: recompute modularity of the sidecar labels from the supply
    edges (same formula as the green clustering_metrics oracle)."""
    lc = f'"{label_col}"'
    return f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
    lab AS (SELECT CAST(vertex AS BIGINT) AS vertex, CAST({lc} AS BIGINT) AS p
            FROM read_parquet('{SIDECAR_DIR}/{name}.parquet')),
    ut AS (SELECT s.src, s.dst, 1.0 AS w, l1.p AS c_src, l2.p AS c_dst
           FROM sym s JOIN lab l1 ON s.src = l1.vertex
                      JOIN lab l2 ON s.dst = l2.vertex
           WHERE s.src <= s.dst),
    m AS (SELECT sum(w) AS m FROM ut),
    inside AS (SELECT c_src AS c, sum(w) AS in_w FROM ut WHERE c_src = c_dst GROUP BY c_src),
    tot AS (SELECT c, sum(w) AS tot_w FROM
            (SELECT c_src AS c, w FROM ut UNION ALL SELECT c_dst AS c, w FROM ut) t
            GROUP BY c),
    q AS (SELECT sum(coalesce(i.in_w, 0.0) / (SELECT m FROM m)
                 - (t.tot_w / (2.0 * (SELECT m FROM m))) * (t.tot_w / (2.0 * (SELECT m FROM m)))) AS q
          FROM tot t LEFT JOIN inside i ON t.c = i.c)
    SELECT l.vertex, l.p AS {lc},
           CAST(round((SELECT q FROM q) * 1e6) AS BIGINT) AS q_e6
    FROM lab l
    """


def q_louvain(spark, sf_dir):
    from .algorithms.louvain import louvain as _louvain

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    res, _q = _louvain(g)
    return _community_result(
        spark, g, res.select("vertex", "partition"), "louvain", "partition",
        engine_q=_q,
    )


QUERIES["louvain"] = q_louvain
ORACLES["louvain"] = _modularity_of_sidecar_sql("louvain", "partition")


# --- SSSP with an unrolled Bellman-Ford oracle (integer-valued weights) ------

SSSP_ORACLE_ROUNDS = 30
WEIGHTED_SUPPLY_SQL = (
    f"SELECT src, dst, CAST((src + dst) % 7 + 1 AS DOUBLE) AS w FROM ({SUPPLY_EDGES_SQL}) t"
)


def q_sssp(spark, sf_dir):
    from .algorithms.traversal import sssp as _sssp

    e = supply_edges(spark, sf_dir).select(
        "src", "dst", ((F.col("src") + F.col("dst")) % 7 + 1).cast("double").alias("weight")
    )
    g = Graph.from_edgelist(e, weight="weight", directed=True, renumber=False)
    return _sssp(g, 0).select(
        "vertex", F.col("distance").cast("long").alias("dist_i")
    )


def _sssp_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({WEIGHTED_SUPPLY_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "d0 AS MATERIALIZED (SELECT v, CASE WHEN v = 0 THEN CAST(0 AS DOUBLE) END AS d FROM univ)",
    ]
    for k in range(1, SSSP_ORACLE_ROUNDS + 1):
        p = f"d{k-1}"
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT b.v, CASE "
            f"WHEN m.md IS NULL THEN b.d WHEN b.d IS NULL THEN m.md "
            f"ELSE least(b.d, m.md) END AS d "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, min(p.d + e.w) AS md "
            f"FROM edges e JOIN {p} p ON e.src = p.v WHERE p.d IS NOT NULL "
            f"GROUP BY e.dst) m ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(d AS BIGINT) AS dist_i FROM d{SSSP_ORACLE_ROUNDS}"
    )


ORACLES["sssp"] = _sssp_oracle()
QUERIES["sssp"] = q_sssp

# --- round-2 additions: SCC (recursive-CTE oracle), Leiden, ECG --------------

def q_scc(spark, sf_dir):
    from .algorithms.scc import strongly_connected_components as _scc

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return _scc(g).select("vertex", "labels")


# SCC oracle: transitive closure via recursive CTE (the supply graph is 400
# vertices, closure fits easily), label = min{u : v->u and u->v} ∪ {v}.
ORACLES["scc"] = f"""
    WITH RECURSIVE edges AS ({SUPPLY_EDGES_SQL}),
    reach(a, b) AS (
        SELECT src AS a, dst AS b FROM edges
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN edges e ON r.b = e.src
    ),
    univ AS (SELECT unnest(generate_series(0,
             (SELECT max(greatest(src, dst)) FROM edges))) AS v),
    mutual AS (SELECT r1.a AS v, min(r1.b) AS m
               FROM reach r1 JOIN reach r2 ON r1.b = r2.a AND r2.b = r1.a
               GROUP BY r1.a)
    SELECT u.v AS vertex,
           CAST(least(u.v, coalesce(m.m, u.v)) AS BIGINT) AS labels
    FROM univ u LEFT JOIN mutual m ON u.v = m.v
"""
QUERIES["scc"] = q_scc


def q_leiden(spark, sf_dir):
    from .algorithms.leiden import leiden as _leiden

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    res, _q = _leiden(g)
    return _community_result(
        spark, g, res.select("vertex", "partition"), "leiden", "partition",
        engine_q=_q,
    )


def q_ecg(spark, sf_dir):
    from .algorithms.ecg import ecg as _ecg

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    res, _q = _ecg(g, ensemble_size=4)
    return _community_result(
        spark, g, res.select("vertex", "partition"), "ecg", "partition",
        engine_q=_q,
    )


QUERIES["leiden"] = q_leiden
QUERIES["ecg"] = q_ecg
ORACLES["leiden"] = _modularity_of_sidecar_sql("leiden", "partition")
ORACLES["ecg"] = _modularity_of_sidecar_sql("ecg", "partition")


def q_spectral_balanced_cut(spark, sf_dir):
    """The k-means labels aren't SQL-replicable (the eigensolver is pinned
    against dense numpy eigh in tests/test_spectral.py), but the emitted
    labeling's invariants are: sidecar labels + quantized edge-cut +
    per-cluster size, re-derived by the oracle from the raw edges."""
    from .algorithms.clustering_metrics import analyze_clustering_edge_cut
    from .algorithms.spectral import spectral_balanced_cut_clustering
    import os

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    res = spectral_balanced_cut_clustering(g, num_clusters=4, num_eigen_vects=4)
    pdf = res.toPandas().sort_values("vertex").reset_index(drop=True)
    pdf["vertex"] = pdf["vertex"].astype("int64")
    pdf["cluster"] = pdf["cluster"].astype("int64")
    lab_df = spark.createDataFrame(pdf).select(
        "vertex", F.col("cluster").alias("labels")
    )
    cut = analyze_clustering_edge_cut(g, lab_df)
    os.makedirs(SIDECAR_DIR, exist_ok=True)
    pdf.to_parquet(f"{SIDECAR_DIR}/spectral_balanced_cut.parquet", index=False)
    sizes = pdf.groupby("cluster").size()
    pdf["cluster_size"] = pdf["cluster"].map(sizes).astype("int64")
    pdf["cut_e2"] = int(round(cut * 100))
    return spark.createDataFrame(pdf)


ORACLES["spectral_balanced_cut"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
    lab AS (SELECT CAST(vertex AS BIGINT) AS vertex, CAST(cluster AS BIGINT) AS p
            FROM read_parquet('{SIDECAR_DIR}/spectral_balanced_cut.parquet')),
    ut AS (SELECT s.src, s.dst, 1.0 AS w, l1.p AS c_src, l2.p AS c_dst
           FROM sym s JOIN lab l1 ON s.src = l1.vertex
                      JOIN lab l2 ON s.dst = l2.vertex
           WHERE s.src <= s.dst),
    cut AS (SELECT coalesce(sum(w), 0.0) AS cut FROM ut WHERE c_src <> c_dst),
    sizes AS (SELECT p, count(*) AS n FROM lab GROUP BY p)
    SELECT l.vertex, l.p AS cluster, s.n AS cluster_size,
           CAST(round((SELECT cut FROM cut) * 100) AS BIGINT) AS cut_e2
    FROM lab l JOIN sizes s ON l.p = s.p
"""
QUERIES["spectral_balanced_cut"] = q_spectral_balanced_cut


# betweenness: deterministic source subset (v % BC_SOURCE_MOD == 0 — the
# reference's "k : int or list" list form) makes the whole Brandes pass
# SQL-replicable: the oracle unrolls BFS/sigma/dependency level-by-level
# (exact on unweighted BFS DAGs, where every dependency edge connects
# adjacent levels). BC_LEVELS must be >= the supply graph's max source
# eccentricity (measured: 3 at sf0.001, 2 at sf0.01; 4 leaves margin).
BC_SOURCE_MOD = 8
BC_LEVELS = 4


def q_betweenness(spark, sf_dir):
    """Sampled-source Brandes with an explicit deterministic source list;
    value-checked by the unrolled SQL oracle (the exact k=None tier keeps
    its pure-Python Brandes pin in tests/test_betweenness.py)."""
    from .algorithms.betweenness import betweenness_centrality

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    sources = [r.vertex for r in g.vertices().collect() if r.vertex % BC_SOURCE_MOD == 0]
    return betweenness_centrality(g, k=sorted(sources)).select(
        "vertex",
        F.round(F.col("betweenness_centrality") * 1e5).cast("long").alias("bc_e5"),
    )


def _brandes_scaffold(L: int) -> list:
    """Shared unrolled-Brandes CTE scaffold (BFS dist, path counts sig,
    reverse dependencies del0..delL) used by BOTH the vertex and the edge
    betweenness oracles."""
    parts = [
        f"WITH raw AS ({SUPPLY_EDGES_SQL}),",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM"
        " (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym),",
        f"d0 AS MATERIALIZED (SELECT v AS s, v AS v, 0 AS d FROM verts"
        f" WHERE v % {BC_SOURCE_MOD} = 0),",
    ]
    for i in range(1, L + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT s, v, min(d) AS d FROM ("
            f"SELECT s, v, d FROM d{i-1} UNION ALL "
            f"SELECT p.s, e.dst AS v, {i} AS d FROM d{i-1} p "
            f"JOIN sym e ON e.src = p.v AND p.d = {i-1}) GROUP BY s, v),"
        )
    parts.append(f"dist AS MATERIALIZED (SELECT s, v, d FROM d{L}),")
    parts.append(
        "sg0 AS MATERIALIZED (SELECT s, v, CAST(1 AS DOUBLE) AS sig"
        " FROM dist WHERE d = 0),"
    )
    for i in range(1, L + 1):
        parts.append(
            f"sg{i} AS MATERIALIZED (SELECT dv.s, dv.v, sum(sp.sig) AS sig "
            f"FROM dist dv JOIN sym e ON e.dst = dv.v "
            f"JOIN sg{i-1} sp ON sp.s = dv.s AND sp.v = e.src "
            f"WHERE dv.d = {i} GROUP BY dv.s, dv.v),"
        )
    parts.append(
        "sig AS MATERIALIZED ("
        + " UNION ALL ".join(f"SELECT * FROM sg{i}" for i in range(L + 1))
        + "),"
    )
    parts.append(
        f"del{L} AS MATERIALIZED (SELECT s, v, CAST(0 AS DOUBLE) AS delta"
        f" FROM dist WHERE d = {L}),"
    )
    for i in range(L - 1, -1, -1):
        parts.append(
            f"del{i} AS MATERIALIZED (SELECT dv.s, dv.v, coalesce(c.c, 0) AS delta "
            f"FROM dist dv LEFT JOIN ("
            f"SELECT dw.s, e.src AS v, sum(sv.sig / sw.sig * (1 + dw.delta)) AS c "
            f"FROM del{i+1} dw "
            f"JOIN sig sw ON sw.s = dw.s AND sw.v = dw.v "
            f"JOIN sym e ON e.dst = dw.v "
            f"JOIN dist dp ON dp.s = dw.s AND dp.v = e.src AND dp.d = {i} "
            f"JOIN sig sv ON sv.s = dw.s AND sv.v = e.src "
            f"GROUP BY dw.s, e.src) c ON c.s = dv.s AND c.v = dv.v "
            f"WHERE dv.d = {i}),"
        )
    return parts


def _betweenness_oracle() -> str:
    L = BC_LEVELS
    parts = _brandes_scaffold(L)
    parts.append(
        "alldel AS ("
        + " UNION ALL ".join(f"SELECT * FROM del{i}" for i in range(L + 1))
        + "),"
    )
    parts.append(
        "bcr AS (SELECT v, sum(delta) AS bc FROM alldel WHERE s <> v GROUP BY v),"
        "nn AS (SELECT count(*) AS n FROM verts),"
        f"kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM verts"
        f" WHERE v % {BC_SOURCE_MOD} = 0),"
        # ADVICE r2: BC_LEVELS is a data-dependent eccentricity bound — fail
        # LOUDLY if one more expansion level would still reach new pairs
        # (i.e. the BFS was truncated before its fixpoint) instead of
        # silently hashing a wrong answer.
        f"chk AS (SELECT count(*) AS extra FROM dist p "
        f"JOIN sym e ON e.src = p.v AND p.d = {L} "
        f"LEFT JOIN dist x ON x.s = p.s AND x.v = e.dst WHERE x.v IS NULL) "
        "SELECT vt.v AS vertex, "
        "CASE WHEN (SELECT extra FROM chk) > 0 "
        "THEN CAST(error('BC oracle truncated: raise BC_LEVELS') AS BIGINT) "
        # engine scale for undirected+normalized+sampled:
        # 0.5 * 2/((n-1)(n-2)) * n/k  ==  (n/k) / ((n-1)(n-2))
        "ELSE CAST(round(coalesce(b.bc, 0) / ((nn.n - 1) * (nn.n - 2)) * (nn.n / kk.k)"
        " * 100000) AS BIGINT) END AS bc_e5 "
        "FROM verts vt CROSS JOIN nn CROSS JOIN kk LEFT JOIN bcr b ON b.v = vt.v"
    )
    return "\n".join(parts)


def q_mst(spark, sf_dir):
    """Distributed Borůvka; value-checked by an unrolled round-by-round
    DuckDB oracle that replays the engine's exact deterministic tie-break
    (min struct (weight, lo, hi) per component) and the min-label merge
    (recursive-CTE closure per round). Integer weights make every compare
    exact. The pure-Python Kruskal total-weight/forest-shape pin stays in
    tests/test_scc_mst.py."""
    from .algorithms.mst import minimum_spanning_tree

    e = supply_edges(spark, sf_dir).select(
        "src", "dst",
        ((F.col("src") * 7919 + F.col("dst")) % 97 + 1).cast("double").alias("weight"),
    )
    g = Graph.from_edgelist(e, weight="weight", directed=False, renumber=False)
    return minimum_spanning_tree(g).select(
        "src", "dst", F.col("weight").cast("long").alias("w_i")
    )


MST_ORACLE_ROUNDS = 10  # >= ceil(log2(V=400)) + margin; empty rounds no-op


def _mst_oracle() -> str:
    parts = [
        f"WITH RECURSIVE raw AS ({SUPPLY_EDGES_SQL})",
        # undirected weight = min over the (up to two) directed rows —
        # symmetrize dedup-min over weight (src*7919 + dst) % 97 + 1
        "symw AS MATERIALIZED (SELECT least(src,dst) AS lo, greatest(src,dst) AS hi, "
        "min((src*7919 + dst) % 97 + 1) AS w FROM raw GROUP BY 1, 2)",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM "
        "(SELECT lo AS v FROM symw UNION ALL SELECT hi FROM symw))",
        "comp0 AS MATERIALIZED (SELECT v, v AS c FROM verts)",
    ]
    for k in range(1, MST_ORACLE_ROUNDS + 1):
        p = k - 1
        parts.append(
            f"lab{k} AS MATERIALIZED (SELECT e.lo, e.hi, e.w, cl.c AS c_lo, ch.c AS c_hi "
            f"FROM symw e JOIN comp{p} cl ON cl.v = e.lo "
            f"JOIN comp{p} ch ON ch.v = e.hi WHERE cl.c <> ch.c)"
        )
        parts.append(
            f"pick{k} AS MATERIALIZED (SELECT lo, hi, w, c_lo, c_hi FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY comp ORDER BY w, lo, hi) AS rn "
            f"FROM (SELECT c_lo AS comp, * FROM lab{k} "
            f"      UNION ALL SELECT c_hi AS comp, * FROM lab{k})) WHERE rn = 1)"
        )
        parts.append(f"sel{k} AS MATERIALIZED (SELECT DISTINCT lo, hi, w FROM pick{k})")
        parts.append(
            f"mg{k} AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
            f"SELECT c_lo AS a, c_hi AS b FROM pick{k} "
            f"UNION ALL SELECT c_hi AS a, c_lo AS b FROM pick{k}))"
        )
        parts.append(
            f"cl{k}(u, v) AS (SELECT a, b FROM mg{k} "
            f"UNION SELECT cl{k}.u, m.b FROM cl{k} JOIN mg{k} m ON m.a = cl{k}.v)"
        )
        parts.append(
            f"rel{k} AS MATERIALIZED (SELECT u AS c, least(u, min(v)) AS newc "
            f"FROM cl{k} GROUP BY u)"
        )
        parts.append(
            f"comp{k} AS MATERIALIZED (SELECT cp.v, coalesce(r.newc, cp.c) AS c "
            f"FROM comp{p} cp LEFT JOIN rel{k} r ON r.c = cp.c)"
        )
    union = " UNION ".join(
        f"SELECT lo, hi, w FROM sel{k}" for k in range(1, MST_ORACLE_ROUNDS + 1)
    )
    parts.append(f"allsel AS ({union})")
    return ",\n".join(parts) + (
        "\nSELECT CAST(lo AS BIGINT) AS src, CAST(hi AS BIGINT) AS dst, "
        "CAST(w AS BIGINT) AS w_i FROM allsel"
    )


QUERIES["betweenness"] = q_betweenness
ORACLES["betweenness"] = _betweenness_oracle()
QUERIES["mst"] = q_mst
ORACLES["mst"] = _mst_oracle()


SESSION_GAP_MINUTES = 30


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (batch form of the applyInPandasWithState
    streaming operator — linkgraph/streaming.py; the two are pytest-checked
    for identical output)."""
    from .streaming import sessionize_events_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_events_batch(ev, gap_minutes=SESSION_GAP_MINUTES)


def q_emb_ivf_topk(spark, sf_dir):
    """Trained-quantizer cells aren't SQL-replicable, but the emitted
    candidate lists' RECALL against the exact top-k is (VERDICT r2 item 7):
    the query writes its (query_id, neighbor_id, rnk) rows to a sidecar
    parquet and appends a per-query recall_e2 column measured against the
    engine's own brute-force tier; the oracle recomputes the exact top-k
    in SQL, re-derives recall of the sidecar rows, and fails LOUDLY below
    a sanity floor. The k-means training randomness itself stays
    pytest-pinned (test_text_similarity.py::test_ivf_topk_recall)."""
    import os

    from .similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    # cells/probe sized for the driver table's weak cluster structure
    # (measured: 8/4 -> recall 0.76-0.83 at sf0.001/0.01; 32/4 collapses
    # to ~0.3 because near-uniform vectors spread over all cells)
    res = ivf_cosine_topk(
        emb, queries, k=10, n_cells=8, nprobe=4
    ).select("query_id", "neighbor_id", "rnk")
    pdf = res.toPandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype("int64")
    os.makedirs(SIDECAR_DIR, exist_ok=True)
    pdf.to_parquet(f"{SIDECAR_DIR}/emb_ivf_topk.parquet", index=False)

    # exact top-10 with the same integer-quantized dot as emb_topk
    qe = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("be"))
    dot = F.expr(
        "aggregate(zip_with(qe, be, (x, y) -> "
        "cast(round(cast(x as double)*1000) as bigint) * "
        "cast(round(cast(y as double)*1000) as bigint)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    exact = (
        qe.join(b, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot.alias("dot_q"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "neighbor_id")
    )
    overlap = {
        r["query_id"]: r["n"]
        for r in spark.createDataFrame(pdf[["query_id", "neighbor_id"]])
        .join(exact, on=["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    pdf["recall_e2"] = (
        pdf["query_id"].map(lambda q: overlap.get(q, 0) * 10).astype("int64")
    )
    return spark.createDataFrame(pdf)


ORACLES["emb_ivf_topk"] = f"""
    WITH lab AS (SELECT CAST(query_id AS BIGINT) AS query_id,
                        CAST(neighbor_id AS BIGINT) AS neighbor_id,
                        CAST(rnk AS BIGINT) AS rnk
                 FROM read_parquet('{SIDECAR_DIR}/emb_ivf_topk.parquet')),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    pairs AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(sum(CAST(round(CAST(q.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
                 * CAST(round(CAST(b.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS dot_q
        FROM q, embeddings b, generate_series(1, 64) AS t(i)
        WHERE b.vec_id <> q.vec_id
        GROUP BY q.vec_id, b.vec_id),
    exact AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM pairs) t WHERE rnk <= 10),
    rec AS (SELECT l.query_id, count(e.neighbor_id) * 10 AS recall_e2
            FROM lab l LEFT JOIN exact e
              ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
            GROUP BY l.query_id)
    SELECT l.query_id, l.neighbor_id, l.rnk,
           CASE WHEN r.recall_e2 < 50
                THEN CAST(error('IVF recall collapsed below 0.5') AS BIGINT)
                ELSE r.recall_e2 END AS recall_e2
    FROM lab l JOIN rec r ON l.query_id = r.query_id
"""
QUERIES["emb_ivf_topk"] = q_emb_ivf_topk


ORACLES["events_sessions"] = f"""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MINUTES} minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, sum(new_sess)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sn
        FROM o
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(round(sum(value) * 100) AS BIGINT) AS value_sum_e2
    FROM s GROUP BY user_id, sn
"""
QUERIES["events_sessions"] = q_events_sessions


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (vector dedup tier)
# ---------------------------------------------------------------------------

# tau = 2/5 (cosine 0.4): integer test 25*dot^2 >= 4*|a|^2*|b|^2 with dot>0.
# Components quantized to round(x*1000) BIGINTs on BOTH sides so the filter
# and the output column are exact integer arithmetic (same trick as emb_topk;
# avoids float-hash divergence at the threshold boundary).
EMB_NEAR_DUP_TAU_NUM, EMB_NEAR_DUP_TAU_DEN = 2, 5


def q_emb_near_dup(spark, sf_dir):
    """Exact tier of linkgraph.similarity.embedding_near_dup (quantized for
    the driver hash; the float/LSH tiers are pytest-verified against a
    numpy oracle in tests/test_text_similarity.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qe = F.expr(
        "transform(embedding, x -> cast(round(cast(x as double)*1000) as bigint))"
    )
    n2 = F.expr(
        "aggregate(transform(qv, x -> x*x), cast(0 as bigint), (acc, v) -> acc + v)"
    )
    e = emb.select(F.col("vec_id"), qe.alias("qv")).withColumn("n2", n2)
    a = e.select(
        F.col("vec_id").alias("a_id"), F.col("qv").alias("ae"), F.col("n2").alias("an2")
    )
    b = e.select(
        F.col("vec_id").alias("b_id"), F.col("qv").alias("be"), F.col("n2").alias("bn2")
    )
    dot = F.expr(
        "aggregate(zip_with(ae, be, (x, y) -> x * y), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    num, den = EMB_NEAR_DUP_TAU_NUM, EMB_NEAR_DUP_TAU_DEN
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", dot.alias("dot_q"), "an2", "bn2")
        .filter(
            (F.col("dot_q") > 0)
            & (
                F.lit(den * den) * F.col("dot_q") * F.col("dot_q")
                >= F.lit(num * num) * F.col("an2") * F.col("bn2")
            )
        )
        .select("a_id", "b_id", "dot_q")
    )


ORACLES["emb_near_dup"] = f"""
    WITH pr AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(sum(CAST(round(CAST(a.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
                 * CAST(round(CAST(b.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS dot_q,
               CAST(sum(CAST(round(CAST(a.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
                 * CAST(round(CAST(a.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS an2,
               CAST(sum(CAST(round(CAST(b.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
                 * CAST(round(CAST(b.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS bn2
        FROM embeddings a, embeddings b, generate_series(1, 64) AS t(i)
        WHERE a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id)
    SELECT a_id, b_id, dot_q FROM pr
    WHERE dot_q > 0
      AND {EMB_NEAR_DUP_TAU_DEN * EMB_NEAR_DUP_TAU_DEN} * dot_q * dot_q
          >= {EMB_NEAR_DUP_TAU_NUM * EMB_NEAR_DUP_TAU_NUM} * an2 * bn2
"""
QUERIES["emb_near_dup"] = q_emb_near_dup


# ---------------------------------------------------------------------------
# induced subgraph (community/subgraph_extraction.py:22-89)
# ---------------------------------------------------------------------------

SUBGRAPH_MOD = 5


def q_induced_subgraph(spark, sf_dir):
    """Graph.subgraph on the deterministic vertex subset v % 5 == 0 —
    two semi-joins (induced_subgraph_impl.cuh's filter semantics)."""
    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    verts = g.vertices().filter(F.col("vertex") % SUBGRAPH_MOD == 0)
    return g.subgraph(verts).edges.select("src", "dst")


ORACLES["induced_subgraph"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw))
    SELECT src, dst FROM sym
    WHERE src % {SUBGRAPH_MOD} = 0 AND dst % {SUBGRAPH_MOD} = 0
"""
QUERIES["induced_subgraph"] = q_induced_subgraph


# ---------------------------------------------------------------------------
# tf-idf keyword extraction (training-pipeline text op)
# ---------------------------------------------------------------------------

def q_doc_tfidf(spark, sf_dir):
    """Top-5 terms per document by tf·idf; ranking compares the quantized
    integer score so order is engine-independent."""
    from .text.analysis import tfidf_top_terms

    return tfidf_top_terms(_documents(spark, sf_dir), k=5)


ORACLES["doc_tfidf"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        FROM documents),
    toks2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    sc AS (
        SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
               CAST(round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfc) * 1000000)
                    AS BIGINT) AS score_e6
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score_e6 DESC, term ASC) AS rnk FROM sc)
    SELECT doc_id, term, tf, score_e6, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 5
"""
QUERIES["doc_tfidf"] = q_doc_tfidf


# ---------------------------------------------------------------------------
# uniform neighbor sampling (GraphSAGE fanout; upstream-cuGraph API shape)
# ---------------------------------------------------------------------------

UNS_FANOUTS = [3, 2]
UNS_STARTS = 10


def q_neighbor_sample(spark, sf_dir):
    """rank_mode="lcg" makes each hop's per-src top-k pure BIGINT
    arithmetic; the oracle unrolls hops with the identical window."""
    from .algorithms.sampling import uniform_neighbor_sample

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return uniform_neighbor_sample(
        g, list(range(UNS_STARTS)), fanouts=UNS_FANOUTS, rank_mode="lcg"
    ).select("hop", "src", "dst")


def _neighbor_sample_oracle() -> str:
    from .algorithms.random_walks import RW_LCG_A, RW_LCG_B, RW_LCG_C, RW_LCG_P

    seed = 42
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        f"f0 AS (SELECT unnest(generate_series(0, {UNS_STARTS - 1})) AS src)",
    ]
    for hop, k in enumerate(UNS_FANOUTS):
        parts.append(
            f"s{hop} AS MATERIALIZED (SELECT {hop} AS hop, src, dst FROM ("
            f"SELECT e.src, e.dst, row_number() OVER (PARTITION BY e.src ORDER BY "
            f"({RW_LCG_A} * e.src + {RW_LCG_B * (hop + 1)} + {RW_LCG_C} * e.dst "
            f"+ {seed}) % {RW_LCG_P} ASC, e.dst ASC) AS rn "
            f"FROM edges e JOIN f{hop} USING (src)) WHERE rn <= {k})"
        )
        parts.append(
            f"f{hop + 1} AS (SELECT DISTINCT dst AS src FROM s{hop})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST(hop AS INT) AS hop, src, dst FROM s{h}"
        for h in range(len(UNS_FANOUTS))
    )
    return ",\n".join(parts) + f"\n{union}"


ORACLES["neighbor_sample"] = _neighbor_sample_oracle()
QUERIES["neighbor_sample"] = q_neighbor_sample


# ---------------------------------------------------------------------------
# host-graph contraction (page graph -> host graph, Common-Crawl coarsening)
# ---------------------------------------------------------------------------

HOST_DIV = 8  # supply vertices 0..399 -> 50 "hosts"


def q_host_pagerank(spark, sf_dir):
    """Contract the supply graph by host = vertex DIV 8, then weighted
    PageRank on the host graph (weight = collapsed page-link multiplicity,
    self-links dropped) — the host-level ranking pass of a web-scale link
    pipeline. One E-scale contraction, then the algorithm runs on the
    tiny quotient graph."""
    from .structure.contract import contract_vertices

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    amap = g.vertices().select(
        "vertex", F.expr(f"vertex DIV {HOST_DIV}").alias("group")
    )
    cg = contract_vertices(g, amap, self_loops=False)
    pr = pagerank(cg, alpha=ALPHA, fixed_iterations=PR_ITERS)
    return pr.select(
        F.col("vertex").alias("host"),
        F.round(F.col("pagerank") * 1e7).cast("long").alias("pr_e7"),
    )


def _host_pagerank_oracle() -> str:
    a, one_m_a = ALPHA, 1.0 - ALPHA
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        f"hedges AS MATERIALIZED (SELECT src // {HOST_DIV} AS src, "
        f"dst // {HOST_DIV} AS dst, CAST(count(*) AS DOUBLE) AS w "
        f"FROM edges WHERE src // {HOST_DIV} <> dst // {HOST_DIV} "
        "GROUP BY 1, 2)",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM hedges))) AS v)",
        "outw AS (SELECT src AS v, sum(w) AS ow FROM hedges GROUP BY src)",
        "vt AS MATERIALIZED (SELECT u.v, coalesce(o.ow, 0.0) AS ow "
        "FROM univ u LEFT JOIN outw o ON u.v = o.v)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM vt)",
        "r0 AS MATERIALIZED (SELECT v, ow, 1.0/(SELECT n FROM nv) AS r FROM vt)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = f"r{k-1}"
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT b.v, b.ow, "
            f"((SELECT sum(CASE WHEN ow <= 0 THEN r ELSE 0 END) FROM {p}) * {a} + {one_m_a})"
            f" / (SELECT n FROM nv) + {a} * coalesce(m.s, 0.0) AS r "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, sum(p.r * e.w / p.ow) AS s "
            f"FROM hedges e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS host, CAST(round(r * 1e7) AS BIGINT) AS pr_e7 FROM r{PR_ITERS}"
    )


ORACLES["host_pagerank"] = _host_pagerank_oracle()
QUERIES["host_pagerank"] = q_host_pagerank


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021 table A1 family)
# ---------------------------------------------------------------------------

def q_doc_gopher(spark, sf_dir):
    """Integer-exact repetition signals per document — the Gopher/C4
    repetition-filter family (top-word fraction, distinct-word ratio,
    top-bigram fraction), floor-divided into e5 BIGINTs on both sides."""
    from .text.analysis import repetition_metrics

    return repetition_metrics(_documents(spark, sf_dir)).select(
        "doc_id", "n_words", "top_word_e5", "distinct_e5", "top_bigram_e5"
    )


ORACLES["doc_gopher"] = """
    WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS w,
                         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words
                  FROM documents),
    words AS (SELECT doc_id, n_words, unnest(w) AS word FROM base),
    wc AS (SELECT doc_id, n_words, word, count(*) AS c
           FROM words GROUP BY doc_id, n_words, word),
    topw AS (SELECT doc_id, n_words,
                    (100000 * max(c)) // n_words AS top_word_e5,
                    (100000 * count(*)) // n_words AS distinct_e5
             FROM wc GROUP BY doc_id, n_words),
    bgi AS (SELECT doc_id, n_words, w,
                   unnest(generate_series(1, CAST(n_words AS INT) - 1)) AS i
            FROM base WHERE n_words >= 2),
    bgc AS (SELECT doc_id, n_words, w[i] || ' ' || w[i + 1] AS bg, count(*) AS c
            FROM bgi GROUP BY doc_id, n_words, bg),
    topbg AS (SELECT doc_id, (100000 * max(c)) // greatest(n_words - 1, 1)
                      AS top_bigram_e5
              FROM bgc GROUP BY doc_id, n_words)
    SELECT t.doc_id, t.n_words, t.top_word_e5, t.distinct_e5,
           CAST(coalesce(b.top_bigram_e5, 0) AS BIGINT) AS top_bigram_e5
    FROM topw t LEFT JOIN topbg b ON t.doc_id = b.doc_id
"""
QUERIES["doc_gopher"] = q_doc_gopher

# ---------------------------------------------------------------------------
# incremental recrawl-delta ranking (structure/delta.py)
# ---------------------------------------------------------------------------

INCR_ITERS = 6
# removals: a deterministic ~20% slice of the base supply edges;
# additions: order -> NEW review-host vertices 400..449 (grows the universe)
DELTA_REMOVE_SQL = "(src + 3 * dst) % 5 = 0"
DELTA_ADD_SQL = (
    "SELECT DISTINCT l_orderkey % 400 AS src, 400 + (l_suppkey % 50) AS dst "
    "FROM lineitem"
)


def q_incr_pagerank(spark, sf_dir):
    """Recrawl-delta ranking: full PageRank on the base supply graph, then
    a signed edge delta (~20% removals + additions that introduce 50 NEW
    vertices) applied via ``apply_edge_delta`` — ONE union+hash-agg pass,
    no rebuild — and a warm restart (``nstart`` = previous scores) for
    INCR_ITERS < PR_ITERS supersteps. The delta-then-warm-restart shape is
    the 100-TB recrawl plan: the expensive converged state is reused, not
    recomputed."""
    from .structure.delta import apply_edge_delta

    base = Graph.from_edgelist(
        supply_edges(spark, sf_dir), directed=True, renumber=False
    )
    pr0 = pagerank(base, alpha=ALPHA, fixed_iterations=PR_ITERS)
    li = _lineitem(spark, sf_dir)
    removals = (
        supply_edges(spark, sf_dir)
        .filter((F.col("src") + 3 * F.col("dst")) % 5 == 0)
        .select("src", "dst", F.lit(-1.0).alias("dw"))
    )
    additions = (
        li.select(
            (F.col("l_orderkey") % 400).alias("src"),
            (F.lit(400) + F.col("l_suppkey") % 50).alias("dst"),
        )
        .distinct()
        .select("src", "dst", F.lit(1.0).alias("dw"))
    )
    g2 = apply_edge_delta(base, removals.unionByName(additions), weight="dw")
    pr1 = pagerank(
        g2,
        alpha=ALPHA,
        nstart=pr0.select("vertex", F.col("pagerank").alias("values")),
        fixed_iterations=INCR_ITERS,
    )
    return pr1.select(
        "vertex", F.round(F.col("pagerank") * 1e7).cast("long").alias("pr_e7")
    )


def _incr_pagerank_oracle() -> str:
    a, one_m_a = ALPHA, 1.0 - ALPHA
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "outdeg AS (SELECT src AS v, count(*) AS od FROM edges GROUP BY src)",
        "vt AS MATERIALIZED (SELECT u.v, coalesce(o.od, 0) AS od "
        "FROM univ u LEFT JOIN outdeg o ON u.v = o.v)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM vt)",
        "r0 AS MATERIALIZED (SELECT v, od, 1.0/(SELECT n FROM nv) AS r FROM vt)",
    ]
    # phase 1: cold PageRank on the base graph (engine-identical arithmetic)
    for k in range(1, PR_ITERS + 1):
        p = f"r{k-1}"
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT b.v, b.od, "
            f"((SELECT sum(CASE WHEN od = 0 THEN r ELSE 0 END) FROM {p}) * {a} + {one_m_a})"
            f" / (SELECT n FROM nv) + {a} * coalesce(m.s, 0.0) AS r "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, sum(p.r / p.od) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )
    # the delta-applied graph + warm-start state s0 (nstart normalized by its
    # sum over the NEW universe, missing vertices = 0 — pagerank.py nstart)
    parts += [
        f"edges2 AS MATERIALIZED (SELECT src, dst FROM edges "
        f"WHERE NOT ({DELTA_REMOVE_SQL}) UNION {DELTA_ADD_SQL})",
        "univ2 AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges2))) AS v)",
        "outdeg2 AS (SELECT src AS v, count(*) AS od FROM edges2 GROUP BY src)",
        "vt2 AS MATERIALIZED (SELECT u.v, coalesce(o.od, 0) AS od "
        "FROM univ2 u LEFT JOIN outdeg2 o ON u.v = o.v)",
        "nv2 AS MATERIALIZED (SELECT count(*) AS n FROM vt2)",
        f"nsum AS MATERIALIZED (SELECT sum(r) AS s FROM r{PR_ITERS})",
        f"s0 AS MATERIALIZED (SELECT t.v, t.od, "
        f"coalesce(p.r, 0.0) / (SELECT s FROM nsum) AS r "
        f"FROM vt2 t LEFT JOIN r{PR_ITERS} p ON t.v = p.v)",
    ]
    # phase 2: warm-restart supersteps on the delta-applied graph
    for k in range(1, INCR_ITERS + 1):
        p = f"s{k-1}"
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT b.v, b.od, "
            f"((SELECT sum(CASE WHEN od = 0 THEN r ELSE 0 END) FROM {p}) * {a} + {one_m_a})"
            f" / (SELECT n FROM nv2) + {a} * coalesce(m.s, 0.0) AS r "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, sum(p.r / p.od) AS s "
            f"FROM edges2 e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(r * 1e7) AS BIGINT) AS pr_e7 FROM s{INCR_ITERS}"
    )


ORACLES["incr_pagerank"] = _incr_pagerank_oracle()
QUERIES["incr_pagerank"] = q_incr_pagerank


# ---------------------------------------------------------------------------
# incremental WCC after an additions-only recrawl delta
# ---------------------------------------------------------------------------

WCC_ADD_SQL = (
    "SELECT DISTINCT l_orderkey % 1000 AS src, 2000 + (l_suppkey % 37) AS dst "
    "FROM lineitem"
)


def q_incr_wcc(spark, sf_dir):
    """Incremental connectivity: WCC on the base link graph, an
    additions-only delta (37 new hub vertices each linking many order
    vertices — merges components), then ``incremental_wcc``: the delta is
    contracted to the label-quotient graph (≤ one vertex per touched
    component), the superstep loop runs on THAT delta-sized graph, and one
    V-row remap join produces the new labeling — the edge table is never
    shuffled again. The oracle recomputes WCC of the updated graph COLD
    (unique canonical fixpoint), so any quotient/remap error diverges."""
    from .algorithms.wcc import incremental_wcc
    from .structure.delta import apply_edge_delta

    base = Graph.from_edgelist(
        link_edges(spark, sf_dir), directed=False, renumber=False
    )
    labels0 = weakly_connected_components(base)
    li = _lineitem(spark, sf_dir)
    adds = li.select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.lit(2000) + F.col("l_suppkey") % 37).alias("dst"),
    ).distinct()
    g2 = apply_edge_delta(base, adds)  # additions only, +1 presence each
    return incremental_wcc(g2, labels0, adds).select("vertex", "labels")


def _incr_wcc_oracle() -> str:
    K = WCC_ORACLE_ROUNDS
    parts = [
        f"WITH base AS MATERIALIZED ({LINK_EDGES_SQL})",
        f"edges AS MATERIALIZED (SELECT src, dst FROM base UNION {WCC_ADD_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges))",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "l0 AS MATERIALIZED (SELECT v, v AS l FROM univ)",
    ]
    for k in range(1, K + 1):
        p = f"l{k-1}"
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT b.v, least(b.l, coalesce(m.ml, b.l)) AS l "
            f"FROM {p} b LEFT JOIN (SELECT s.dst AS v, min(p.l) AS ml "
            f"FROM sym s JOIN {p} p ON s.src = p.v GROUP BY s.dst) m ON b.v = m.v)"
        )
    # loud fixpoint guard (ADVICE r2 style): if the last unrolled round still
    # changed a label, fail the oracle instead of comparing truncated output
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CASE WHEN (SELECT count(*) FROM l{K} a "
        f"JOIN l{K-1} b ON a.v = b.v AND a.l <> b.l) > 0 "
        f"THEN CAST(error('incr_wcc oracle truncated: raise WCC_ORACLE_ROUNDS') AS BIGINT) "
        f"ELSE l END AS labels FROM l{K}"
    )


ORACLES["incr_wcc"] = _incr_wcc_oracle()
QUERIES["incr_wcc"] = q_incr_wcc


# ---------------------------------------------------------------------------
# Round-3 training-pipeline queries: PII redaction, decontamination,
# stratified sampling, shard export planning (text/pipeline.py)
# ---------------------------------------------------------------------------

def _pii_augmented(spark, sf_dir):
    """Documents with deterministic PII planted (the synthetic corpus has
    none): email on doc_id%3, phone on %5, ipv4 on %7 — both engines build
    the identical augmented text, so redaction is exercised for real."""
    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" mail bob"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-867-5309 soon")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" from 10.0.0.77 today")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


def q_doc_pii_redact(spark, sf_dir):
    """Map-only PII scrub: per-kind counts on the raw text + md5 of the
    redacted text (the hash pins the full replacement byte stream)."""
    from .text.pipeline import pii_redact

    out = pii_redact(_pii_augmented(spark, sf_dir))
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ipv4", F.md5("redacted").alias("red_md5")
    )


def q_doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination (word-8-gram overlap, GPT-3 appendix-C
    protocol shape): benchmark = doc_id % 97 == 0 slice of the corpus."""
    from .text.pipeline import decontaminate

    d = _documents(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(d, bench, n=8)


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 0.1}
SAMPLE_DEFAULT = 0.05
_THR = {k: int(v * 2**31) for k, v in SAMPLE_RATES.items()}
_THR_DEFAULT = int(SAMPLE_DEFAULT * 2**31)


def q_doc_sample_strata(spark, sf_dir):
    """Deterministic training-mix sample: keep 50% en / 25% de / 10% zh /
    5% rest by a 31-bit LCG keep-predicate on doc_id (map-only filter)."""
    from .text.pipeline import stratified_sample

    d = _documents(spark, sf_dir)
    return stratified_sample(
        d, SAMPLE_RATES, strata_col="lang", key_col="doc_id",
        default_rate=SAMPLE_DEFAULT,
    ).select("doc_id", "lang")


def q_doc_shards(spark, sf_dir):
    """Training-shard export manifest: 8 LCG-assigned shards with per-shard
    row count / byte total / key range (the balance check run before paying
    the placement shuffle of write_shards)."""
    from .text.pipeline import shard_plan

    d = _documents(spark, sf_dir)
    return shard_plan(d, 8, key_col="doc_id", size_col="n_chars").select(
        "shard",
        "n_docs",
        "bytes",
        "min_key",
        "max_key",
    )


_PII_AUG_SQL = """
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' mail bob' || CAST(doc_id AS VARCHAR) || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309 soon' ELSE '' END
               || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.0.77 today' ELSE '' END
               AS text
        FROM documents
"""

ORACLES["doc_pii_redact"] = f"""
    WITH aug AS MATERIALIZED ({_PII_AUG_SQL})
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
                '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           md5(regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                       '<PII:email>', 'g'),
                   '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PII:phone>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
               '<PII:ipv4>', 'g')) AS red_md5
    FROM aug
"""

ORACLES["doc_decontaminate"] = """
    WITH dw AS MATERIALIZED (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    di AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 1))) AS i
           FROM dw),
    dsh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS shingle FROM di),
    bsh AS MATERIALIZED (
        SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0),
    hits AS (SELECT d.doc_id, count(*) AS n
             FROM dsh d JOIN bsh b ON d.shingle = b.shingle GROUP BY d.doc_id)
    SELECT doc.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
           CAST(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM documents doc LEFT JOIN hits h ON doc.doc_id = h.doc_id
"""

ORACLES["doc_sample_strata"] = f"""
    SELECT doc_id, lang FROM documents
    WHERE (doc_id * 1103515245 + 12345) % 2147483648 <
          CASE lang
               WHEN 'en' THEN {_THR["en"]}
               WHEN 'de' THEN {_THR["de"]}
               WHEN 'zh' THEN {_THR["zh"]}
               ELSE {_THR_DEFAULT} END
"""

ORACLES["doc_shards"] = """
    SELECT (doc_id * 1103515245 + 12345) % 2147483648 % 8 AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS bytes,
           min(doc_id) AS min_key,
           max(doc_id) AS max_key
    FROM documents
    GROUP BY 1
"""

QUERIES["doc_pii_redact"] = q_doc_pii_redact
QUERIES["doc_decontaminate"] = q_doc_decontaminate
QUERIES["doc_sample_strata"] = q_doc_sample_strata
QUERIES["doc_shards"] = q_doc_shards


# ---------------------------------------------------------------------------
# batched personalized PageRank (random-walk-with-restart) + span dedup
# ---------------------------------------------------------------------------

PPR_SEEDS = [0, 17, 42, 101, 256]
PPR_ITERS = 10
SPAN_W = 8


def q_ppr(spark, sf_dir):
    """Batched personalized PageRank: one restart-to-seed vector per seed in
    a single long-format DataFrame program (algorithms/ppr.py). Only reached
    vertices carry rows, so row set AND values are checked."""
    from .algorithms.ppr import batched_personalized_pagerank

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    res = batched_personalized_pagerank(
        g, PPR_SEEDS, alpha=ALPHA, iterations=PPR_ITERS
    )
    return res.select(
        "seed", "vertex", F.round(F.col("ppr") * 1e7).cast("long").alias("ppr_e7")
    )


def _ppr_oracle() -> str:
    """Iteration-unrolled restart-to-seed replay: per superstep one message
    aggregation (a * r / outdeg) plus a per-seed restart row holding the
    non-propagated mass (1 - sum of that superstep's messages)."""
    a = ALPHA
    seeds = ", ".join(str(s) for s in PPR_SEEDS)
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        "od AS MATERIALIZED (SELECT src AS v, count(*) AS od FROM edges GROUP BY src)",
        f"seeds AS MATERIALIZED (SELECT unnest([{seeds}]) AS seed)",
        "r0 AS MATERIALIZED (SELECT seed, seed AS v, 1.0 AS r FROM seeds)",
    ]
    for k in range(1, PPR_ITERS + 1):
        p = f"r{k-1}"
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT p.seed, e.dst AS v, "
            f"sum({a} * p.r / od.od) AS r "
            f"FROM edges e JOIN {p} p ON e.src = p.v JOIN od ON od.v = e.src "
            f"GROUP BY p.seed, e.dst)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT seed, v, sum(r) AS r FROM ("
            f"SELECT seed, v, r FROM m{k} UNION ALL "
            f"SELECT s.seed, s.seed AS v, 1.0 - coalesce(t.s, 0.0) AS r "
            f"FROM seeds s LEFT JOIN (SELECT seed, sum(r) AS s FROM m{k} "
            f"GROUP BY seed) t ON s.seed = t.seed) GROUP BY seed, v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT seed, v AS vertex, CAST(round(r * 1e7) AS BIGINT) AS ppr_e7"
        f" FROM r{PPR_ITERS}"
    )


def q_doc_span_dedup(spark, sf_dir):
    """Exact duplicate-span removal (ExactSubstr, Lee et al. 2021) at word
    granularity: every non-canonical occurrence of a corpus-duplicated
    8-token span is cut and documents reassembled (text/dedup.py)."""
    from .text.dedup import span_dedup

    d = _documents(spark, sf_dir)
    out = span_dedup(d, text_col="text", id_col="doc_id", w=SPAN_W)
    return out.select(
        "doc_id",
        F.md5("text_dedup").alias("dedup_md5"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


ORACLES["ppr"] = _ppr_oracle()

ORACLES["doc_span_dedup"] = f"""
    WITH dw AS MATERIALIZED (
        SELECT doc_id AS doc, string_split(trim(text), ' ') AS w FROM documents),
    tok AS MATERIALIZED (
        SELECT doc, n, pos, w[pos] AS tok FROM (
            SELECT doc, len(w) AS n, w,
                   unnest(generate_series(1, len(w))) AS pos FROM dw)),
    occ AS MATERIALIZED (
        SELECT doc, i, array_to_string(w[i:i+{SPAN_W - 1}], ' ') AS span FROM (
            SELECT doc, w, unnest(generate_series(1, len(w) - {SPAN_W - 1})) AS i
            FROM dw WHERE len(w) >= {SPAN_W})),
    nc AS (SELECT doc, i FROM (
        SELECT doc, i,
               row_number() OVER (PARTITION BY span ORDER BY doc, i) AS rn
        FROM occ) WHERE rn > 1),
    cov AS MATERIALIZED (SELECT DISTINCT doc, pos FROM (
        SELECT doc, unnest(generate_series(i, i + {SPAN_W - 1})) AS pos FROM nc)),
    surv AS (SELECT t.doc, t.pos, t.tok FROM tok t
             LEFT JOIN cov c ON t.doc = c.doc AND t.pos = c.pos
             WHERE c.doc IS NULL),
    reb AS (SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS txt,
                   count(*) AS kept FROM surv GROUP BY doc)
    SELECT d.doc_id,
           md5(coalesce(r.txt, '')) AS dedup_md5,
           CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split(trim(d.text), ' ')) - coalesce(r.kept, 0) AS BIGINT)
               AS n_removed
    FROM documents d LEFT JOIN reb r ON d.doc_id = r.doc
"""

QUERIES["ppr"] = q_ppr
QUERIES["doc_span_dedup"] = q_doc_span_dedup


# ---------------------------------------------------------------------------
# distributed k-means + SemDeDup (similarity.py) — EXACT integer replay:
# quantized vectors, integer dots, and centroid re-quantization whose only
# float ops (sqrt of an exact integer, one division, one round) are
# correctly-rounded doubles in both engines — bit-identical assignments.
# ---------------------------------------------------------------------------

KM_K = 8
KM_ITERS = 4
KM_SCALE = 1000
KM_DIM = 64
SEM_TAU_NUM, SEM_TAU_DEN = 2, 5  # cosine >= 0.4 (same tau as emb_near_dup)


def _kmeans_cte(k: int, iters: int) -> str:
    """Shared CTE chain ending in af(id, c, dot) — the final assignment
    against cent{iters} plus the integer dot to the assigned centroid."""
    lcg = "(id * 1103515245 + 12345) % 2147483648"
    parts = [
        "qv AS MATERIALIZED (SELECT vec_id AS id, t.i AS i, "
        f"CAST(round(CAST(embedding[t.i] AS DOUBLE) * {KM_SCALE}) AS BIGINT) AS q "
        f"FROM embeddings, generate_series(1, {KM_DIM}) AS t(i))",
        "inorm AS MATERIALIZED (SELECT id, sqrt(sum(q*q)) AS nrm FROM qv GROUP BY id)",
        f"seeds AS MATERIALIZED (SELECT id, row_number() OVER (ORDER BY {lcg}, id) - 1 AS c "
        f"FROM (SELECT DISTINCT id FROM qv) ORDER BY {lcg}, id LIMIT {k})",
        f"cent0 AS MATERIALIZED (SELECT s.c, q.i, "
        f"CAST(round({KM_SCALE} * q.q / n.nrm) AS BIGINT) AS q "
        "FROM seeds s JOIN qv q ON q.id = s.id JOIN inorm n ON n.id = s.id)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT id, c FROM ("
            f"SELECT q.id, ct.c, row_number() OVER (PARTITION BY q.id "
            f"ORDER BY sum(q.q * ct.q) DESC, ct.c ASC) AS rn "
            f"FROM qv q JOIN cent{t-1} ct ON ct.i = q.i GROUP BY q.id, ct.c) "
            f"WHERE rn = 1)"
        )
        parts.append(
            f"su{t} AS MATERIALIZED (SELECT a.c, q.i, sum(q.q) AS s "
            f"FROM a{t} a JOIN qv q ON q.id = a.id GROUP BY a.c, q.i)"
        )
        parts.append(f"nm{t} AS (SELECT c, sqrt(sum(s*s)) AS nrm FROM su{t} GROUP BY c)")
        parts.append(
            f"cent{t} AS MATERIALIZED (SELECT p.c, p.i, "
            f"CASE WHEN su.s IS NULL OR nm.nrm = 0 THEN p.q "
            f"ELSE CAST(round({KM_SCALE} * su.s / nm.nrm) AS BIGINT) END AS q "
            f"FROM cent{t-1} p LEFT JOIN su{t} su ON su.c = p.c AND su.i = p.i "
            f"LEFT JOIN nm{t} nm ON nm.c = p.c)"
        )
    parts.append(
        f"af AS MATERIALIZED (SELECT id, c, dot FROM ("
        f"SELECT q.id, ct.c, sum(q.q * ct.q) AS dot, "
        f"row_number() OVER (PARTITION BY q.id "
        f"ORDER BY sum(q.q * ct.q) DESC, ct.c ASC) AS rn "
        f"FROM qv q JOIN cent{iters} ct ON ct.i = q.i GROUP BY q.id, ct.c) "
        f"WHERE rn = 1)"
    )
    return ",\n".join(parts)


def q_emb_kmeans(spark, sf_dir):
    """Distributed spherical k-means over quantized integer vectors
    (similarity.py kmeans_embeddings) — assignments are bit-exact
    replicable, so the oracle checks every cluster id."""
    from .similarity import kmeans_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_embeddings(emb, k=KM_K, iterations=KM_ITERS).select(
        "vec_id", F.col("cluster").cast("long").alias("cluster")
    )


def q_emb_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (similarity.py semantic_dedup): k-means
    clusters, within-cluster near-dup groups, keep-farthest-from-centroid."""
    from .similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(
        emb, threshold=SEM_TAU_NUM / SEM_TAU_DEN, k=KM_K, iterations=KM_ITERS
    )
    return out.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        F.col("keep").cast("int").alias("keep"),
    )


ORACLES["emb_kmeans"] = (
    "WITH "
    + _kmeans_cte(KM_K, KM_ITERS)
    + "\nSELECT id AS vec_id, CAST(c AS BIGINT) AS cluster FROM af"
)

ORACLES["emb_semdedup"] = (
    "WITH RECURSIVE "
    + _kmeans_cte(KM_K, KM_ITERS)
    + f""",
    n2 AS (SELECT id, sum(q*q) AS n2 FROM qv GROUP BY id),
    pq AS MATERIALIZED (
        SELECT x.id AS a_id, y.id AS b_id, sum(qa.q * qb.q) AS dot
        FROM af x JOIN af y ON x.c = y.c AND x.id < y.id
        JOIN qv qa ON qa.id = x.id JOIN qv qb ON qb.id = y.id AND qb.i = qa.i
        GROUP BY x.id, y.id),
    pr AS MATERIALIZED (
        SELECT p.a_id, p.b_id FROM pq p
        JOIN n2 x ON x.id = p.a_id JOIN n2 y ON y.id = p.b_id
        WHERE p.dot > 0
          AND {SEM_TAU_DEN * SEM_TAU_DEN} * p.dot * p.dot
              >= {SEM_TAU_NUM * SEM_TAU_NUM} * x.n2 * y.n2),
    sym AS (SELECT a_id AS u, b_id AS v FROM pr
            UNION SELECT b_id, a_id FROM pr),
    reach(u, v) AS (SELECT u, v FROM sym
                    UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    lbl AS (SELECT u AS id, least(u, min(v)) AS lbl FROM reach GROUP BY u),
    rep AS (SELECT lbl, id AS keep_id FROM (
        SELECT l.lbl, l.id, row_number() OVER (
            PARTITION BY l.lbl
            ORDER BY a.dot / sqrt(n.n2) ASC, l.id ASC) AS rn
        FROM lbl l JOIN af a ON a.id = l.id JOIN n2 n ON n.id = l.id)
        WHERE rn = 1)
    SELECT a.id AS vec_id, CAST(a.c AS BIGINT) AS cluster,
           CAST(CASE WHEN l.id IS NULL OR a.id = r.keep_id THEN 1 ELSE 0 END AS INT)
               AS keep
    FROM af a LEFT JOIN lbl l ON l.id = a.id LEFT JOIN rep r ON r.lbl = l.lbl
"""
)

QUERIES["emb_kmeans"] = q_emb_kmeans
QUERIES["emb_semdedup"] = q_emb_semdedup


def q_emb_proto(spark, sf_dir):
    """Prototypicality scores (similarity.py prototypicality_scores):
    cosine to the assigned k-means centroid. The double arithmetic is a
    fixed tree over exact integers (sqrt/mult/div — correctly rounded), so
    even the e6 quantization is bit-identical cross-engine."""
    from .similarity import prototypicality_scores

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = prototypicality_scores(emb, k=KM_K, iterations=KM_ITERS)
    return out.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        F.round(F.col("proto") * 1e6).cast("long").alias("proto_e6"),
    )


ORACLES["emb_proto"] = (
    "WITH "
    + _kmeans_cte(KM_K, KM_ITERS)
    + f""",
    n2 AS (SELECT id, sum(q*q) AS n2 FROM qv GROUP BY id),
    cn AS (SELECT c, sqrt(sum(q*q)) AS cn FROM cent{KM_ITERS} GROUP BY c)
    SELECT a.id AS vec_id, CAST(a.c AS BIGINT) AS cluster,
           CAST(round((a.dot / (sqrt(n2.n2) * cn.cn)) * 1000000.0) AS BIGINT)
               AS proto_e6
    FROM af a JOIN n2 ON n2.id = a.id JOIN cn ON cn.c = a.c
"""
)
QUERIES["emb_proto"] = q_emb_proto


# ---------------------------------------------------------------------------
# TrustRank — value-checks the personalized-PageRank code path end to end
# (pagerank.py's personalization/dangling handling, previously pytest-only)
# ---------------------------------------------------------------------------

TRUST_SEEDS = [0, 17, 42, 101, 256]
TRUST_ITERS = 12


def q_trustrank(spark, sf_dir):
    """TrustRank (algorithms/ppr.py trustrank): PageRank with restart biased
    to a trusted seed set over the supply graph."""
    from .algorithms.ppr import trustrank

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    tr = trustrank(g, TRUST_SEEDS, alpha=ALPHA, fixed_iterations=TRUST_ITERS)
    return tr.select(
        "vertex", F.round(F.col("trust") * 1e7).cast("long").alias("trust_e7")
    )


def _trustrank_oracle() -> str:
    """Personalized update, unrolled: r'(v) = (dangling_sum·α + (1−α))·p(v)
    + α·Σ r(u)/od(u); p uniform over the trusted seeds, r0 = 1/V."""
    a, one_m_a = ALPHA, 1.0 - ALPHA
    seeds = ", ".join(str(s) for s in TRUST_SEEDS)
    pshare = 1.0 / len(TRUST_SEEDS)
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "outdeg AS (SELECT src AS v, count(*) AS od FROM edges GROUP BY src)",
        f"vt AS MATERIALIZED (SELECT u.v, coalesce(o.od, 0) AS od, "
        f"CASE WHEN u.v IN ({seeds}) THEN {pshare!r} ELSE 0.0 END AS p "
        "FROM univ u LEFT JOIN outdeg o ON u.v = o.v)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM vt)",
        "r0 AS MATERIALIZED (SELECT v, od, p, 1.0/(SELECT n FROM nv) AS r FROM vt)",
    ]
    for k in range(1, TRUST_ITERS + 1):
        pr = f"r{k-1}"
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT b.v, b.od, b.p, "
            f"((SELECT sum(CASE WHEN od = 0 THEN r ELSE 0 END) FROM {pr}) * {a} "
            f"+ {one_m_a}) * b.p + {a} * coalesce(m.s, 0.0) AS r "
            f"FROM {pr} b LEFT JOIN (SELECT e.dst AS v, sum(p2.r / p2.od) AS s "
            f"FROM edges e JOIN {pr} p2 ON e.src = p2.v GROUP BY e.dst) m "
            f"ON b.v = m.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(r * 1e7) AS BIGINT) AS trust_e7"
        f" FROM r{TRUST_ITERS}"
    )


ORACLES["trustrank"] = _trustrank_oracle()
QUERIES["trustrank"] = q_trustrank


# ---------------------------------------------------------------------------
# edge betweenness — same unrolled Brandes oracle as the green `betweenness`
# row, keyed by edge (reference centrality/betweenness_centrality.py:188-288)
# ---------------------------------------------------------------------------


def q_edge_betweenness(spark, sf_dir):
    """Sampled-source edge Brandes (algorithms/betweenness.py
    edge_betweenness_centrality) with the same deterministic source list as
    the vertex row; per-edge dependencies are exactly the inner terms of the
    vertex oracle's reverse pass, so the SQL replay shares its scaffold."""
    from .algorithms.betweenness import edge_betweenness_centrality

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    sources = [r.vertex for r in g.vertices().collect() if r.vertex % BC_SOURCE_MOD == 0]
    return edge_betweenness_centrality(g, k=sorted(sources)).select(
        "src",
        "dst",
        F.round(F.col("betweenness_centrality") * 1e5).cast("long").alias("ebc_e5"),
    )


def _edge_betweenness_oracle() -> str:
    L = BC_LEVELS
    parts = _brandes_scaffold(L)
    # per-(source, DAG-edge) dependency: for u at level i preceding w at
    # level i+1, c = sig(u)/sig(w) * (1 + delta(w)) — the exact inner term
    # the vertex oracle groups by u; here it stays keyed by the edge.
    for i in range(L):
        parts.append(
            f"ec{i} AS MATERIALIZED (SELECT dw.s, e.src AS u, dw.v AS w, "
            f"sv.sig / sw.sig * (1 + dw.delta) AS c "
            f"FROM del{i + 1} dw "
            f"JOIN sig sw ON sw.s = dw.s AND sw.v = dw.v "
            f"JOIN sym e ON e.dst = dw.v "
            f"JOIN dist dp ON dp.s = dw.s AND dp.v = e.src AND dp.d = {i} "
            f"JOIN sig sv ON sv.s = dw.s AND sv.v = e.src),"
        )
    parts.append(
        "allec AS ("
        + " UNION ALL ".join(f"SELECT * FROM ec{i}" for i in range(L))
        + "),"
    )
    parts.append(
        "ebc AS (SELECT least(u, w) AS src, greatest(u, w) AS dst, sum(c) AS bc"
        " FROM allec GROUP BY 1, 2),"
        "base AS (SELECT src, dst FROM sym WHERE src <= dst),"
        "nn AS (SELECT count(*) AS n FROM verts),"
        f"kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM verts"
        f" WHERE v % {BC_SOURCE_MOD} = 0),"
        # same loud truncation guard as the vertex oracle
        f"chk AS (SELECT count(*) AS extra FROM dist p "
        f"JOIN sym e ON e.src = p.v AND p.d = {L} "
        f"LEFT JOIN dist x ON x.s = p.s AND x.v = e.dst WHERE x.v IS NULL) "
        # engine scale for undirected+normalized+sampled edge variant:
        # 1/(n(n-1)) * n/k  (NetworkX _rescale_e)
        "SELECT b.src, b.dst, "
        "CASE WHEN (SELECT extra FROM chk) > 0 "
        "THEN CAST(error('BC oracle truncated: raise BC_LEVELS') AS BIGINT) "
        "ELSE CAST(round(coalesce(e.bc, 0) / (nn.n * (nn.n - 1)) * (nn.n / kk.k)"
        " * 100000) AS BIGINT) END AS ebc_e5 "
        "FROM base b CROSS JOIN nn CROSS JOIN kk "
        "LEFT JOIN ebc e ON e.src = b.src AND e.dst = b.dst"
    )
    return "\n".join(parts)


QUERIES["edge_betweenness"] = q_edge_betweenness
ORACLES["edge_betweenness"] = _edge_betweenness_oracle()


# ---------------------------------------------------------------------------
# hungarian / linear assignment — integer costs make the ε-auction EXACTLY
# optimal (ε < 1/(n+1), Bertsekas bound), so the oracle brute-forces the
# optimum total with a bitmask DP over the fixed 8x10 bipartite instance
# (reference linear_assignment/lap.py:18-133)
# ---------------------------------------------------------------------------

LAP_W, LAP_J = 8, 10  # workers 0..7, jobs 100..109 (complete bipartite)
LAP_COST = "1 + ({w} * 41 + {j} * 17) % 59"  # deterministic integer costs


def q_hungarian(spark, sf_dir):
    """Distributed auction LAP (algorithms/assignment.py hungarian) on a
    complete bipartite instance built from the nation table; emits the
    matching summary (size, distinct jobs, exact total cost) that the
    DuckDB bitmask-DP oracle recomputes from scratch."""
    from .algorithms.assignment import hungarian

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    w = nat.filter(F.col("k") < LAP_W).select(F.col("k").alias("w"))
    j = nat.filter(F.col("k") < LAP_J).select(F.col("k").alias("jk"))
    cost = F.expr(LAP_COST.format(w="w", j="jk")).cast("double")
    pairs = w.crossJoin(j).select(
        F.col("w").alias("src"),
        (F.lit(100) + F.col("jk")).alias("dst"),
        cost.alias("weight"),
    )
    g = Graph.from_edgelist(pairs, weight="weight", directed=True, renumber=False)
    total, asg = hungarian(g, list(range(LAP_W)))
    n_matched = asg.count()
    n_jobs = asg.select("assignment").distinct().count()
    return spark.createDataFrame(
        [(int(n_matched), int(n_jobs), int(round(total)))],
        "n_matched LONG, n_jobs LONG, total_cost LONG",
    )


ORACLES["hungarian"] = f"""
    WITH RECURSIVE ws AS (SELECT CAST(n_nationkey AS BIGINT) AS w FROM nation
                          WHERE n_nationkey < {LAP_W}),
    js AS (SELECT CAST(n_nationkey AS BIGINT) AS jk FROM nation
           WHERE n_nationkey < {LAP_J}),
    pairs AS (SELECT ws.w, js.jk, {LAP_COST.format(w="ws.w", j="js.jk")} AS cost
              FROM ws, js),
    -- bitmask DP over workers 0..{LAP_W - 1} in id order: state = (next
    -- worker, used-jobs mask, running total); optimum = min total at step n
    rec(step, mask, total) AS (
        SELECT 0, 0, 0
        UNION ALL
        SELECT r.step + 1, r.mask | (1 << CAST(p.jk AS INT)), r.total + p.cost
        FROM rec r JOIN pairs p
          ON p.w = r.step AND (r.mask & (1 << CAST(p.jk AS INT))) = 0
        WHERE r.step < {LAP_W})
    SELECT CAST({LAP_W} AS BIGINT) AS n_matched,
           CAST({LAP_W} AS BIGINT) AS n_jobs,
           CAST(min(total) AS BIGINT) AS total_cost
    FROM rec WHERE step = {LAP_W}
"""
QUERIES["hungarian"] = q_hungarian


# ---------------------------------------------------------------------------
# Force Atlas 2 — ONE seeded iteration with exact repulsion and explicit LCG
# initial positions is fully SQL-replicable (every force is a fixed double
# expression; e3 quantization absorbs summation-order ulps), so the oracle
# replays the whole update instead of settling for bounds-only invariants
# (reference layout/force_atlas2.py:18-149)
# ---------------------------------------------------------------------------

FA2_POS_X = "((v * 1103515245 + 12345) % 100000) / 50000.0 - 1.0"
FA2_POS_Y = "((v * 69069 + 1) % 100000) / 50000.0 - 1.0"


def q_force_atlas2(spark, sf_dir):
    """One FA2 iteration (layout.py force_atlas2) on the supply graph:
    LCG-seeded positions, exact O(V^2) repulsion, strong gravity, no
    outbound-attraction scaling — every per-vertex displacement replayed
    bit-for-bit(-ish; e3 quantized) by the DuckDB oracle."""
    from .layout import force_atlas2

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    pos0 = g.vertices().select(
        "vertex",
        F.expr(FA2_POS_X.replace("v", "vertex")).alias("x"),
        F.expr(FA2_POS_Y.replace("v", "vertex")).alias("y"),
    )
    out = force_atlas2(
        g,
        max_iter=1,
        pos_list=pos0,
        outbound_attraction_distribution=False,
        barnes_hut_optimize=False,
        strong_gravity_mode=True,
        gravity=1.0,
        scaling_ratio=2.0,
        jitter_tolerance=1.0,
    )
    return out.select(
        "vertex",
        F.round(F.col("x") * 1e3).cast("long").alias("x_e3"),
        F.round(F.col("y") * 1e3).cast("long").alias("y_e3"),
    )


ORACLES["force_atlas2"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
    univ AS (SELECT unnest(generate_series(0,
        (SELECT max(greatest(src, dst)) FROM raw))) AS v),
    deg AS (SELECT src AS v, count(*) AS dg FROM sym GROUP BY src),
    pos AS MATERIALIZED (SELECT u.v,
        {FA2_POS_X.replace("v", "u.v")} AS x,
        {FA2_POS_Y.replace("v", "u.v")} AS y,
        coalesce(d.dg, 0) + 1.0 AS m
        FROM univ u LEFT JOIN deg d ON d.v = u.v),
    att AS (SELECT e.src AS v, sum(pd.x - ps.x) AS ax, sum(pd.y - ps.y) AS ay
            FROM sym e JOIN pos ps ON ps.v = e.src JOIN pos pd ON pd.v = e.dst
            GROUP BY e.src),
    rep AS (SELECT a.v,
        sum(2.0 * a.m * b.m /
            power(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) + 1e-9, 2)
            * (a.x - b.x)) AS rx,
        sum(2.0 * a.m * b.m /
            power(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) + 1e-9, 2)
            * (a.y - b.y)) AS ry
        FROM pos a JOIN pos b ON a.v <> b.v GROUP BY a.v),
    force AS MATERIALIZED (SELECT p.v, p.m, p.x, p.y,
        coalesce(a.ax, 0) + coalesce(r.rx, 0)
            - 1.0 * p.m * p.x / (sqrt(p.x*p.x + p.y*p.y) + 1e-9) AS dx,
        coalesce(a.ay, 0) + coalesce(r.ry, 0)
            - 1.0 * p.m * p.y / (sqrt(p.x*p.x + p.y*p.y) + 1e-9) AS dy
        FROM pos p LEFT JOIN att a ON a.v = p.v LEFT JOIN rep r ON r.v = p.v),
    sw AS (SELECT sum(m * sqrt(dx*dx + dy*dy)) AS swing,
                  sum(m * sqrt(dx*dx + dy*dy) / 2.0) AS traction FROM force),
    sp AS (SELECT least(1.0 * 1.0 * traction / (1.0 + swing), 1.5) AS speed,
                  swing, traction FROM sw),
    spe AS (SELECT speed / (1.0 + sqrt(speed * swing / greatest(traction, 1e-9)))
            AS se FROM sp)
    SELECT f.v AS vertex,
           CAST(round((f.x + (SELECT se FROM spe) * f.dx
                 / (1.0 + sqrt(f.dx*f.dx + f.dy*f.dy))) * 1000) AS BIGINT) AS x_e3,
           CAST(round((f.y + (SELECT se FROM spe) * f.dy
                 / (1.0 + sqrt(f.dx*f.dx + f.dy*f.dy))) * 1000) AS BIGINT) AS y_e3
    FROM force f
"""
QUERIES["force_atlas2"] = q_force_atlas2


# --- canonical-URL dedup (text/urls.py) -------------------------------------
# The documents table has no url column, so the query synthesizes a messy
# url per doc deterministically (five variant shapes keyed on doc_id % 5 —
# casing, www, default port, tracking params, fragment, trailing slash,
# param order) with the IDENTICAL expression in both engines; what the
# oracle then actually checks is the canonicalization rule set itself plus
# the keep-min grouping.


def _messy_url_col() -> F.Column:
    k = F.pmod(F.col("doc_id"), F.lit(100)).cast("string")
    host = F.concat(F.lit("site"), k, F.lit(".example.com"))
    path = F.concat(F.lit("/doc/"), k)
    v = F.pmod(F.col("doc_id"), F.lit(5))
    return (
        F.when(v == 0, F.concat(F.lit("https://"), host, path))
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://WWW."),
                F.upper(host),
                F.lit(":443"),
                path,
                F.lit("/"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), host, path, F.lit("?utm_source=feed&ref=rss")
            ),
        )
        .when(
            v == 3,
            F.concat(F.lit("https://"), host, F.lit(":443"), path, F.lit("#sec2")),
        )
        .otherwise(F.concat(F.lit("https://"), host, path, F.lit("?b=2&a=1")))
    )


_MESSY_URL_SQL = """
    CASE CAST(doc_id % 5 AS BIGINT)
      WHEN 0 THEN 'https://site' || CAST(doc_id % 100 AS VARCHAR)
                  || '.example.com/doc/' || CAST(doc_id % 100 AS VARCHAR)
      WHEN 1 THEN 'HTTPS://WWW.' || upper('site' || CAST(doc_id % 100 AS VARCHAR)
                  || '.example.com') || ':443/doc/'
                  || CAST(doc_id % 100 AS VARCHAR) || '/'
      WHEN 2 THEN 'https://site' || CAST(doc_id % 100 AS VARCHAR)
                  || '.example.com/doc/' || CAST(doc_id % 100 AS VARCHAR)
                  || '?utm_source=feed&ref=rss'
      WHEN 3 THEN 'https://site' || CAST(doc_id % 100 AS VARCHAR)
                  || '.example.com:443/doc/' || CAST(doc_id % 100 AS VARCHAR)
                  || '#sec2'
      ELSE 'https://site' || CAST(doc_id % 100 AS VARCHAR)
           || '.example.com/doc/' || CAST(doc_id % 100 AS VARCHAR) || '?b=2&a=1'
    END
"""


def q_doc_url_dedup(spark, sf_dir):
    from .text.urls import url_dedup

    d = _documents(spark, sf_dir).select("doc_id", _messy_url_col().alias("url"))
    return url_dedup(d, url_col="url", id_col="doc_id").select(
        "doc_id", "canonical_url", "is_canonical"
    )


def _url_dedup_oracle() -> str:
    from .text.urls import canonicalize_url_sql

    canon = canonicalize_url_sql("url")
    return f"""
    WITH urls AS (
        SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents
    ),
    canon AS (SELECT doc_id, {canon} AS canonical_url FROM urls),
    keep AS (SELECT canonical_url, min(doc_id) AS keep_id
             FROM canon GROUP BY canonical_url)
    SELECT c.doc_id, c.canonical_url,
           (c.doc_id = k.keep_id) AS is_canonical
    FROM canon c JOIN keep k USING (canonical_url)
    """


QUERIES["doc_url_dedup"] = q_doc_url_dedup
ORACLES["doc_url_dedup"] = _url_dedup_oracle()


# --- per-vertex triangles + local clustering coefficient --------------------
# Beyond-reference (the fork's triangles() is a global scalar,
# community/triangle_count.py:33-37); same degree-ordered oriented plan,
# inner closing join, corner explode. cc is emitted as the exact integer
# floor((2e6*t) / (d*(d-1))) so the compare never touches a float.


def q_clustering_coeff(spark, sf_dir):
    from .algorithms.triangles import clustering_coefficient

    g = Graph.from_edgelist(
        supply_edges(spark, sf_dir), directed=False, renumber=False
    )
    r = clustering_coefficient(g)
    denom = F.col("nbr_degree") * (F.col("nbr_degree") - F.lit(1))
    return r.select(
        "vertex",
        "triangles",
        "nbr_degree",
        F.when(
            denom > 0,
            F.expr("2000000 * triangles div (nbr_degree * (nbr_degree - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cc_e6"),
    )


ORACLES["clustering_coeff"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)
            WHERE src <> dst),
    deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
    orient AS (SELECT e.src, e.dst FROM sym e
               JOIN deg a ON e.src = a.v JOIN deg b ON e.dst = b.v
               WHERE a.d < b.d OR (a.d = b.d AND e.src < e.dst)),
    tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
            FROM orient e1 JOIN orient e2 ON e1.dst = e2.src
            JOIN orient e3 ON e1.src = e3.src AND e2.dst = e3.dst),
    corners AS (SELECT x AS vertex, count(*) AS t FROM (
                    SELECT u AS x FROM tri UNION ALL
                    SELECT v AS x FROM tri UNION ALL
                    SELECT w AS x FROM tri) GROUP BY x),
    univ AS (SELECT unnest(generate_series(0, (SELECT max(greatest(src, dst)) FROM raw))) AS vertex)
    SELECT univ.vertex,
           coalesce(c.t, 0) AS triangles,
           coalesce(deg.d, 0) AS nbr_degree,
           CASE WHEN coalesce(deg.d, 0) > 1
                THEN (2000000 * coalesce(c.t, 0)) // (deg.d * (deg.d - 1))
                ELSE 0 END AS cc_e6
    FROM univ LEFT JOIN corners c ON univ.vertex = c.vertex
              LEFT JOIN deg ON univ.vertex = deg.v
"""
QUERIES["clustering_coeff"] = q_clustering_coeff


# --- bloom-tier decontamination ----------------------------------------------
# Same output contract as doc_decontaminate (the bloom prefilter is followed
# by an exact-confirm join, so false positives never reach the output) —
# the oracle is therefore the identical SQL. What this row adds is a driver
# value check of the whole bloom path: bitmap build, packed-word gather,
# survivor confirm.


def q_doc_decontaminate_bloom(spark, sf_dir):
    from .text.pipeline import bloom_decontaminate

    d = _documents(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return bloom_decontaminate(d, bench, n=8)


QUERIES["doc_decontaminate_bloom"] = q_doc_decontaminate_bloom
ORACLES["doc_decontaminate_bloom"] = ORACLES["doc_decontaminate"]


# --- HyperBall harmonic centrality -------------------------------------------
# Boldi-Vigna harmonic centrality over FM reachability sketches
# (algorithms/anf.py harmonic_centrality, mode="in": vertices that REACH v,
# each weighted 1/d). In lcg hash mode every register mask, per-vertex
# register-position sum, scaled-integer ball estimate, and 1/t-weighted
# accumulation is exact BIGINT arithmetic — the oracle replays the whole
# computation value-for-value (same sketch replay as the `anf` row, plus
# the ball/weight fold).


def q_harmonic(spark, sf_dir):
    from .algorithms.anf import harmonic_centrality

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    out = harmonic_centrality(
        g, max_hops=ANF_HOPS, num_registers=ANF_REGS, seed=ANF_SEED,
        hash_mode="lcg", mode="in",
    )
    return out.select("vertex", "harmonic_e")


def _harmonic_oracle(select: str = "harmonic") -> str:
    from .algorithms.anf import (
        LCG_A, LCG_C, LCG_J, LCG_M, LCG_TZ_CAP, harm_weight, pow2_frac_table,
    )

    r = ANF_REGS
    mask31 = LCG_M - 1
    frac = "[" + ", ".join(str(v) for v in pow2_frac_table(r)) + "]"
    # mode="in": the engine reverses the edges before the gather
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT dst AS src, src AS dst "
        f"FROM ({SUPPLY_EDGES_SQL}))",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        f"regs AS (SELECT unnest(generate_series(0, {r - 1})) AS j)",
        f"h0 AS (SELECT v, j, (({LCG_A} * (v + j * {LCG_J} + {ANF_SEED}) "
        f"+ {LCG_C}) % {LCG_M}) AS h FROM univ CROSS JOIN regs)",
        f"h1 AS (SELECT v, j, xor(h, (h << 13) & {mask31}) AS h FROM h0)",
        "h2 AS (SELECT v, j, xor(h, h >> 17) AS h FROM h1)",
        f"h3 AS (SELECT v, j, xor(h, (h << 5) & {mask31}) AS h FROM h2)",
        "s0 AS MATERIALIZED (SELECT v, j, (CAST(1 AS BIGINT) << "
        f"(CASE WHEN h = 0 THEN {LCG_TZ_CAP} "
        f"ELSE least(bit_count((h & -h) - 1), {LCG_TZ_CAP}) END)) AS mask "
        "FROM h3)",
    ]
    for k in range(1, ANF_HOPS + 1):
        p = f"s{k-1}"
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT v, j, bit_or(mask) AS mask FROM ("
            f"SELECT v, j, mask FROM {p} "
            f"UNION ALL "
            f"SELECT e.src AS v, p.j, p.mask FROM edges e "
            f"JOIN {p} p ON e.dst = p.v) GROUP BY v, j)"
        )
    for k in range(0, ANF_HOPS + 1):
        parts.append(
            f"b{k} AS (SELECT v, (CAST(1 AS BIGINT) << CAST(rt // {r} AS INT)) "
            f"* {frac}[CAST(rt % {r} AS INT) + 1] AS ball FROM ("
            f"SELECT v, CAST(sum(bit_count(mask & xor(mask + 1, "
            f"CAST(-1 AS BIGINT)))) AS BIGINT) AS rt FROM s{k} GROUP BY v))"
        )
    terms = " + ".join(
        f"(b{k}.ball - b{k-1}.ball) * {harm_weight(k)}"
        for k in range(1, ANF_HOPS + 1)
    )
    joins = " ".join(f"JOIN b{k} USING (v)" for k in range(1, ANF_HOPS + 1))
    if select == "harmonic":
        final = f"SELECT b0.v AS vertex, CAST({terms} AS BIGINT) AS harmonic_e "
    else:  # closeness: exact sum-of-distances + final reachable ball
        sumterms = " + ".join(
            f"(b{k}.ball - b{k-1}.ball) * {k}" for k in range(1, ANF_HOPS + 1)
        )
        final = (
            f"SELECT b0.v AS vertex, CAST({sumterms} AS BIGINT) AS sumdist_e, "
            f"CAST(b{ANF_HOPS}.ball AS BIGINT) AS ball_e6 "
        )
    return ",\n".join(parts) + "\n" + final + f"FROM b0 {joins}"


def q_closeness(spark, sf_dir):
    """Lin's-index closeness (algorithms/anf.py closeness_centrality) —
    same HyperBall replay as `harmonic`, checking the exact-integer
    sum-of-distances accumulator and the final reachable-ball estimate."""
    from .algorithms.anf import closeness_centrality

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    out = closeness_centrality(
        g, max_hops=ANF_HOPS, num_registers=ANF_REGS, seed=ANF_SEED,
        hash_mode="lcg", mode="in",
    )
    return out.select("vertex", "sumdist_e", "ball_e6")


QUERIES["harmonic"] = q_harmonic
ORACLES["harmonic"] = _harmonic_oracle()
QUERIES["closeness"] = q_closeness
ORACLES["closeness"] = _harmonic_oracle(select="closeness")


# --- link-prediction extras ---------------------------------------------------
# Adamic-Adar / resource-allocation / preferential-attachment / cosine family
# (algorithms/link_prediction.py link_scores): the driver row checks the
# EXACT-INTEGER building blocks — common-neighbor count, deg(u)*deg(v), and
# sum_w (1e9 DIV deg(w)) — from which every float coefficient derives.


def q_linkpred_extra(spark, sf_dir):
    from .algorithms.link_prediction import link_scores

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    return link_scores(g)


ORACLES["linkpred_extra"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
    deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
    pairs AS (SELECT src AS f, dst AS s FROM sym WHERE src <= dst),
    cn AS (SELECT p.f, p.s, count(*) AS cn,
                  CAST(sum(1000000000 // dn.d) AS BIGINT) AS ra_e9
           FROM pairs p JOIN sym a ON a.src = p.f JOIN sym b ON b.src = p.s AND b.dst = a.dst
           JOIN deg dn ON dn.v = a.dst
           GROUP BY p.f, p.s)
    SELECT p.f AS source, p.s AS destination,
           CAST(coalesce(cn.cn, 0) AS BIGINT) AS cn,
           CAST(da.d * db.d AS BIGINT) AS pa,
           CAST(coalesce(cn.ra_e9, 0) AS BIGINT) AS ra_e9
    FROM pairs p
    JOIN deg da ON p.f = da.v JOIN deg db ON p.s = db.v
    LEFT JOIN cn ON p.f = cn.f AND p.s = cn.s
"""
QUERIES["linkpred_extra"] = q_linkpred_extra


# --- DSIR importance weights --------------------------------------------------
# Xie et al. 2023 data-selection weights (text/pipeline.py dsir_weights).
# The query scores every document against a deterministic in-corpus target
# slice and writes the B-row bucket model (bucket, ct, cr, s_e) to the
# sidecar. The oracle re-derives the hashed-ngram bucket counts FROM SCRATCH
# (same char-LCG fold the minhash oracle replays), dots them with the
# sidecar's integer score column, and emits loud guard rows if the
# sidecar's ct/cr count tables disagree with its own re-derivation — so
# everything except the driver-side log() evaluation is value-checked.

DSIR_BUCKETS, DSIR_NMAX = 256, 2


def q_doc_dsir(spark, sf_dir):
    import os

    import pandas as pd

    from .text.pipeline import dsir_weights

    d = _documents(spark, sf_dir)
    target = d.filter(F.col("doc_id") % 97 == 0)
    weights, buckets = dsir_weights(
        d, target, num_buckets=DSIR_BUCKETS, alpha=1.0, n_max=DSIR_NMAX
    )
    os.makedirs(SIDECAR_DIR, exist_ok=True)
    pd.DataFrame(buckets, columns=["bucket", "ct", "cr", "s_e"]).to_parquet(
        f"{SIDECAR_DIR}/dsir_buckets.parquet", index=False
    )
    return weights.select("doc_id", "dsir_w_e")


def _dsir_oracle() -> str:
    from .text.dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    gram_selects = " UNION ALL ".join(
        f"SELECT doc_id, array_to_string(w[i:i+{n-1}], ' ') AS g FROM "
        f"(SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - {n-1}, 1))) AS i "
        f"FROM words)"
        for n in range(1, DSIR_NMAX + 1)
    )
    return f"""
    WITH words AS MATERIALIZED (SELECT doc_id, string_split(trim(text), ' ') AS w
                                FROM documents),
    grams AS MATERIALIZED (SELECT doc_id, g FROM ({gram_selects}) WHERE length(g) > 0),
    cnts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    chpos AS (SELECT doc_id, g, c,
                     unnest(generate_series(1, length(g))) AS i
              FROM cnts),
    codes AS (SELECT doc_id, g, c,
                     sum(ascii(substring(g, i, 1)) *
                         (({MH_LCG_A}::BIGINT * i + {MH_LCG_B}) % {MH_LCG_P}))
                       % {MH_LCG_P} AS code
              FROM chpos GROUP BY doc_id, g, c),
    docbuckets AS MATERIALIZED (
        SELECT doc_id, code % {DSIR_BUCKETS} AS bucket, sum(c) AS cnt
        FROM codes GROUP BY doc_id, code % {DSIR_BUCKETS}),
    side AS (SELECT bucket, ct, cr, s_e
             FROM read_parquet('{SIDECAR_DIR}/dsir_buckets.parquet')),
    dots AS (SELECT doc_id, CAST(sum(cnt * s.s_e) AS BIGINT) AS dsir_w_e
             FROM docbuckets d JOIN side s USING (bucket) GROUP BY doc_id),
    cr_check AS (SELECT bucket, sum(cnt) AS tot FROM docbuckets GROUP BY bucket),
    ct_check AS (SELECT bucket, sum(cnt) AS tot FROM docbuckets
                 WHERE doc_id % 97 = 0 GROUP BY bucket),
    guard AS (
        SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(-999999999 AS BIGINT) AS dsir_w_e
        FROM side s
        LEFT JOIN cr_check r ON s.bucket = r.bucket
        LEFT JOIN ct_check t ON s.bucket = t.bucket
        WHERE coalesce(r.tot, 0) <> s.cr OR coalesce(t.tot, 0) <> s.ct)
    SELECT d.doc_id, coalesce(dots.dsir_w_e, 0) AS dsir_w_e
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN dots ON d.doc_id = dots.doc_id
    UNION ALL SELECT doc_id, dsir_w_e FROM guard
    """


QUERIES["doc_dsir"] = q_doc_dsir
ORACLES["doc_dsir"] = _dsir_oracle()


# ---------------------------------------------------------------------------
# C4-style line-granularity pipeline (text/dedup.py line_dedup,
# text/pipeline.py c4_line_filter). The synthetic documents carry no
# newlines, so both queries derive a deterministic line structure first —
# every aligned run of LINE_W words is one line — with the IDENTICAL
# construction in Spark and DuckDB; the oracle then replays the operator
# verbatim. Reference N/A (no text layer in the fork).
# ---------------------------------------------------------------------------

LINE_W = 8


def _chunk_lines_col():
    """Spark: array of LINE_W-word lines from the trimmed text column."""
    toks = F.split(F.trim(F.col("text")), " ")
    nlines = F.expr(
        f"(size(split(trim(text), ' ')) + {LINE_W - 1}) DIV {LINE_W}"
    )
    return F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * LINE_W + 1, LINE_W)),
    )


# DuckDB twin of _chunk_lines_col: ln(doc_id, i, line) with i starting at 0.
_CHUNK_LINES_SQL = f"""
    dw AS MATERIALIZED (SELECT doc_id, string_split(trim(text), ' ') AS w
                        FROM documents),
    ex AS MATERIALIZED (SELECT doc_id, w,
            unnest(generate_series(0, (len(w) + {LINE_W - 1}) // {LINE_W} - 1)) AS i
        FROM dw),
    ln AS MATERIALIZED (SELECT doc_id, i,
            array_to_string(w[i*{LINE_W}+1:i*{LINE_W}+{LINE_W}], ' ') AS line
        FROM ex)
"""


def q_doc_line_dedup(spark, sf_dir):
    """Corpus-wide exact line dedup (C4/RefinedWeb line pass): duplicated
    lines keep only the canonical minimum-(doc, index) occurrence; docs
    reassembled from survivors (text/dedup.py line_dedup)."""
    from .text.dedup import line_dedup

    d = _documents(spark, sf_dir).select(
        "doc_id", F.array_join(_chunk_lines_col(), "\n").alias("text")
    )
    out = line_dedup(d, text_col="text", id_col="doc_id", min_chars=1)
    return out.select(
        "doc_id",
        F.md5("text_dedup").alias("dedup_md5"),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


ORACLES["doc_line_dedup"] = f"""
    WITH {_CHUNK_LINES_SQL},
    lp AS (SELECT doc_id AS doc, i + 1 AS i, line FROM ln),
    nc AS (SELECT doc, i FROM (
        SELECT doc, i,
               row_number() OVER (PARTITION BY line ORDER BY doc, i) AS rn
        FROM lp WHERE length(trim(line)) >= 1) WHERE rn > 1),
    surv AS (SELECT l.doc, l.i, l.line FROM lp l
             LEFT JOIN nc ON l.doc = nc.doc AND l.i = nc.i
             WHERE nc.doc IS NULL),
    reb AS (SELECT doc, string_agg(line, chr(10) ORDER BY i) AS txt,
                   count(*) AS kept FROM surv GROUP BY doc),
    nl AS (SELECT doc_id, count(*) AS n FROM ln GROUP BY doc_id)
    SELECT d.doc_id,
           md5(coalesce(r.txt, '')) AS dedup_md5,
           CAST(nl.n AS BIGINT) AS n_lines,
           CAST(nl.n - coalesce(r.kept, 0) AS BIGINT) AS n_removed
    FROM (SELECT DISTINCT doc_id FROM documents) d
    JOIN nl ON nl.doc_id = d.doc_id
    LEFT JOIN reb r ON r.doc = d.doc_id
"""

QUERIES["doc_line_dedup"] = q_doc_line_dedup


def q_doc_c4_filter(spark, sf_dir):
    """C4 heuristic cleaning (Raffel et al. 2020): terminal-punctuation +
    min-word + blocklist line rules, min-surviving-lines + lorem-ipsum +
    curly-brace page rules (text/pipeline.py c4_line_filter). Punctuation,
    a 'javascript' token, and page-level blocklist lines are injected
    deterministically from (doc_id, line index) so every rule branch fires
    on the synthetic corpus — the identical injection runs in both
    engines."""
    from .text.pipeline import c4_line_filter

    toks = F.split(F.trim(F.col("text")), " ")
    nlines = F.expr(f"(size(split(trim(text), ' ')) + {LINE_W - 1}) DIV {LINE_W}")

    def mk(i):
        body = F.concat_ws(" ", F.slice(toks, i * LINE_W + 1, LINE_W))
        key = F.col("doc_id") + i
        body = F.when(key % 7 == 0, F.concat(body, F.lit(" javascript"))).otherwise(body)
        return F.when(key % 3 != 2, F.concat(body, F.lit("."))).otherwise(body)

    txt = F.array_join(F.transform(F.sequence(F.lit(0), nlines - 1), mk), "\n")
    txt = (
        F.when(F.col("doc_id") % 31 == 0, F.concat(txt, F.lit("\nlorem ipsum dolor")))
        .when(F.col("doc_id") % 37 == 0, F.concat(txt, F.lit("\nfunction() {")))
        .otherwise(txt)
    )
    d = _documents(spark, sf_dir).select("doc_id", txt.alias("text"))
    out = c4_line_filter(d, text_col="text", id_col="doc_id")
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_md5"),
        "n_kept",
        "n_dropped",
        "kept",
    )


ORACLES["doc_c4_filter"] = f"""
    WITH {_CHUNK_LINES_SQL},
    inj AS (SELECT doc_id, i,
            (CASE WHEN (doc_id + i) % 3 <> 2 THEN b1 || '.' ELSE b1 END) AS line
        FROM (SELECT doc_id, i,
                (CASE WHEN (doc_id + i) % 7 = 0 THEN line || ' javascript'
                      ELSE line END) AS b1 FROM ln)),
    extra AS (SELECT doc_id, max(i) + 1 AS i,
            (CASE WHEN doc_id % 31 = 0 THEN 'lorem ipsum dolor'
                  ELSE 'function() {{' END) AS line
        FROM inj WHERE doc_id % 31 = 0 OR (doc_id % 37 = 0 AND doc_id % 31 <> 0)
        GROUP BY doc_id),
    allln AS (SELECT * FROM inj UNION ALL SELECT * FROM extra),
    full_txt AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS t
                 FROM allln GROUP BY doc_id),
    flags AS (SELECT doc_id, i, line,
            (right(rtrim(line), 1) IN ('.', '!', '?', '"')
             AND len(list_filter(string_split(line, ' '), x -> x <> '')) >= 5
             AND NOT contains(lower(line), 'javascript')) AS ok
        FROM allln),
    keptl AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt,
                     count(*) AS n_kept
              FROM flags WHERE ok GROUP BY doc_id),
    tot AS (SELECT doc_id, count(*) AS n FROM allln GROUP BY doc_id)
    SELECT t.doc_id,
           md5(coalesce(k.txt, '')) AS clean_md5,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped,
           CAST((coalesce(k.n_kept, 0) >= 3
                 AND NOT contains(lower(f.t), 'lorem ipsum')
                 AND NOT contains(f.t, '{{')) AS BIGINT) AS kept
    FROM tot t
    JOIN full_txt f ON f.doc_id = t.doc_id
    LEFT JOIN keptl k ON k.doc_id = t.doc_id
"""

QUERIES["doc_c4_filter"] = q_doc_c4_filter


# ---------------------------------------------------------------------------
# BM25 sparse retrieval (text/retrieval.py) — inverted index + posting-list
# join; exact-int mode makes every score step BIGINT (rational idf, DIV
# saturation chain) so DuckDB replays the ranking bit-for-bit.
# Queries are derived from the corpus itself: every doc_id % 50 == 0
# contributes words 3..7 of its own text as a query. Reference N/A.
# ---------------------------------------------------------------------------

BM25_K = 5
BM25_QMOD = 50
BM25_K1M = 1200
BM25_BM = 750
IDF_SCALE_SQL = 1_000_000
BM25_PREC_SQL = 1_000_000


def q_doc_bm25(spark, sf_dir):
    """BM25 top-k retrieval (Robertson-Zaragoza) in integer-exact mode:
    rational idf + DIV saturation chain over an inverted index
    (text/retrieval.py bm25_topk)."""
    from .text.retrieval import bm25_topk

    d = _documents(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), " ")
    qs = d.filter(F.col("doc_id") % BM25_QMOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 3, 5)).alias("text"),
    )
    out = bm25_topk(d, qs, k=BM25_K, exact_int=True)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        "rank",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("long").alias("score"),
    )


ORACLES["doc_bm25"] = f"""
    WITH dw AS MATERIALIZED (SELECT doc_id, string_split(trim(text), ' ') AS w
                             FROM documents),
    dl AS MATERIALIZED (SELECT doc_id AS doc, len(w) AS dl FROM dw),
    stats AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl),
    post AS MATERIALIZED (
        SELECT doc_id AS doc, tok AS term, count(*) AS tf FROM (
            SELECT doc_id, unnest(w) AS tok FROM dw)
        WHERE tok <> '' GROUP BY doc_id, tok),
    dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
    qt AS (SELECT DISTINCT doc_id AS qid, tok AS term FROM (
            SELECT doc_id, unnest(w[3:7]) AS tok FROM dw
            WHERE doc_id % {BM25_QMOD} = 0)
        WHERE tok <> ''),
    cand AS (SELECT q.qid, p.doc, p.tf, f.df, l.dl, s.n, s.tot
             FROM qt q JOIN post p USING (term)
             JOIN dft f USING (term) JOIN dl l ON l.doc = p.doc, stats s),
    terms AS (SELECT qid, doc,
            (CAST({IDF_SCALE_SQL} AS BIGINT) * (2*(n - df) + 1) // (2*df + 1)) *
            ((tf * CAST({BM25_K1M + 1000} AS BIGINT) * 1000 * {BM25_PREC_SQL} * tot)
             // (tf * CAST(1000000 AS BIGINT) * tot +
                 {BM25_K1M} * (({1000 - BM25_BM}) * CAST(tot AS BIGINT)
                               + {BM25_BM} * dl * n))) AS ts
        FROM cand),
    scored AS (SELECT qid, doc, CAST(sum(ts) AS BIGINT) AS score
               FROM terms GROUP BY qid, doc),
    ranked AS (SELECT qid, doc, score,
            row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rank
        FROM scored)
    SELECT CAST(qid AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
           CAST(doc AS BIGINT) AS doc_id, score
    FROM ranked WHERE rank <= {BM25_K}
"""

QUERIES["doc_bm25"] = q_doc_bm25


# ---------------------------------------------------------------------------
# Maximal independent set (algorithms/mis.py) — Luby with deterministic LCG
# priorities; the oracle unrolls the rounds verbatim (idempotent after
# convergence is NOT true for Luby, so a guard row fires loudly if the
# unroll count ever stops covering the driver graph: 2 rounds at sf0.001,
# 3 at sf0.01, 6 unrolled). Reference N/A (no MIS in the 2021 fork).
# ---------------------------------------------------------------------------

MIS_ORACLE_ROUNDS = 6


def q_mis(spark, sf_dir):
    """Luby maximal independent set with deterministic LCG priorities on
    the supply graph (algorithms/mis.py): one E-scale min-key partial agg
    + active-set semi/anti joins per round, one scalar action per round."""
    from .algorithms.mis import maximal_independent_set

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    return maximal_independent_set(g).select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("in_mis").cast("int").alias("in_mis"),
    )


def _mis_oracle() -> str:
    key_v = "((1103515245 * {c} + 12345) % 2147483648) * 4294967296 + {c}"
    parts = [
        f"WITH raw AS ({SUPPLY_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw))",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM raw))) AS v)",
        "a0 AS (SELECT v FROM univ)",
        "e0 AS (SELECT src, dst FROM sym)",
    ]
    for t in range(1, MIS_ORACLE_ROUNDS + 1):
        ks = key_v.format(c="src")
        ka = key_v.format(c="a.v")
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT dst AS v, min({ks}) AS mk "
            f"FROM e{t-1} GROUP BY dst)"
        )
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT a.v FROM a{t-1} a "
            f"LEFT JOIN m{t} m ON a.v = m.v "
            f"WHERE m.mk IS NULL OR {ka} < m.mk)"
        )
        parts.append(
            f"r{t} AS (SELECT v FROM w{t} UNION "
            f"SELECT e.dst AS v FROM e{t-1} e JOIN w{t} w ON e.src = w.v)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT a.v FROM a{t-1} a "
            f"LEFT JOIN r{t} r ON a.v = r.v WHERE r.v IS NULL)"
        )
        parts.append(
            f"e{t} AS MATERIALIZED (SELECT e.src, e.dst FROM e{t-1} e "
            f"JOIN a{t} x ON e.src = x.v JOIN a{t} y ON e.dst = y.v)"
        )
    wins = " UNION ".join(f"SELECT v FROM w{t}" for t in range(1, MIS_ORACLE_ROUNDS + 1))
    parts.append(f"mis AS ({wins})")
    parts.append(
        f"guard AS (SELECT CAST(-1 AS BIGINT) AS vertex, CAST(-9 AS INT) AS in_mis "
        f"FROM a{MIS_ORACLE_ROUNDS} LIMIT 1)"
    )
    return (
        ",\n".join(parts)
        + """
    SELECT CAST(u.v AS BIGINT) AS vertex,
           CAST(CASE WHEN m.v IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_mis
    FROM univ u LEFT JOIN mis m ON u.v = m.v
    UNION ALL SELECT vertex, in_mis FROM guard
    """
    )


QUERIES["mis"] = q_mis
ORACLES["mis"] = _mis_oracle()


# ---------------------------------------------------------------------------
# whole-graph summary measures (reciprocity / assortativity / degree hist)
# ---------------------------------------------------------------------------

def q_graph_stats(spark, sf_dir):
    """Reciprocity of the directed supply graph + degree assortativity of
    its symmetrized form (algorithms/graph_measures.py): one pair-keyed
    map-side-combined agg, two co-partitioned degree joins, six BIGINT
    sufficient statistics — the scaled ratios are derived from identical
    integers in both engines."""
    from .algorithms.graph_measures import degree_assortativity, reciprocity

    gd = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    gu = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    rec = reciprocity(gd)
    asr = degree_assortativity(gu).select(
        F.col("m").alias("m_sym"), "sx", "sxx", "sxy", "assortativity_e6"
    )
    return rec.crossJoin(asr)


ORACLES["graph_stats"] = f"""
    WITH raw AS ({SUPPLY_EDGES_SQL}),
    pairs AS (SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
                     max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
                     max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS rev
              FROM raw GROUP BY lo, hi),
    rec AS (SELECT CAST(sum(fwd + rev) AS BIGINT) AS m,
                   CAST(2 * sum(fwd * rev) AS BIGINT) AS recip FROM pairs),
    sym AS (SELECT DISTINCT src, dst FROM
            (SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw)),
    deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
    pr AS (SELECT a.d AS x, b.d AS y FROM sym e
           JOIN deg a ON e.src = a.v JOIN deg b ON e.dst = b.v),
    st AS (SELECT CAST(count(*) AS BIGINT) AS m_sym,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(x * x) AS BIGINT) AS sxx,
                  CAST(sum(y * y) AS BIGINT) AS syy,
                  CAST(sum(x * y) AS BIGINT) AS sxy FROM pr)
    SELECT rec.m, rec.recip,
           CAST(round(CAST(1000000 AS DOUBLE) * rec.recip / rec.m) AS BIGINT)
             AS reciprocity_e6,
           st.m_sym, st.sx, st.sxx, st.sxy,
           CASE WHEN (st.m_sym * st.sxx - st.sx * st.sx) = 0 THEN NULL
                ELSE CAST(round(CAST(1000000 AS DOUBLE) *
                     CAST(st.m_sym * st.sxy - st.sx * st.sx AS DOUBLE) /
                     (sqrt(CAST(st.m_sym * st.sxx - st.sx * st.sx AS DOUBLE)) *
                      sqrt(CAST(st.m_sym * st.syy - st.sx * st.sx AS DOUBLE))))
                     AS BIGINT) END AS assortativity_e6
    FROM rec, st
"""
QUERIES["graph_stats"] = q_graph_stats


def q_degree_hist(spark, sf_dir):
    """Exact total-degree distribution of the link graph including
    isolated vertices (max+1 universe rule): two map-side-combined
    V-scale aggregations, no join wider than V."""
    from .algorithms.graph_measures import degree_histogram

    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    return degree_histogram(g, direction="total")


ORACLES["degree_hist"] = f"""
    WITH e AS ({LINK_EDGES_SQL}),
    univ AS (SELECT unnest(generate_series(0, (SELECT max(greatest(src, dst)) FROM e))) AS vertex),
    t AS (SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e),
    d AS (SELECT vertex, count(*) AS c FROM t GROUP BY vertex),
    deg AS (SELECT u.vertex, CAST(coalesce(d.c, 0) AS BIGINT) AS degree
            FROM univ u LEFT JOIN d ON u.vertex = d.vertex)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices FROM deg GROUP BY degree
"""
QUERIES["degree_hist"] = q_degree_hist


# ---------------------------------------------------------------------------
# simhash near-dup detection (LCG dialect -> exact cross-engine replay)
# ---------------------------------------------------------------------------

def q_doc_simhash_dups(spark, sf_dir):
    """SimHash signatures (text/dedup.py simhash_lcg_signatures) + 16-bit
    band LSH + exact Hamming verify: per doc the 62-bit signature and the
    count of near neighbors (hamming <= 3). Signature = two map-side
    combined aggs; candidate stage is the banded bucket join, never
    all-pairs."""
    from .text.dedup import simhash_lcg_signatures, simhash_near_pairs

    docs = _documents(spark, sf_dir)
    sigs = simhash_lcg_signatures(docs)
    pairs = simhash_near_pairs(sigs)
    both = pairs.select(F.col("id_a").alias("doc_id")).unionByName(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    n = both.groupBy("doc_id").agg(F.count("*").alias("n_near"))
    return (
        sigs.join(n, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("simhash").cast("long").alias("simhash"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
        )
    )


ORACLES["doc_simhash_dups"] = """
    WITH toks AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
            FROM documents)
        WHERE length(tok) >= 1
        GROUP BY doc_id, tok),
    chpos AS (
        SELECT doc_id, tok, tf,
               unnest(generate_series(1, length(tok))) AS i
        FROM toks),
    codes AS (
        SELECT doc_id, tok, any_value(tf) AS tf,
               sum(ascii(substring(tok, i, 1)) *
                   ((1103515245::BIGINT * i + 12345) % 2147483647))
                 % 2147483647 AS code
        FROM chpos GROUP BY doc_id, tok),
    hs AS (
        SELECT doc_id, tf,
               ((1103515245::BIGINT * code + 12345) % 2147483647)
               + (((506952114::BIGINT * code + 54321) % 2147483647)
                  * 2147483648::BIGINT) AS h
        FROM codes),
    bitsum AS (
        SELECT doc_id, b.b,
               sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN tf ELSE -tf END) AS s
        FROM hs, generate_series(0, 61) b(b)
        GROUP BY doc_id, b.b),
    sig AS (
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
        FROM bitsum GROUP BY doc_id),
    banded AS (
        SELECT doc_id, simhash, b.b AS band, (simhash >> (16 * b.b)) & 65535 AS bucket
        FROM sig, generate_series(0, 3) b(b)),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b FROM cand WHERE bit_count(xor(sa, sb)) <= 3),
    sides AS (SELECT id_a AS doc_id FROM pairs
              UNION ALL SELECT id_b AS doc_id FROM pairs),
    n AS (SELECT doc_id, count(*) AS n_near FROM sides GROUP BY doc_id)
    SELECT s.doc_id, CAST(s.simhash AS BIGINT) AS simhash,
           CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near
    FROM sig s LEFT JOIN n ON s.doc_id = n.doc_id
"""
QUERIES["doc_simhash_dups"] = q_doc_simhash_dups


# ---------------------------------------------------------------------------
# densest subgraph (Bahmani et al. peeling, eps = 1/2)
# ---------------------------------------------------------------------------

DENSEST_ORACLE_ROUNDS = 18  # > log_1.5(400) + margin; guard row if short


def q_densest(spark, sf_dir):
    """Greedy-peeling densest subgraph (algorithms/densest.py, eps=0.2)
    on the supply graph UNION a planted K20 on the disjoint id range
    10000..10019 (derived arithmetically in both engines) — at sf0.001
    the peel provably recovers the planted clique in round 3, so the
    driver row checks a genuinely multi-round argmax. Per round: one
    E-scale degree agg + one 2-scalar action; peel threshold and argmax
    are exact cross-multiplied BIGINTs."""
    from .algorithms.densest import densest_subgraph

    ids = spark.range(20).select(F.col("id").cast("long").alias("i"))
    clique = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .filter(F.col("a.i") < F.col("b.i"))
        .select(
            (F.lit(10000) + F.col("a.i")).alias("src"),
            (F.lit(10000) + F.col("b.i")).alias("dst"),
        )
    )
    raw = supply_edges(spark, sf_dir).unionByName(clique)
    g = Graph.from_edgelist(raw, directed=False, renumber=False)
    return densest_subgraph(g, epsilon=0.2).select(
        F.col("vertex").cast("long").alias("vertex"),
        "density_num", "density_den", "density_e9",
    )


def _densest_oracle() -> str:
    # eps = 1/5 -> peel keeps d * V * 5 > S * 6
    parts = [
        f"WITH sup AS ({SUPPLY_EDGES_SQL})",
        "clq AS (SELECT 10000 + a.a AS src, 10000 + b.b AS dst "
        "FROM generate_series(0, 19) a(a), generate_series(0, 19) b(b) "
        "WHERE a.a < b.b)",
        "raw AS (SELECT src, dst FROM sup UNION ALL SELECT src, dst FROM clq)",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw))",
        "e0 AS (SELECT src, dst FROM sym)",
    ]
    n = DENSEST_ORACLE_ROUNDS
    for t in range(1, n + 1):
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT src AS v, count(*) AS d "
            f"FROM e{t-1} GROUP BY src)"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT count(*) AS vv, "
            f"coalesce(sum(d), 0) AS ss FROM d{t})"
        )
        parts.append(
            f"k{t} AS MATERIALIZED (SELECT v FROM d{t}, s{t} "
            f"WHERE d * vv * 5 > ss * 6)"
        )
        parts.append(
            f"e{t} AS MATERIALIZED (SELECT e.src, e.dst FROM e{t-1} e "
            f"JOIN k{t} a ON e.src = a.v JOIN k{t} b ON e.dst = b.v)"
        )
    rounds = " UNION ALL ".join(
        f"SELECT {t} AS t, vv, ss FROM s{t}" for t in range(1, n + 1)
    )
    parts.append(f"rounds AS MATERIALIZED (SELECT * FROM ({rounds}) WHERE ss > 0)")
    # exact integer argmax, earliest round on ties
    parts.append(
        "best AS (SELECT t, vv, ss FROM rounds r WHERE NOT EXISTS ("
        "SELECT 1 FROM rounds u WHERE u.ss * r.vv > r.ss * u.vv) "
        "ORDER BY t LIMIT 1)"
    )
    acts = " UNION ALL ".join(
        f"SELECT {t} AS t, v FROM d{t}" for t in range(1, n + 1)
    )
    parts.append(f"acts AS ({acts})")
    parts.append(
        f"guard AS (SELECT CAST(-1 AS BIGINT) AS vertex, "
        f"CAST(-9 AS BIGINT) AS density_num, CAST(-9 AS BIGINT) AS density_den, "
        f"CAST(-9 AS BIGINT) AS density_e9 FROM e{n} LIMIT 1)"
    )
    return (
        ",\n".join(parts)
        + """
    SELECT CAST(a.v AS BIGINT) AS vertex,
           CAST(b.ss AS BIGINT) AS density_num,
           CAST(2 * b.vv AS BIGINT) AS density_den,
           CAST((1000000000::BIGINT * b.ss + b.vv) // (2 * b.vv) AS BIGINT)
             AS density_e9
    FROM acts a JOIN best b ON a.t = b.t
    UNION ALL SELECT * FROM guard
    """
    )


QUERIES["densest"] = q_densest
ORACLES["densest"] = _densest_oracle()


# ---------------------------------------------------------------------------
# local clustering: PPR sweep cut (Andersen-Chung-Lang)
# ---------------------------------------------------------------------------

LC_SEED = 0
LC_ITERS = 10


def q_local_cluster(spark, sf_dir):
    """ACL local clustering around seed 0 on the undirected supply graph
    (algorithms/local_cluster.py): the audited zero-action PPR loop, then
    a SUPPORT-scale sweep — degree-normalized ordering, exact BIGINT
    cut/volume prefix sums, conductance argmin. phi_e9 uses integer
    half-up rounding; the sweep order and argmin ratios are doubles
    derived from identical integers in both engines."""
    from .algorithms.local_cluster import local_cluster

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=False, renumber=False)
    return local_cluster(g, LC_SEED, alpha=ALPHA, iterations=LC_ITERS).select(
        F.col("vertex").cast("long").alias("vertex"),
        "rank", "cut", "den", "phi_e9",
    )


def _local_cluster_oracle() -> str:
    a = ALPHA
    s = LC_SEED
    parts = [
        f"WITH raw AS ({SUPPLY_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw))",
        "od AS MATERIALIZED (SELECT src AS v, count(*) AS od FROM sym GROUP BY src)",
        f"r0 AS (SELECT CAST({s} AS BIGINT) AS v, 1.0::DOUBLE AS r)",
    ]
    for k in range(1, LC_ITERS + 1):
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT e.dst AS v, "
            f"sum({a} * p.r / od.od) AS r "
            f"FROM sym e JOIN r{k-1} p ON e.src = p.v JOIN od ON od.v = e.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT v, sum(r) AS r FROM ("
            f"SELECT v, r FROM m{k} UNION ALL "
            f"SELECT CAST({s} AS BIGINT) AS v, "
            f"1.0 - coalesce((SELECT sum(r) FROM m{k}), 0.0) AS r) GROUP BY v)"
        )
    parts += [
        f"p AS MATERIALIZED (SELECT v, CAST(round(r * 1e7) AS BIGINT) AS p7 "
        f"FROM r{LC_ITERS} WHERE CAST(round(r * 1e7) AS BIGINT) > 0)",
        "sweep AS MATERIALIZED (SELECT p.v, p.p7, od.od AS d, "
        "row_number() OVER (ORDER BY CAST(p.p7 AS DOUBLE) / od.od DESC, p.v ASC) "
        "AS rk FROM p JOIN od ON od.v = p.v)",
        "er AS MATERIALIZED (SELECT a.rk AS ra, b.rk AS rb FROM sym e "
        "LEFT JOIN sweep a ON e.src = a.v LEFT JOIN sweep b ON e.dst = b.v "
        "WHERE a.rk IS NOT NULL OR b.rk IS NOT NULL)",
        "dplus AS (SELECT least(coalesce(ra, 1099511627776), "
        "coalesce(rb, 1099511627776)) AS rk, count(*) AS c FROM er GROUP BY 1)",
        "dminus AS (SELECT greatest(ra, rb) AS rk, count(*) AS c FROM er "
        "WHERE ra IS NOT NULL AND rb IS NOT NULL GROUP BY 1)",
        "tot AS (SELECT count(*) AS tv FROM sym)",
        "cum AS MATERIALIZED (SELECT s.v, s.rk, "
        "sum(s.d) OVER (ORDER BY s.rk) AS vol, "
        "sum(coalesce(dp.c, 0) - coalesce(dm.c, 0)) OVER (ORDER BY s.rk) AS cut "
        "FROM sweep s LEFT JOIN dplus dp ON s.rk = dp.rk "
        "LEFT JOIN dminus dm ON s.rk = dm.rk)",
        "cand AS (SELECT rk, cut, least(vol, tv - vol) AS den FROM cum, tot "
        "WHERE least(vol, tv - vol) > 0)",
        "best AS (SELECT rk, cut, den FROM cand "
        "ORDER BY CAST(cut AS DOUBLE) / den ASC, rk ASC LIMIT 1)",
    ]
    return (
        ",\n".join(parts)
        + """
    SELECT CAST(c.v AS BIGINT) AS vertex,
           CAST(c.rk AS BIGINT) AS "rank",
           CAST(b.cut AS BIGINT) AS cut,
           CAST(b.den AS BIGINT) AS den,
           CAST((2000000000::BIGINT * b.cut + b.den) // (2 * b.den) AS BIGINT)
             AS phi_e9
    FROM cum c, best b WHERE c.rk <= b.rk
    """
    )


QUERIES["local_cluster"] = q_local_cluster
ORACLES["local_cluster"] = _local_cluster_oracle()


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity scoring (hashed-bucket bigram LM)
# ---------------------------------------------------------------------------

CCNET_BUCKETS = 128
CCNET_REF_MOD = 10


def q_doc_ccnet(spark, sf_dir):
    """CCNet perplexity filter (text/pipeline.py ccnet_perplexity): train
    the hashed-bucket bigram LM on the doc_id%10==0 reference slice, score
    every document by exact scaled-int log-prob sums. The model's ln()
    evaluations happen once on the driver and ship to BOTH engines via the
    sidecar, so the oracle re-derives every count (loud guards) and replays
    every score bit-for-bit."""
    import os

    import pandas as pd

    from .text.pipeline import ccnet_perplexity

    d = _documents(spark, sf_dir)
    ref = d.filter(F.col("doc_id") % CCNET_REF_MOD == 0)
    scores, trans_model, ctx_model = ccnet_perplexity(
        d, ref, num_buckets=CCNET_BUCKETS, alpha=1.0
    )
    os.makedirs(SIDECAR_DIR, exist_ok=True)
    pd.DataFrame(trans_model, columns=["bp", "bc", "c2", "s_e"]).to_parquet(
        f"{SIDECAR_DIR}/ccnet_trans.parquet", index=False
    )
    pd.DataFrame(ctx_model, columns=["bp", "c1", "s_unseen_e"]).to_parquet(
        f"{SIDECAR_DIR}/ccnet_ctx.parquet", index=False
    )
    return scores.select("doc_id", "sum_e", "n_terms", "avg_nlogp_e6")


def _ccnet_oracle() -> str:
    import math

    from .text.dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    s0 = int(round(1_000_000 * math.log(1.0 / CCNET_BUCKETS)))
    return f"""
    WITH words AS MATERIALIZED (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    tokpos AS MATERIALIZED (
        SELECT doc_id, i, w[i] AS tok FROM (
            SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM words)),
    tokchars AS (
        SELECT doc_id, i, tok, unnest(generate_series(1, length(tok))) AS j
        FROM tokpos),
    csum AS (
        SELECT doc_id, i,
               sum(ascii(substring(tok, j, 1)) *
                   (({MH_LCG_A}::BIGINT * j + {MH_LCG_B}) % {MH_LCG_P}))
                 % {MH_LCG_P} AS code
        FROM tokchars GROUP BY doc_id, i),
    codes AS MATERIALIZED (
        SELECT t.doc_id, t.i, coalesce(c.code, 0) % {CCNET_BUCKETS} AS b
        FROM tokpos t LEFT JOIN csum c ON t.doc_id = c.doc_id AND t.i = c.i),
    pairs AS (
        SELECT a.doc_id, a.b AS bp, b.b AS bc
        FROM codes a JOIN codes b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
    dt AS MATERIALIZED (
        SELECT doc_id, bp, bc, count(*) AS cnt FROM pairs GROUP BY doc_id, bp, bc),
    c2_chk AS (SELECT bp, bc, sum(cnt) AS c2 FROM dt
               WHERE doc_id % {CCNET_REF_MOD} = 0 GROUP BY bp, bc),
    c1_chk AS (SELECT bp, sum(cnt) AS c1 FROM dt
               WHERE doc_id % {CCNET_REF_MOD} = 0 GROUP BY bp),
    strans AS (SELECT bp, bc, c2, s_e
               FROM read_parquet('{SIDECAR_DIR}/ccnet_trans.parquet')),
    sctx AS (SELECT bp, c1, s_unseen_e
             FROM read_parquet('{SIDECAR_DIR}/ccnet_ctx.parquet')),
    guard_t AS (
        SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(-999999999 AS BIGINT) AS sum_e,
               CAST(-9 AS BIGINT) AS n_terms, CAST(-9 AS BIGINT) AS avg_nlogp_e6
        FROM c2_chk k FULL OUTER JOIN strans s
          ON k.bp = s.bp AND k.bc = s.bc
        WHERE k.c2 IS DISTINCT FROM s.c2),
    guard_c AS (
        SELECT CAST(-2 AS BIGINT) AS doc_id, CAST(-999999999 AS BIGINT) AS sum_e,
               CAST(-9 AS BIGINT) AS n_terms, CAST(-9 AS BIGINT) AS avg_nlogp_e6
        FROM c1_chk k FULL OUTER JOIN sctx s ON k.bp = s.bp
        WHERE k.c1 IS DISTINCT FROM s.c1),
    scored AS (
        SELECT d.doc_id,
               sum(d.cnt * coalesce(t.s_e, c.s_unseen_e, {s0})) AS sum_e,
               sum(d.cnt) AS n_terms
        FROM dt d
        LEFT JOIN strans t ON d.bp = t.bp AND d.bc = t.bc
        LEFT JOIN sctx c ON d.bp = c.bp
        GROUP BY d.doc_id)
    SELECT doc.doc_id,
           CAST(coalesce(s.sum_e, 0) AS BIGINT) AS sum_e,
           CAST(coalesce(s.n_terms, 0) AS BIGINT) AS n_terms,
           CASE WHEN coalesce(s.n_terms, 0) > 0
                THEN CAST(round(CAST(-s.sum_e AS DOUBLE) / s.n_terms) AS BIGINT)
           END AS avg_nlogp_e6
    FROM (SELECT DISTINCT doc_id FROM documents) doc
    LEFT JOIN scored s ON doc.doc_id = s.doc_id
    UNION ALL SELECT * FROM guard_t
    UNION ALL SELECT * FROM guard_c
    """


QUERIES["doc_ccnet"] = q_doc_ccnet
ORACLES["doc_ccnet"] = _ccnet_oracle()


# ---------------------------------------------------------------------------
# multi-source BFS (batched ego balls)
# ---------------------------------------------------------------------------

MSBFS_SEEDS = [0, 7, 200]
MSBFS_DEPTH = 4


def q_multi_source_bfs(spark, sf_dir):
    """Batched BFS from several roots in the same supersteps
    (algorithms/traversal.py multi_source_bfs over batched_ego_graphs):
    frontier joins size-gated between broadcast and co-partitioned, rows
    tagged by seed; out-edge expansion on the directed supply graph."""
    from .algorithms.traversal import multi_source_bfs

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    return multi_source_bfs(g, MSBFS_SEEDS, depth_limit=MSBFS_DEPTH).select(
        F.col("seed").cast("long").alias("seed"),
        F.col("vertex").cast("long").alias("vertex"),
        F.col("distance").cast("long").alias("distance"),
    )


def _msbfs_oracle() -> str:
    seeds = ", ".join(str(s) for s in MSBFS_SEEDS)
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        f"d0 AS (SELECT seed, CAST(seed AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist "
        f"FROM (SELECT unnest([{seeds}]) AS seed))",
    ]
    for k in range(1, MSBFS_DEPTH + 1):
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT seed, v, min(dist) AS dist FROM ("
            f"SELECT seed, v, dist FROM d{k-1} "
            f"UNION ALL "
            f"SELECT p.seed, e.dst AS v, p.dist + 1 AS dist "
            f"FROM edges e JOIN d{k-1} p ON e.src = p.v WHERE p.dist = {k-1}"
            f") GROUP BY seed, v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(seed AS BIGINT) AS seed, v AS vertex, dist AS distance "
        f"FROM d{MSBFS_DEPTH}"
    )


QUERIES["multi_source_bfs"] = q_multi_source_bfs
ORACLES["multi_source_bfs"] = _msbfs_oracle()


# ---------------------------------------------------------------------------
# eigenvector centrality (shifted power iteration, NetworkX semantics)
# ---------------------------------------------------------------------------

EIG_ITERS = 8


def q_eigenvector(spark, sf_dir):
    """Shifted power iteration x <- normalize_L2(x + N^T x) on the directed
    supply graph (algorithms/eigenvector.py); fixed supersteps so the
    oracle can unroll them, e7-quantized output."""
    from .algorithms.eigenvector import eigenvector_centrality

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    res = eigenvector_centrality(g, fixed_iterations=EIG_ITERS)
    return res.select(
        "vertex",
        F.round(F.col("eigenvector_centrality") * 1e7).cast("long").alias("ev_e7"),
    )


def _eigenvector_oracle() -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL})",
        "univ AS MATERIALIZED (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "c0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS c_raw FROM univ)",
        "n0 AS MATERIALIZED (SELECT sqrt(CAST(count(*) AS DOUBLE)) AS nrm FROM univ)",
    ]
    for k in range(1, EIG_ITERS + 1):
        p, pn = f"c{k-1}", f"n{k-1}"
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT b.v, "
            f"b.c_raw / (SELECT nrm FROM {pn}) + coalesce(m.s, 0.0) AS c_raw "
            f"FROM {p} b LEFT JOIN (SELECT e.dst AS v, "
            f"sum(p.c_raw) / (SELECT nrm FROM {pn}) AS s "
            f"FROM edges e JOIN {p} p ON e.src = p.v GROUP BY e.dst) m ON b.v = m.v)"
        )
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT sqrt(sum(c_raw * c_raw)) AS nrm FROM c{k})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS vertex, CAST(round(c_raw / (SELECT nrm FROM n{EIG_ITERS})"
        f" * 1e7) AS BIGINT) AS ev_e7 FROM c{EIG_ITERS}"
    )


QUERIES["eigenvector"] = q_eigenvector
ORACLES["eigenvector"] = _eigenvector_oracle()


# ---------------------------------------------------------------------------
# co-citation / bibliographic coupling (Small 1973 / Kessler 1963)
# ---------------------------------------------------------------------------


def q_cocitation(spark, sf_dir):
    """Directed citation projections on the supply graph
    (algorithms/cocitation.py): pairs cited together (common in-neighbors)
    full-outer-merged with pairs citing the same targets (common
    out-neighbors), floored at count >= 2 on either side."""
    from .algorithms.cocitation import bibliographic_coupling, cocitation

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    cc = cocitation(g, min_count=2)
    bc = bibliographic_coupling(g, min_count=2)
    return (
        cc.join(bc, on=["first", "second"], how="full")
        .select(
            "first",
            "second",
            F.coalesce("cocitation", F.lit(0)).alias("cocitation"),
            F.coalesce("coupling", F.lit(0)).alias("coupling"),
        )
    )


COCITATION_SQL = f"""
WITH edges AS MATERIALIZED ({SUPPLY_EDGES_SQL}),
cc AS (
  SELECT a.dst AS first, b.dst AS second, count(*) AS cocitation
  FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst HAVING count(*) >= 2
),
bc AS (
  SELECT a.src AS first, b.src AS second, count(*) AS coupling
  FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src HAVING count(*) >= 2
)
SELECT coalesce(cc.first, bc.first) AS first,
       coalesce(cc.second, bc.second) AS second,
       coalesce(cc.cocitation, 0) AS cocitation,
       coalesce(bc.coupling, 0) AS coupling
FROM cc FULL OUTER JOIN bc ON cc.first = bc.first AND cc.second = bc.second
"""


QUERIES["cocitation"] = q_cocitation
ORACLES["cocitation"] = COCITATION_SQL


# ---------------------------------------------------------------------------
# anchor-text aggregation (Brin & Page 1998 §2.2 anchor propagation)
# ---------------------------------------------------------------------------


def q_anchor_terms(spark, sf_dir):
    """Anchor-text inverted index + per-target top-2 terms: a deterministic
    link+anchor structure is derived from the documents table (3 outlinks
    per doc at (doc_id*31 + 7k) mod N, anchor text = source tokens 2k,2k+1),
    rendered to REAL html, then run through the production extract_anchors
    pandas UDF -> anchor_text_index -> top_anchor_terms (extract.py); the
    oracle replays the same derivation relationally."""
    from .extract import anchor_text_index, top_anchor_terms

    d = _documents(spark, sf_dir).select("doc_id", "text")
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1
    toks = F.split(F.col("text"), " ")
    parts = [F.lit("<html><body><ul>")]
    for k in (1, 2, 3):
        tgt = (F.col("doc_id") * 31 + 7 * k) % F.lit(n)
        anchor = F.concat_ws(
            " ",
            F.coalesce(F.element_at(toks, 2 * k + 1), F.lit("")),
            F.coalesce(F.element_at(toks, 2 * k + 2), F.lit("")),
        )
        parts += [
            F.lit('<li><a href="doc://'),
            tgt.cast("string"),
            F.lit('">'),
            anchor,
            F.lit("</a></li>"),
        ]
    parts.append(F.lit("</ul></body></html>"))
    pages = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(*parts).alias("html"),
    )
    idx = anchor_text_index(pages, min_count=2)
    return top_anchor_terms(idx, k=2).select(
        "dst", "term", F.col("cnt").cast("long").alias("cnt"),
        F.col("rank").cast("long").alias("rank"),
    )


ANCHOR_TERMS_SQL = """
WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
lnk AS (
  SELECT 'doc://' || CAST((d.doc_id * 31 + 7 * k.k) % n.n AS VARCHAR) AS dst,
         'doc://' || CAST(d.doc_id AS VARCHAR) AS src,
         str_split(d.text, ' ') AS toks, k.k
  FROM documents d CROSS JOIN n CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) k
),
terms AS (
  SELECT dst, lower(trim(tok)) AS term FROM (
    SELECT dst, src, toks[2 * k + 1] AS tok FROM lnk
    UNION ALL
    SELECT dst, src, toks[2 * k + 2] AS tok FROM lnk
  ) WHERE src <> dst AND tok IS NOT NULL AND trim(tok) <> ''
),
idx AS (
  SELECT dst, term, count(*) AS cnt FROM terms GROUP BY dst, term
  HAVING count(*) >= 2
),
ranked AS (
  SELECT dst, term, cnt,
         row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, term ASC) AS rank
  FROM idx
)
SELECT dst, term, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 2
"""


QUERIES["anchor_terms"] = q_anchor_terms
ORACLES["anchor_terms"] = ANCHOR_TERMS_SQL


# ---------------------------------------------------------------------------
# bow-tie decomposition (Broder et al. 2000)
# ---------------------------------------------------------------------------
# Purpose-built 600-vertex graph with every Broder class structurally
# populated: band 0 = IN (0-99), 1 = CORE ring (100-299), 2 = OUT
# (300-399), 3 = in-tendrils (400-449), 4 = out-tendrils (450-499),
# 5 = tubes (500-549), 6 = a disconnected ring (550-599). Residue edges
# from lineitem add deterministic bulk, thinned to ~1/13 and filtered by a
# band-transition whitelist so the macro-structure is invariant while the
# oracle still derives every class from first principles (transitive
# closure), independent of the band layout.

BOWTIE_EDGES_CTES = """
bt_s AS (SELECT unnest(generate_series(0, 599)) AS v),
bt_structural AS (
  SELECT v AS src, 100 + ((v - 100 + 1) % 200) AS dst FROM bt_s WHERE v BETWEEN 100 AND 299
  UNION ALL SELECT v, v + 100 FROM bt_s WHERE v < 100
  UNION ALL SELECT v - 200, v FROM bt_s WHERE v BETWEEN 300 AND 399
  UNION ALL SELECT v - 400, v FROM bt_s WHERE v BETWEEN 400 AND 449
  UNION ALL SELECT v, v - 150 FROM bt_s WHERE v BETWEEN 450 AND 499
  UNION ALL SELECT v - 500, v FROM bt_s WHERE v BETWEEN 500 AND 549
  UNION ALL SELECT v, v - 200 FROM bt_s WHERE v BETWEEN 500 AND 549
  UNION ALL SELECT v, 550 + ((v - 550 + 1) % 50) FROM bt_s WHERE v >= 550
),
bt_resid AS (
  SELECT src, dst FROM (
    SELECT l_orderkey % 600 AS src,
           (l_partkey + 3 * l_suppkey) % 600 AS dst
    FROM lineitem
  )
  WHERE src <> dst AND (src * 31 + dst) % 13 = 0
    AND (CASE WHEN src < 100 THEN 0 WHEN src < 300 THEN 1 WHEN src < 400 THEN 2
              WHEN src < 450 THEN 3 WHEN src < 500 THEN 4 WHEN src < 550 THEN 5
              ELSE 6 END) * 10
      + (CASE WHEN dst < 100 THEN 0 WHEN dst < 300 THEN 1 WHEN dst < 400 THEN 2
              WHEN dst < 450 THEN 3 WHEN dst < 500 THEN 4 WHEN dst < 550 THEN 5
              ELSE 6 END)
      IN (0, 1, 11, 12, 22, 3, 33, 44, 42, 5, 55, 52, 66)
),
bt_edges AS MATERIALIZED (
  SELECT DISTINCT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
  FROM (SELECT * FROM bt_structural UNION ALL SELECT * FROM bt_resid)
)
"""


def bowtie_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of BOWTIE_EDGES_CTES — MUST stay in sync."""
    li = _lineitem(spark, sf_dir)

    def band(c):
        return (
            F.when(c < 100, 0)
            .when(c < 300, 1)
            .when(c < 400, 2)
            .when(c < 450, 3)
            .when(c < 500, 4)
            .when(c < 550, 5)
            .otherwise(6)
        )

    resid = (
        li.select(
            (F.col("l_orderkey") % 600).alias("src"),
            ((F.col("l_partkey") + 3 * F.col("l_suppkey")) % 600).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .filter(((F.col("src") * 31 + F.col("dst")) % 13) == 0)
        .filter(
            (band(F.col("src")) * 10 + band(F.col("dst"))).isin(
                0, 1, 11, 12, 22, 3, 33, 44, 42, 5, 55, 52, 66
            )
        )
    )

    v = spark.range(600).select(F.col("id").alias("v"))
    V = F.col("v")

    def seg(lo, hi, src_e, dst_e):
        return v.filter((V >= lo) & (V < hi)).select(
            src_e.alias("src"), dst_e.alias("dst")
        )

    structural = (
        seg(100, 300, V, 100 + ((V - 100 + 1) % 200))
        .unionByName(seg(0, 100, V, V + 100))
        .unionByName(seg(300, 400, V - 200, V))
        .unionByName(seg(400, 450, V - 400, V))
        .unionByName(seg(450, 500, V, V - 150))
        .unionByName(seg(500, 550, V - 500, V))
        .unionByName(seg(500, 550, V, V - 200))
        .unionByName(seg(550, 600, V, 550 + ((V - 550 + 1) % 50)))
    )
    return (
        structural.unionByName(resid)
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
    )


def q_bowtie(spark, sf_dir):
    """Broder bow-tie classes over the purpose-built web-shaped graph
    (algorithms/bowtie.py: SCC + WCC + four frontier-fixpoint reach sets)."""
    from .algorithms.bowtie import bowtie_structure

    g = Graph.from_edgelist(bowtie_edges(spark, sf_dir), directed=True, renumber=False)
    return bowtie_structure(g)


# Oracle: full directed + undirected transitive closures (600 vertices fit
# comfortably), then the Broder class rules verbatim — largest SCC by
# (count desc, label asc), IN/OUT by reach to/from it, giant weak
# component, TUBES = fwd(IN) ∩ bwd(OUT) inside the leftovers.
BOWTIE_SQL = f"""
WITH RECURSIVE {BOWTIE_EDGES_CTES},
reach(a, b) AS (
    SELECT src AS a, dst AS b FROM bt_edges
    UNION
    SELECT r.a, e.dst AS b FROM reach r JOIN bt_edges e ON r.b = e.src
),
bt_uedges AS MATERIALIZED (
    SELECT src, dst FROM bt_edges UNION SELECT dst, src FROM bt_edges
),
ureach(a, b) AS (
    SELECT src AS a, dst AS b FROM bt_uedges
    UNION
    SELECT r.a, e.dst AS b FROM ureach r JOIN bt_uedges e ON r.b = e.src
),
univ AS (SELECT unnest(generate_series(0,
         (SELECT max(greatest(src, dst)) FROM bt_edges))) AS v),
mutual AS (SELECT r1.a AS v, min(r1.b) AS m
           FROM reach r1 JOIN reach r2 ON r1.b = r2.a AND r2.b = r1.a
           GROUP BY r1.a),
comp AS (SELECT u.v, least(u.v, coalesce(m.m, u.v)) AS c
         FROM univ u LEFT JOIN mutual m ON u.v = m.v),
core_id AS (SELECT c FROM comp GROUP BY c ORDER BY count(*) DESC, c ASC LIMIT 1),
corev AS (SELECT v FROM comp WHERE c = (SELECT c FROM core_id)),
inv AS (SELECT DISTINCT r.a AS v FROM reach r
        WHERE r.b IN (SELECT v FROM corev) AND r.a NOT IN (SELECT v FROM corev)),
outv AS (SELECT DISTINCT r.b AS v FROM reach r
         WHERE r.a IN (SELECT v FROM corev) AND r.b NOT IN (SELECT v FROM corev)),
fwdin AS (SELECT v FROM inv
          UNION SELECT DISTINCT r.b AS v FROM reach r WHERE r.a IN (SELECT v FROM inv)),
bwdout AS (SELECT v FROM outv
           UNION SELECT DISTINCT r.a AS v FROM reach r WHERE r.b IN (SELECT v FROM outv)),
wmin AS (SELECT a AS v, min(b) AS m FROM ureach GROUP BY a),
wcomp AS (SELECT u.v, least(u.v, coalesce(w.m, u.v)) AS c
          FROM univ u LEFT JOIN wmin w ON u.v = w.v),
giant AS (SELECT c FROM wcomp GROUP BY c ORDER BY count(*) DESC, c ASC LIMIT 1)
SELECT CAST(u.v AS BIGINT) AS vertex,
       CASE WHEN u.v IN (SELECT v FROM corev) THEN 'CORE'
            WHEN u.v IN (SELECT v FROM inv) THEN 'IN'
            WHEN u.v IN (SELECT v FROM outv) THEN 'OUT'
            WHEN (SELECT c FROM wcomp w WHERE w.v = u.v) <> (SELECT c FROM giant)
                 THEN 'DISCONNECTED'
            WHEN u.v IN (SELECT v FROM fwdin) AND u.v IN (SELECT v FROM bwdout)
                 THEN 'TUBES'
            ELSE 'TENDRILS' END AS cls
FROM univ u
"""


QUERIES["bowtie"] = q_bowtie
ORACLES["bowtie"] = BOWTIE_SQL


# ---------------------------------------------------------------------------
# corpus n-gram LM count tables (Kneser-Ney continuation counts)
# ---------------------------------------------------------------------------


def q_doc_ngram_lm(spark, sf_dir):
    """Corpus 1..3-gram counts + KN continuation counts over the documents
    table (text/lm.py), top-300 per order by (cnt desc, gram) so the row
    count stays bounded while the heavy head of the distribution — the
    part an LM pipeline actually smooths — is value-checked exactly."""
    from pyspark.sql import Window

    from .text.lm import ngram_lm_counts

    d = _documents(spark, sf_dir).select("doc_id", "text")
    counts = ngram_lm_counts(d, n_max=3, min_count=2)
    w = Window.partitionBy("ord").orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 300)
        .select("ord", "gram", "cnt", "cont_cnt", "rnk")
    )


DOC_NGRAM_LM_SQL = """
WITH toks AS (SELECT doc_id, str_split(lower(trim(text)), ' ') AS t FROM documents),
pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks),
g AS (
  SELECT 1 AS ord, t[i] AS gram FROM pos
  UNION ALL
  SELECT 2, array_to_string(t[i:i+1], ' ') FROM pos WHERE i + 1 <= len(t)
  UNION ALL
  SELECT 3, array_to_string(t[i:i+2], ' ') FROM pos WHERE i + 2 <= len(t)
),
cnts AS (SELECT ord, gram, count(*) AS cnt FROM g GROUP BY ord, gram),
cont AS (
  SELECT ord - 1 AS ord,
         substring(gram, position(' ' IN gram) + 1) AS gram,
         count(*) AS cont_cnt
  FROM cnts WHERE ord >= 2 GROUP BY 1, 2
),
ranked AS (
  SELECT c.ord, c.gram, c.cnt, coalesce(ct.cont_cnt, 0) AS cont_cnt,
         row_number() OVER (PARTITION BY c.ord ORDER BY c.cnt DESC, c.gram ASC) AS rnk
  FROM cnts c LEFT JOIN cont ct ON c.ord = ct.ord AND c.gram = ct.gram
  WHERE c.cnt >= 2
)
SELECT CAST(ord AS BIGINT) AS ord, gram, CAST(cnt AS BIGINT) AS cnt,
       CAST(cont_cnt AS BIGINT) AS cont_cnt, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 300
"""


QUERIES["doc_ngram_lm"] = q_doc_ngram_lm
ORACLES["doc_ngram_lm"] = DOC_NGRAM_LM_SQL


# ---------------------------------------------------------------------------
# crawl snapshot delta (linkgraph/crawl.py)
# ---------------------------------------------------------------------------


def q_crawl_delta(spark, sf_dir):
    """Two-crawl recrawl pipeline over REAL rendered html: snapshot t0 is
    docs with doc_id%13!=0 (links k=1..3 at (i*31+7k)%n), snapshot t1 is
    docs with doc_id%17!=3 (docs with i%5==1 are CHANGED: ' v2' body, links
    (i*37+11k)%n); the new crawl also carries stale t0 recaptures for
    i%7==2 so latest_snapshot's max-of-struct resolution is exercised.
    Production path: latest_snapshot -> crawl_delta (md5 of html, bodies
    never shuffled) -> edge_delta_from_crawls (extraction UDF touches only
    moved pages). Output: per-url status + signed edge-delta counts; the
    oracle re-derives everything relationally."""
    from .crawl import crawl_delta, edge_delta_from_crawls, latest_snapshot

    d = _documents(spark, sf_dir).select("doc_id", "text")
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1
    i = F.col("doc_id")
    url = F.concat(F.lit("doc://"), i.cast("string"))

    def render(mul, off, v2):
        parts = [F.lit("<html><body><p>"), F.col("text")]
        if v2:
            parts.append(F.lit(" v2"))
        parts.append(F.lit("</p><ul>"))
        for k in (1, 2, 3):
            tgt = (i * mul + off * k) % F.lit(n)
            parts += [
                F.lit('<li><a href="doc://'),
                tgt.cast("string"),
                F.lit('">l</a></li>'),
            ]
        parts.append(F.lit("</ul></body></html>"))
        return F.concat(*parts)

    chg = i % 5 == 1
    html0 = render(31, 7, False)
    html1 = F.when(chg, render(37, 11, True)).otherwise(html0)
    t0 = d.filter(i % 13 != 0).select(
        url.alias("url"),
        F.timestamp_seconds(i + 1000).alias("warc_ts"),
        html0.alias("html"),
    )
    t1 = d.filter(i % 17 != 3).select(
        url.alias("url"),
        F.timestamp_seconds(i + 2000).alias("warc_ts"),
        html1.alias("html"),
    )
    stale = d.filter((i % 7 == 2) & (i % 13 != 0) & (i % 17 != 3)).select(
        url.alias("url"),
        F.timestamp_seconds(i + 1000).alias("warc_ts"),
        html0.alias("html"),
    )
    old = latest_snapshot(t0)
    new = latest_snapshot(t1.unionByName(stale))
    st = crawl_delta(old, new)
    ed = edge_delta_from_crawls(old, new, statuses=st)
    agg = ed.groupBy(F.col("src").alias("url")).agg(
        F.sum(F.when(F.col("op") == 1, 1).otherwise(0)).alias("edge_adds"),
        F.sum(F.when(F.col("op") == -1, 1).otherwise(0)).alias("edge_dels"),
    )
    return st.join(agg, on="url", how="left").select(
        "url",
        "status",
        F.coalesce(F.col("edge_adds"), F.lit(0)).cast("long").alias("edge_adds"),
        F.coalesce(F.col("edge_dels"), F.lit(0)).cast("long").alias("edge_dels"),
    )


CRAWL_DELTA_SQL = """
WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
base AS (
  SELECT doc_id, doc_id % 5 = 1 AS chg,
         doc_id % 13 <> 0 AS in0, doc_id % 17 <> 3 AS in1
  FROM documents
),
st AS (
  SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN in0 AND NOT in1 THEN 'removed'
              WHEN in1 AND NOT in0 THEN 'added'
              WHEN chg THEN 'changed' ELSE 'unchanged' END AS status
  FROM base WHERE in0 OR in1
),
ks AS (SELECT unnest([1, 2, 3]) AS k),
oe AS (
  SELECT DISTINCT 'doc://' || CAST(b.doc_id AS VARCHAR) AS src,
         'doc://' || CAST((b.doc_id * 31 + 7 * ks.k) % n.n AS VARCHAR) AS dst
  FROM base b CROSS JOIN n CROSS JOIN ks
  WHERE b.in0 AND (NOT b.in1 OR b.chg)
),
ne AS (
  SELECT DISTINCT 'doc://' || CAST(b.doc_id AS VARCHAR) AS src,
         'doc://' || CAST((b.doc_id * (CASE WHEN b.chg THEN 37 ELSE 31 END)
                           + (CASE WHEN b.chg THEN 11 ELSE 7 END) * ks.k) % n.n
                          AS VARCHAR) AS dst
  FROM base b CROSS JOIN n CROSS JOIN ks
  WHERE b.in1 AND (NOT b.in0 OR b.chg)
),
ed AS (
  SELECT coalesce(oe.src, ne.src) AS url,
         CASE WHEN oe.src IS NULL THEN 1 ELSE -1 END AS op
  FROM oe FULL OUTER JOIN ne ON oe.src = ne.src AND oe.dst = ne.dst
  WHERE oe.src IS NULL OR ne.src IS NULL
),
agg AS (
  SELECT url,
         sum(CASE WHEN op = 1 THEN 1 ELSE 0 END) AS edge_adds,
         sum(CASE WHEN op = -1 THEN 1 ELSE 0 END) AS edge_dels
  FROM ed GROUP BY url
)
SELECT st.url, st.status,
       CAST(coalesce(agg.edge_adds, 0) AS BIGINT) AS edge_adds,
       CAST(coalesce(agg.edge_dels, 0) AS BIGINT) AS edge_dels
FROM st LEFT JOIN agg ON st.url = agg.url
"""


QUERIES["crawl_delta"] = q_crawl_delta
ORACLES["crawl_delta"] = CRAWL_DELTA_SQL


# ---------------------------------------------------------------------------
# skip-gram walk pair counts (DeepWalk/node2vec training data)
# ---------------------------------------------------------------------------


WALK_PAIRS_WINDOW = 2


def q_walk_pairs(spark, sf_dir):
    """Deterministic LCG walks (the green random_walks dialect) fed through
    skipgram_pairs: the DeepWalk training-pair artifact. The oracle replays
    the full walks and derives pairs with a step-distance self-join —
    semantically identical to the production array expansion."""
    from .algorithms.random_walks import random_walks, skipgram_pairs

    g = Graph.from_edgelist(supply_edges(spark, sf_dir), directed=True, renumber=False)
    walks = random_walks(
        g, list(range(RW_STARTS)), max_depth=RW_DEPTH, rank_mode="lcg"
    )
    return skipgram_pairs(walks, window=WALK_PAIRS_WINDOW).select(
        F.col("center").cast("long").alias("center"),
        F.col("context").cast("long").alias("context"),
        F.col("cnt").cast("long").alias("cnt"),
    )


def _walk_pairs_oracle() -> str:
    base = _random_walks_oracle()
    return (
        f"WITH walks AS MATERIALIZED (\n{base}\n)\n"
        f"SELECT CAST(a.vertex AS BIGINT) AS center, "
        f"CAST(b.vertex AS BIGINT) AS context, count(*) AS cnt\n"
        f"FROM walks a JOIN walks b ON a.walk_id = b.walk_id "
        f"AND a.step <> b.step AND abs(a.step - b.step) <= {WALK_PAIRS_WINDOW}\n"
        f"GROUP BY 1, 2"
    )


QUERIES["walk_pairs"] = q_walk_pairs
ORACLES["walk_pairs"] = _walk_pairs_oracle()


# ---------------------------------------------------------------------------
# butterfly counts (bipartite 4-cycle motif)
# ---------------------------------------------------------------------------


def q_butterflies(spark, sf_dir):
    """Per-order butterfly participation on the order->part bipartite link
    graph (algorithms/cocitation.py butterfly_count, side=src): pairs of
    orders sharing parts -> C(shared, 2) summed per vertex."""
    from .algorithms.cocitation import butterfly_count

    g = Graph.from_edgelist(link_edges(spark, sf_dir), directed=True, renumber=False)
    return butterfly_count(g, side="src").select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("butterflies").cast("long").alias("butterflies"),
    )


BUTTERFLIES_SQL = f"""
WITH edges AS MATERIALIZED ({LINK_EDGES_SQL}),
p AS (
  SELECT a.src AS first, b.src AS second, count(*) AS c
  FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
),
v AS (
  SELECT first AS vertex, (c * (c - 1)) // 2 AS b FROM p
  UNION ALL
  SELECT second AS vertex, (c * (c - 1)) // 2 AS b FROM p
)
SELECT CAST(vertex AS BIGINT) AS vertex, CAST(sum(b) AS BIGINT) AS butterflies
FROM v GROUP BY vertex HAVING sum(b) > 0
"""


QUERIES["butterflies"] = q_butterflies
ORACLES["butterflies"] = BUTTERFLIES_SQL


# ---------------------------------------------------------------------------
# greedy coloring (Jones-Plassmann, LCG priorities)
# ---------------------------------------------------------------------------


COLOR_EDGES_SQL = (
    "SELECT DISTINCT o_orderkey % 3000 AS src, (o_custkey * 13 + 7) % 3000 AS dst "
    "FROM orders WHERE o_orderkey % 3000 <> (o_custkey * 13 + 7) % 3000"
)
COLOR_ROUNDS = 40  # sf0.001 needs 7, sf0.01 needs 32; guard row past that


def color_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse (avg degree ~10 at sf0.01) deterministic graph for coloring —
    the supply/link graphs are too dense for a JP driver query (JP rounds =
    longest decreasing-priority path, which approaches V as density grows)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = F.col("o_orderkey") % 3000
    dst = (F.col("o_custkey") * 13 + 7) % 3000
    return (
        o.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_coloring(spark, sf_dir):
    """Jones-Plassmann greedy coloring (algorithms/coloring.py) on the
    sparse orders-derived graph; the oracle replays every round (winner
    selection by LCG key + mex of colored neighbors) verbatim, with a
    poison row if the unroll depth is exceeded."""
    from .algorithms.coloring import greedy_color

    g = Graph.from_edgelist(color_edges(spark, sf_dir), directed=True, renumber=False)
    return greedy_color(g).select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("color").cast("long").alias("color"),
    )


def _coloring_oracle() -> str:
    from .algorithms.mis import MIS_LCG_A, MIS_LCG_C, MIS_LCG_M

    def key(col):
        return f"((({MIS_LCG_A} * {col} + {MIS_LCG_C}) % {MIS_LCG_M}) * 4294967296 + {col})"

    parts = [
        f"WITH e0 AS MATERIALIZED ({COLOR_EDGES_SQL})",
        "edges AS MATERIALIZED (SELECT src, dst FROM e0 "
        "UNION SELECT dst, src FROM e0)",
        "univ AS (SELECT unnest(generate_series(0, "
        "(SELECT max(greatest(src, dst)) FROM edges))) AS v)",
        "act1 AS MATERIALIZED (SELECT v FROM univ)",
        "colors0 AS (SELECT CAST(NULL AS BIGINT) AS v, CAST(NULL AS BIGINT) AS c WHERE 1=0)",
    ]
    for k in range(1, COLOR_ROUNDS + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT a.v FROM act{k} a WHERE NOT EXISTS ("
            f"SELECT 1 FROM edges e JOIN act{k} b ON e.src = b.v "
            f"WHERE e.dst = a.v AND {key('b.v')} < {key('a.v')}))"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT w.v, coalesce((SELECT min(g.x) "
            f"FROM generate_series(0, 4096) AS g(x) WHERE g.x NOT IN "
            f"(SELECT col.c FROM edges e JOIN colors{k-1} col ON e.src = col.v "
            f"WHERE e.dst = w.v)), 0) AS c FROM w{k} w)"
        )
        parts.append(
            f"colors{k} AS MATERIALIZED (SELECT * FROM colors{k-1} "
            f"UNION ALL SELECT * FROM c{k})"
        )
        parts.append(
            f"act{k+1} AS MATERIALIZED (SELECT v FROM act{k} "
            f"WHERE v NOT IN (SELECT v FROM w{k}))"
        )
    final = COLOR_ROUNDS
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(v AS BIGINT) AS vertex, CAST(c AS BIGINT) AS color "
        f"FROM colors{final}\n"
        f"UNION ALL SELECT -1, -1 FROM (SELECT v FROM act{final + 1} LIMIT 1)"
    )


QUERIES["coloring"] = q_coloring
ORACLES["coloring"] = _coloring_oracle()


# ---------------------------------------------------------------------------
# token-budget mix sampling (greedy per-stratum fill in LCG order)
# ---------------------------------------------------------------------------

MIX_BUDGETS = {"en": 5000, "de": 2000}
MIX_DEFAULT_BUDGET = 1000


def q_doc_mix_sample(spark, sf_dir):
    """Token-budget mix assembly (text/pipeline.py token_budget_sample):
    fill 5000 en / 2000 de / 1000-per-other-language token budgets greedily
    in deterministic LCG order. The engine locates each stratum's cutoff
    with the two-level bucket-histogram scheme (only the straddling bucket
    pays a window); the oracle replays the NAIVE full-stratum window in SQL
    — independent derivations that must agree exactly."""
    from .text.pipeline import token_budget_sample

    d = _documents(spark, sf_dir)
    out = token_budget_sample(
        d, MIX_BUDGETS, strata_col="lang", key_col="doc_id",
        text_col="text", default_budget=MIX_DEFAULT_BUDGET, bucket_bits=4,
    )
    return out.select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tokens"),
    )


ORACLES["doc_mix_sample"] = f"""
WITH t AS (
    SELECT doc_id, lang,
           (1103515245 * doc_id + 12345) % 2147483648 AS u,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
    FROM documents
), w AS (
    SELECT doc_id, lang, n_tokens,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY u, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
    FROM t
)
SELECT doc_id, lang, n_tokens FROM w
WHERE prefix < CASE lang
    WHEN 'en' THEN {MIX_BUDGETS["en"]}
    WHEN 'de' THEN {MIX_BUDGETS["de"]}
    ELSE {MIX_DEFAULT_BUDGET} END
"""

QUERIES["doc_mix_sample"] = q_doc_mix_sample


# ---------------------------------------------------------------------------
# hashed linear quality classifier (fastText-shaped, integer weights)
# ---------------------------------------------------------------------------

QCLS_BUCKETS = 512
QCLS_THRESHOLD_E3 = 0


def q_doc_quality_classifier(spark, sf_dir):
    """Hashed-bag-of-ngrams linear scorer (text/pipeline.py
    hashed_linear_quality): unigram + positional-bigram buckets via the
    shared char-LCG fold, integer weights from a second LCG, keep by
    integer cross-multiplied mean threshold. Map-only / zero shuffle; the
    oracle replays feature construction row-wise in SQL."""
    from .text.pipeline import hashed_linear_quality

    d = _documents(spark, sf_dir)
    return hashed_linear_quality(
        d, num_buckets=QCLS_BUCKETS, threshold_e3=QCLS_THRESHOLD_E3
    ).select(F.col("id").alias("doc_id"), "n_features", "score", "keep")


def _qcls_oracle() -> str:
    from .text.dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P
    from .text.pipeline import LCG_A, LCG_C, LCG_M

    w = f"((({LCG_A}::BIGINT * f + {LCG_C}) % {LCG_M}) % 257 - 128)"
    return f"""
    WITH words AS MATERIALIZED (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    tokpos AS MATERIALIZED (
        SELECT doc_id, i, w[i] AS tok FROM (
            SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM words)),
    tokchars AS (
        SELECT doc_id, i, tok, unnest(generate_series(1, length(tok))) AS j
        FROM tokpos),
    csum AS (
        SELECT doc_id, i,
               sum(ascii(substring(tok, j, 1)) *
                   (({MH_LCG_A}::BIGINT * j + {MH_LCG_B}) % {MH_LCG_P}))
                 % {MH_LCG_P} AS code
        FROM tokchars GROUP BY doc_id, i),
    codes AS MATERIALIZED (
        SELECT t.doc_id, t.i, coalesce(c.code, 0) % {QCLS_BUCKETS} AS b
        FROM tokpos t LEFT JOIN csum c ON t.doc_id = c.doc_id AND t.i = c.i),
    uni AS (
        SELECT doc_id, count(*) AS n_uni, sum({w.replace('f', 'b')}) AS s_uni
        FROM codes GROUP BY doc_id),
    bi AS (
        SELECT a.doc_id, count(*) AS n_bi,
               sum({w.replace('f', f'(a.b * {QCLS_BUCKETS} + c.b)')}) AS s_bi
        FROM codes a JOIN codes c ON a.doc_id = c.doc_id AND c.i = a.i + 1
        GROUP BY a.doc_id)
    SELECT u.doc_id,
           CAST(u.n_uni + coalesce(b.n_bi, 0) AS BIGINT) AS n_features,
           CAST(u.s_uni + coalesce(b.s_bi, 0) AS BIGINT) AS score,
           CAST(CASE WHEN (u.s_uni + coalesce(b.s_bi, 0)) * 1000 >=
                {QCLS_THRESHOLD_E3} * (u.n_uni + coalesce(b.n_bi, 0))
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM uni u LEFT JOIN bi b ON u.doc_id = b.doc_id
    """


QUERIES["doc_quality_classifier"] = q_doc_quality_classifier
ORACLES["doc_quality_classifier"] = _qcls_oracle()


# ---------------------------------------------------------------------------
# product quantization + ADC top-k
# ---------------------------------------------------------------------------

PQ_M = 4
PQ_K = 16
PQ_ITERS = 2
PQ_TOPK = 5
PQ_QMOD = 32
PQ_RERANK = 250


def q_emb_pq_topk(spark, sf_dir):
    """PQ compression + asymmetric-distance search (similarity.py
    pq_train_encode / pq_adc_topk): m=4 integer L2 codebooks trained by
    exact-arithmetic k-means, every vector encoded to 4 codes, queries
    scored by table lookup (sum of per-subspace dots against the assigned
    codeword). The oracle replays codebook training, encoding, and the ADC
    ranking bit-for-bit."""
    from .similarity import pq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % PQ_QMOD == 0)
    return pq_adc_topk(
        emb, qs, m=PQ_M, k=PQ_K, topk=PQ_TOPK, iterations=PQ_ITERS
    ).select("query_id", "neighbor_id", "score", "rnk")


def _pq_cte_parts() -> list[str]:
    """Shared CTE chain for the PQ oracles, ending in scores(qid, id, score)."""
    m, k, iters, ds = PQ_M, PQ_K, PQ_ITERS, KM_DIM // PQ_M
    lcg = "(id * 1103515245 + 12345) % 2147483648"
    parts = [
        "qv AS MATERIALIZED (SELECT vec_id AS id, t.i AS i, "
        f"CAST(round(CAST(embedding[t.i] AS DOUBLE) * {KM_SCALE}) AS BIGINT) AS q "
        f"FROM embeddings, generate_series(1, {KM_DIM}) AS t(i))",
        f"seeds AS MATERIALIZED (SELECT id, row_number() OVER (ORDER BY {lcg}, id) - 1 AS c "
        f"FROM (SELECT DISTINCT id FROM qv) ORDER BY {lcg}, id LIMIT {PQ_K})",
    ]
    for j in range(m):
        lo, hi = j * ds, (j + 1) * ds
        dimf = f"q.i > {lo} AND q.i <= {hi}"
        parts.append(
            f"pc{j}_0 AS MATERIALIZED (SELECT s.c, q.i - {lo} AS i, q.q "
            f"FROM seeds s JOIN qv q ON q.id = s.id WHERE {dimf})"
        )
        for t in range(1, iters + 1):
            parts.append(
                f"pa{j}_{t} AS MATERIALIZED (SELECT id, c FROM ("
                f"SELECT q.id, ct.c, row_number() OVER (PARTITION BY q.id "
                f"ORDER BY sum((q.q - ct.q)*(q.q - ct.q)) ASC, ct.c ASC) AS rn "
                f"FROM qv q JOIN pc{j}_{t-1} ct ON ct.i = q.i - {lo} "
                f"WHERE {dimf} GROUP BY q.id, ct.c) WHERE rn = 1)"
            )
            parts.append(
                f"ps{j}_{t} AS (SELECT a.c, q.i - {lo} AS i, sum(q.q) AS s, "
                f"count(*) AS n FROM pa{j}_{t} a JOIN qv q ON q.id = a.id "
                f"WHERE {dimf} GROUP BY a.c, q.i)"
            )
            parts.append(
                f"pc{j}_{t} AS MATERIALIZED (SELECT p.c, p.i, "
                f"CASE WHEN su.s IS NULL THEN p.q "
                f"ELSE CAST(round(su.s / su.n) AS BIGINT) END AS q "
                f"FROM pc{j}_{t-1} p LEFT JOIN ps{j}_{t} su "
                f"ON su.c = p.c AND su.i = p.i)"
            )
        parts.append(
            f"pcode{j} AS MATERIALIZED (SELECT id, c FROM ("
            f"SELECT q.id, ct.c, row_number() OVER (PARTITION BY q.id "
            f"ORDER BY sum((q.q - ct.q)*(q.q - ct.q)) ASC, ct.c ASC) AS rn "
            f"FROM qv q JOIN pc{j}_{iters} ct ON ct.i = q.i - {lo} "
            f"WHERE {dimf} GROUP BY q.id, ct.c) WHERE rn = 1)"
        )
        parts.append(
            f"tq{j} AS MATERIALIZED (SELECT q.id AS qid, ct.c, "
            f"sum(q.q * ct.q) AS t FROM qv q "
            f"JOIN pc{j}_{iters} ct ON ct.i = q.i - {lo} "
            f"WHERE q.id % {PQ_QMOD} = 0 AND {dimf} GROUP BY q.id, ct.c)"
        )
    joins = ["pcode0 c0"]
    for j in range(1, m):
        joins.append(f"JOIN pcode{j} c{j} ON c{j}.id = c0.id")
    joins.append("JOIN tq0 t0 ON t0.c = c0.c")
    for j in range(1, m):
        joins.append(f"JOIN tq{j} t{j} ON t{j}.c = c{j}.c AND t{j}.qid = t0.qid")
    ssum = " + ".join(f"t{j}.t" for j in range(m))
    parts.append(
        "scores AS MATERIALIZED (SELECT t0.qid, c0.id, "
        f"({ssum}) AS score FROM {' '.join(joins)})"
    )
    return parts


def _pq_oracle() -> str:
    return (
        "WITH " + ",\n".join(_pq_cte_parts()) + f"""
SELECT qid AS query_id, id AS neighbor_id, score,
       CAST(rn AS BIGINT) AS rnk
FROM (SELECT qid, id, score, row_number() OVER (
          PARTITION BY qid ORDER BY score DESC, id DESC) AS rn
      FROM scores)
WHERE rn <= {PQ_TOPK}
"""
    )


QUERIES["emb_pq_topk"] = q_emb_pq_topk
ORACLES["emb_pq_topk"] = _pq_oracle()


def q_emb_pq_recall(spark, sf_dir):
    """Recall@k of the ADC ranking against the exact integer-quantized
    top-k (self included on both sides — ADC does not exclude the query
    from the base scan), with AND without the exact-rerank refinement
    tier (similarity.py pq_adc_topk rerank=R — Jegou et al. §IV-C). Both
    sides are deterministic integer rankings, so unlike the IVF recall
    row no sidecar is needed: the oracle re-derives the PQ side (full
    training replay), the rerank tier, AND the exact side in SQL and the
    per-query recalls must match EXACTLY. Measured: recall@5 median 0.40
    (range 0.2-0.6) at m=4/k=16 on the near-uniform driver vectors — the
    honest cost of 32x compression with NO rerank stage — vs 1.00 median
    (min 0.80) with the R=250 rerank tier (`recall_rerank_e2`), the production
    shape: ADC shortlist into one bounded exact integer-dot join."""
    from .similarity import pq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % PQ_QMOD == 0)
    pq = pq_adc_topk(
        emb, qs, m=PQ_M, k=PQ_K, topk=PQ_TOPK, iterations=PQ_ITERS
    ).select("query_id", "neighbor_id")
    pq_rr = pq_adc_topk(
        emb, qs, m=PQ_M, k=PQ_K, topk=PQ_TOPK, iterations=PQ_ITERS,
        rerank=PQ_RERANK,
    ).select("query_id", "neighbor_id")

    qe = qs.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("be"))
    dot = F.expr(
        "aggregate(zip_with(qe, be, (x, y) -> "
        f"cast(round(cast(x as double)*{KM_SCALE}) as bigint) * "
        f"cast(round(cast(y as double)*{KM_SCALE}) as bigint)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    # BOUNDED quadratic surface: this cross join is the ORACLE-SUPPORT leg
    # of the recall measurement (ground truth = exact top-k per query), so
    # it is Q x B rows by definition — Q is gated here, and B is the
    # driver-scale embeddings table (<= a few thousand rows). Production
    # ANN paths are the bucketed LSH/IVF/PQ tiers, never this join.
    n_q = qs.count()
    if n_q > 512:
        raise ValueError(
            f"emb_pq_recall exact side is gated to <= 512 queries (got {n_q}): "
            "the ground-truth cross join is quadratic by design"
        )
    exact = (
        qe.join(b, F.lit(True))
        .select("query_id", "neighbor_id", dot.alias("dot_q"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PQ_TOPK)
        .select("query_id", "neighbor_id")
    )
    per_q = 100 // PQ_TOPK
    hits = exact.withColumn("hit", F.lit(1))

    def _recall(top, col):
        return (
            top.join(hits, on=["query_id", "neighbor_id"], how="left")
            .groupBy("query_id")
            .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) * per_q)
                 .cast("long").alias(col))
        )

    return _recall(pq, "recall_e2").join(
        _recall(pq_rr, "recall_rerank_e2"), on="query_id"
    )


def _pq_recall_oracle() -> str:
    per_q = 100 // PQ_TOPK
    return (
        "WITH " + ",\n".join(_pq_cte_parts()) + f""",
pqtop AS (SELECT qid, id FROM (
    SELECT qid, id, row_number() OVER (
        PARTITION BY qid ORDER BY score DESC, id DESC) AS rn
    FROM scores) t WHERE rn <= {PQ_TOPK}),
epairs AS (
    SELECT qq.id AS qid, bb.id AS nid, sum(qq.q * bb.q) AS dot_q
    FROM qv qq JOIN qv bb ON bb.i = qq.i
    WHERE qq.id % {PQ_QMOD} = 0
    GROUP BY qq.id, bb.id),
etop AS (SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (
        PARTITION BY qid ORDER BY dot_q DESC, nid ASC) AS rn
    FROM epairs) t WHERE rn <= {PQ_TOPK}),
rcand AS (SELECT qid, id FROM (
    SELECT qid, id, row_number() OVER (
        PARTITION BY qid ORDER BY score DESC, id DESC) AS rn
    FROM scores) t WHERE rn <= {PQ_RERANK}),
rtop AS (SELECT qid, id FROM (
    SELECT r.qid, r.id, row_number() OVER (
        PARTITION BY r.qid ORDER BY e.dot_q DESC, r.id DESC) AS rn
    FROM rcand r JOIN epairs e ON e.qid = r.qid AND e.nid = r.id)
    t WHERE rn <= {PQ_TOPK}),
rec0 AS (SELECT p.qid, CAST(count(e.nid) * {per_q} AS BIGINT) AS recall_e2
         FROM pqtop p LEFT JOIN etop e ON e.qid = p.qid AND e.nid = p.id
         GROUP BY p.qid),
rec1 AS (SELECT p.qid, CAST(count(e.nid) * {per_q} AS BIGINT)
             AS recall_rerank_e2
         FROM rtop p LEFT JOIN etop e ON e.qid = p.qid AND e.nid = p.id
         GROUP BY p.qid)
SELECT rec0.qid AS query_id, rec0.recall_e2, rec1.recall_rerank_e2
FROM rec0 JOIN rec1 ON rec1.qid = rec0.qid
"""
    )


QUERIES["emb_pq_recall"] = q_emb_pq_recall
ORACLES["emb_pq_recall"] = _pq_recall_oracle()


# ---------------------------------------------------------------------------
# FM distinct-count sketches over shingles (vocabulary cardinality per lang)
# ---------------------------------------------------------------------------

FMD_REGS = 8
FMD_SEED = 7
FMD_K = 3  # 3-word shingles


def q_lang_shingle_fm(spark, sf_dir):
    """Per-language distinct-shingle cardinality sketches
    (text/analysis.py fm_distinct_sketches): the countDistinct-free corpus
    stat. Emits the raw FM registers — exact integers — like the `anf`
    row; the float 2^R/phi estimate stays a pytest-pinned convenience."""
    from .text.analysis import fm_distinct_sketches, word_shingles

    d = _documents(spark, sf_dir)
    sh = word_shingles(d, "text", "doc_id", FMD_K).join(
        d.select("doc_id", "lang"), on="doc_id"
    )
    return fm_distinct_sketches(
        sh, "lang", "shingle", num_registers=FMD_REGS, seed=FMD_SEED
    ).select("lang", F.col("j").cast("long").alias("j"), "mask")


def _fm_oracle() -> str:
    from .algorithms.anf import LCG_A, LCG_C, LCG_J, LCG_M, LCG_TZ_CAP
    from .text.dedup import MH_LCG_A, MH_LCG_B, MH_LCG_P

    mask31 = LCG_M - 1
    return f"""
    WITH words AS MATERIALIZED (
        SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
    idx AS (SELECT doc_id, lang, w,
            unnest(generate_series(1, greatest(len(w) - {FMD_K - 1}, 1)))
            AS i FROM words),
    sh AS MATERIALIZED (
        -- DISTINCT: h0 below folds chars GROUPED BY (lang, shingle);
        -- duplicate rows would multiply-count the char products. The
        -- engine computes h0 row-wise, where duplicates are harmless
        -- (identical masks, idempotent under BIT_OR).
        SELECT DISTINCT lang, array_to_string(w[i:i+{FMD_K - 1}], ' ') AS shingle
        FROM idx),
    shc AS (SELECT lang, shingle, unnest(generate_series(1, length(shingle))) AS i
            FROM sh),
    h0 AS MATERIALIZED (
        SELECT lang, shingle,
               sum(ascii(substring(shingle, i, 1)) *
                   (({MH_LCG_A}::BIGINT * i + {MH_LCG_B}) % {MH_LCG_P}))
                 % {MH_LCG_P} AS h0
        FROM shc GROUP BY lang, shingle),
    reg AS (SELECT lang, h0, unnest(generate_series(0, {FMD_REGS - 1})) AS j
            FROM h0),
    m0 AS (SELECT lang, j, (({LCG_A} * (h0 + j * {LCG_J} + {FMD_SEED})
            + {LCG_C}) % {LCG_M}) AS h FROM reg),
    m1 AS (SELECT lang, j, xor(h, (h << 13) & {mask31}) AS h FROM m0),
    m2 AS (SELECT lang, j, xor(h, h >> 17) AS h FROM m1),
    m3 AS (SELECT lang, j, xor(h, (h << 5) & {mask31}) AS h FROM m2),
    masks AS (SELECT lang, j, (CAST(1 AS BIGINT) <<
        (CASE WHEN h = 0 THEN {LCG_TZ_CAP}
         ELSE least(bit_count((h & -h) - 1), {LCG_TZ_CAP}) END)) AS mask
        FROM m3)
    SELECT lang, CAST(j AS BIGINT) AS j, bit_or(mask) AS mask
    FROM masks GROUP BY lang, j
    """


QUERIES["lang_shingle_fm"] = q_lang_shingle_fm
ORACLES["lang_shingle_fm"] = _fm_oracle()


# ---------------------------------------------------------------------------
# K4 (4-clique) motif counts
# ---------------------------------------------------------------------------


def q_four_cliques(spark, sf_dir):
    """Exact K4 count (algorithms/triangles.py four_clique_count) on the
    supply graph UNION a planted K20 at ids 10000..10019 (C(20,4)=4845
    guaranteed cliques plus whatever the organic graph holds). Emits the
    triangle count alongside for motif-family context; the oracle
    re-derives both with independent 3-way/6-way adjacency joins."""
    from .algorithms.triangles import four_clique_count, triangle_count

    ids = spark.range(20).select(F.col("id").cast("long").alias("i"))
    clique = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .filter(F.col("a.i") < F.col("b.i"))
        .select(
            (F.lit(10000) + F.col("a.i")).alias("src"),
            (F.lit(10000) + F.col("b.i")).alias("dst"),
        )
    )
    raw = supply_edges(spark, sf_dir).unionByName(clique)
    g = Graph.from_edgelist(raw, directed=False, renumber=False)
    n_tri = triangle_count(g)
    n_k4 = four_clique_count(g)
    return spark.createDataFrame(
        [(int(n_tri), int(n_k4))], "n_triangles LONG, n_k4 LONG"
    )


FOUR_CLIQUE_SQL = f"""
    WITH raw AS (SELECT src, dst FROM ({{supply}})
                 UNION ALL
                 SELECT 10000 + a.i AS src, 10000 + b.i AS dst
                 FROM generate_series(0, 19) AS a(i), generate_series(0, 19) AS b(i)
                 WHERE a.i < b.i),
    s AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM raw WHERE src <> dst),
    tri AS (SELECT count(*) AS n FROM s ab
            JOIN s ac ON ac.u = ab.u AND ac.v > ab.v
            JOIN s bc ON bc.u = ab.v AND bc.v = ac.v),
    k4 AS (SELECT count(*) AS n FROM s ab
           JOIN s ac ON ac.u = ab.u AND ac.v > ab.v
           JOIN s ad ON ad.u = ab.u AND ad.v > ac.v
           JOIN s bc ON bc.u = ab.v AND bc.v = ac.v
           JOIN s bd ON bd.u = ab.v AND bd.v = ad.v
           JOIN s cd ON cd.u = ac.v AND cd.v = ad.v)
    SELECT CAST(tri.n AS BIGINT) AS n_triangles, CAST(k4.n AS BIGINT) AS n_k4
    FROM tri, k4
"""


QUERIES["four_cliques"] = q_four_cliques
ORACLES["four_cliques"] = FOUR_CLIQUE_SQL.format(supply=SUPPLY_EDGES_SQL)


# ---------------------------------------------------------------------------
# streaming exact dedup, driven end to end (state store across micro-batches)
# ---------------------------------------------------------------------------

STREAM_DUP_MOD = 10  # every 10th doc gets a higher-id duplicate copy
STREAM_DUP_SHIFT = 1_000_000


def q_stream_dedup(spark, sf_dir):
    """streaming.py stream_exact_dedup driven END TO END through Structured
    Streaming: the documents table (plus a deterministic duplicate copy of
    every 10th doc at doc_id + 1e6 — the driver corpus has no exact dupes
    of its own) is split into three micro-batch files by doc_id % 3 and
    fed through three availableNow cycles sharing one checkpoint, so the
    per-hash state store suppresses duplicates ACROSS batches and survives
    stream restarts. First-arrival rule: the winner per md5(text) is the
    earliest batch holding the hash, min doc_id inside it — replayed
    exactly by the oracle's min-batch/min-id SQL."""
    import shutil
    import tempfile

    from .streaming import stream_exact_dedup

    docs = _documents(spark, sf_dir)
    dups = (
        docs.filter(F.col("doc_id") % STREAM_DUP_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + STREAM_DUP_SHIFT)
    )
    feed = docs.unionByName(dups).select("doc_id", "text", "lang")

    base = tempfile.mkdtemp(prefix="linkgraph_stream_dedup_")
    docs_dir, out_dir, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    try:
        for i in range(3):
            feed.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(docs_dir)
            q = (
                stream_exact_dedup(spark, docs_dir)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                raise RuntimeError("streaming cycle timed out after 600s")
        out = spark.read.parquet(out_dir).select("text_hash", "doc_id")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


STREAM_DEDUP_SQL = f"""
    WITH feed AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {STREAM_DUP_SHIFT} AS doc_id, text FROM documents
        WHERE doc_id % {STREAM_DUP_MOD} = 0),
    h AS (SELECT doc_id, md5(text) AS text_hash, doc_id % 3 AS b FROM feed),
    w AS (SELECT text_hash, min(b) AS mb FROM h GROUP BY text_hash)
    SELECT h.text_hash, CAST(min(h.doc_id) AS BIGINT) AS doc_id
    FROM h JOIN w ON w.text_hash = h.text_hash AND h.b = w.mb
    GROUP BY h.text_hash
"""


QUERIES["stream_dedup"] = q_stream_dedup
ORACLES["stream_dedup"] = STREAM_DEDUP_SQL


# ---------------------------------------------------------------------------
# versioned edge store: exactly-once maintenance + time travel, end to end
# ---------------------------------------------------------------------------


def q_store_time_travel(spark, sf_dir):
    """streaming.py stream_graph_maintenance + read_edge_store(version=...)
    end to end: three delta batches (insert the link graph, then two
    deletion waves) flow through three availableNow cycles sharing one
    checkpoint — batch ids are the version numbers, so versions 0/1/2
    commit deterministically — and the query reads version 1 BY NUMBER
    after version 2 has superseded it (time travel: the v1 snapshot equals
    the link graph minus only the FIRST deletion wave). Lineage columns
    from the v1 manifest (edges_before/after) ride along on every row so
    the value hash pins the per-version metrics trail too."""
    import shutil
    import tempfile

    from .streaming import read_edge_store, stream_graph_maintenance

    edges = link_edges(spark, sf_dir)
    b0 = edges.select("src", "dst", F.lit(1.0).alias("dw"))
    b1 = edges.filter((F.col("src") + F.col("dst")) % 7 == 0).select(
        "src", "dst", F.lit(-1.0).alias("dw")
    )
    b2 = edges.filter((F.col("src") + F.col("dst")) % 7 == 1).select(
        "src", "dst", F.lit(-1.0).alias("dw")
    )

    base = tempfile.mkdtemp(prefix="linkgraph_store_tt_")
    delta_dir, store_dir, ck = f"{base}/deltas", f"{base}/store", f"{base}/ck"
    try:
        for b in (b0, b1, b2):
            b.coalesce(1).write.mode("append").parquet(delta_dir)
            q = stream_graph_maintenance(
                spark, delta_dir, store_dir, ck, directed=True,
                run_pagerank=False,
            )
            if not q.awaitTermination(600):
                raise RuntimeError("streaming cycle timed out after 600s")
        g1, meta1 = read_edge_store(spark, store_dir, version=1)
        out = g1.edges.select(
            "src",
            "dst",
            F.round(F.col("weight") * 1000).cast("long").alias("w_e3"),
            F.lit(int(meta1["version"])).cast("long").alias("version"),
            F.lit(int(meta1["edges_before"])).cast("long").alias("edges_before"),
            F.lit(int(meta1["edges_after"])).cast("long").alias("edges_after"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


STORE_TIME_TRAVEL_SQL = f"""
    WITH e AS MATERIALIZED (SELECT src, dst FROM ({LINK_EDGES_SQL})),
    v1 AS (SELECT src, dst FROM e WHERE (src + dst) % 7 <> 0),
    m AS (SELECT (SELECT count(*) FROM e) AS edges_before,
                 (SELECT count(*) FROM v1) AS edges_after)
    SELECT v1.src, v1.dst, CAST(1000 AS BIGINT) AS w_e3,
           CAST(1 AS BIGINT) AS version,
           CAST(m.edges_before AS BIGINT) AS edges_before,
           CAST(m.edges_after AS BIGINT) AS edges_after
    FROM v1, m
"""


QUERIES["store_time_travel"] = q_store_time_travel
ORACLES["store_time_travel"] = STORE_TIME_TRAVEL_SQL


# ---------------------------------------------------------------------------
# sequence packing (concat-then-chunk training-window manifest)
# ---------------------------------------------------------------------------

PACK_WINDOW = 64


def q_doc_pack(spark, sf_dir):
    """text/pipeline.py pack_sequences: the GPT-style concat-then-chunk
    assembly manifest — docs in deterministic LCG order, token streams
    concatenated and cut into 64-token training windows; each manifest row
    says which token span of which doc fills which chunk positions. The
    two-level bucket-histogram prefix sum (no global window) must agree
    with the oracle's naive full-corpus running total exactly."""
    from .text.pipeline import pack_sequences

    return pack_sequences(_documents(spark, sf_dir), window=PACK_WINDOW)


DOC_PACK_SQL = f"""
    WITH t AS (SELECT doc_id,
                      len(string_split(trim(text), ' ')) AS toks,
                      (doc_id * 1103515245 + 12345) % 2147483648 AS u
               FROM documents),
    p AS (SELECT doc_id, toks,
                 coalesce(sum(toks) OVER (ORDER BY u, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS s
          FROM t),
    x AS (SELECT doc_id, s, toks,
                 unnest(generate_series(CAST(s // {PACK_WINDOW} AS BIGINT),
                     CAST((s + toks - 1) // {PACK_WINDOW} AS BIGINT)))
                   AS chunk_id
          FROM p)
    SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
           CAST(greatest(chunk_id * {PACK_WINDOW} - s, 0) AS BIGINT)
             AS doc_off,
           CAST(greatest(s - chunk_id * {PACK_WINDOW}, 0) AS BIGINT)
             AS chunk_off,
           CAST(least((chunk_id + 1) * {PACK_WINDOW}, s + toks)
                - greatest(chunk_id * {PACK_WINDOW}, s) AS BIGINT) AS n_toks
    FROM x
"""


QUERIES["doc_pack"] = q_doc_pack
ORACLES["doc_pack"] = DOC_PACK_SQL


# ---------------------------------------------------------------------------
# negative-sampling table (word2vec/node2vec training negatives)
# ---------------------------------------------------------------------------

NEG_N = 2000
NEG_SEED = 42
NEG_CHUNK = 64


def q_walk_negatives(spark, sf_dir):
    """algorithms/random_walks.py negative_samples: 2000 degree-
    proportional draws from the supply graph's out-degree vocabulary —
    the word2vec negative-sampling table that pairs with walk_pairs.
    Inverse-CDF over the concatenated weight stream via the pack_sequences
    span manifest (one chunk-keyed equi-join, no range join); the oracle
    replays the naive cumulative-sum range join and every draw must land
    on the same vertex."""
    from .algorithms.random_walks import negative_samples

    deg = (
        supply_edges(spark, sf_dir)
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.count("*").alias("weight"))
    )
    return negative_samples(
        deg, NEG_N, seed=NEG_SEED, chunk=NEG_CHUNK
    ).select(F.col("sample_id").cast("long"), F.col("vertex").cast("long"))


WALK_NEGATIVES_SQL = f"""
    WITH deg AS (SELECT src AS vertex, count(*) AS w
                 FROM ({SUPPLY_EDGES_SQL}) GROUP BY src),
    ordv AS (SELECT vertex, w,
                    (vertex * 1103515245 + 12345) % 2147483648 AS u
             FROM deg),
    p AS (SELECT vertex, w,
                 coalesce(sum(w) OVER (ORDER BY u, vertex
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS s
          FROM ordv),
    tot AS (SELECT sum(w) AS t FROM deg),
    d AS (SELECT g.i AS sample_id,
                 ((g.i + {NEG_SEED}) * 1103515245 + 12345) % 2147483648 % tot.t
                   AS pos
          FROM generate_series(0, {NEG_N - 1}) AS g(i), tot)
    SELECT CAST(d.sample_id AS BIGINT) AS sample_id,
           CAST(p.vertex AS BIGINT) AS vertex
    FROM d JOIN p ON d.pos >= p.s AND d.pos < p.s + p.w
"""


QUERIES["walk_negatives"] = q_walk_negatives
ORACLES["walk_negatives"] = WALK_NEGATIVES_SQL


# ---------------------------------------------------------------------------
# BPE vocabulary training (tokenizer artifact)
# ---------------------------------------------------------------------------

BPE_MERGES = 8
BPE_PASSES = 3


def q_bpe_merges(spark, sf_dir):
    """text/bpe.py bpe_train: 8 BPE merges learned from the documents
    corpus (Sennrich word-histogram formulation — ONE corpus pass, then
    vocabulary-scale iterations). The oracle unrolls all 8 iterations in
    SQL: word histogram, adjacent-pair counts, (count desc, lhs, rhs)
    argmax, and the shared triple-replace merge application — every merge,
    its operands, and its count must match bit-for-bit."""
    from .text.bpe import bpe_train

    merges, vocab = bpe_train(
        _documents(spark, sf_dir), num_merges=BPE_MERGES,
        apply_passes=BPE_PASSES,
    )
    return merges


def _bpe_oracle() -> str:
    rep = "s"
    for _ in range(BPE_PASSES):
        rep = (
            f"replace({rep}, ' ' || b.l || ' ' || b.r || ' ', "
            f"' ' || b.l || b.r || ' ')"
        )
    parts = [
        """w0 AS MATERIALIZED (
        SELECT word, cnt,
               ' ' || array_to_string(regexp_extract_all(word, '(.)', 1), ' ')
                   || ' </w> ' AS s
        FROM (SELECT word, count(*) AS cnt FROM (
                  SELECT unnest(string_split(trim(text), ' ')) AS word
                  FROM documents)
              WHERE word <> '' GROUP BY word))"""
    ]
    for t in range(1, BPE_MERGES + 1):
        parts.append(
            f"""a{t} AS (SELECT cnt, string_split(trim(s), ' ') AS arr
            FROM w{t - 1}),
    e{t} AS (SELECT cnt, arr,
                    unnest(generate_series(1, len(arr) - 1)) AS i FROM a{t}),
    p{t} AS (SELECT arr[i] AS l, arr[i + 1] AS r, sum(cnt) AS c
             FROM e{t} GROUP BY arr[i], arr[i + 1]),
    b{t} AS MATERIALIZED (SELECT l, r, c FROM p{t}
                          ORDER BY c DESC, l ASC, r ASC LIMIT 1),
    w{t} AS MATERIALIZED (SELECT word, cnt, {rep} AS s
                          FROM w{t - 1}, b{t} b)"""
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS rank, l AS lhs, r AS rhs, "
        f"l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b{t}"
        for t in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n" + finals


QUERIES["bpe_merges"] = q_bpe_merges
ORACLES["bpe_merges"] = _bpe_oracle()

BPE_DOC_MOD = 50


def q_doc_bpe_tokens(spark, sf_dir):
    """text/bpe.py bpe_encode: tokenize every 50th document with the
    8-merge vocabulary trained on the full corpus — the end-to-end
    tokenizer artifact (train on corpus, encode the corpus). Output is
    (doc_id, pos, token) with word-major 1-based positions; the oracle
    re-derives the trained word segmentation (same unrolled 8-iteration
    chain as bpe_merges) and explodes it back onto the selected docs."""
    from .text.bpe import bpe_encode, bpe_train

    docs = _documents(spark, sf_dir)
    merges, vocab = bpe_train(
        docs, num_merges=BPE_MERGES, apply_passes=BPE_PASSES
    )
    sel = docs.filter(F.col("doc_id") % BPE_DOC_MOD == 0)
    return bpe_encode(sel, vocab).select(
        "doc_id", F.col("pos").cast("long"), "token"
    )


def _bpe_tokens_oracle() -> str:
    base = _bpe_oracle()
    head = base[: base.rindex("SELECT CAST(1 AS BIGINT)")]
    # reuse the training CTE chain; w{BPE_MERGES} is the trained word
    # segmentation. Every corpus word is in-vocabulary by construction, so
    # the encoder's OOV fallback never fires here (it is pytest-pinned).
    return (
        head
        + f""",
    dw AS (SELECT doc_id, w.i AS wpos, arr[w.i] AS word
           FROM (SELECT doc_id, string_split(trim(text), ' ') AS arr
                 FROM documents WHERE doc_id % {BPE_DOC_MOD} = 0),
                LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) w
           WHERE arr[w.i] <> ''),
    dt AS (SELECT d.doc_id, d.wpos, t.i AS tpos, seg[t.i] AS token
           FROM (SELECT dw.doc_id, dw.wpos,
                        string_split(trim(wf.s), ' ') AS seg
                 FROM dw JOIN w{BPE_MERGES} wf ON wf.word = dw.word) d,
                LATERAL (SELECT unnest(generate_series(1, len(seg))) AS i) t)
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY wpos, tpos) AS BIGINT) AS pos,
           token
    FROM dt
"""
    )


QUERIES["doc_bpe_tokens"] = q_doc_bpe_tokens
ORACLES["doc_bpe_tokens"] = _bpe_tokens_oracle()


# ---------------------------------------------------------------------------
# Registration order = driver evidence (VERDICT r4 item 1)
# ---------------------------------------------------------------------------
# The driver's correctness artifact snapshots the FIRST 50 entries of
# queries() in registration order; everything past the window is gated only
# by the in-repo mini-driver (tests/test_driver_contract.py, all queries,
# every round). Round 4 registered 47 new queries past the window, so its
# driver JSON attested none of them. This block therefore REORDERS the
# registry: the window pins the four structure rows + the four [core]
# algorithms, then carries every query that has never had a driver-green
# row (the r3/r4 additions + this round's). The 42 rows the driver already
# certified green in rounds 1-4 rotate out (still mini-driver-gated), plus
# seven near-duplicates of in-window families (graph_stats, degree_hist,
# doc_c4_filter, closeness, four_cliques, walk_pairs, doc_decontaminate —
# each the sibling of a windowed query sharing its machinery and oracle
# style).

DRIVER_WINDOW = [
    # pinned: structure rows + the four [core] algorithms
    "graph_edges_sym", "graph_degrees", "graph_renumber_map", "graph_two_hop",
    "pagerank", "wcc", "lpa", "triangles",
    # PQ pair stays until emb_pq_topk (round-5 red, engine-side rounding
    # hardened round 6) has a driver-green row
    "emb_pq_topk", "emb_pq_recall",
    # never driver-attested: the 7 gated siblings + round-5 late additions
    "doc_decontaminate", "closeness", "doc_c4_filter", "graph_stats",
    "degree_hist", "walk_pairs", "four_cliques",
    "doc_pack", "walk_negatives", "bpe_merges", "doc_bpe_tokens",
    # round-5 streaming rows (re-attest the stateful machinery)
    "stream_dedup", "store_time_travel",
    # round-robin refresh: oldest driver evidence first (last green in the
    # round-4 artifact, registry order) — see the rotation rule below
    "doc_token_count", "doc_dedup_exact", "doc_langid", "doc_quality",
    "doc_fingerprint", "doc_shingle_dups", "emb_topk", "events_hourly",
    "jaccard", "bfs", "katz", "hits", "salsa", "anf", "ego_graph",
    "hypergraph_edges", "core_number", "doc_minhash_dedup", "emb_lsh_topk",
    "k_core", "node2vec", "ktruss", "random_walks", "media_image_stats",
    "clustering_metrics", "louvain", "sssp",
]
# Standing rotation policy (VERDICT r5 item 2): every round the window is
#   8 pinned rows + any query without a driver-green row in ANY round's
#   CORRECTNESS artifact (red or never-run) + the remaining slots filled
#   round-robin with the queries whose newest driver-green row is OLDEST
#   (ties broken by registry order) — so every query re-attests roughly
#   every other round while the [core] surface re-attests every round.
# The in-repo two-scale mini-driver gate still covers all 103 every round.


def _reorder_registry() -> None:
    """Reorder QUERIES/ORACLES in place: DRIVER_WINDOW first, then every
    remaining query in its original relative order. In-place so references
    held by importers stay valid."""
    assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"DRIVER_WINDOW names unknown queries: {missing}"
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        for name in DRIVER_WINDOW:
            if name in snap:
                reg[name] = snap.pop(name)
        reg.update(snap)


_reorder_registry()
