"""Dense vertex renumbering — the Spark NumberMap.

Reference semantics being matched:
- external ids (any dtype incl. strings/urls, or MULTI-COLUMN keys) map to
  dense internal ids in [0, V) (python/cugraph/cugraph/structure/
  number_map.py:130-160 builds the indirection map as the distinct union of
  src/dst keys; :475-517 the legacy renumber path accepts a LIST of source/
  destination columns — e.g. (host, path) or (url, crawl_ts) — and keys the
  map on the column tuple);
- internal ids are assigned in OUT-DEGREE-DESCENDING order, isolated
  vertices last (cpp/src/structure/renumber_edgelist_impl.cuh:281-289
  sort_by_key thrust::greater; :250-280 isolated append). Ordering is a
  load-balancing detail in the reference (degree segments,
  graph_view.hpp:239-243); correctness of every algorithm is independent of
  id order because results are unrenumbered back (pagerank.py:132-133). We
  reproduce it with a deterministic tie-break (external key tuple ascending)
  so runs are bit-reproducible and resumable.

Scale note (10^12 vertices): the id assignment avoids a single global sort.
It ranks by (degree desc, key asc) via a two-level scheme: a tiny
degree-histogram cumulative offset (distinct degrees are O(thousands) under
power law) + row_number partitioned BY DEGREE. The only residual skew is the
degree-1/degree-0 tie-buckets, where tie order is semantically irrelevant —
at extreme scale those buckets can additionally be hash-salted into
sub-buckets with per-bucket offsets without changing any algorithm output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


@dataclass
class NumberMap:
    """Bidirectional external<->internal vertex id mapping.

    ``map`` has columns: ``vid:long`` (dense [0, V)), one or more external
    key columns (``key`` for single-column keys, ``key_0..key_{k-1}`` for
    composite keys), and ``out_degree:long``.
    """

    map: DataFrame
    key_cols: list[str]

    @property
    def vertex_count_df(self) -> DataFrame:
        return self.map.select(F.count("*").alias("v"))

    def add_internal_vertex_id(
        self, df: DataFrame, ext_col, out_col: str, drop_ext: bool = True
    ) -> DataFrame:
        """Attach internal id for an external key (single column or a list
        of columns for composite keys).

        Reference: number_map.py:103-116 (right merge on external key);
        :475-517 (column-list keys).
        """
        ext_cols = _as_list(ext_col)
        m = self.map.select(
            *[F.col(k).alias(c) for k, c in zip(self.key_cols, ext_cols)],
            F.col("vid").alias(out_col),
        )
        out = df.join(m, on=ext_cols, how="inner")
        return out.drop(*ext_cols) if drop_ext else out

    def unrenumber(self, df: DataFrame, col: str, ext_name: str | None = None) -> DataFrame:
        """internal id column -> external key column(s)
        (number_map.py:614-693). Composite keys expand ``col`` into
        ``{col}_0..{col}_{k-1}`` (matching the reference's per-key columns)."""
        if len(self.key_cols) == 1:
            k = self.key_cols[0]
            ext_name = ext_name or col
            m = self.map.select(F.col("vid").alias(col), F.col(k).alias("__ext__"))
            return (
                df.join(m, on=col, how="left")
                .drop(col)
                .withColumnRenamed("__ext__", ext_name)
            )
        base = ext_name or col
        out_names = [f"{base}_{i}" for i in range(len(self.key_cols))]
        m = self.map.select(
            F.col("vid").alias(col),
            *[F.col(k).alias(n) for k, n in zip(self.key_cols, out_names)],
        )
        return df.join(m, on=col, how="left").drop(col)


def build_number_map(
    edges: DataFrame,
    src="src",
    dst="dst",
    vertices: DataFrame | None = None,
    vertex_col="vertex",
) -> NumberMap:
    """Build the dense renumber map from an (external-id) edge list.

    ``src``/``dst`` may each be a column name or a LIST of column names
    (composite external keys, number_map.py:475-517); the lists must be the
    same length and the map is keyed on the tuple.

    ``vertices`` optionally supplies the full vertex universe (e.g. every
    crawled url) so link-less pages become isolated vertices, mirroring the
    reference rule that the vertex set can exceed edge endpoints
    (renumber_edgelist_impl.cuh:250-280 appends isolated vertices last).
    """
    src_cols, dst_cols = _as_list(src), _as_list(dst)
    if len(src_cols) != len(dst_cols):
        raise ValueError("src and dst key column lists must have equal length")
    nk = len(src_cols)
    key_cols = ["key"] if nk == 1 else [f"key_{i}" for i in range(nk)]
    sel_src = [F.col(c).alias(k) for c, k in zip(src_cols, key_cols)]
    sel_dst = [F.col(c).alias(k) for c, k in zip(dst_cols, key_cols)]
    endpoints = edges.select(*sel_src).unionByName(edges.select(*sel_dst))
    out_deg = (
        edges.select(*sel_src).groupBy(*key_cols).agg(F.count("*").alias("out_degree"))
    )
    verts = endpoints.distinct()
    if vertices is not None:
        v_cols = _as_list(vertex_col)
        if len(v_cols) != nk:
            raise ValueError("vertex_col must list one column per key column")
        verts = verts.unionByName(
            vertices.select(*[F.col(c).alias(k) for c, k in zip(v_cols, key_cols)])
        ).distinct()
    verts = verts.join(out_deg, on=key_cols, how="left").fillna(0, subset=["out_degree"])

    # two-level dense rank: degree-histogram offsets (tiny) + per-degree row_number
    hist = verts.groupBy("out_degree").agg(F.count("*").alias("cnt"))
    w_hist = Window.orderBy(F.desc("out_degree")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = hist.select(
        "out_degree", F.coalesce(F.sum("cnt").over(w_hist), F.lit(0)).alias("base")
    )
    w_deg = Window.partitionBy("out_degree").orderBy(*[F.asc(k) for k in key_cols])
    ranked = verts.withColumn("rk", F.row_number().over(w_deg) - F.lit(1))
    mapped = (
        ranked.join(F.broadcast(offsets), on="out_degree")
        .select(
            (F.col("base") + F.col("rk")).cast("long").alias("vid"),
            *[F.col(k) for k in key_cols],
            F.col("out_degree"),
        )
    )
    return NumberMap(map=mapped, key_cols=key_cols)


def renumber_edges(
    edges: DataFrame,
    nmap: NumberMap,
    src="src",
    dst="dst",
    weight: str | None = "weight",
) -> DataFrame:
    """Replace external src/dst key column(s) with dense internal ids (long).

    Two hash joins against the map (number_map.py:507-514). The map is far
    smaller than the edge table (V << E for web graphs) — on a cluster AQE
    picks broadcast when it fits, else shuffled hash join.
    """
    src_cols, dst_cols = _as_list(src), _as_list(dst)
    m_src = nmap.map.select(
        *[F.col(k).alias(c) for k, c in zip(nmap.key_cols, src_cols)],
        F.col("vid").alias("__s__"),
    )
    m_dst = nmap.map.select(
        *[F.col(k).alias(c) for k, c in zip(nmap.key_cols, dst_cols)],
        F.col("vid").alias("__d__"),
    )
    cols = [F.col("__s__").alias("src"), F.col("__d__").alias("dst")]
    if weight:
        cols.append(F.col(weight).cast("double").alias("weight"))
    return edges.join(m_src, on=src_cols).join(m_dst, on=dst_cols).select(*cols)
