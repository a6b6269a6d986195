"""The Graph wrapper — edge DataFrame + renumber map + properties.

Mirrors the capability surface of the reference Graph classes
(python/cugraph/cugraph/structure/graph_classes.py:32-830 and
graph_implementation/simpleGraph.py) as a thin holder around Spark
DataFrames; there is no SG/MG split because every DataFrame is distributed.

Structural invariants replicated (SURVEY.md §1.3):
1. undirected = symmetrized directed, dup (src,dst) collapse to min weight;
2. renumbering -> dense [0, V) ids, degree-descending, isolated last;
3. without renumbering the vertex set is [0, max(src,dst)+1)
   (simpleGraph.py:497-499) — every integer below the max id is a vertex;
4. undirected edge view reports only the upper triangle
   (simpleGraph.py:273-278);
5. self-loops kept (simpleGraph.py:771-782).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .renumber import NumberMap, build_number_map, renumber_edges
from .symmetrize import symmetrize_edges, upper_triangle


@dataclass
class Graph:
    edges: DataFrame  # src:long, dst:long [, weight:double] — internal ids
    directed: bool = False
    weighted: bool = False
    renumbered: bool = False
    nmap: NumberMap | None = None
    multi: bool = False
    _num_vertices: int | None = field(default=None, repr=False)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_edgelist(
        cls,
        edges: DataFrame,
        src="src",
        dst="dst",
        weight: str | None = None,
        directed: bool = False,
        renumber: bool = True,
        multi: bool = False,
        vertices: DataFrame | None = None,
        vertex_col="vertex",
    ) -> "Graph":
        """Build a graph from a COO edge DataFrame.

        Reference: graph_classes.py:89-149 / simpleGraph.py:84-180 —
        validate, renumber, symmetrize(dedup-min) in that order. ``src``/
        ``dst`` may be lists of columns (composite external vertex keys,
        e.g. (host, path) — number_map.py:475-517); composite keys require
        ``renumber=True``.
        """
        src_cols = [src] if isinstance(src, str) else list(src)
        dst_cols = [dst] if isinstance(dst, str) else list(dst)
        composite = len(src_cols) > 1 or len(dst_cols) > 1
        if composite and not renumber:
            raise ValueError("composite vertex keys require renumber=True")
        for c in src_cols + dst_cols + ([weight] if weight else []):
            if c not in edges.columns:
                raise ValueError(f"column {c!r} not in edge DataFrame")
        nmap = None
        if composite:
            nmap = build_number_map(
                edges, src=src_cols, dst=dst_cols,
                vertices=vertices, vertex_col=vertex_col,
            )
            e = renumber_edges(edges, nmap, src=src_cols, dst=dst_cols, weight=weight)
        else:
            cols = [F.col(src_cols[0]).alias("src"), F.col(dst_cols[0]).alias("dst")]
            if weight:
                cols.append(F.col(weight).cast("double").alias("weight"))
            e = edges.select(*cols)
            if renumber:
                nmap = build_number_map(e, vertices=vertices, vertex_col=vertex_col)
                e = renumber_edges(e, nmap, weight="weight" if weight else None)
            else:
                e = e.withColumn("src", F.col("src").cast("long")).withColumn(
                    "dst", F.col("dst").cast("long")
                )
        e = symmetrize_edges(
            e,
            weight="weight" if weight else None,
            symmetrize=not directed,
            multi=multi,
        )
        return cls(
            edges=e,
            directed=directed,
            weighted=weight is not None,
            renumbered=renumber,
            nmap=nmap,
            multi=multi,
        )

    @classmethod
    def from_adjlist(cls, adj: DataFrame, vid: str = "vid", nbrs: str = "nbrs", **kw) -> "Graph":
        """Build from (vertex, array<neighbor>) rows (graph_classes.py:151-202)."""
        coo = adj.select(F.col(vid).alias("src"), F.explode(nbrs).alias("dst"))
        return cls.from_edgelist(coo, **kw)

    # -- basic accessors -----------------------------------------------------
    def number_of_vertices(self) -> int:
        if self._num_vertices is None:
            if self.renumbered:
                self._num_vertices = self.nmap.map.count()
            else:
                # max+1 rule: simpleGraph.py:497-499
                row = self.edges.agg(
                    F.max(F.greatest("src", "dst")).alias("m")
                ).collect()[0]
                self._num_vertices = int(row["m"]) + 1 if row["m"] is not None else 0
        return self._num_vertices

    def number_of_edges(self) -> int:
        if self.directed:
            return self.edges.count()
        return upper_triangle(self.edges).count()

    def vertices(self) -> DataFrame:
        """All vertex ids as DF[vertex:long] — includes isolated vertices."""
        if self.renumbered:
            return self.nmap.map.select(F.col("vid").alias("vertex"))
        n = self.number_of_vertices()
        return self.edges.sparkSession.range(n).select(F.col("id").alias("vertex"))

    def view_edge_list(self) -> DataFrame:
        """Edge sink; upper triangle for undirected (simpleGraph.py:234-278)."""
        return self.edges if self.directed else upper_triangle(self.edges)

    def view_adj_list(self) -> DataFrame:
        """CSR-like sink: (vertex, sorted neighbor array)."""
        return self.edges.groupBy(F.col("src").alias("vertex")).agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )

    def view_transposed_adj_list(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("vertex")).agg(
            F.sort_array(F.collect_list("src")).alias("nbrs")
        )

    # -- degrees (simpleGraph.py:538-707) -----------------------------------
    def out_degree(self) -> DataFrame:
        d = self.edges.groupBy(F.col("src").alias("vertex")).agg(
            F.count("*").alias("degree")
        )
        return (
            self.vertices()
            .join(d, on="vertex", how="left")
            .fillna(0, subset=["degree"])
            .select("vertex", F.col("degree").cast("long").alias("degree"))
        )

    def in_degree(self) -> DataFrame:
        d = self.edges.groupBy(F.col("dst").alias("vertex")).agg(
            F.count("*").alias("degree")
        )
        return (
            self.vertices()
            .join(d, on="vertex", how="left")
            .fillna(0, subset=["degree"])
            .select("vertex", F.col("degree").cast("long").alias("degree"))
        )

    def degree(self) -> DataFrame:
        i = self.in_degree().withColumnRenamed("degree", "in_d")
        o = self.out_degree().withColumnRenamed("degree", "out_d")
        return i.join(o, on="vertex").select(
            "vertex", (F.col("in_d") + F.col("out_d")).alias("degree")
        )

    def out_weight_sums(self) -> DataFrame:
        """Per-vertex sum of out-edge weights; 1.0/edge when unweighted
        (copy_v_transform_reduce_in_out_nbr.cuh:96 default weight)."""
        w = F.col("weight") if self.weighted else F.lit(1.0)
        return self.edges.groupBy(F.col("src").alias("vertex")).agg(
            F.sum(w).alias("out_weight")
        )

    # -- point lookups (simpleGraph.py:743-825) ------------------------------
    def has_node(self, n) -> bool:
        if self.renumbered:
            return self._to_internal(n) is not None
        return (
            self.edges.filter((F.col("src") == n) | (F.col("dst") == n)).limit(1).count()
            > 0
        )

    def has_edge(self, u, v) -> bool:
        e = self.edges
        if self.renumbered:
            u = self._to_internal(u)
            v = self._to_internal(v)
            if u is None or v is None:
                return False
        return e.filter((F.col("src") == u) & (F.col("dst") == v)).limit(1).count() > 0

    def _to_internal(self, ext):
        ks = self.nmap.key_cols
        vals = [ext] if len(ks) == 1 else list(ext)
        if len(vals) != len(ks):
            raise ValueError(f"expected a {len(ks)}-tuple external key")
        flt = self.nmap.map
        for k, v in zip(ks, vals):
            flt = flt.filter(F.col(k) == v)
        rows = flt.select("vid").collect()
        return rows[0]["vid"] if rows else None

    def neighbors(self, n) -> DataFrame:
        if self.renumbered:
            n = self._to_internal(n)
        out = self.edges.filter(F.col("src") == n).select(F.col("dst").alias("vertex"))
        if self.renumbered:
            out = self.nmap.unrenumber(out, "vertex")
        return out

    # -- derived structures ---------------------------------------------------
    def two_hop_neighbors(self) -> DataFrame:
        """Distinct (first, second) pairs at exactly 2 hops
        (simpleGraph.py:464-485, cpp/src/traversal/two_hop_neighbors.cu)."""
        a = self.edges.select(F.col("src").alias("first"), F.col("dst").alias("mid"))
        b = self.edges.select(F.col("src").alias("mid"), F.col("dst").alias("second"))
        pairs = (
            a.join(b, on="mid")
            .filter(F.col("first") != F.col("second"))
            .select("first", "second")
            .distinct()
        )
        return pairs

    def subgraph(self, vertices: DataFrame, vertex_col: str = "vertex") -> "Graph":
        """Induced subgraph via two semi-joins
        (community/subgraph_extraction.py:22-89)."""
        v = vertices.select(F.col(vertex_col).alias("vertex"))
        e = (
            self.edges.join(v.withColumnRenamed("vertex", "src"), on="src", how="leftsemi")
            .join(v.withColumnRenamed("vertex", "dst"), on="dst", how="leftsemi")
        )
        return Graph(
            edges=e,
            directed=self.directed,
            weighted=self.weighted,
            renumbered=self.renumbered,
            nmap=self.nmap,
            multi=self.multi,
        )

    def unrenumber(self, df: DataFrame, col: str) -> DataFrame:
        if not self.renumbered:
            return df
        return self.nmap.unrenumber(df, col)


# --- host-side construction conveniences (graph_classes.py:256-366) ----------

def from_pandas_edgelist(
    spark,
    pdf,
    source: str = "src",
    destination: str = "dst",
    edge_attr: str | None = None,
    directed: bool = False,
    renumber: bool = True,
) -> Graph:
    """Reference: from_pandas_edgelist — createDataFrame then from_edgelist."""
    sdf = spark.createDataFrame(pdf)
    return Graph.from_edgelist(
        sdf, src=source, dst=destination, weight=edge_attr,
        directed=directed, renumber=renumber,
    )


def from_pandas_adjacency(spark, pdf, directed: bool = False) -> Graph:
    """Reference: from_pandas_adjacency (graph_classes.py:256-312) — square
    labeled adjacency DataFrame -> nonzero COO with the index labels as
    external vertex ids (renumbered)."""
    import numpy as np

    if list(pdf.index) != list(pdf.columns):
        raise ValueError("adjacency DataFrame must have identical index and columns")
    a = pdf.to_numpy()
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError("adjacency matrix must be square")
    labels = list(pdf.index)
    src, dst = np.nonzero(a)
    rows = [
        (labels[int(s)], labels[int(d)], float(a[s, d])) for s, d in zip(src, dst)
    ]
    sdf = spark.createDataFrame(rows, ["src", "dst", "weight"])
    return Graph.from_edgelist(sdf, weight="weight", directed=directed, renumber=True)


def from_numpy_array(spark, arr, directed: bool = False, renumber: bool = False) -> Graph:
    """Reference: from_numpy_array — dense adjacency matrix -> nonzero COO
    (graph_classes.py:313-341)."""
    import numpy as np

    a = np.asarray(arr)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError("adjacency matrix must be square")
    src, dst = np.nonzero(a)
    w = a[src, dst].astype(float)
    rows = [(int(s), int(d), float(x)) for s, d, x in zip(src, dst, w)]
    sdf = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    return Graph.from_edgelist(
        sdf, weight="weight", directed=directed, renumber=renumber
    )


def from_numpy_matrix(spark, arr, directed: bool = False, renumber: bool = False) -> Graph:
    """Reference alias (graph_classes.py:313-341 from_numpy_matrix)."""
    return from_numpy_array(spark, arr, directed=directed, renumber=renumber)
