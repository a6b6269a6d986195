"""Hypergraph transform: a table becomes a graph of rows and values.

Reference: structure/hypergraph.py:42-63 (Graphistry-style hypergraph):
- every row becomes a node (id = "{EVENTID}::{row index or id column}"),
- every (column, value) in selected columns becomes a value node
  (id = "{category}::{value}" when categorical, else "{col}::{value}"),
- direct=False: edges row-node -> value-node (bipartite);
- direct=True: edges value-node -> value-node across column pairs, skipping
  the row nodes.

Pure DataFrame ops (SURVEY §2.1): per-column select + union (the relational
"melt"), concat_ws node ids, optional pair cross of columns for direct mode.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypergraph(
    df: DataFrame,
    columns: list[str] | None = None,
    direct: bool = False,
    event_id_col: str | None = None,
    sep: str = "::",
) -> dict:
    """Returns {'edges': DF[src, dst], 'entities': DF[node_id, category],
    'events': DF[node_id]} — the DataFrame rendering of the reference's
    hypergraph result object."""
    columns = columns or df.columns
    for c in columns:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    if event_id_col is None:
        df = df.withColumn("__event_id__", F.monotonically_increasing_id())
        event_id_col = "__event_id__"
    ev_node = F.concat_ws(sep, F.lit("event"), F.col(event_id_col).cast("string"))

    entities = None
    for c in columns:
        e = df.filter(F.col(c).isNotNull()).select(
            F.concat_ws(sep, F.lit(c), F.col(c).cast("string")).alias("node_id"),
            F.lit(c).alias("category"),
        )
        entities = e if entities is None else entities.unionByName(e)
    entities = entities.distinct()

    if direct:
        edges = None
        for a, b in combinations(columns, 2):
            e = (
                df.filter(F.col(a).isNotNull() & F.col(b).isNotNull())
                .select(
                    F.concat_ws(sep, F.lit(a), F.col(a).cast("string")).alias("src"),
                    F.concat_ws(sep, F.lit(b), F.col(b).cast("string")).alias("dst"),
                )
            )
            edges = e if edges is None else edges.unionByName(e)
    else:
        edges = None
        for c in columns:
            e = df.filter(F.col(c).isNotNull()).select(
                ev_node.alias("src"),
                F.concat_ws(sep, F.lit(c), F.col(c).cast("string")).alias("dst"),
            )
            edges = e if edges is None else edges.unionByName(e)

    events = df.select(ev_node.alias("node_id")).distinct()
    return {"edges": edges, "entities": entities, "events": events}
