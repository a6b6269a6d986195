"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.7 — its iteration loop is
host-pinned, cpp/src/link_analysis/pagerank_impl.cuh:194); the north rule's
resumability maps to batch checkpointing (linkgraph/checkpoint.py). This
module adds the streaming capabilities a continuously-crawled corpus needs
on top of that batch core:

- ``stream_pages_to_edges``: incremental link extraction — new page files
  appear in a directory, links are extracted with the same vectorized UDFs
  as the batch path, and edge rows are appended to the edge store. The batch
  algorithms then run over the growing edge table (mini-batch graph
  maintenance; streaming graph algorithms proper are out of scope exactly as
  they are absent from the reference).
- ``stream_hourly_event_rollup``: watermarked tumbling-window aggregation
  over an event stream (late data handled by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .corpus import PAGE_SCHEMA
from .extract import extract_links

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_pages_to_edges(
    spark: SparkSession,
    pages_dir: str,
    edges_out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """readStream(pages parquet) -> extract_links -> append edges parquet.

    Returns the StreamingQuery. ``trigger_once`` processes the backlog and
    stops (the incremental-crawl batch pattern); pass False for continuous.
    """
    pages = spark.readStream.schema(PAGE_SCHEMA).parquet(pages_dir)
    edges = pages.select(
        F.col("url").alias("src"),
        F.explode(extract_links("html")).alias("dst"),
        F.col("warc_ts").alias("crawl_ts"),
    )
    writer = (
        edges.writeStream.format("parquet")
        .option("path", edges_out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hourly_event_rollup(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window rollup (unstarted streaming DataFrame —
    attach any sink; tests use a memory sink with availableNow)."""
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize_events_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization, batch form: events of one user belong to
    one session while consecutive gaps stay under ``gap_minutes``.

    Returns DF[user_id, session_start, session_end, n_events, value_sum].
    Classic lag + cumulative-sum shape — fully SQL-expressible, so this
    variant carries a value-checked DuckDB oracle in the driver contract
    (`events_sessions`); the streaming variant below shares its semantics
    and is pytest-checked for parity against this one.

    The per-user window sort is the textbook sessionization plan; per-user
    event counts are bounded (activity per user), so the window never sees
    the global skew a per-key sort of the whole table would.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic, not epoch casts: ts is TIMESTAMP_NTZ, and
    # ts − lag(ts) > INTERVAL works identically (and timezone-independently)
    # in Spark and the DuckDB oracle, at full microsecond precision
    prev = F.lag("ts").over(w)
    flagged = events.withColumn(
        "new_sess",
        F.when(
            prev.isNull()
            | (F.col("ts") - prev > F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
            1,
        ).otherwise(0),
    ).withColumn("session_no", F.sum("new_sess").over(w))
    return (
        flagged.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100).cast("long").alias("value_sum_e2"),
        )
        .drop("session_no")
    )


SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum_e2", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),   # session start, µs epoch
        T.StructField("last_us", T.LongType()),    # last event, µs epoch
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def stream_sessionize_events(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    per-user session state (start, last-seen, count, sum) lives in the
    state store; a session row is emitted when a later event exceeds the
    gap, or when the event-time timeout fires (watermark passed
    last + gap) for sessions with no successor. Semantics identical to
    ``sessionize_events_batch`` (pytest parity check).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        import math

        (user_id,) = key
        out = []

        def half_up_e2(x: float) -> int:
            # Spark F.round / DuckDB round are HALF-UP (away from zero);
            # Python round() is banker's — 12.5 would round 12 vs their 13
            n = math.floor(abs(x) * 100 + 0.5)
            return n if x >= 0 else -n

        def close(s):
            out.append(
                (
                    user_id,
                    pd.Timestamp(s[0], unit="us"),
                    pd.Timestamp(s[1], unit="us"),
                    s[2],
                    half_up_e2(s[3]),
                )
            )

        if state.hasTimedOut:
            if state.exists:
                close(state.get)
                state.remove()
        else:
            cur = state.get if state.exists else None
            rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
            for ts, val in zip(rows["ts"], rows["value"]):
                us = ts.value // 1000
                if cur is not None and us - cur[1] > gap_us:
                    close(cur)
                    cur = None
                if cur is None:
                    cur = (us, us, 1, float(val))
                else:
                    # min/max, not overwrite: a within-watermark LATE event
                    # from a later micro-batch must extend the session's
                    # span backward without regressing its end (an
                    # overwrite corrupted later gap checks). One open
                    # session per user is the state contract — a late event
                    # older than watermark is dropped by Spark upstream.
                    cur = (
                        min(cur[0], us),
                        max(cur[1], us),
                        cur[2] + 1,
                        cur[3] + float(val),
                    )
            state.update(cur)
            # event-time timeout: fire once the watermark passes last + gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in SESSION_OUT_SCHEMA.fields]
            )

    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming graph maintenance: edge-delta stream -> versioned edge store
# -> warm-restart analytics per cycle (the streaming half of the recrawl
# family in structure/delta.py)
# ---------------------------------------------------------------------------

GRAPH_DELTA_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("dw", T.DoubleType()),  # signed: +insert / -delete
    ]
)

_V_RE_TMPL = "v%012d"


def _store_versions(io, store_dir: str) -> list[int]:
    out = []
    for name in io.listdir(store_dir):
        if name.startswith("v") and io.exists(f"{store_dir}/{name}/meta.json"):
            try:
                out.append(int(name[1:]))
            except ValueError:
                continue
    return sorted(out)


def read_edge_store(spark: SparkSession, store_dir: str, version: int | None = None):
    """(Graph, meta dict) at the store's latest committed version — or at
    ``version`` exactly (time travel: versions are immutable snapshots, so
    any committed version remains queryable forever). (None, None) for an
    empty store; ValueError names the committed versions when ``version``
    is not one of them. Reads ONLY the manifest + one parquet directory."""
    import json as _json

    from .checkpoint import _io
    from .structure.graph import Graph

    io = _io()
    versions = _store_versions(io, store_dir)
    if not versions:
        return None, None
    if version is None:
        v = versions[-1]
    elif version in versions:
        v = version
    else:
        raise ValueError(
            f"version {version} not committed in {store_dir}; have {versions}"
        )
    vdir = f"{store_dir}/{_V_RE_TMPL % v}"
    meta = _json.loads(io.read_text(f"{vdir}/meta.json"))
    edges = spark.read.parquet(f"{vdir}/data")
    g = Graph(edges=edges, directed=meta["directed"], weighted=True,
              renumbered=False, nmap=None, multi=False)
    return g, meta


def stream_graph_maintenance(
    spark: SparkSession,
    delta_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    directed: bool = True,
    run_pagerank: bool = True,
    pagerank_tol: float = 1.0e-6,
    pagerank_max_iter: int = 100,
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
):
    """readStream(signed edge deltas) -> ``foreachBatch`` -> versioned edge
    store + warm-restarted PageRank per recrawl cycle.

    Store layout (same marker-last commit protocol as checkpoint.py —
    data first, ``meta.json`` last, partial versions never read):

        <store_dir>/v000000000007/data/*.parquet   weighted edge snapshot
        <store_dir>/v000000000007/scores/*.parquet vertex, pagerank
        <store_dir>/v000000000007/meta.json        lineage + metrics

    Exactly-once: the version directory is named by the micro-batch id, so
    a replayed batch (foreachBatch's at-least-once contract) overwrites its
    own version and re-commits — idempotent, never double-applied. The meta
    manifest records the delta row count, edge counts before/after, and the
    warm PageRank iteration count per cycle — the per-cycle lineage +
    convergence metrics trail, queryable as JSON.

    Scale: each cycle costs ONE E-scale union+hash-agg shuffle
    (apply_edge_delta) + a warm-restart PageRank that converges in a
    fraction of the cold iteration count because the previous fixpoint
    seeds ``nstart`` (structure/delta.py §10 of docs/PLANS.md).
    """
    import json as _json

    from .algorithms.pagerank import pagerank as _pagerank
    from .checkpoint import _io
    from .structure.delta import apply_edge_delta
    from .structure.graph import Graph

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        io = _io()
        io.mkdirs(store_dir)
        prev_g, prev_meta = read_edge_store(spark, store_dir)
        if prev_g is None:
            base = spark.createDataFrame(
                [], "src LONG, dst LONG, weight DOUBLE"
            )
            prev_g = Graph(edges=base, directed=directed, weighted=True,
                           renumbered=False, nmap=None, multi=False)
            edges_before = 0
        else:
            edges_before = prev_meta["edges_after"]
        g2 = apply_edge_delta(prev_g, batch_df, weight="dw")
        vdir = f"{store_dir}/{_V_RE_TMPL % batch_id}"
        io.delete(vdir)  # replayed batch: drop its partial version first
        g2.edges.write.mode("overwrite").parquet(f"{vdir}/data")
        committed = spark.read.parquet(f"{vdir}/data")
        edges_after = committed.count()
        meta = {
            "version": batch_id,
            "directed": directed,
            "delta_rows": batch_df.count(),
            "edges_before": edges_before,
            "edges_after": edges_after,
            "prev_version": prev_meta["version"] if prev_meta else None,
        }
        if run_pagerank and edges_after > 0:
            g_committed = Graph(edges=committed, directed=directed,
                                weighted=True, renumbered=False, nmap=None,
                                multi=False)
            nstart = None
            if prev_meta is not None and prev_meta.get("pagerank_iters"):
                pvdir = f"{store_dir}/{_V_RE_TMPL % prev_meta['version']}"
                nstart = spark.read.parquet(f"{pvdir}/scores").select(
                    "vertex", F.col("pagerank").alias("values")
                )
            timings: list = []
            pr = _pagerank(
                g_committed, tol=pagerank_tol, max_iter=pagerank_max_iter,
                nstart=nstart, iteration_timings=timings,
                fail_on_nonconvergence=False,
            )
            pr.write.mode("overwrite").parquet(f"{vdir}/scores")
            meta["pagerank_iters"] = len(timings)
            meta["warm_start"] = nstart is not None
        # marker-last commit: meta.json existence == version committed
        io.write_text(f"{vdir}/meta.json", _json.dumps(meta))

    deltas = spark.readStream.schema(GRAPH_DELTA_SCHEMA)
    if max_files_per_trigger is not None:
        deltas = deltas.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = deltas.parquet(delta_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming exact dedup: ingest-time first-arrival filter by content hash
# ---------------------------------------------------------------------------

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("keep_id", T.LongType())])


def stream_exact_dedup(
    spark: SparkSession,
    docs_dir: str,
) -> DataFrame:
    """Ingest-time exact dedup of a document stream: the FIRST-ARRIVING doc
    per md5(text) is emitted (ties inside one micro-batch break to the
    lower doc_id, so replays are deterministic); later duplicates — in the
    same batch, later batches, or after a restart — are suppressed by the
    per-hash state-store entry. The batch twin is
    ``text.dedup.exact_dedup`` (keep-min over the whole corpus; the
    streaming op keeps the arrival-order winner instead, the natural
    ingest rule — parity on single-batch input is pinned in tests).

    Scale: state is one long per distinct hash, partitioned by the hash —
    the same shuffle key the batch groupBy uses, so hot hashes cannot skew
    (one state row regardless of duplicate count). For an unbounded crawl
    the state store is the dedup index by design (that is what ingest
    dedup means); operators that only need within-horizon dedup should
    add a watermark + timeout on top.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        (text_hash,) = key
        if state.hasTimedOut:  # NoTimeout: unreachable, defensive
            return
        best = None
        for pdf in pdf_iter:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return
        if state.exists:
            return  # duplicate of an already-kept doc: emit nothing
        state.update((best,))
        yield pd.DataFrame({"text_hash": [text_hash], "doc_id": [best]})

    docs = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(docs_dir)
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .applyInPandasWithState(
            fn,
            DEDUP_OUT_SCHEMA,
            _DEDUP_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
