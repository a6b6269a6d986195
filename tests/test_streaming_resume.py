"""Structured Streaming surface + checkpoint/resume tests (FIXTURES.md §4)."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from linkgraph import Graph, generate_pages, label_propagation, pagerank, weakly_connected_components
from linkgraph.checkpoint import CheckpointManager
from linkgraph.streaming import stream_hourly_event_rollup, stream_pages_to_edges


@pytest.fixture(scope="module")
def corpus_graph(spark):
    pages = generate_pages(spark, 500, seed=42).cache()
    from linkgraph import pages_to_edges

    edges = pages_to_edges(pages)
    g = Graph.from_edgelist(
        edges,
        directed=True,
        renumber=True,
        vertices=pages.select(F.col("url").alias("vertex")),
    )
    return pages, g


def test_pagerank_resume_bitwise(tmp_path, spark, corpus_graph):
    """Kill after iteration k, resume from checkpoint, final scores identical
    (deterministic supersteps — FIXTURES.md §4)."""
    _, g = corpus_graph
    ck = str(tmp_path / "ck")
    full = {
        r.vertex: r.pagerank
        for r in pagerank(
            g, tol=1e-6, max_iter=200, checkpoint_dir=ck, checkpoint_every=2
        ).collect()
    }
    CheckpointManager(ck).truncate_after(2)  # simulate dying after iter 2
    resumed = {
        r.vertex: r.pagerank
        for r in pagerank(
            g, tol=1e-6, max_iter=200, checkpoint_dir=ck, checkpoint_every=2
        ).collect()
    }
    assert full == resumed  # bitwise equality


def test_wcc_lpa_resume(tmp_path, spark, corpus_graph):
    _, g = corpus_graph
    for fn, name, kw in [
        (weakly_connected_components, "wcc", {}),
        (label_propagation, "lpa", {"fixed_iterations": 4}),
    ]:
        ck = str(tmp_path / name)
        full = {
            r.vertex: r.labels
            for r in fn(g, checkpoint_dir=ck, checkpoint_every=1, **kw).collect()
        }
        CheckpointManager(ck).truncate_after(1)
        resumed = {
            r.vertex: r.labels
            for r in fn(g, checkpoint_dir=ck, checkpoint_every=1, **kw).collect()
        }
        assert full == resumed, name


def test_partial_checkpoint_ignored(tmp_path, spark, corpus_graph):
    """A snapshot without its meta.json commit marker must be skipped."""
    _, g = corpus_graph
    ck = str(tmp_path / "ck2")
    pagerank(g, tol=1e-6, max_iter=200, checkpoint_dir=ck, checkpoint_every=2)
    mgr = CheckpointManager(ck)
    latest, _, _ = mgr.latest(spark)
    # corrupt the newest snapshot: remove its commit marker
    os.remove(os.path.join(ck, f"iter_{latest:05d}", "meta.json"))
    got = mgr.latest(spark)
    assert got is not None and got[0] < latest


def test_stream_pages_to_edges(tmp_path, spark):
    pages_dir = str(tmp_path / "pages")
    edges_dir = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")
    generate_pages(spark, 200, seed=42).write.parquet(pages_dir)
    q = stream_pages_to_edges(spark, pages_dir, edges_dir, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(edges_dir)
    assert got.columns == ["src", "dst", "crawl_ts"]
    from linkgraph import extract_links, pages_to_edges

    expected = pages_to_edges(spark.read.parquet(pages_dir)).count()
    assert got.count() == expected
    # incremental batch: drop more pages, re-trigger, only new rows appended
    generate_pages(spark, 200, seed=99).write.mode("append").parquet(pages_dir)
    q2 = stream_pages_to_edges(spark, pages_dir, edges_dir, ck)
    q2.awaitTermination(120)
    assert spark.read.parquet(edges_dir).count() > expected


def test_stream_hourly_rollup(tmp_path, spark):
    ev_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(ev_dir)
    df = stream_hourly_event_rollup(spark, ev_dir)
    q = (
        df.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM rollup")
    assert got.count() > 0
    # differential vs the batch rollup
    batch = (
        spark.read.parquet(ev_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    merged = got.select("window_start", "event_type", "n_events").exceptAll(
        batch.select("window_start", "event_type", "n_events")
    )
    assert merged.count() == 0


def test_sessionize_batch_vs_streaming_parity(tmp_path, spark):
    """The applyInPandasWithState sessionizer must agree with the batch
    (lag+cumsum) sessionizer. In a single availableNow batch, every session
    except each user's LAST gets closed in-batch (the last would need the
    watermark to advance past its timeout), so parity is checked on the
    batch result minus each user's final session."""
    from pyspark.sql import Window

    from linkgraph.streaming import (
        sessionize_events_batch,
        stream_sessionize_events,
    )

    ev_dir = str(tmp_path / "sess_events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(ev_dir)

    got_q = (
        stream_sessionize_events(spark, ev_dir, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    got_q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sessions")

    batch = sessionize_events_batch(
        spark.read.parquet(ev_dir), gap_minutes=30
    )
    w = Window.partitionBy("user_id")
    closed = batch.withColumn(
        "last_end", F.max("session_end").over(w)
    ).filter(F.col("session_end") != F.col("last_end")).drop("last_end")

    cols = ["user_id", "session_start", "session_end", "n_events", "value_sum_e2"]
    assert closed.count() > 0
    diff = closed.select(cols).exceptAll(got.select(cols))
    assert diff.count() == 0, "batch-closed sessions missing from streaming output"
    extra = got.select(cols).exceptAll(batch.select(cols))
    assert extra.count() == 0, "streaming emitted sessions the batch path lacks"


def test_stream_exact_dedup_first_arrival_and_restart(tmp_path, spark):
    """Batch 1 dedups within itself (lowest doc_id wins inside a batch);
    later batches AND a restarted query suppress duplicates of anything
    already kept — the state store is the dedup index."""
    from linkgraph.streaming import stream_exact_dedup

    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    def feed(rows, name):
        spark.createDataFrame(
            rows, "doc_id LONG, text STRING, lang STRING"
        ).coalesce(1).write.mode("append").parquet(docs_dir)

    out_dir = str(tmp_path / "out")

    def run(_):
        # parquet sink: the one sink kind that RECOVERS from a checkpoint,
        # which is the restart semantics under test
        q = (
            stream_exact_dedup(spark, docs_dir)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["text_hash"], r["doc_id"])
            for r in spark.read.parquet(out_dir).collect()
        }

    feed(
        [(5, "aaa", "en"), (2, "aaa", "en"), (9, "bbb", "de")], "b1"
    )
    got1 = run("dedup_s1")
    assert {d for _, d in got1} == {2, 9}  # min id within the batch wins

    # batch twin parity on the same single-batch input (exact_dedup emits
    # DF[id, keep]; its keep set must equal the streamed winners)
    from linkgraph.text.dedup import exact_dedup

    batch = exact_dedup(
        spark.read.parquet(docs_dir), text_col="text", id_col="doc_id"
    )
    assert {
        r["doc_id"] for r in batch.collect() if r["keep"]
    } == {d for _, d in got1}

    # new file: one dup of "aaa" (suppressed) + one new hash (kept),
    # through a FRESH query restarted on the same checkpoint
    feed([(1, "aaa", "en"), (7, "ccc", "fr")], "b2")
    got2 = run("dedup_s2")
    # sink accumulates: only the new hash was emitted this cycle; the
    # cross-restart duplicate (doc 1, lower id than kept doc 2) was not
    assert {d for _, d in got2 - got1} == {7}
    assert {d for _, d in got2} == {2, 9, 7}
