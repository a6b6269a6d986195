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
