"""Structured Streaming front-ends for the engine's batch operators.

The reference is a batch system; these entry points exist because the
100 TB deployment ingests continuously (Common-Crawl-style fetches,
event logs) and Spark's incremental execution gives the same operators
a streaming form for free when they are expressed declaratively:

- ``stream_events_rollup``: readStream over an events directory →
  event-time window aggregation with a watermark for late data. The
  aggregation is the streaming form of ``__spark_entry__.q_events_rollup``
  (same groupBy keys/aliases), so a ``Trigger.AvailableNow`` run over a
  static directory must equal the batch result — that equivalence is the
  test (tests/test_streaming.py).
- ``stream_pages_to_edges``: readStream over page parquet → the SAME
  pinned Arrow extraction kernels as the batch path (extract.py) →
  append-mode edge sink. Extraction is stateless/per-row, so streaming
  semantics are trivially exactly-once under checkpointing.

Both run with ``availableNow`` triggers in tests (bounded, reproducible)
and with default micro-batch triggers in production; sinks are parquet +
checkpointLocation so a killed stream resumes exactly-once — the
streaming counterpart of checkpointing.py's batch superstep resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp_ntz, value double"


def events_rollup_frame(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly rollup (streaming-safe form of q_events_rollup):
    counts + sums per (event_type, hour window). Late rows beyond the
    watermark are dropped deterministically."""
    e = events.withColumn("ts_evt", F.col("ts").cast("timestamp"))
    return (
        e.withWatermark("ts_evt", watermark)
        .groupBy("event_type", F.window("ts_evt", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "n_events",
            "sum_value",
        )
    )


def stream_events_rollup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Stream an events parquet directory into an hourly-rollup parquet
    sink. Returns the StreamingQuery (caller awaits/stops)."""
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    rolled = events_rollup_frame(src, watermark)
    writer = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_pages_to_edges(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream Common-Crawl-style page parquet into raw href-edge parquet
    using the batch extraction kernels (extract.py — pinned, versioned,
    byte-identical text). Output rows: (src_url, dst_url) string pairs;
    id minting/symmetrization stay batch jobs over the accumulated sink
    (they need global state; the stream stays stateless)."""
    from .corpus import PAGES_SCHEMA
    from .extract import href_edges

    src = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    edges = href_edges(src)
    writer = (
        edges.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
