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


def _require_whole_hour_tz(spark: SparkSession) -> None:
    """The hourly-window ≡ batch-date_trunc equivalence only holds when
    the session timezone's UTC offset is a whole hour (see
    events_rollup_frame). Fail loudly otherwise. Probes offsets across
    the year (both DST phases — e.g. Australia/Lord_Howe is +11:00 in
    January but +10:30 in July) and falls back to parsing literal
    GMT±HH[:MM]-style ids ZoneInfo can't load."""
    import re
    from datetime import datetime
    from zoneinfo import ZoneInfo

    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        zi = ZoneInfo(tz)
        whole = all(
            (off := datetime(y, m, 15, tzinfo=zi).utcoffset()) is not None
            and off.total_seconds() % 3600 == 0
            for y in (2025, 2026)
            for m in (1, 4, 7, 10)
        )
    except Exception:
        m = re.fullmatch(r"(?:UTC|GMT)?([+-]\d{1,2})(?::?(\d{2}))?", tz.strip())
        whole = tz.upper() in ("UTC", "GMT", "Z") or (
            m is not None and (m.group(2) or "00") == "00"
        )
    if not whole:
        raise ValueError(
            f"stream_events_rollup requires a whole-hour-offset session "
            f"timezone (got {tz!r}): hourly windows on the cast timestamp "
            "would land on sub-hour boundaries and diverge from the batch "
            "rollup. Set spark.sql.session.timeZone=UTC."
        )


def events_rollup_frame(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly rollup (streaming-safe form of q_events_rollup):
    counts + sums per (event_type, hour window). Late rows beyond the
    watermark are dropped deterministically.

    Timezone contract (ADVICE r2): watermarks require TIMESTAMP (Spark
    rejects TIMESTAMP_NTZ event time), so the ntz column is cast — which
    makes window buckets align to absolute epoch hours. That equals the
    batch ``date_trunc('hour', ts)`` only when the session timezone has
    a whole-hour UTC offset; ``_require_whole_hour_tz`` enforces it
    loudly at the entry points instead of diverging silently at +05:30."""
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
    _require_whole_hour_tz(spark)
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


def stream_pages_dedup(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming exact-dedup front-end for the pages corpus: keep the
    first page seen per content fingerprint (md5 of textops-normalized
    text — identical to the batch ``textops.fingerprint`` family).

    State shape: ``dropDuplicatesWithinWatermark`` on the fingerprint
    key with an event-time watermark on ``warc_ts``, so per-key state is
    EVICTED once the watermark passes — bounded state at 10^12-page
    scale, unlike a plain streaming dropDuplicates whose key set grows
    forever. Within any window shorter than the watermark the result
    matches the batch dedup keeper-set (asserted by
    tests/test_streaming.py); duplicates arriving later than the
    watermark re-emit — the documented, deliberate trade for bounded
    state. Sink + checkpointLocation give exactly-once resume like the
    other two front-ends."""
    from .corpus import PAGES_SCHEMA
    from .textops import normalized_text

    src = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    deduped = (
        src.withColumn("fingerprint", F.md5(normalized_text(F.col("text"))))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("url", "warc_ts", "fingerprint")
    )
    writer = (
        deduped.writeStream.outputMode("append")
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
