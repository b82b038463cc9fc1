"""Structured Streaming ↔ batch equivalence + exactly-once resume.

The streaming forms reuse the batch expressions/kernels, so an
``availableNow`` pass over a static directory must reproduce the batch
result exactly — that is the oracle here (no independent streaming
semantics to get wrong).
"""

import os

from pyspark.sql import functions as F

from sheep_spark import corpus, extract, streaming

SF_DIR = "/root/testdata/sf0.001"


def _await_all(spark, queries, timeout=120):
    for q in queries:
        q.awaitTermination(timeout)


def _sentinel(spark, events, offset_hours):
    """One far-future row: advances the watermark past every real
    window so append mode finalizes them (standard closer pattern).
    Its own window is excluded from comparisons via event_type."""
    return events.limit(1).select(
        F.lit(-1).alias("event_id"),
        F.lit(-1).alias("user_id"),
        F.lit("__closer__").alias("event_type"),
        (F.col("ts") + F.expr(f"INTERVAL {offset_hours} HOURS")).alias("ts"),
        F.lit(0.0).alias("value"),
    )


def test_stream_events_rollup_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path / "in")
    events.write.mode("overwrite").parquet(in_dir)
    _sentinel(spark, events.orderBy(F.desc("ts")), 1000).write.mode("append").parquet(in_dir)

    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    q = streaming.stream_events_rollup(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(180)

    got = {
        (r.event_type, r.hour): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
        if r.event_type != "__closer__"
    }
    want = {
        (r.event_type, r.hour): (r.n_events, r.sum_value)
        for r in events.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .collect()
    }
    assert got == want


def test_stream_rollup_incremental_resume(spark, tmp_path):
    """Two availableNow runs over a growing directory: the checkpoint
    must make the second run process ONLY the new files (exactly-once),
    and the union of outputs must equal the batch rollup of everything."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").persist()
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    real = F.col("event_type") != "__closer__"
    first.write.mode("overwrite").parquet(in_dir)
    _sentinel(spark, events, 1000).write.mode("append").parquet(in_dir)
    streaming.stream_events_rollup(spark, in_dir, out_dir, ck_dir).awaitTermination(180)
    n_after_first = (
        spark.read.parquet(out_dir).where(real).agg(F.sum("n_events")).collect()[0][0]
    )
    assert n_after_first == first.count()

    # append the second half as new files (no overwrite of the first);
    # rows in already-closed windows are late beyond the watermark and
    # would be dropped — keep phase 2 self-consistent by shifting it into
    # the future instead (same aggregation, disjoint windows)
    second_shifted = second.withColumn("ts", F.col("ts") + F.expr("INTERVAL 2000 HOURS"))
    second_shifted.write.mode("append").parquet(in_dir)
    _sentinel(spark, events, 4000).write.mode("append").parquet(in_dir)
    streaming.stream_events_rollup(spark, in_dir, out_dir, ck_dir).awaitTermination(180)
    total = (
        spark.read.parquet(out_dir).where(real).agg(F.sum("n_events")).collect()[0][0]
    )
    assert total == events.count()  # each row contributed exactly once


def test_stream_pages_dedup_matches_batch_and_resumes(spark, tmp_path):
    """Streaming exact-dedup (dropDuplicatesWithinWatermark on the
    fingerprint): one output row per distinct fingerprint, equal to the
    batch keeper set; duplicates arriving in a LATER availableNow run
    are still suppressed (state survives the checkpoint resume)."""
    pages = corpus.generate_pages(spark, 120, seed=13).persist()
    dup_a = pages.limit(40).withColumn("url", F.concat(F.lit("dup-a-"), F.col("url")))
    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    # phase 1: originals + 40 same-text copies under different urls
    pages.write.mode("overwrite").parquet(in_dir)
    dup_a.write.mode("append").parquet(in_dir)
    # the test watermark is huge so no state is evicted mid-run: the
    # availableNow pass must then dedup EXACTLY
    streaming.stream_pages_dedup(
        spark, in_dir, out_dir, ck_dir, watermark="365 days"
    ).awaitTermination(180)

    from sheep_spark.textops import normalized_text

    batch_fps = {
        r.fp for r in pages.select(F.md5(normalized_text(F.col("text"))).alias("fp")).collect()
    }
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == len(batch_fps)  # one keeper per distinct text
    assert {r.fingerprint for r in got} == batch_fps

    # phase 2: new files = more copies of phase-1 texts + 30 new pages;
    # the resume must process only the new files and suppress the old
    # fingerprints from checkpointed state
    dup_b = pages.limit(25).withColumn("url", F.concat(F.lit("dup-b-"), F.col("url")))
    new_pages = corpus.generate_pages(spark, 30, seed=14).withColumn(
        "url", F.concat(F.lit("new-"), F.col("url"))
    )
    dup_b.write.mode("append").parquet(in_dir)
    new_pages.write.mode("append").parquet(in_dir)
    streaming.stream_pages_dedup(
        spark, in_dir, out_dir, ck_dir, watermark="365 days"
    ).awaitTermination(180)

    new_fps = {
        r.fp
        for r in new_pages.select(F.md5(normalized_text(F.col("text"))).alias("fp")).collect()
    }
    got2 = spark.read.parquet(out_dir).collect()
    assert {r.fingerprint for r in got2} == batch_fps | new_fps
    assert len(got2) == len(batch_fps | new_fps)  # no re-emits across runs


def test_stream_pages_to_edges_matches_batch(spark, tmp_path):
    pages = corpus.generate_pages(spark, 200, seed=11).persist()
    in_dir = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(in_dir)

    out_dir = str(tmp_path / "edges")
    ck_dir = str(tmp_path / "ck")
    q = streaming.stream_pages_to_edges(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(180)

    got = sorted(
        (r.src_url, r.dst_url) for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted((r.src_url, r.dst_url) for r in extract.href_edges(pages).collect())
    assert got == want and len(got) > 0
