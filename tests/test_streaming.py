"""Streaming surface: stateless signature stream + incremental exact dedup
with persistent state across micro-batches and restarts."""

import os

from pyspark.sql import functions as F

from deduplication_framework_spark.sources.pages import PAGES_SCHEMA
from deduplication_framework_spark.streaming.incremental import (
    run_incremental_exact_dedup,
    stream_signatures,
)


def _write_batch(spark, pages, lo, hi, out):
    pages.filter((F.col("doc_order") >= lo) & (F.col("doc_order") < hi)).select(
        "url", "warc_ts", "html", "text", "lang"
    ).coalesce(1).write.mode("append").parquet(out)


def test_incremental_exact_dedup(spark, pages, tmp_path):
    src = str(tmp_path / "stream_src")
    state = str(tmp_path / "state")

    _write_batch(spark, pages, 0, 200, src)
    q, handler = run_incremental_exact_dedup(spark, src, state, PAGES_SCHEMA)
    q.awaitTermination()

    k1 = handler.keepers().count()
    d1 = (
        pages.filter(F.col("doc_order") < 200)
        .select(F.xxhash64("text").alias("h"))
        .distinct()
        .count()
    )
    assert k1 == d1

    # second batch includes exact copies of batch-1 docs (the exact class
    # spans rows 300-360: copies of each other, not of batch 1) plus fresh
    _write_batch(spark, pages, 200, 400, src)
    q2, handler2 = run_incremental_exact_dedup(spark, src, state, PAGES_SCHEMA)
    q2.awaitTermination()

    total_distinct = (
        pages.filter(F.col("doc_order") < 400)
        .select(F.xxhash64("text").alias("h"))
        .distinct()
        .count()
    )
    assert handler2.keepers().count() == total_distinct
    # no duplicate hashes in the keeper sink
    kdf = handler2.keepers()
    assert (
        kdf.select(F.xxhash64("text").alias("h")).distinct().count() == kdf.count()
    )


def test_stream_signatures_matches_batch(spark, pages, tmp_path):
    src = str(tmp_path / "sig_src")
    _write_batch(spark, pages, 0, 50, src)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    sigs = stream_signatures(stream)
    q = (
        sigs.writeStream.format("memory")
        .queryName("sig_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.url: (tuple(r.sig), r.simhash)
        for r in spark.sql("SELECT * FROM sig_out").collect()
    }

    batch = stream_signatures(
        spark.read.schema(PAGES_SCHEMA).parquet(src)
    )
    expect = {r.url: (tuple(r.sig), r.simhash) for r in batch.collect()}
    assert got == expect and len(got) == 50
