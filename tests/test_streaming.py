"""Structured Streaming binding smoke test (SURVEY.md §7.8): the batch
plan runs unchanged under foreachBatch; streaming output must equal the
batch output on the same corpus."""

from __future__ import annotations

import time

from bank_statement_pdf_parser_spark import spec
from bank_statement_pdf_parser_spark.plans.extract import extract_all
from bank_statement_pdf_parser_spark.streaming import extract_stream


def test_stream_equals_batch(spark, transcripts_path, tmp_path):
    schema = spark.read.parquet(transcripts_path).schema
    src = str(tmp_path / "src")
    spark.read.parquet(transcripts_path).limit(400).coalesce(2) \
        .write.parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = extract_stream(stream, str(tmp_path / "out"), str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_spans = spark.read.parquet(
        str(tmp_path / "out" / "spans")).drop("batch_id")
    got_txns = spark.read.parquet(
        str(tmp_path / "out" / "transactions")).drop("batch_id")
    batch = extract_all(spark.read.parquet(src))
    assert sorted(map(tuple, got_txns.collect())) == \
        sorted(map(tuple, batch.transactions.collect()))
    # span_idx is assigned per micro-batch; turns arrive whole, so spans
    # must match exactly too
    assert sorted(map(tuple, got_spans.collect())) == \
        sorted(map(tuple, batch.spans.collect()))


def test_micro_batch_retry_is_idempotent(spark, transcripts_path, tmp_path):
    """A micro-batch replayed from the checkpoint (same batch_id) must
    REPLACE its own output partition, not append duplicates."""
    from bank_statement_pdf_parser_spark.streaming.batch_stream import (
        process_micro_batch)
    out = str(tmp_path / "out")
    batch_df = spark.read.parquet(transcripts_path).limit(120)
    process_micro_batch(batch_df, 0, out)
    first = sorted(map(tuple, spark.read.parquet(f"{out}/transactions")
                       .collect()))
    assert first
    process_micro_batch(batch_df, 0, out)  # simulated retry
    second = sorted(map(tuple, spark.read.parquet(f"{out}/transactions")
                        .collect()))
    assert second == first
