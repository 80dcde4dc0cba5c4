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

    got_spans = spark.read.parquet(str(tmp_path / "out" / "spans"))
    got_txns = spark.read.parquet(str(tmp_path / "out" / "transactions"))
    batch = extract_all(spark.read.parquet(src))
    assert sorted(map(tuple, got_txns.collect())) == \
        sorted(map(tuple, batch.transactions.collect()))
    # span_idx is assigned per micro-batch; turns arrive whole, so spans
    # must match exactly too
    assert sorted(map(tuple, got_spans.collect())) == \
        sorted(map(tuple, batch.spans.collect()))
