"""Minimal working Structured Streaming binding of the extraction plan.

Works because every stage of the batch plan except the per-turn index
windows is stateless; the indexes are assigned inside foreachBatch
(each micro-batch holds whole turns)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.extract import build_spans, build_transactions, build_records
from ..sources.transcripts import with_resolved_payload


def extract_stream(transcript_stream: DataFrame, output_dir: str,
                   checkpoint_dir: str):
    """transcript_stream: a streaming DataFrame with the transcripts
    schema. Returns the started StreamingQuery."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        turns = with_resolved_payload(batch_df)
        records = build_records(turns, mode="fused")
        build_spans(turns, records).write.mode("append").parquet(
            f"{output_dir}/spans")
        build_transactions(records).write.mode("append").parquet(
            f"{output_dir}/transactions")

    return (transcript_stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(process_batch)
            .start())
