"""Minimal working Structured Streaming binding of the extraction plan.

Works because every stage of the batch plan except the per-turn index
windows is stateless; the indexes are assigned inside foreachBatch
(each micro-batch holds whole turns).

Exactly-once output: each micro-batch writes into its own
`batch_id=N` partition via dynamic-partition overwrite, so a batch
retried from the checkpoint after a partial write REPLACES its own
partition instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.extract import build_spans, build_transactions, build_records
from ..sources.transcripts import with_resolved_payload


def process_micro_batch(batch_df: DataFrame, batch_id: int,
                        output_dir: str) -> None:
    """One micro-batch -> its own batch_id partition (idempotent on
    retry: dynamic overwrite replaces exactly this batch's output)."""
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    turns = with_resolved_payload(batch_df)
    records = build_records(turns, mode="fused")
    (build_spans(turns, records, records_include_html=True)
     .withColumn("batch_id", F.lit(int(batch_id)))
     .write.mode("overwrite").partitionBy("batch_id")
     .parquet(f"{output_dir}/spans"))
    (build_transactions(records)
     .withColumn("batch_id", F.lit(int(batch_id)))
     .write.mode("overwrite").partitionBy("batch_id")
     .parquet(f"{output_dir}/transactions"))


def extract_stream(transcript_stream: DataFrame, output_dir: str,
                   checkpoint_dir: str):
    """transcript_stream: a streaming DataFrame with the transcripts
    schema. Returns the started StreamingQuery."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_micro_batch(batch_df, batch_id, output_dir)

    return (transcript_stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(process_batch)
            .start())
