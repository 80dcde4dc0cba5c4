"""Structured Streaming upgrade path (SURVEY.md §2.10 / §7.8).

The batch pipeline is deliberately turn-local, which makes the
streaming variant a thin wrapper rather than a redesign:

    spark.readStream.table("transcripts")            # or kafka source
      -> with_resolved_payload(...)                   # stateless Catalyst
      -> mapInPandas(tokenize_records, RECORDS_DDL)   # stateless per-batch
      -> normalize_records(...)                       # stateless Catalyst
      -> writeStream.foreachBatch(checkpointed write) # S4 seam
         .option("checkpointLocation", ...)

Only span_idx/txn_idx assignment is stateful (a per-turn window). In
streaming, a turn arrives whole (one row), so the per-turn indexes are
computable inside the same micro-batch — no cross-batch state, no
watermark requirements. If turns could arrive fragmented, the carrier
would be `applyInPandasWithState` keyed by (conv_id, turn_idx) with a
processing-time timeout flushing incomplete turns.

Deferred in v1 per SURVEY.md: the 10^12-turn target is a batch
backfill; this module documents the seam so the streaming binding is a
config change, not a rewrite.
"""

from .batch_stream import extract_stream  # noqa: F401
