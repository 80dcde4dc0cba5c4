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
watermark requirements.

When turns DO arrive fragmented, `assembler.assemble_turns` is the
custom stateful operator: `applyInPandasWithState` keyed by
(conv_id, turn_idx) buffers fragments in GroupState across
micro-batches, collapses duplicate deliveries, emits each turn whole
exactly once, and (optionally) flushes incomplete turns on a
processing-time timeout so state stays bounded. Event-time metrics
with late-data discipline live in `metrics_stream.windowed_turn_
metrics` (watermark + windowed aggregation, append mode).
"""

from .assembler import assemble_turns  # noqa: F401
from .batch_stream import curate_stream, extract_stream  # noqa: F401
from .dedup_stream import dedup_chunks, dedup_turns  # noqa: F401
from .metrics_stream import windowed_turn_metrics  # noqa: F401
