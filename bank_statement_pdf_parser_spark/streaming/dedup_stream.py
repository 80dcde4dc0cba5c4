"""Streaming deduplication for transcript ingest (training-data
pipelines: at-least-once upstreams re-deliver turns; exact dedup must
happen BEFORE extraction so duplicate documents never reach the
tokenizer).

`dedup_turns` uses `dropDuplicatesWithinWatermark`: state holds one
entry per key only until the event-time watermark passes `within`, so
state is bounded by (arrival rate x window), not stream length — the
only viable shape at 10^12 turns. Keys on (conv_id, turn_idx) by
default (a redelivered turn is the same logical row); `by_content=True`
keys on the content instead (cross-conversation exact content dedup,
the streaming analogue of neardup.exact_dedup — note this drops ALL
BUT THE FIRST conversation carrying a given text within the window).

Content keying: a single 64-bit hash is NOT collision-safe at design
scale — at 10^12 keys the birthday bound expects tens of thousands of
colliding pairs, each silently dropping a distinct document. The key
is therefore (length(text), xxhash64(text), xxhash64(41, text)): two
independently-seeded 64-bit hashes plus the length, ~128 effective
bits, putting the expected collision count at 10^12 keys below 1e-13.
The state row stays ~20 bytes/key; text itself never enters state.

MIGRATION: this widened the by_content state-store key from one
column to three (round 5). A streaming checkpoint written by the
round-4 single-hash key cannot resume through this operator (Spark
fails the state schema compatibility check at restart) — drain the
old stream and start a fresh checkpoint; the watermark horizon
bounds the duplicate exposure of the cutover to `within`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_chunks(chunk_stream: DataFrame,
                 within: str = "1 hour") -> DataFrame:
    """Exact-dedup for a CHUNKED turn stream (assembler.CHUNKS_DDL),
    keyed on (conv_id, turn_idx, chunk_idx) — drops at-least-once
    chunk redeliveries AND whole-turn redeliveries (every chunk of the
    second copy is a key-level duplicate) before they reach the
    stateful assembler.

    This is the composition order for the end-to-end curation stream
    (dedup BEFORE assembly, not after):

    - state here is key-only (~tens of bytes/chunk within the
      watermark horizon); deduping assembled turns instead would
      buffer each redelivered turn's full text in assembler state a
      second time before dropping it;
    - a redelivered turn arriving AFTER its assembler state was
      emitted+removed would otherwise re-assemble and re-emit;
    - (implementation note, Spark 4.1) the Arrow-columnar output of
      applyInPandasWithState feeding a downstream stateful exchange
      throws ClassCastException (ColumnarBatchRow -> UnsafeRow);
      dedup-first keeps the pandas-state operator last before the
      sink, which is also the plan you want.

    ASSUMPTION (ADVICE r5): redeliveries are BYTE-IDENTICAL
    re-chunkings — the same chunk boundaries and n_chunks, as an
    at-least-once replay of the same records naturally is. A
    redelivery re-chunked with DIFFERENT boundaries carries novel
    (turn, chunk_idx) keys that pass this dedup; the assembler then
    drops conflicting-layout rows pre-emit (first layout wins) but a
    post-emit re-chunked redelivery re-assembles and re-emits — use
    dedup_turns(by_content=True) downstream (or batch exact_dedup)
    when the producer cannot guarantee stable chunking."""
    return (chunk_stream.withWatermark("ts", within)
            .dropDuplicatesWithinWatermark(
                ["conv_id", "turn_idx", "chunk_idx"]))


def dedup_turns(stream: DataFrame, within: str = "1 hour",
                by_content: bool = False) -> DataFrame:
    """stream: streaming DataFrame with the transcripts schema (must
    carry the `ts` event-time column). Returns the stream with
    duplicates within the watermark horizon dropped (first delivery
    wins)."""
    wm = stream.withWatermark("ts", within)
    if by_content:
        keyed = (wm.withColumn("_klen", F.length("text"))
                 .withColumn("_k1", F.xxhash64("text"))
                 .withColumn("_k2", F.xxhash64(F.lit(41), F.col("text"))))
        return (keyed.dropDuplicatesWithinWatermark(["_klen", "_k1", "_k2"])
                .drop("_klen", "_k1", "_k2"))
    return wm.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
