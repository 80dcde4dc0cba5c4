"""Stateful streaming turn assembler (SURVEY.md §2.10 deferred case).

The batch engine assumes a turn arrives WHOLE (one transcripts row).
When an upstream producer ships a turn as text fragments — e.g. an
agent streaming tool output — the stream carries chunk rows:

    conv_id, turn_idx, role, chunk_idx, n_chunks, chunk, tool, ts

`assemble_turns` is the custom stateful operator the streaming
docstring deferred: `applyInPandasWithState` keyed by
(conv_id, turn_idx) buffers a turn's fragments in GroupState across
micro-batches and emits ONE assembled transcripts row the moment all
n_chunks are present (chunks concatenated in chunk_idx order,
duplicates from at-least-once upstreams collapsed by keeping the first
copy of each index). Incomplete turns either wait in state or, with a
processing-time timeout, are flushed away so state stays bounded —
exactly the late/incomplete-data discipline a 10^12-turn streaming
ingest needs. Downstream, the assembled rows flow through the SAME
stateless extraction plan as batch (foreachBatch / build_records);
nothing else changes.

State is O(one turn's text) per in-flight key and is dropped on emit,
so the operator's memory bound is (open turns) x (turn size), not the
stream length.

Redelivery contract: exact re-emit suppression holds for
BYTE-IDENTICAL re-chunking (same boundaries, same n_chunks — the
normal at-least-once case, where the producer replays the same
records). A redelivery RE-CHUNKED with different boundaries is a
different record stream: pre-emit, conflicting-layout rows are
dropped here (first-seen n_chunks wins, so the assembled text is
always a single consistent copy — never a mix of layouts); post-emit
(state already removed), the new layout assembles and re-emits a
second copy, which only downstream content dedup
(dedup_stream.dedup_turns(by_content=True) or batch
neardup.exact_dedup) removes. See dedup_stream.dedup_chunks for the
composition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from .. import spec

CHUNKS_DDL = (
    "conv_id string, turn_idx int, role string, chunk_idx int, "
    "n_chunks int, chunk string, tool string, ts timestamp"
)

# GroupState layout: collected chunk indexes + texts, turn metadata.
_STATE_DDL = (
    "idxs array<int>, parts array<string>, role string, tool string, "
    "ts timestamp, n_chunks int"
)


def _make_assemble(timeout_ms: int | None):
    def assemble(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any):
        conv_id, turn_idx = key
        if state.hasTimedOut:
            # incomplete turn abandoned: drop buffered fragments
            state.remove()
            return

        if state.exists:
            idxs, parts, role, tool, ts, n_chunks = state.get
            # dict keyed by chunk_idx: O(1) duplicate detection (a list
            # membership scan would be quadratic per heavily-fragmented
            # turn); flattened back to parallel arrays for the state row
            got = dict(zip(idxs, parts))
        else:
            got = {}
            role = tool = ts = n_chunks = None

        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                ci = int(row.chunk_idx)
                if n_chunks is not None and int(row.n_chunks) != n_chunks:
                    # conflicting chunk LAYOUT for this turn (a
                    # redelivery re-chunked with different boundaries
                    # slips past key-level dedup): the first-seen
                    # layout wins and conflicting rows are dropped —
                    # mixing layouts would concatenate fragments that
                    # never belonged to one copy (ADVICE r5)
                    continue
                if not (0 <= ci < int(row.n_chunks)):
                    # a stray out-of-range index must not substitute
                    # for a missing real fragment in the count-based
                    # completion check below
                    continue
                if ci in got:
                    continue  # duplicate delivery: first copy wins
                got[ci] = row.chunk if isinstance(row.chunk, str) else ""
                role = role or row.role
                tool = tool if tool is not None else row.tool
                ts = ts if ts is not None else row.ts
                n_chunks = int(row.n_chunks)

        if n_chunks is not None and len(got) >= n_chunks:
            text = "".join(got[i] for i in sorted(got))
            state.remove()
            yield pd.DataFrame({
                "conv_id": [conv_id], "turn_idx": [turn_idx],
                "role": [role], "text": [text], "tool": [tool],
                "ts": [ts]})
        else:
            state.update((list(got.keys()), list(got.values()),
                          role, tool, ts, n_chunks))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return assemble


def assemble_turns(chunk_stream, timeout_ms: int | None = 60_000):
    """chunk_stream: streaming DataFrame with CHUNKS_DDL schema ->
    streaming DataFrame with the transcripts schema (spec
    TRANSCRIPTS_DDL), one row per completed turn. timeout_ms=None
    disables the incomplete-turn flush (state then waits forever)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    conf = (GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None else GroupStateTimeout.NoTimeout)
    return (chunk_stream
            .groupBy("conv_id", "turn_idx")
            .applyInPandasWithState(
                _make_assemble(timeout_ms),
                outputStructType=spec.TRANSCRIPTS_DDL,
                stateStructType=_STATE_DDL,
                outputMode="append",
                timeoutConf=conf))
