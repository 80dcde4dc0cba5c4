"""Event-time windowed stream metrics with late-data discipline
(SURVEY.md §2.10: watermark + windowed aggregation).

Turn-volume metrics per (event-time window, role): `withWatermark`
bounds how late a transcript row may arrive; rows older than the
watermark are dropped at ingest, and each window is emitted exactly
once, when the watermark passes its end (append mode) — so a
downstream metrics table never sees a partial window revised. This is
the S6 metrics sink's streaming face: at ingest scale the same
aggregation runs per-executor partial first (hash aggregate), so the
state store holds one row per (window, role), not per turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_metrics(transcript_stream: DataFrame,
                          window_dur: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    return (transcript_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window_dur).alias("win"), "role")
            .agg(F.count("*").alias("n_turns"),
                 # octet_length: a bytes metric must count BYTES, not
                 # characters (multi-byte UTF-8 would under-report)
                 F.sum(F.octet_length("text")).cast("long")
                 .alias("bytes_in")))
