"""Minimal working Structured Streaming binding of the extraction plan.

Works because every stage of the batch plan except the per-turn index
windows is stateless; the indexes are assigned inside foreachBatch
(each micro-batch holds whole turns).

Exactly-once output: each micro-batch writes into its own
`batch_id=N` partition via dynamic-partition overwrite, so a batch
retried from the checkpoint after a partial write REPLACES its own
partition instead of appending duplicates.

Lineage: each micro-batch also commits one manifest through the SAME
`ManifestStore` seam as the batch sink (sources/checkpoint.py) —
partition_id = batch_id instead of conv_id bucket, schema identical
(LINEAGE_DDL). The manifest is committed AFTER the batch's output
partitions, so a crash mid-batch leaves no manifest; the checkpoint
replays the batch, dynamic overwrite replaces its partitions, and the
re-commit atomically replaces the manifest — stream resume behaves
exactly like batch resume, and downstream lineage consumers read one
schema regardless of which engine wrote it.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..plans.extract import build_spans, build_transactions, build_records
from ..sources.checkpoint import ManifestStore, _obs_result
from ..sources.transcripts import with_resolved_payload


def process_micro_batch(batch_df: DataFrame, batch_id: int,
                        output_dir: str,
                        store: ManifestStore | None = None,
                        run_id: str = "stream") -> None:
    """One micro-batch -> its own batch_id partition (idempotent on
    retry: dynamic overwrite replaces exactly this batch's output).
    With a ManifestStore, input rows/bytes ride the spans job via
    df.observe (no extra scan); output counts AND the conv-id range
    (OUTPUT-level, same semantics as the batch sink: NULL when the
    batch extracted nothing) come from the freshly committed batch_id
    partitions (partition-pruned reads), then the batch's manifest is
    committed atomically."""
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    obs, raw_batch = None, batch_df
    in_aggs = [F.count(F.lit(1)).alias("rows_in"),
               F.sum(F.length("text")).alias("bytes_in")]
    if store is not None:
        obs = Observation()
        batch_df = batch_df.observe(obs, *in_aggs)
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
    if store is not None:
        # AQE empty-relation caveat (sources/checkpoint._obs_result):
        # an empty micro-batch prunes the CollectMetrics node
        m_in = _obs_result(
            obs, lambda: raw_batch.agg(*in_aggs).first().asDict())
        from .. import spec
        bid = F.col("batch_id") == int(batch_id)
        # explicit schemas: an all-empty first batch writes no files
        # to infer from
        # conv range rides the spans read-back (every output conv has
        # at least one span) — OUTPUT-level, matching the batch sink's
        # round-6 semantics: NULL when the batch extracted nothing
        sp = (spark.read
              .schema(f"{spec.SPANS_DDL}, batch_id int")
              .parquet(f"{output_dir}/spans")
              .filter(bid)
              .agg(F.count(F.lit(1)).alias("n"),
                   F.min("conv_id").alias("cmin"),
                   F.max("conv_id").alias("cmax")).first())
        n_spans = sp["n"]
        n_txns = (spark.read
                  .schema(f"{spec.TRANSACTIONS_DDL}, batch_id int")
                  .parquet(f"{output_dir}/transactions")
                  .filter(bid).count())
        store.commit(int(batch_id), {
            "run_id": run_id, "partition_id": int(batch_id),
            "conv_id_min": sp["cmin"], "conv_id_max": sp["cmax"],
            "rows_in": int(m_in["rows_in"] or 0),
            "bytes_in": int(m_in["bytes_in"] or 0),
            "rows_out": int(n_spans + n_txns),
            "n_spans": int(n_spans), "n_txns": int(n_txns),
            "status": "committed", "ts": time.time(),
        })


def extract_stream(transcript_stream: DataFrame, output_dir: str,
                   checkpoint_dir: str, run_id: str = "stream"):
    """transcript_stream: a streaming DataFrame with the transcripts
    schema. Returns the started StreamingQuery. Lineage manifests are
    committed per micro-batch under <output_dir>/_manifest (same
    store/schema as the batch sink)."""
    store = ManifestStore(f"{output_dir}/_manifest", prefix="batch")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_micro_batch(batch_df, batch_id, output_dir,
                            store=store, run_id=run_id)

    return (transcript_stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(process_batch)
            .start())


def attach_state_metrics(query, store: ManifestStore, spark=None):
    """State-store observability (round 6): register a
    StreamingQueryListener that, after every micro-batch of `query`,
    amends the batch's committed manifest with the summed
    stateOperators footprint (state_rows = numRowsTotal,
    state_bytes = memoryUsedBytes across dedup + assembler state) —
    so a 10^12-scale operator can alarm on state growth from the SAME
    lineage table it already reads, no Spark UI scraping.

    Ordering: the foreachBatch body commits the manifest DURING batch
    N; the progress event fires AFTER batch N completes, so the
    amendment always finds the manifest (a crash in between leaves
    state fields NULL for that batch — observability, not lineage
    truth). Events are filtered by the query's runId; progress events
    that raced ahead of registration are replayed from a small buffer.
    The listener unregisters itself when the query terminates."""
    from pyspark.sql.streaming.listener import StreamingQueryListener

    if spark is None:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
    run_id = str(query.runId)

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            if str(p.runId) != run_id:
                return
            ops = p.stateOperators
            if not ops:
                return
            store.amend(int(p.batchId), {
                "state_rows": int(sum(o.numRowsTotal for o in ops)),
                "state_bytes": int(sum(o.memoryUsedBytes for o in ops)),
            })

        def onQueryTerminated(self, event):
            if str(getattr(event, "runId", "")) == run_id:
                try:
                    spark.streams.removeListener(self)
                except Exception:  # session already torn down
                    pass

    listener = _L()
    spark.streams.addListener(listener)
    # progress events are delivered asynchronously; any batch that
    # completed before addListener took effect is recovered from
    # recentProgress (same payload the event would have carried)
    for p in query.recentProgress:
        if str(p["runId"]) == run_id and p.get("stateOperators"):
            ops = p["stateOperators"]
            store.amend(int(p["batchId"]), {
                "state_rows": int(sum(o["numRowsTotal"] for o in ops)),
                "state_bytes": int(sum(o["memoryUsedBytes"]
                                       for o in ops)),
            })
    return listener


def curate_stream(chunk_stream: DataFrame, output_dir: str,
                  checkpoint_dir: str, run_id: str = "curate",
                  dedup_within: str = "1 hour",
                  assemble_timeout_ms: int | None = None):
    """The END-TO-END streaming curation pipeline as ONE query:

        chunks -> dedup_chunks (watermarked exact dedup, key-only
        state) -> assemble_turns (GroupState buffers fragments across
        micro-batches) -> foreachBatch extraction with per-batch
        idempotent writes + atomic lineage manifests (extract_stream's
        batch body).

    All three stateful concerns — dedup state, assembler GroupState,
    manifest commits — hang off the SAME checkpoint, so a kill at any
    point resumes coherently: replayed chunks are re-deduped from
    restored dedup state, half-assembled turns continue from restored
    GroupState, and a replayed micro-batch overwrites its own
    batch_id partition and manifest (no duplicate rows, no duplicate
    lineage). Dedup runs BEFORE assembly — see dedup_chunks for why
    that is both the cheaper-state order and the one Spark 4.1 plans
    correctly. chunk_stream: assembler.CHUNKS_DDL schema."""
    from .assembler import assemble_turns
    from .dedup_stream import dedup_chunks
    store = ManifestStore(f"{output_dir}/_manifest", prefix="batch")
    turns = assemble_turns(dedup_chunks(chunk_stream, dedup_within),
                           timeout_ms=assemble_timeout_ms)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_micro_batch(batch_df, batch_id, output_dir,
                            store=store, run_id=run_id)

    q = (turns.writeStream
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .foreachBatch(process_batch)
         .start())
    attach_state_metrics(q, store, spark=chunk_stream.sparkSession)
    return q
