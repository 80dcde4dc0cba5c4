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


def test_stream_resume_commits_batch_lineage(spark, transcripts_path,
                                             tmp_path):
    """A stopped (killed) stream restarted on the same checkpoint must
    resume with NO duplicate rows, and every micro-batch must commit a
    lineage manifest through the same ManifestStore seam as the batch
    sink — identical schema, atomic replace on replay."""
    from bank_statement_pdf_parser_spark.sources.checkpoint import (
        LINEAGE_DDL, ManifestStore)
    from bank_statement_pdf_parser_spark.streaming.batch_stream import (
        process_micro_batch)
    import os
    schema = spark.read.parquet(transcripts_path).schema
    full = spark.read.parquet(transcripts_path).limit(240)
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    f1 = full.limit(120)
    f2 = full.subtract(f1)
    f1.coalesce(1).write.parquet(f"{src}/f1")
    for root, _dirs, files in os.walk(f"{src}/f1"):
        for f in files:
            os.utime(os.path.join(root, f), (1_000_000_000,) * 2)

    def run_stream():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
        q = extract_stream(stream, out, ck)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()                       # batch 0 = f1, then "killed"
    f2.coalesce(1).write.parquet(f"{src}/f2")
    run_stream()                       # resume: batch 1 = f2 only

    store = ManifestStore(f"{out}/_manifest", prefix="batch")
    assert store.committed() == {0, 1}
    lineage = store.lineage(spark)
    # identical lineage schema to the batch sink's bucket manifests
    assert lineage.schema == spark.createDataFrame([], LINEAGE_DDL).schema
    rows_in = {r.partition_id: r.rows_in for r in lineage.collect()}
    assert sum(rows_in.values()) == 240

    got = sorted(map(tuple, spark.read.parquet(f"{out}/transactions")
                     .drop("batch_id").collect()))
    want = sorted(map(tuple,
                      extract_all(full).transactions.collect()))
    assert got == want and got    # resumed, complete, no duplicates

    # a replayed micro-batch (crash after partial write) REPLACES both
    # its output partition and its manifest
    process_micro_batch(f2, 1, out, store=store)
    again = sorted(map(tuple, spark.read.parquet(f"{out}/transactions")
                       .drop("batch_id").collect()))
    assert again == want
    assert store.committed() == {0, 1}
    assert store.lineage(spark).count() == 2


def _write_file(spark, rows, ddl, path, mtime):
    import os
    df = spark.createDataFrame(rows, ddl)
    df.coalesce(1).write.parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_stateful_turn_assembler(spark, tmp_path):
    """applyInPandasWithState: turn fragments scattered ACROSS
    micro-batches (and duplicated, at-least-once style) are buffered in
    GroupState and emitted as exactly one whole turn each; a turn with
    a missing fragment stays in state and never emits."""
    from bank_statement_pdf_parser_spark.streaming.assembler import (
        CHUNKS_DDL, assemble_turns)
    import datetime as dt
    ts = dt.datetime(2026, 1, 5, 10, 0, 0)

    def chunk(conv, turn, idx, n, text):
        return (conv, turn, "user", idx, n, text, None, ts)

    # turn A: 3 chunks over two batches (chunk 1 duplicated);
    # turn B: 2 chunks in one batch; turn C: incomplete (1 of 2);
    # turn D: a stray out-of-range chunk_idx must NOT substitute for
    # the missing real fragment (index-coverage, not raw count)
    f1 = [chunk("A", 0, 0, 3, "alpha "), chunk("A", 0, 1, 3, "beta "),
          chunk("C", 0, 0, 2, "never"),
          chunk("D", 0, 0, 2, "dee "), chunk("D", 0, 5, 2, "stray")]
    f2 = [chunk("A", 0, 1, 3, "beta "),  # duplicate delivery
          chunk("A", 0, 2, 3, "gamma"),
          chunk("B", 1, 1, 2, "world"), chunk("B", 1, 0, 2, "hello ")]
    src = str(tmp_path / "chunks")
    _write_file(spark, f1, CHUNKS_DDL, f"{src}/f1", 1_000_000_000)
    _write_file(spark, f2, CHUNKS_DDL, f"{src}/f2", 1_000_000_001)

    stream = (spark.readStream.schema(CHUNKS_DDL)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    out = assemble_turns(stream, timeout_ms=None)
    q = (out.writeStream.format("memory").queryName("assembled")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.conv_id, r.turn_idx): r.text
           for r in spark.sql("SELECT * FROM assembled").collect()}
    assert got == {("A", 0): "alpha beta gamma", ("B", 1): "hello world"}


def test_assembler_drops_conflicting_chunk_layout(spark, tmp_path):
    """A redelivery RE-CHUNKED with different boundaries (n_chunks=3
    vs the original 2) slips past key-level dedup; the assembler must
    drop the conflicting-layout rows instead of mixing fragments from
    two layouts into corrupted text or emitting early off the larger
    n_chunks (ADVICE r5). First-seen layout wins; the turn completes
    with the ORIGINAL bytes when its real missing fragment arrives."""
    from bank_statement_pdf_parser_spark.streaming.assembler import (
        CHUNKS_DDL, assemble_turns)
    import datetime as dt
    ts = dt.datetime(2026, 1, 5, 10, 0, 0)

    def chunk(conv, idx, n, text):
        return (conv, 0, "user", idx, n, text, None, ts)

    # batch 1: half of layout-A ("hello " + "world")
    f1 = [chunk("E", 0, 2, "hello ")]
    # batch 2: a layout-B re-chunking of the same turn ("hel" / "lo wo"
    # / "rld") — chunk_idx 1 and 2 are novel keys, n_chunks conflicts
    f2 = [chunk("E", 1, 3, "lo wo"), chunk("E", 2, 3, "rld")]
    # batch 3: the real missing layout-A fragment
    f3 = [chunk("E", 1, 2, "world")]
    src = str(tmp_path / "chunks")
    _write_file(spark, f1, CHUNKS_DDL, f"{src}/f1", 1_000_000_000)
    _write_file(spark, f2, CHUNKS_DDL, f"{src}/f2", 1_000_000_001)
    _write_file(spark, f3, CHUNKS_DDL, f"{src}/f3", 1_000_000_002)

    stream = (spark.readStream.schema(CHUNKS_DDL)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = (assemble_turns(stream, timeout_ms=None)
         .writeStream.format("memory").queryName("layout_conflict")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [(r.conv_id, r.turn_idx, r.text)
           for r in spark.sql("SELECT * FROM layout_conflict").collect()]
    assert got == [("E", 0, "hello world")]


def test_windowed_metrics_drop_late_rows(spark, tmp_path):
    """Watermark + windowed agg: a row arriving behind the watermark is
    dropped; closed windows emit exactly once with the on-time counts."""
    from bank_statement_pdf_parser_spark.streaming.metrics_stream import (
        windowed_turn_metrics)
    from bank_statement_pdf_parser_spark import spec
    import datetime as dt
    d1 = dt.datetime(2026, 1, 5, 10, 10, 0)

    def turn(conv, ts, role="user", text="x" * 10):
        return (conv, 0, role, text, None, ts)

    f1 = [turn("a", d1), turn("b", d1), turn("c", d1, role="assistant")]
    f2 = [turn("d", d1 + dt.timedelta(days=1))]   # advances watermark
    # the watermark computed from a batch takes effect one batch later,
    # so a second fresh batch is what CLOSES (emits+evicts) the day-1
    # window before the late row arrives
    f2b = [turn("g", d1 + dt.timedelta(days=1, seconds=30))]
    f3 = [turn("e", d1 + dt.timedelta(minutes=5)),  # LATE: behind wm
          turn("f", d1 + dt.timedelta(days=1, minutes=1))]
    src = str(tmp_path / "turns")
    _write_file(spark, f1, spec.TRANSCRIPTS_DDL, f"{src}/f1", 1_000_000_000)
    _write_file(spark, f2, spec.TRANSCRIPTS_DDL, f"{src}/f2", 1_000_000_100)
    _write_file(spark, f2b, spec.TRANSCRIPTS_DDL, f"{src}/f2b",
                1_000_000_200)
    _write_file(spark, f3, spec.TRANSCRIPTS_DDL, f"{src}/f3", 1_000_000_300)

    stream = (spark.readStream.schema(spec.TRANSCRIPTS_DDL)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    out = windowed_turn_metrics(stream)
    q = (out.writeStream.format("memory").queryName("winmetrics")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM winmetrics").collect()
    day1 = sorted((r.role, r.n_turns, r.bytes_in) for r in rows
                  if r.win.start.day == 5)
    # the late row 'e' (same 10:00 window) must NOT be counted, and the
    # closed window must have been emitted exactly once per role
    assert day1 == [("assistant", 1, 10), ("user", 2, 20)]


def test_empty_micro_batch_commits_zero_lineage(spark, tmp_path):
    """An empty micro-batch must still commit its manifest (zeros) —
    the AQE empty-relation caveat prunes the CollectMetrics node and
    the first batch writes no parquet files to infer schema from."""
    from bank_statement_pdf_parser_spark.sources.checkpoint import (
        ManifestStore)
    from bank_statement_pdf_parser_spark.streaming.batch_stream import (
        process_micro_batch)
    empty = spark.createDataFrame([], spec.TRANSCRIPTS_DDL)
    store = ManifestStore(str(tmp_path / "_manifest"), prefix="batch")
    process_micro_batch(empty, 0, str(tmp_path / "out"), store=store)
    [m] = store.lineage(spark).collect()
    assert (m.partition_id, m.rows_in, m.rows_out) == (0, 0, 0)
    assert m.conv_id_min is None and m.conv_id_max is None


def test_curate_stream_end_to_end_kill_resume(spark, transcripts_path,
                                              tmp_path):
    """The COMPOSED streaming story in one query — chunks ->
    dedup_chunks -> assemble_turns -> extraction + lineage manifests —
    killed mid-run with turns half-assembled in GroupState, then
    resumed on the same checkpoint. Asserts: output byte-equal to the
    batch engine on the logical corpus, duplicate chunks AND a
    redelivered whole turn dropped, half-assembled turns completed
    from restored state, and lineage manifests unique per micro-batch
    (total rows_in == assembled turns, each exactly once)."""
    from bank_statement_pdf_parser_spark.sources.checkpoint import (
        ManifestStore)
    from bank_statement_pdf_parser_spark.streaming import curate_stream
    from bank_statement_pdf_parser_spark.streaming.assembler import (
        CHUNKS_DDL)

    base = (spark.read.parquet(transcripts_path)
            .filter("text IS NOT NULL AND length(text) >= 3")
            .limit(24).collect())
    assert len(base) == 24

    def chunks(r, idxs):
        c1, c2 = len(r.text) // 3, 2 * len(r.text) // 3
        parts = [r.text[:c1], r.text[c1:c2], r.text[c2:]]
        return [(r.conv_id, r.turn_idx, r.role, i, 3, parts[i],
                 r.tool, r.ts) for i in idxs]

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    # phase A file 1: turns 0-7 whole; turns 8-15 MISSING chunk 2
    # (stay in GroupState across the kill); a duplicate chunk delivery
    fa1 = sum((chunks(r, [0, 1, 2]) for r in base[:8]), [])
    fa1 += sum((chunks(r, [0, 1]) for r in base[8:16]), [])
    fa1 += chunks(base[0], [1])                    # duplicate chunk
    # phase A file 2: a whole-turn REDELIVERY (all chunks again)
    fa2 = chunks(base[3], [0, 1, 2])
    _write_file(spark, fa1, CHUNKS_DDL, f"{src}/fa1", 1_000_000_000)
    _write_file(spark, fa2, CHUNKS_DDL, f"{src}/fa2", 1_000_000_001)

    def run():
        stream = (spark.readStream.schema(CHUNKS_DDL)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
        q = curate_stream(stream, out, ck, dedup_within="365 days")
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()  # ... then "killed" with turns 8-15 half-assembled

    # phase B: the missing chunk 2s (completing restored state),
    # 8 brand-new turns, and another whole-turn redelivery
    fb = sum((chunks(r, [2]) for r in base[8:16]), [])
    fb += sum((chunks(r, [0, 1, 2]) for r in base[16:24]), [])
    fb += chunks(base[10], [0, 1, 2])              # turn redelivery
    _write_file(spark, fb, CHUNKS_DDL, f"{src}/fb", 1_000_000_002)

    run()  # resume on the same checkpoint

    logical = spark.createDataFrame(base, spec.TRANSCRIPTS_DDL)
    want = extract_all(logical)
    got_txns = sorted(map(tuple, spark.read.parquet(f"{out}/transactions")
                          .drop("batch_id").collect()))
    got_spans = sorted(map(tuple, spark.read.parquet(f"{out}/spans")
                           .drop("batch_id").collect()))
    assert got_txns == sorted(map(tuple, want.transactions.collect()))
    assert got_spans == sorted(map(tuple, want.spans.collect()))

    store = ManifestStore(f"{out}/_manifest", prefix="batch")
    lineage = store.lineage(spark).collect()
    assert len({m.partition_id for m in lineage}) == len(lineage)
    # every turn assembled exactly once across the whole run: the
    # duplicate chunk, the pre-kill redelivery and the post-resume
    # redelivery all died in dedup/assembler state
    assert sum(m.rows_in for m in lineage) == 24

    # state-store observability (round 6): the progress listener amends
    # each batch's manifest with the summed stateOperators footprint;
    # amendments land asynchronously after the batch, so poll briefly
    deadline = time.time() + 15
    while time.time() < deadline:
        lineage = store.lineage(spark).collect()
        with_state = [m for m in lineage if m.state_rows is not None]
        if with_state:
            break
        time.sleep(0.5)
    assert with_state, "no lineage row carries state metrics"
    # dedup state holds watermarked chunk keys; some batch must have
    # seen a positive state footprint
    assert any(m.state_rows > 0 for m in with_state)
    assert all(m.state_bytes >= 0 for m in with_state)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a turn re-delivered in a LATER
    micro-batch (at-least-once upstream) is dropped while inside the
    watermark horizon; distinct turns all pass; content-keyed mode
    collapses identical text across conversations."""
    from bank_statement_pdf_parser_spark.streaming.dedup_stream import (
        dedup_turns)
    import datetime as dt
    t = dt.datetime(2026, 1, 5, 10, 0, 0)

    def turn(conv, idx, text, secs=0):
        return (conv, idx, "user", text, None,
                t + dt.timedelta(seconds=secs))

    f1 = [turn("a", 0, "hello"), turn("b", 0, "world", 5)]
    f2 = [turn("a", 0, "hello"),          # redelivery: drop
          turn("a", 1, "next", 10),       # new turn: keep
          turn("c", 0, "world", 15)]      # same text, new conv: keep
    src = str(tmp_path / "turns")
    _write_file(spark, f1, spec.TRANSCRIPTS_DDL, f"{src}/f1", 1_000_000_000)
    _write_file(spark, f2, spec.TRANSCRIPTS_DDL, f"{src}/f2", 1_000_000_001)

    def run(name, **kw):
        stream = (spark.readStream.schema(spec.TRANSCRIPTS_DDL)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
        q = (dedup_turns(stream, **kw)
             .writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted((r.conv_id, r.turn_idx, r.text)
                      for r in spark.sql(f"SELECT * FROM {name}").collect())

    assert run("dedup_key") == [
        ("a", 0, "hello"), ("a", 1, "next"),
        ("b", 0, "world"), ("c", 0, "world")]
    # content-keyed: "world" from conv c duplicates conv b's text
    assert run("dedup_content", by_content=True) == [
        ("a", 0, "hello"), ("a", 1, "next"), ("b", 0, "world")]
