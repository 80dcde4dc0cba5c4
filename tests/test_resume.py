"""SURVEY.md §5.2.5: kill after k bucket-groups, restart, assert output
identical to an uninterrupted run and free of duplicates."""

from __future__ import annotations

import pytest

from bank_statement_pdf_parser_spark.sources.checkpoint import (
    CheckpointedExtract)


def _canon(df):
    return sorted(tuple(r) for r in df.drop("bucket").collect())


def test_resume_idempotent(spark, transcripts_path, tmp_path):
    df = spark.read.parquet(transcripts_path)

    full = CheckpointedExtract(str(tmp_path / "full"), "full", n_buckets=8,
                               buckets_per_job=4)
    full.run(df)

    ck = CheckpointedExtract(str(tmp_path / "ck"), "r1", n_buckets=8,
                             buckets_per_job=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ck.run(df, fail_after_groups=1)
    done_after_crash = ck.committed_buckets()
    assert 0 < len(done_after_crash) < 8

    res = ck.run(df)  # resume
    assert sorted(res.buckets_skipped) == sorted(done_after_crash)
    assert ck.committed_buckets() == set(range(8))

    assert _canon(ck.spans(spark)) == _canon(full.spans(spark))
    assert _canon(ck.transactions(spark)) == _canon(full.transactions(spark))

    lineage = ck.lineage(spark).collect()
    assert len(lineage) == 8
    assert sum(m["rows_in"] for m in lineage) == df.count()
    assert all(m["status"] == "committed" for m in lineage)


def test_extraction_runs_once_per_turn(spark, transcripts_path, tmp_path):
    """The sink must not recompute the extraction DAG for its sibling
    output or its metrics: the tokenizer kernel sees every classified
    turn EXACTLY once across the whole run (spans, transactions, input
    metrics and output counts all derive from that single pass)."""
    from bank_statement_pdf_parser_spark.sources.transcripts import (
        with_resolved_payload)
    df = spark.read.parquet(transcripts_path)
    n_classified = with_resolved_payload(df).count()
    probe = spark.sparkContext.accumulator(0)
    ck = CheckpointedExtract(str(tmp_path / "once"), "r1", n_buckets=4,
                             buckets_per_job=2)
    ck.run(df, probe=probe)
    assert probe.value == n_classified


def test_second_run_is_noop(spark, transcripts_path, tmp_path):
    df = spark.read.parquet(transcripts_path)
    ck = CheckpointedExtract(str(tmp_path / "o"), "r1", n_buckets=4,
                             buckets_per_job=4)
    r1 = ck.run(df)
    n1 = ck.spans(spark).count()
    r2 = ck.run(df)
    assert r2.buckets_done == []
    assert sorted(r2.buckets_skipped) == [0, 1, 2, 3]
    assert ck.spans(spark).count() == n1


def test_empty_group_commits_true_metrics(spark, tmp_path):
    """A bucket group whose turns yield ZERO records must still commit
    manifests with the TRUE input metrics (AQE empty-relation pruning
    removes the CollectMetrics node on the empty write — the
    _obs_result fallback re-derives rows_in/bytes_in instead of
    crashing or zero-filling them)."""
    rows = [(f"c{i}", 0, "user", "no bank signature here", None, None)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    ck = CheckpointedExtract(str(tmp_path / "out"), "r", 8, 8)
    res = ck.run(df)
    assert len(res.metrics) == 8
    assert sum(m["rows_in"] for m in res.metrics) == 40
    assert sum(m["bytes_in"] for m in res.metrics) == 40 * len(
        "no bank signature here")
    assert sum(m["rows_out"] for m in res.metrics) == 0
    assert ck.committed_buckets() == set(range(8))


def test_compact_rewrites_small_files_losslessly(spark, transcripts_path,
                                                 tmp_path):
    """compact(): many small files per bucket partition are rewritten
    into the per-bucket byte budget; the row multiset is unchanged and
    a leftover staging dir from a crashed compaction is cleaned up."""
    import os
    from pyspark.sql import functions as F
    out = str(tmp_path / "out")
    ck = CheckpointedExtract(out, "r", 4, 4)
    ck.run(spark.read.parquet(transcripts_path).limit(200))
    txns_dir = f"{out}/transactions"
    before = sorted(map(tuple, spark.read.parquet(txns_dir).collect()))
    assert before

    # fragment: rewrite every bucket partition as many tiny files
    frag = (spark.read.parquet(txns_dir)
            .repartition(40).write.mode("overwrite")
            .partitionBy("bucket"))
    frag.parquet(txns_dir + ".frag")
    import shutil
    shutil.rmtree(txns_dir)
    os.rename(txns_dir + ".frag", txns_dir)
    os.makedirs(txns_dir + ".compacting")  # crashed-compaction leftover

    report = ck.compact(spark, "transactions", target_bytes=1 << 30)
    after = sorted(map(tuple, spark.read.parquet(txns_dir).collect()))
    assert after == before
    assert not os.path.exists(txns_dir + ".compacting")
    assert not os.path.exists(txns_dir + ".old")
    for b, (n_before, n_after) in report.items():
        assert n_after <= n_before
        assert n_after == 1  # 1 GiB budget -> one file per bucket
    assert sum(n for n, _ in report.values()) > len(report)  # was fragmented


def test_compact_recovers_from_between_renames_crash(spark, transcripts_path,
                                                     tmp_path):
    """The swap is two renames; a crash BETWEEN them leaves the only
    committed copy at `.old` (plus the complete `.compacting` copy) and
    NO data_dir. The next compact() must RECOVER that state — restore
    the committed copy and proceed — never purge it (the round-4 code
    rmtree'd both leftovers first, destroying the dataset)."""
    import os
    import shutil
    out = str(tmp_path / "out")
    ck = CheckpointedExtract(out, "r", 4, 4)
    ck.run(spark.read.parquet(transcripts_path).limit(200))
    txns_dir = f"{out}/transactions"
    before = sorted(map(tuple, spark.read.parquet(txns_dir).collect()))
    assert before

    # crash window A: data_dir renamed to .old, staging copy complete
    shutil.copytree(txns_dir, txns_dir + ".compacting")
    os.rename(txns_dir, txns_dir + ".old")
    report = ck.compact(spark, "transactions", target_bytes=1 << 30)
    assert report  # recovered and compacted, not crashed
    after = sorted(map(tuple, spark.read.parquet(txns_dir).collect()))
    assert after == before
    assert not os.path.exists(txns_dir + ".old")
    assert not os.path.exists(txns_dir + ".compacting")

    # crash window B: only a complete staging copy survives -> promoted
    shutil.copytree(txns_dir, txns_dir + ".compacting")
    shutil.rmtree(txns_dir)
    report = ck.compact(spark, "transactions", target_bytes=1 << 30)
    assert report
    after = sorted(map(tuple, spark.read.parquet(txns_dir).collect()))
    assert after == before


def test_compact_empty_dataset_is_noop(spark, tmp_path):
    """--compact-mb after a run that extracted nothing must no-op, not
    raise: dataset dir absent, or present with zero bucket partitions
    (round-4 code built an empty repartition budget and crashed)."""
    import os
    ck = CheckpointedExtract(str(tmp_path / "out"), "r", 4, 4)
    assert ck.compact(spark, "transactions") == {}  # dir absent
    os.makedirs(str(tmp_path / "out" / "transactions"))
    assert ck.compact(spark, "transactions") == {}  # no partitions


def test_incremental_read_tracks_recommits(spark, transcripts_path,
                                           tmp_path):
    """Iceberg-style incremental consumption from the manifest store:
    a cursor taken after a full run sees nothing new; recomputing ONE
    bucket (manifest re-commit) surfaces exactly that bucket's rows;
    and the incremental scan prunes the untouched partition
    directories (I/O proportional to the change)."""
    import os
    df = spark.read.parquet(transcripts_path)
    ck = CheckpointedExtract(str(tmp_path / "inc"), "r1", n_buckets=8,
                             buckets_per_job=4)
    ck.run(df)

    full, cur = ck.read_incremental(spark, None)
    assert full.count() == ck.transactions(spark).count()

    nothing, cur2 = ck.read_incremental(spark, cur)
    assert nothing.count() == 0

    # simulate a recomputed bucket: drop one manifest and resume
    victim = sorted(ck.committed_buckets())[3]
    os.remove(os.path.join(ck.manifest_dir, f"bucket-{victim}.json"))
    ck2 = CheckpointedExtract(str(tmp_path / "inc"), "r2", n_buckets=8,
                              buckets_per_job=4)
    ck2.run(df)

    delta, cur3 = ck.read_incremental(spark, cur)
    want = ck.transactions(spark).filter(f"bucket = {victim}")
    assert _canon(delta) == _canon(want)
    assert delta.count() > 0
    # partition pruning: the bucket predicate lands in the scan's
    # PartitionFilters (directory-level pruning, not a row filter) —
    # inputFiles() can't show this, it lists pre-pruning
    plan = delta._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0]

    # and the new cursor is quiescent again
    again, _ = ck.read_incremental(spark, cur3)
    assert again.count() == 0


def test_lineage_conv_range_matches_exact(spark, transcripts_path,
                                          tmp_path):
    """conv_id_min/max in the manifests (round 7: derived from the
    staged-records parquet FOOTER statistics, zero Spark jobs) must
    equal an exact per-bucket aggregation over the staged records."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(transcripts_path)
    ck = CheckpointedExtract(str(tmp_path / "rng"), "r1", n_buckets=8,
                             buckets_per_job=4)
    ck.run(df)
    staged = spark.read.parquet(str(tmp_path / "rng" / "records"))
    want = {r["bucket"]: (r["cmin"], r["cmax"])
            for r in staged.groupBy("bucket")
            .agg(F.min("conv_id").alias("cmin"),
                 F.max("conv_id").alias("cmax")).collect()}
    got = {m["partition_id"]: (m["conv_id_min"], m["conv_id_max"])
           for m in ck.lineage(spark).collect()
           if m["conv_id_min"] is not None}
    assert got == want
