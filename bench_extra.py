"""Round-7 auxiliary benchmarks (guide §1.4): noop-sink stage isolation
for the extraction pipeline + same-session config A/Bs.

NOT part of the driver contract — bench.py is the frozen measurement.
This harness exists so optimization deltas can be attributed to a stage
(scan+resolve vs tokenizer/Arrow boundary vs record shuffle+window) and
so config candidates (Arrow batch size) are compared INTERLEAVED in one
session/window instead of across host epochs.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
Env:   SPARK_GRAFT_EXTRA_REPEATS (default 3)
       SPARK_GRAFT_EXTRA_BATCHES (comma list, default "1024,4096")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.abspath(__file__))


def _cpu_busy() -> float:
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = list(map(int, f[1:]))
    return (sum(vals) - vals[3] - vals[4]) / os.sysconf("SC_CLK_TCK")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "3"))
    batch_sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_EXTRA_BATCHES", "1024,4096").split(",")]
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from bank_statement_pdf_parser_spark.plans.extract import (
        build_records, build_spans, build_transactions)
    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.sources.transcripts import (
        with_resolved_payload)

    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS",
                               "2" if cpus >= 16 else "1")
    spark = get_spark(app="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      **{"spark.task.cpus": task_cpus,
                         "spark.sql.files.maxPartitionBytes": "4m"})
    spark.sparkContext.setLogLevel("ERROR")

    tpch_input = os.path.join(REPO, ".cache", "bench",
                              f"tpch_transcripts_{sf}_x16.parquet")
    if not os.path.exists(tpch_input):
        from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
            transcripts_from_tpch)
        transcripts_from_tpch(spark, sf_dir).repartition(16) \
            .write.parquet(tpch_input)
    df = spark.read.parquet(tpch_input)
    turns = with_resolved_payload(df)

    out: dict[str, list[float]] = {}
    busy: dict[str, list[float]] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        c0, t0 = _cpu_busy(), time.perf_counter()
        fn()
        w, b = time.perf_counter() - t0, _cpu_busy() - c0
        spark.sparkContext.setJobDescription(None)
        out.setdefault(name, []).append(round(w, 3))
        busy.setdefault(name, []).append(round(b, 2))

    spans_full = build_spans(
        turns, build_records(turns, profile="spans"),
        records_include_html=True)
    txns_full = build_transactions(
        build_records(turns, profile="transactions"))

    suite = [
        ("scan_resolve_noop", lambda: noop(turns)),
        ("records_full_noop",
         lambda: noop(build_records(turns, profile="full"))),
        ("records_txn_noop",
         lambda: noop(build_records(turns, profile="transactions"))),
        ("records_spans_noop",
         lambda: noop(build_records(turns, profile="spans"))),
        ("spans_noop", lambda: noop(spans_full)),
        ("transactions_noop", lambda: noop(txns_full)),
        ("spans_count", spans_full.count),
        ("transactions_count", txns_full.count),
    ]

    # warmup: codegen JIT + python worker spawn
    noop(build_records(turns.limit(cpus * 64)))

    for _ in range(repeats):
        for bs in batch_sizes:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(bs))
            for name, fn in suite:
                timed(f"{name}@b{bs}", fn)

    res = {
        name: {"best": min(ws), "wall": ws, "busy": busy[name],
               "busy_best": min(busy[name])}
        for name, ws in out.items()
    }
    print(json.dumps({"sf": sf, "cpus": cpus, "repeats": repeats,
                      "batch_sizes": batch_sizes, "results": res},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
