"""Benchmark harness (driver contract).

Runs the headline extraction workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus throughput extras}.

Headline workloads:
  extract_tpch      full pipeline over TPC-H-rendered statement turns
                    (one statement per order, one txn line per lineitem)
  extract_synthetic full pipeline over the seeded synthetic transcript
                    corpus (multi-bank, adversarial, HTML) — cached
                    parquet under .cache/bench/
  agg_metrics       lineitem Q1-style hash aggregate (Catalyst floor)
  broadcast_join    lineitem x part broadcast join + agg
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _synthetic_path(sf: float) -> str:
    n_convs = int(os.environ.get(
        "SPARK_GRAFT_BENCH_CONVS", str(max(100, int(sf * 60000)))))
    cache = os.path.join(REPO, ".cache", "bench")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{n_convs}_seed42_x32.parquet")
    if not os.path.exists(path):
        from bank_statement_pdf_parser_spark import fixtures
        rows = fixtures.gen_transcripts(n_convs=n_convs, seed=42)
        fixtures.write_transcripts_parquet(rows, path, n_files=32)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from pyspark.sql import functions as F

    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        transcripts_from_tpch)

    # Python-heavy stages consume two CPU contexts per task (JVM thread
    # + Arrow Python worker); on a fully-subscribed host, accounting for
    # that via spark.task.cpus=2 beats oversubscribing (measured: local[32]
    # task.cpus=2 == local[16] ~= 1.5x faster than local[32] task.cpus=1).
    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS",
                               "2" if cpus >= 16 else "1")
    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      **{"spark.task.cpus": task_cpus})
    spark.sparkContext.setLogLevel("ERROR")

    syn_path = _synthetic_path(sf)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # salt repartition: local bench inputs are one small parquet file /
    # one post-shuffle AQE partition, so turn-granular salting is what
    # spreads the tokenizer across all cores (SURVEY.md §4.2). records is
    # persisted because both outputs (spans, transactions) derive from it;
    # the turns source is re-scanned by the HTML branch, which is why the
    # rendered corpus is materialized to parquet first (a real deployment
    # reads a table, not a live render).
    # Tokenizer task granularity: 1 task/core on the default (small)
    # corpus — finer tasks pay Arrow/Python round-trip overhead there.
    # On the 10x-larger scaling corpus 3 tasks/core is faster at BOTH
    # levels (stragglers on skewed multi-page statements stall a whole
    # core-sized slot; finer tasks also cut busy CPU ~10%), so
    # BENCH/run_scaling.py sets SPARK_GRAFT_SALT_MULT=3.
    salt = cpus * int(os.environ.get("SPARK_GRAFT_SALT_MULT", "1"))

    tpch_input = os.path.join(REPO, ".cache", "bench",
                              f"tpch_transcripts_{sf}.parquet")
    if not os.path.exists(tpch_input):
        transcripts_from_tpch(spark, sf_dir).repartition(32).write.parquet(
            tpch_input)
    # render timing measured fresh each run (not cached): Catalyst-only.
    # One untimed slice first: the render is the suite's first query, so
    # without it the measurement absorbs whole-stage-codegen JIT warmup
    # (~3-4s once per JVM) that a long-lived job pays nowhere else.
    tp_live = transcripts_from_tpch(spark, sf_dir)
    tp_live.limit(4096).agg(F.max(F.length("text"))).collect()
    timed("render_tpch_statements",
          lambda: tp_live.agg(F.max(F.length("text"))).collect())

    def run_extraction(name, path, warmup=False):
        df = spark.read.parquet(path)
        if warmup:
            # spawn + warm all Python UDF workers (pandas/numpy imports)
            # before any timed section; a long-lived job pays this once
            extract_all(df.limit(cpus * 64),
                        salt_partitions=salt).records.count()
        out = extract_all(df, salt_partitions=salt)
        # spans is a SINGLE pass over records since round 2 (array
        # concat + one explode, no union of sibling subtrees), so the
        # two counts cost exactly two tokenizer passes. Persisting
        # records instead was measured SLOWER and less scalable here:
        # the columnar cache build of nested record structs costs more
        # CPU than one tokenizer pass (353 vs 279 busy core-s at 16
        # cores) and its memory pressure broke 4->16 scaling (0.35 eff
        # vs 0.78-0.80 without). The production sink avoids both by
        # staging records to parquet (sources/checkpoint.py).
        n = timed(name, lambda: out.transactions.count() + out.spans.count())
        return n, df.count()

    n_rows1, n_turns_tpch = run_extraction("extract_tpch", tpch_input,
                                           warmup=True)
    n_rows2, n_turns_syn = run_extraction("extract_synthetic", syn_path)
    n_txn1, n_span2 = n_rows1, n_rows2

    # operator micro floors
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    timed("agg_metrics", lambda: li.groupBy("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
               F.count("*")).collect())
    timed("broadcast_join", lambda: li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand").agg(F.sum("l_extendedprice")).collect())

    total = round(sum(timings.values()), 3)
    extract_sec = timings["extract_tpch"] + timings["extract_synthetic"]
    turns = n_turns_tpch + n_turns_syn
    extras = {
        "turns_total": turns,
        "turns_per_sec": round(turns / extract_sec, 1),
        "rows_extracted": int(n_txn1 + n_span2),
        "cpus": cpus,
    }
    print(json.dumps({
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
