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
    n_convs = max(100, int(sf * 20000))
    cache = os.path.join(REPO, ".cache", "bench")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{n_convs}_seed42.parquet")
    if not os.path.exists(path):
        from bank_statement_pdf_parser_spark import fixtures
        rows = fixtures.gen_transcripts(n_convs=n_convs, seed=42)
        fixtures.write_transcripts_parquet(rows, path)
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

    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
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
    # persisted because both outputs (spans, transactions) derive from it.
    salt = cpus * 2

    # headline 1: extraction over TPC-H-rendered statements
    tp = transcripts_from_tpch(spark, sf_dir)
    n_turns_tpch = timed("render_tpch_statements", lambda: tp.count())
    out1 = extract_all(tp, salt_partitions=salt)
    out1.records.persist()
    n_txn1 = timed("extract_tpch", lambda: out1.transactions.count()
                   + out1.spans.count())
    out1.records.unpersist()

    # headline 2: extraction over the synthetic multi-bank corpus
    syn = spark.read.parquet(syn_path)
    n_turns_syn = syn.count()
    out2 = extract_all(syn, salt_partitions=salt)
    out2.records.persist()
    n_span2 = timed("extract_synthetic",
                    lambda: out2.spans.count() + out2.transactions.count())
    out2.records.unpersist()

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
