"""Capture .explain('formatted') for every headline bench query into
plans/r07/<query>_{before,after}.txt (round-7 optimization evidence).

Usage: python tools/dump_r07_plans.py before|after [sf_dir]
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        transcripts_from_tpch)

    # mirror bench.py's session settings so plans match the measured runs
    spark = get_spark(app="plans-r07", master="local[4]",
                      shuffle_partitions=32,
                      **{"spark.task.cpus": "1",
                         "spark.sql.files.maxPartitionBytes": "4m"})
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    tpch_input = os.path.join(REPO, ".cache", "bench",
                              f"tpch_transcripts_{sf}_x16.parquet")
    tp_live = transcripts_from_tpch(spark, sf_dir)
    tpch_df = spark.read.parquet(tpch_input)
    out = extract_all(tpch_df)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    plans = {
        "render_tpch_statements":
            tp_live.agg(F.max(F.length("text"))),
        "extract_transactions": out.transactions,
        "extract_spans": out.spans,
        # what the bench thunks actually execute (counts prune columns)
        "extract_transactions_count":
            out.transactions.groupBy().count(),
        "extract_spans_count": out.spans.groupBy().count(),
        "agg_metrics":
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
                 F.count("*")),
        "broadcast_join":
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand").agg(F.sum("l_extendedprice")),
    }
    for name, df in plans.items():
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
