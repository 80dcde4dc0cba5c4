"""spark-submit entry point for the checkpointed extraction job.

    spark-submit --py-files <engine.zip> run_extract.py \
        --input /path/transcripts.parquet --output /path/out --run-id r1

Re-running the same command resumes: committed buckets are skipped via
the manifest + anti-join worklist (see sources/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run-1")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--buckets-per-job", type=int, default=4)
    ap.add_argument("--mode", default="fused", choices=["fused", "relational"])
    ap.add_argument("--master", default=None)
    ap.add_argument("--compact-mb", type=int, default=None,
                    help="after the run, rewrite spans/transactions "
                         "bucket partitions into files of ~this many "
                         "MiB (small-file maintenance)")
    args = ap.parse_args()

    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.sources.checkpoint import (
        CheckpointedExtract)
    from bank_statement_pdf_parser_spark.sources.transcripts import (
        load_transcripts)

    spark = get_spark(app=f"extract-{args.run_id}", master=args.master)
    ck = CheckpointedExtract(args.output, args.run_id, args.buckets,
                             args.buckets_per_job, mode=args.mode)
    res = ck.run(load_transcripts(spark, args.input))
    compacted = {}
    if args.compact_mb:
        for ds in ("spans", "transactions"):
            rep = ck.compact(spark, ds, args.compact_mb << 20)
            compacted[ds] = {
                "files_before": sum(n for n, _ in rep.values()),
                "files_after": sum(n for _, n in rep.values())}
    print(json.dumps({
        "run_id": res.run_id,
        "buckets_done": res.buckets_done,
        "buckets_skipped_resume": res.buckets_skipped,
        "rows_out": sum(m["rows_out"] for m in res.metrics),
        **({"compacted": compacted} if compacted else {}),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
