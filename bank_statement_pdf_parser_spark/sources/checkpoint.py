"""Checkpointed, resumable extraction sink (SURVEY.md S4/S6/J3).

Design-scale target is an Iceberg table with per-snapshot atomic
commits; this sandbox has no Iceberg runtime jar, so the same semantics
are implemented behind a thin seam on Parquet:

- work is sharded by `bucket = pmod(xxhash64(conv_id), n_buckets)` —
  the Iceberg `bucket(conv_id)` hidden-partition equivalent. All turns
  of a conversation land in one bucket.
- buckets are processed in groups; each group job writes
  `spans/bucket=N/` + `transactions/bucket=N/` via dynamic partition
  overwrite (idempotent on retry), then commits one manifest JSON per
  bucket (tmp+rename, atomic) carrying lineage + row/byte metrics.
- resume = drop buckets that already have a manifest. The worklist is
  computed with a LEFT ANTI join against the committed-bucket set
  (J3); a crashed group leaves no manifest, so its buckets are
  reprocessed and their output dirs overwritten — exactly-once output.

On Iceberg the seam maps to `df.writeTo(tbl).overwritePartitions()`
plus a lineage-table append per snapshot; only this module changes.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.extract import extract_all

BUCKET = "bucket"


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET, F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


@dataclass
class RunResult:
    run_id: str
    buckets_done: list[int]
    buckets_skipped: list[int]
    metrics: list[dict]


class CheckpointedExtract:
    def __init__(self, output_dir: str, run_id: str, n_buckets: int = 16,
                 buckets_per_job: int = 4, mode: str = "fused"):
        self.output_dir = output_dir
        self.run_id = run_id
        self.n_buckets = n_buckets
        self.buckets_per_job = buckets_per_job
        self.mode = mode
        self.manifest_dir = os.path.join(output_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def committed_buckets(self) -> set[int]:
        out = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("bucket-") and f.endswith(".json"):
                out.add(int(f[len("bucket-"):-len(".json")]))
        return out

    def _commit(self, bucket: int, metrics: dict) -> None:
        path = os.path.join(self.manifest_dir, f"bucket-{bucket}.json")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(metrics, fh)
        os.rename(tmp, path)  # atomic commit

    # -- the job ------------------------------------------------------------
    def run(self, transcripts: DataFrame,
            fail_after_groups: int | None = None) -> RunResult:
        """Process all un-committed buckets. `fail_after_groups` simulates a
        crash for resume tests."""
        spark = transcripts.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        done = self.committed_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        src = with_bucket(transcripts, self.n_buckets)

        # J3: restrict to the un-committed worklist via LEFT ANTI join
        if done:
            done_df = spark.createDataFrame(
                [(b,) for b in sorted(done)], f"{BUCKET} int")
            src = src.join(F.broadcast(done_df), BUCKET, "left_anti")

        metrics_all: list[dict] = []
        groups = [todo[i:i + self.buckets_per_job]
                  for i in range(0, len(todo), self.buckets_per_job)]
        for gi, group in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                raise RuntimeError("simulated crash for resume test")
            gsrc = src.filter(F.col(BUCKET).isin(group))

            # S6: per-bucket input metrics in one agg
            in_rows = {r[BUCKET]: r for r in gsrc.groupBy(BUCKET).agg(
                F.count("*").alias("rows_in"),
                F.sum(F.length("text")).alias("bytes_in"),
                F.min("conv_id").alias("conv_id_min"),
                F.max("conv_id").alias("conv_id_max")).collect()}

            out = extract_all(gsrc.drop(BUCKET), mode=self.mode)
            spans = with_bucket(out.spans, self.n_buckets)
            txns = with_bucket(out.transactions, self.n_buckets)
            spans.write.mode("overwrite").partitionBy(BUCKET).parquet(
                os.path.join(self.output_dir, "spans"))
            txns.write.mode("overwrite").partitionBy(BUCKET).parquet(
                os.path.join(self.output_dir, "transactions"))

            out_counts = {
                r[BUCKET]: (r["n_spans"], r["n_txns"]) for r in
                spans.groupBy(BUCKET).agg(F.count("*").alias("n_spans"))
                .join(txns.groupBy(BUCKET).agg(F.count("*").alias("n_txns")),
                      BUCKET, "outer").fillna(0).collect()}

            for b in group:
                r = in_rows.get(b)
                n_spans, n_txns = out_counts.get(b, (0, 0))
                m = {
                    "run_id": self.run_id, "partition_id": b,
                    "conv_id_min": r["conv_id_min"] if r else None,
                    "conv_id_max": r["conv_id_max"] if r else None,
                    "rows_in": int(r["rows_in"]) if r else 0,
                    "bytes_in": int(r["bytes_in"] or 0) if r else 0,
                    "rows_out": int(n_spans + n_txns),
                    "n_spans": int(n_spans), "n_txns": int(n_txns),
                    "status": "committed", "ts": time.time(),
                }
                self._commit(b, m)
                metrics_all.append(m)
        return RunResult(self.run_id, [b for g in groups for b in g],
                         sorted(done), metrics_all)

    # -- outputs ------------------------------------------------------------
    def spans(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.output_dir, "spans"))

    def transactions(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.output_dir, "transactions"))

    def lineage(self, spark: SparkSession) -> DataFrame:
        rows = []
        for b in sorted(self.committed_buckets()):
            with open(os.path.join(self.manifest_dir, f"bucket-{b}.json")) as fh:
                rows.append(json.load(fh))
        return spark.createDataFrame(
            rows,
            "run_id string, partition_id int, conv_id_min string, "
            "conv_id_max string, rows_in long, bytes_in long, rows_out long, "
            "n_spans long, n_txns long, status string, ts double")
