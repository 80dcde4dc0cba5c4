"""Checkpointed, resumable extraction sink (SURVEY.md S4/S6/J3).

Design-scale target is an Iceberg table with per-snapshot atomic
commits; this sandbox has no Iceberg runtime jar, so the same semantics
are implemented behind a thin seam on Parquet:

- work is sharded by `bucket = pmod(xxhash64(conv_id), n_buckets)` —
  the Iceberg `bucket(conv_id)` hidden-partition equivalent. All turns
  of a conversation land in one bucket.
- buckets are processed in groups; each group job writes
  `records/bucket=N/`, `spans/bucket=N/` + `transactions/bucket=N/`
  via dynamic partition overwrite (idempotent on retry), then commits
  one manifest JSON per bucket (tmp+rename, atomic) carrying lineage +
  row/byte metrics.
- resume = drop buckets that already have a manifest. The worklist is
  computed with a LEFT ANTI join against the committed-bucket set
  (J3); a crashed group leaves no manifest, so its buckets are
  reprocessed and their output dirs overwritten — exactly-once output.

Cost shape per bucket group (the 100 TB hot path):

1. ONE pass over raw text: the fused tokenizer writes the staged
   `records` dataset (txn records + HTML main-span pseudo-records,
   ~1000x smaller than the corpus). Per-bucket INPUT metrics
   (rows_in/bytes_in) ride this same job via `df.observe`
   conditional aggregates — no separate metrics scan. (Only those
   two: CollectMetrics accumulators cost ~linearly in aggregates x
   rows, so the conv-id range comes from step 2's pruned staged read
   instead — see run().)
2. spans + transactions are derived from the staged records parquet —
   two cheap jobs that never touch raw text, submitted CONCURRENTLY
   (neither saturates the cluster alone; the scheduler interleaves
   their stages) alongside the tiny per-bucket conv-range aggregation
   over the staged records (conv_id_min/max in lineage = the range of
   the bucket's extracted records; NULL for a bucket with none).
3. GROUPS PIPELINE (round 6): while group g's derived jobs run on a
   single pipeline slot, group g+1's raw pass proceeds on the caller
   thread — between-phase idle time disappears at multi-group scale.
   Manifests still commit strictly after their group's writes, in
   group order; a crash lets in-flight derived work finish (its
   manifests are legitimate) and reprocesses only unstaged groups.
3. Per-bucket OUTPUT counts come from the parquet FOOTERS of the
   files each write just committed — metadata-only (no data pages
   read, no read-back job, never a re-run of the extraction DAG),
   and the literal Iceberg mapping: snapshot manifests carry the
   same per-file row counts. (Round 6: replaced a per-bucket
   conditional-count Observation whose accumulators cost
   ~(buckets x output rows) on the hot write.)

Tests assert (via a tokenizer-call accumulator) that the extraction
kernel sees each turn exactly once per run.

On Iceberg the seam maps to `df.writeTo(tbl).overwritePartitions()`
plus a lineage-table append per snapshot; only this module changes.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..plans.extract import build_records, build_spans, build_transactions
from ..session import ensure_shipped
from .transcripts import with_resolved_payload

BUCKET = "bucket"

LINEAGE_DDL = (
    "run_id string, partition_id int, conv_id_min string, "
    "conv_id_max string, rows_in long, bytes_in long, rows_out long, "
    "n_spans long, n_txns long, state_rows long, state_bytes long, "
    "status string, ts double"
)
# field names derived once; lineage() must not pay a JVM round-trip
# (empty createDataFrame) per call just to enumerate them
LINEAGE_FIELDS = tuple(f.strip().split()[0]
                       for f in LINEAGE_DDL.split(","))
# conv_id_min/max semantics (round 6, both engines): the conv-id range
# of the partition's EXTRACTED OUTPUT (batch sink: staged records;
# streaming: the batch's committed spans), NULL when the partition
# produced nothing. rows_in/bytes_in remain INPUT-level.
# state_rows/state_bytes: streaming state-store footprint after the
# micro-batch (sum over stateOperators: dedup + assembler state),
# amended onto the manifest by the progress listener
# (streaming/batch_stream.attach_state_metrics). NULL for batch-sink
# manifests (no state store) and for batches whose progress event was
# lost to a crash — the metrics are observability, not lineage truth.


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET, F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


class ManifestStore:
    """Atomic per-partition lineage commits (tmp+rename), shared by the
    batch sink (partition = conv_id bucket) and the streaming sink
    (partition = micro-batch id) so stream resume and batch resume
    read/write the SAME artifact with the SAME schema (LINEAGE_DDL).
    Re-committing a partition (a replayed micro-batch, a re-run
    bucket) atomically replaces its manifest — idempotent, never
    duplicated. On Iceberg this maps to a lineage-table append per
    snapshot commit."""

    def __init__(self, manifest_dir: str, prefix: str = "bucket"):
        import threading
        self.manifest_dir = manifest_dir
        self.prefix = prefix
        # amend() is a read-modify-write; the listener-bus thread and
        # attach_state_metrics' recentProgress replay can both amend
        # the same partition, so serialize amendments
        self._amend_lock = threading.Lock()
        os.makedirs(manifest_dir, exist_ok=True)

    def committed(self) -> set[int]:
        out = set()
        head = f"{self.prefix}-"
        for f in os.listdir(self.manifest_dir):
            if f.startswith(head) and f.endswith(".json"):
                out.add(int(f[len(head):-len(".json")]))
        return out

    def commit(self, partition_id: int, metrics: dict) -> None:
        import threading
        import uuid
        path = os.path.join(self.manifest_dir,
                            f"{self.prefix}-{partition_id}.json")
        # tmp name unique per (pid, thread, call): the listener-bus
        # thread and a replay loop may write the same partition's
        # manifest concurrently — a shared tmp path interleaves writes
        # or loses a rename (review r6)
        tmp = (f"{path}.tmp.{os.getpid()}."
               f"{threading.get_ident()}.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(metrics, fh)
        os.rename(tmp, path)  # atomic commit

    def amend(self, partition_id: int, extra: dict) -> bool:
        """Merge `extra` fields into an ALREADY-COMMITTED manifest
        (atomic replace, serialized under a lock — read-modify-write).
        Used by the streaming progress listener to attach state-store
        metrics after the batch's own commit; a no-op (False) when the
        partition has no manifest — amendments never create lineage
        rows."""
        path = os.path.join(self.manifest_dir,
                            f"{self.prefix}-{partition_id}.json")
        with self._amend_lock:
            if not os.path.exists(path):
                return False
            with open(path) as fh:
                data = json.load(fh)
            data.update(extra)
            self.commit(partition_id, data)
        return True


    def snapshot_cursor(self) -> dict:
        """Consumer-side incremental-read cursor: partition-id ->
        sha256 of the committed manifest bytes. A re-committed
        partition (replayed micro-batch, recomputed bucket) atomically
        replaces its manifest, so its fingerprint changes and an
        incremental reader picks the partition up again — the
        Iceberg-incremental-scan semantic, derived purely from the
        lineage artifacts (no writer-side sequence numbers, no clock).
        Keys are strings so cursors round-trip through JSON."""
        import hashlib
        out = {}
        head = f"{self.prefix}-"
        for f in os.listdir(self.manifest_dir):
            if f.startswith(head) and f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f), "rb") as fh:
                    dig = hashlib.sha256(fh.read()).hexdigest()
                out[f[len(head):-len(".json")]] = dig
        return out

    def changed_since(self, cursor: dict | None) -> set[int]:
        """Partition ids whose manifest is new or re-committed
        relative to `cursor` (None = everything committed)."""
        now = self.snapshot_cursor()
        if cursor is None:
            return {int(p) for p in now}
        return {int(p) for p, dig in now.items() if cursor.get(p) != dig}

    def lineage(self, spark: SparkSession) -> DataFrame:
        fields = LINEAGE_FIELDS
        rows = []
        for b in sorted(self.committed()):
            path = os.path.join(self.manifest_dir,
                                f"{self.prefix}-{b}.json")
            with open(path) as fh:
                m = json.load(fh)
            # manifests written before an amendment (or by the batch
            # sink, which has no state store) lack the state fields —
            # normalize to NULLs (tuples in schema order) so one
            # schema serves every writer
            rows.append(tuple(m.get(f) for f in fields))
        return spark.createDataFrame(rows, LINEAGE_DDL)


def _obs_result(observation, fallback):
    """Observation.get, robust to the AQE empty-relation caveat (see
    ann.py): when a downstream exchange materializes EMPTY, adaptive
    re-planning prunes the subtree including the CollectMetrics node,
    and .get raises even though the stage ran. Only possible when the
    observed job produced no rows at all, so `fallback()` recomputes
    (or zero-fills) for that rare case.

    The pruning surfaces as a Py4J/JVM error from `getRow()` whose
    exact class isn't stable across Spark minors, so the except stays
    broad — but every fallback is LOGGED with the triggering error:
    a fallback on a non-empty group means an unplanned extra input
    scan (and possibly masked metrics), which must be visible."""
    try:
        return observation.get
    except Exception as e:  # noqa: BLE001 — see docstring
        import warnings
        warnings.warn(
            "Observation metrics unavailable "
            f"({type(e).__name__}: {e}); recomputing via fallback — "
            "expected only for an all-empty observed job (AQE "
            "empty-relation pruning)", RuntimeWarning, stacklevel=2)
        return fallback()


@dataclass
class RunResult:
    run_id: str
    buckets_done: list[int]
    buckets_skipped: list[int]
    metrics: list[dict]


class CheckpointedExtract:
    def __init__(self, output_dir: str, run_id: str, n_buckets: int = 16,
                 buckets_per_job: int = 4, mode: str = "fused",
                 stage_codec: str = "lz4"):
        self.output_dir = output_dir
        self.run_id = run_id
        self.n_buckets = n_buckets
        self.buckets_per_job = buckets_per_job
        self.mode = mode
        # staged records are transient intra-run data (written once,
        # read once by the derived jobs). lz4 default from the round-4
        # measurement (~10% faster round-trip than snappy); a round-6
        # interleaved A/B at sf0.1 read lz4/zstd/snappy/uncompressed
        # within host noise of each other, so the knob exists for
        # other storage tiers, not because the sandbox cares. Durable
        # spans/transactions outputs keep snappy.
        self.stage_codec = stage_codec
        self.manifest_dir = os.path.join(output_dir, "_manifest")
        self.store = ManifestStore(self.manifest_dir, prefix="bucket")

    # -- manifest helpers ---------------------------------------------------
    def committed_buckets(self) -> set[int]:
        return self.store.committed()

    def _commit(self, bucket: int, metrics: dict) -> None:
        self.store.commit(bucket, metrics)

    # -- the job ------------------------------------------------------------
    def run(self, transcripts: DataFrame,
            fail_after_groups: int | None = None,
            probe=None) -> RunResult:
        """Process all un-committed buckets. `fail_after_groups` simulates a
        crash for resume tests; `probe` is an optional accumulator the
        tokenizer kernel bumps once per input turn row."""
        spark = transcripts.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        ensure_shipped(spark)

        records_dir = os.path.join(self.output_dir, "records")
        spans_dir = os.path.join(self.output_dir, "spans")
        txns_dir = os.path.join(self.output_dir, "transactions")

        done = self.committed_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        # On a RESUMED run, a crashed group may have left stale
        # uncommitted bucket partitions in records_dir. Remove them
        # BEFORE the pipelined loop starts: otherwise stage(g+1)'s
        # dynamic-overwrite commit deletes them while derive(g)'s
        # concurrent reads may be listing the same root, and a file
        # vanishing mid-listing fails the run with
        # FileNotFoundException (ADVICE r6 — loud but flaky). The
        # same partitions would be overwritten anyway; this just moves
        # the delete ahead of any concurrent reader.
        import shutil
        for b in todo:
            stale = os.path.join(records_dir, f"{BUCKET}={b}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        src = with_bucket(transcripts, self.n_buckets)

        # J3: restrict to the un-committed worklist via LEFT ANTI join
        if done:
            done_df = spark.createDataFrame(
                [(b,) for b in sorted(done)], f"{BUCKET} int")
            src = src.join(F.broadcast(done_df), BUCKET, "left_anti")

        metrics_all: list[dict] = []
        groups = [todo[i:i + self.buckets_per_job]
                  for i in range(0, len(todo), self.buckets_per_job)]
        # group PIPELINING (round 6): group g's derived jobs (staged
        # read -> spans/txns/conv-range -> manifest commits) run on a
        # single-slot executor while group g+1's raw-text stage job
        # runs on the caller thread — the cluster never idles between
        # a group's raw pass and its derived writes. Safe overlap:
        # derive(g) reads only its own bucket partitions (pruned away
        # from stage(g+1)'s in-flight writes; _temporary is ignored by
        # the file index), and manifests still commit strictly after
        # their group's writes, in group order (one in-flight derive).
        from concurrent.futures import ThreadPoolExecutor
        pipeline = ThreadPoolExecutor(max_workers=1)
        pending = None

        def _await_pending():
            nonlocal pending
            if pending is not None:
                metrics_all.extend(pending.result())
                pending = None

        for gi, group in enumerate(groups):
            if fail_after_groups is not None and gi >= fail_after_groups:
                # crash simulation: let in-flight derived work finish
                # (its group's manifests are legitimately committed),
                # then die before touching this group
                try:
                    _await_pending()
                finally:
                    pipeline.shutdown(wait=True)
                raise RuntimeError("simulated crash for resume test")
            gsrc = src.filter(F.col(BUCKET).isin(group))

            # S6: per-bucket input metrics observed ON the extraction job
            # (conditional aggregates per bucket — no extra input scan).
            # Only rows_in/bytes_in ride the observation: CollectMetrics
            # accumulators cost ~linearly in (aggregates x rows)
            # regardless of expression complexity (measured round 6:
            # even 128 sum(lit(0)) aggs added ~0.5 s on this corpus),
            # so the conv-id range moved OFF this job — it is computed
            # from the staged records by a concurrent pruned-column
            # job below, where it is practically free.
            obs = Observation()
            aggs = []
            for b in group:
                c = F.col(BUCKET) == b
                aggs += [
                    F.count(F.when(c, True)).alias(f"rows_in_{b}"),
                    F.sum(F.when(c, F.length("text"))).alias(f"bytes_in_{b}"),
                ]
            gobs = gsrc.observe(obs, *aggs)

            # writes REPARTITION BY BUCKET first: without it every task
            # writes a file into every bucket partition (tasks x buckets
            # small files) and the per-file commit protocol dominates
            # the job (measured 3.5x slower at 32 buckets); repartition
            # costs one exchange of *records*-sized data, the accepted
            # shape (raw text still never shuffles)
            def write_bucketed(out_df, path):
                (with_bucket(out_df, self.n_buckets)
                 .repartition(self.n_buckets, BUCKET)
                 .write.mode("overwrite").partitionBy(BUCKET)
                 .option("compression", self.stage_codec)
                 .parquet(path))

            # 1) the ONLY raw-text pass: stage extracted records
            # (synchronous on this thread; overlaps the PREVIOUS
            # group's derived jobs running on the pipeline slot)
            turns = with_resolved_payload(gobs.drop(BUCKET))
            records = build_records(turns, mode=self.mode, probe=probe)
            write_bucketed(records, records_dir)
            # empty group (zero extractable records): one extra input
            # scan re-derives the true input metrics
            m_in = _obs_result(
                obs, lambda: gsrc.agg(*aggs).first().asDict())

            _await_pending()
            pending = pipeline.submit(
                self._derive_and_commit, spark, group, m_in, gsrc,
                records_dir, spans_dir, txns_dir)
        try:
            _await_pending()
        finally:
            pipeline.shutdown(wait=True)
        return RunResult(self.run_id, [b for g in groups for b in g],
                         sorted(done), metrics_all)

    def _derive_and_commit(self, spark, group, m_in, gsrc,
                           records_dir, spans_dir, txns_dir) -> list[dict]:
        """Phase 2 of one bucket group: spans + transactions derived
        from the staged records (no raw text), conv-range aggregation,
        per-bucket manifest commits. Runs on the pipeline slot so the
        next group's raw pass can proceed concurrently.

        Explicit schema on the staged read: skips inference listing,
        and an all-empty group writes no files to infer from.

        Fused path: ONE repartition(n, bucket) on the staged records
        is the ONLY exchange per derived output — the bucket column
        joins the span/txn index windows' partitionBy (bucket is a
        function of conv_id, so the numbering is unchanged), which
        makes hash(bucket) satisfy the window's clustering
        requirement, and the same clustering makes the
        partitionBy(bucket) write emit ~1 file per bucket with no
        second repartition."""
        from ..operators.tokenize import RECORDS_DDL
        os.makedirs(records_dir, exist_ok=True)
        staged = (spark.read
                  .schema(f"{RECORDS_DDL}, {BUCKET} int")
                  .parquet(records_dir)
                  .filter(F.col(BUCKET).isin(group)))
        if self.mode == "fused":
            staged = staged.repartition(self.n_buckets, BUCKET)
            spans = build_spans(None, staged,
                                records_include_html=True,
                                window_prefix=(BUCKET,))
            txns = build_transactions(staged,
                                      window_prefix=(BUCKET,))
        else:
            # relational records exclude HTML; the D5 pandas-UDF
            # branch re-reads the HTML turns (cross-check mode
            # only, not the hot path — keeps the two-exchange
            # shape because spans also derive from raw turns)
            staged = staged.drop(BUCKET)
            turns2 = with_resolved_payload(gsrc.drop(BUCKET))
            spans = build_spans(turns2, staged)
            txns = build_transactions(staged)

        # the two derived jobs share the staged input and neither
        # saturates the cluster alone — submit them CONCURRENTLY
        # (Spark's scheduler interleaves their stages). Per-bucket
        # OUTPUT counts come from the parquet FOOTERS of the files
        # this write just committed: metadata-only (no data pages
        # read, no read-back job), exactly what is durably on disk,
        # and the literal Iceberg mapping (snapshot manifests carry
        # per-file row counts). Replaces the former per-bucket
        # conditional-count Observation, whose CollectMetrics
        # accumulators cost ~(buckets x output rows) on the hot write
        # (measured ~10% of the derived-phase wall at 32 buckets —
        # same accumulator cost class as the round-6 input-metrics
        # trim, CLAUDE.md).
        def observed_write(out_df, path):
            if BUCKET in out_df.columns:
                # fused path: already carries bucket AND is hash-
                # partitioned on it upstream — no exchange here
                bucketed = out_df
            else:
                bucketed = (with_bucket(out_df, self.n_buckets)
                            .repartition(self.n_buckets, BUCKET))
            (bucketed
             .write.mode("overwrite").partitionBy(BUCKET)
             .parquet(path))
            # dynamic partition overwrite just replaced each of this
            # group's bucket partitions wholesale, and only ONE
            # derive runs at a time (single pipeline slot), so the
            # .parquet files under bucket=N are exactly this job's
            # committed output for every N in `group`
            import pyarrow.parquet as pq
            counts = {}
            for b in group:
                bdir = os.path.join(path, f"{BUCKET}={b}")
                n = 0
                if os.path.isdir(bdir):
                    for f in os.listdir(bdir):
                        if f.endswith(".parquet"):
                            n += pq.ParquetFile(
                                os.path.join(bdir, f)).metadata.num_rows
                counts[str(b)] = n
            return counts

        # conv-id range per bucket, from the parquet FOOTERS of the
        # staged records this group just committed (round 7, VERDICT
        # r6 task #4): row-group column statistics carry exact string
        # min/max on this writer (verified untruncated at >100 chars),
        # so the range costs zero Spark jobs — the same metadata-only
        # class as the output row counts, and the Iceberg mapping
        # (manifest files carry per-column lower/upper bounds).
        # Guard: parquet writers MAY truncate long binary stats; if a
        # bound reaches the conservative length cap, or any footer
        # lacks conv_id stats on a file with rows, fall back to the
        # former pruned-column aggregation job. Lineage semantics
        # unchanged: the range of the bucket's EXTRACTED records,
        # NULL when a bucket produced none.
        def conv_range_spark():
            rows = (spark.read
                    .schema(f"{RECORDS_DDL}, {BUCKET} int")
                    .parquet(records_dir)
                    .filter(F.col(BUCKET).isin(group))
                    .groupBy(BUCKET)
                    .agg(F.min("conv_id").alias("cmin"),
                         F.max("conv_id").alias("cmax"))
                    .collect())
            return {r[BUCKET]: (r["cmin"], r["cmax"]) for r in rows}

        def conv_range():
            import pyarrow.parquet as pq
            out: dict[int, tuple] = {}
            for b in group:
                bdir = os.path.join(records_dir, f"{BUCKET}={b}")
                cmin = cmax = None
                if os.path.isdir(bdir):
                    for f in os.listdir(bdir):
                        if not f.endswith(".parquet"):
                            continue
                        md = pq.ParquetFile(
                            os.path.join(bdir, f)).metadata
                        ci = {md.schema.column(i).name: i
                              for i in range(md.num_columns)}
                        for rg in range(md.num_row_groups):
                            col = md.row_group(rg).column(
                                ci["conv_id"])
                            if col.num_values == 0:
                                continue
                            st = col.statistics
                            if (st is None or not st.has_min_max
                                    or len(st.min) >= 64
                                    or len(st.max) >= 64):
                                return conv_range_spark()
                            cmin = (st.min if cmin is None
                                    else min(cmin, st.min))
                            cmax = (st.max if cmax is None
                                    else max(cmax, st.max))
                if cmin is not None:
                    out[b] = (cmin, cmax)
            return out

        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_sp = pool.submit(observed_write, spans, spans_dir)
            f_tx = pool.submit(observed_write, txns, txns_dir)
            f_rng = pool.submit(conv_range)
            m_spans, m_txns = f_sp.result(), f_tx.result()
            ranges = f_rng.result()
        out_counts = {b: (m_spans[str(b)] or 0, m_txns[str(b)] or 0)
                      for b in group}

        out = []
        for b in group:
            n_spans, n_txns = out_counts.get(b, (0, 0))
            cmin, cmax = ranges.get(b, (None, None))
            m = {
                "run_id": self.run_id, "partition_id": b,
                "conv_id_min": cmin,
                "conv_id_max": cmax,
                "rows_in": int(m_in[f"rows_in_{b}"] or 0),
                "bytes_in": int(m_in[f"bytes_in_{b}"] or 0),
                "rows_out": int(n_spans + n_txns),
                "n_spans": int(n_spans), "n_txns": int(n_txns),
                "status": "committed", "ts": time.time(),
            }
            self._commit(b, m)
            out.append(m)
        return out

    # -- maintenance --------------------------------------------------------
    def compact(self, spark: SparkSession, dataset: str = "transactions",
                target_bytes: int = 128 << 20) -> dict[int, tuple[int, int]]:
        """Small-file maintenance — the Iceberg `rewrite_data_files`
        action expressed on the parquet seam. Long-running ingest
        (streaming micro-batches, many bucket groups, retries) accretes
        small files; this rewrites each bucket partition into
        ceil(partition_bytes / target_bytes) files sized for scan
        efficiency.

        The per-bucket file counts come from the ACTUAL on-disk sizes;
        the rewrite is one job (repartition on (bucket, slice) where
        slice = xxhash64 pmod the bucket's file budget) into a staging
        directory, then a directory swap. The swap is the non-atomic
        seam (two renames); on Iceberg the same action is a snapshot
        commit. Crash recovery on entry, ordered so committed data is
        NEVER deleted:

        - `data_dir` present: any leftover `.compacting` (crash during
          the staging write) or `.old` (crash after the second rename,
          before cleanup) is stale — remove it.
        - `data_dir` MISSING (crash in the window between the two
          renames): the committed copy lives at `.old` — rename it
          back. Only when there is no `.old` is a COMPLETE
          `.compacting` promoted (the first rename can only have run
          after the staging write finished, so if `.old` is also gone
          the staging copy is the surviving full dataset).

        Returns {bucket: (files_before, files_after)} — {} for an
        empty/absent dataset (no-op, e.g. --compact-mb after a run
        that extracted nothing)."""
        data_dir = os.path.join(self.output_dir, dataset)
        staging, old = data_dir + ".compacting", data_dir + ".old"
        import shutil
        if not os.path.exists(data_dir):
            if os.path.exists(old):
                os.rename(old, data_dir)       # restore committed copy
            elif os.path.exists(staging):
                os.rename(staging, data_dir)   # complete pre-swap copy
        if not os.path.exists(data_dir):
            return {}
        for leftover in (staging, old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)

        sizes: dict[int, int] = {}
        files_before: dict[int, int] = {}
        for name in os.listdir(data_dir):
            if not name.startswith(f"{BUCKET}="):
                continue
            b = int(name.split("=")[1])
            bdir = os.path.join(data_dir, name)
            parts = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
            files_before[b] = len(parts)
            sizes[b] = sum(os.path.getsize(os.path.join(bdir, f))
                           for f in parts)
        if not files_before:
            return {}
        budget = {b: max(1, -(-sz // target_bytes))
                  for b, sz in sizes.items()}

        df = spark.read.parquet(data_dir)
        slice_map = F.create_map(
            *[x for b, n in budget.items()
              for x in (F.lit(b), F.lit(n))])
        slice_col = F.pmod(F.xxhash64(*[c for c in df.columns
                                        if c != BUCKET]),
                           slice_map[F.col(BUCKET)])
        (df.withColumn("_slice", slice_col)
         .repartition(sum(budget.values()), BUCKET, "_slice")
         .drop("_slice")
         .write.partitionBy(BUCKET).parquet(staging))
        os.rename(data_dir, old)
        os.rename(staging, data_dir)
        shutil.rmtree(old)

        files_after = {}
        for b in files_before:
            bdir = os.path.join(data_dir, f"{BUCKET}={b}")
            files_after[b] = len([f for f in os.listdir(bdir)
                                  if f.endswith(".parquet")])
        return {b: (files_before[b], files_after[b]) for b in files_before}


    def read_incremental(self, spark: SparkSession, cursor: dict | None,
                         dataset: str = "transactions"):
        """Incremental consumption of a derived output: rows of every
        bucket committed (or re-committed) since `cursor`, plus the new
        cursor to persist for the next poll. The bucket filter lands on
        the partitionBy=bucket directory layout, so Spark prunes the
        untouched partitions at planning time — a downstream job pays
        I/O proportional to the CHANGE, not the table (on Iceberg this
        maps to an incremental append scan between snapshot ids).

        Usage: df, cur = sink.read_incremental(spark, None) for the
        initial full read; persist `cur` (JSON-safe) and pass it back
        to receive only re/newly-committed buckets.

        Delivery semantics: the cursor snapshot is taken BEFORE the
        scan plans, so a bucket re-committed concurrently with the
        read may appear in this batch AND again at the next poll —
        at-least-once, never lost; consumers idempotent on (bucket,
        manifest fingerprint) see each state exactly once."""
        new_cursor = self.store.snapshot_cursor()
        changed = sorted(self.store.changed_since(cursor))
        df = spark.read.parquet(os.path.join(self.output_dir, dataset))
        if cursor is None:
            return df, new_cursor
        return df.filter(F.col(BUCKET).isin(
            [int(b) for b in changed])), new_cursor

    # -- outputs ------------------------------------------------------------
    def spans(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.output_dir, "spans"))

    def transactions(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.output_dir, "transactions"))

    def lineage(self, spark: SparkSession) -> DataFrame:
        return self.store.lineage(spark)
