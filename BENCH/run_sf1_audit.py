"""sf1 memory/spill audit (round 7, VERDICT r6 task #5).

One controlled extraction + sink run at SPARK_GRAFT_SF_DIR (default
/root/testdata/sf1.0, ~2.2M turns with the synthetic corpus), with the
UI REST API enabled so per-stage spill/peak-memory metrics are
scrapeable without the web UI, plus /proc-sampled peak RSS of the JVM
and every pyspark worker. Writes BENCH/SF1_AUDIT.md.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_sampler(stop, out):
    """Peak RSS (bytes) of this process tree: driver JVM + python
    workers (they are children of the JVM / daemon)."""
    import glob
    me = os.getpid()

    def tree_rss():
        total = 0
        per_kind = {"java": 0, "python": 0, "other": 0}
        for sdir in glob.glob("/proc/[0-9]*"):
            try:
                with open(sdir + "/stat") as fh:
                    f = fh.read().split()
                comm = f[1]
                rss = int(f[23]) * 4096
            except Exception:
                continue
            if rss <= 0:
                continue
            if "java" in comm:
                per_kind["java"] += rss
            elif "python" in comm:
                per_kind["python"] += rss
            else:
                continue
            total += rss
        return total, per_kind

    while not stop.is_set():
        t, k = tree_rss()
        if t > out.get("peak_total", 0):
            out["peak_total"] = t
            out["peak_breakdown"] = k
        stop.wait(0.5)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.sources.checkpoint import (
        CheckpointedExtract)

    spark = get_spark(app="sf1-audit", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      **{"spark.task.cpus": "2" if cpus >= 16 else "1",
                         "spark.sql.files.maxPartitionBytes": "4m",
                         "spark.ui.enabled": "true",
                         "spark.ui.port": "4049"})
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    syn = os.path.join(REPO, ".cache", "bench",
                       f"transcripts_n{max(100, int(sf*60000))}"
                       "_seed42_x16.parquet")
    tpch = os.path.join(REPO, ".cache", "bench",
                        f"tpch_transcripts_{sf}_x16.parquet")
    dfs = [spark.read.parquet(p) for p in (tpch, syn) if os.path.exists(p)]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)

    stop = threading.Event()
    rss: dict = {}
    t = threading.Thread(target=_rss_sampler, args=(stop, rss),
                         daemon=True)
    t.start()

    extract_all(df.limit(cpus * 64)).records.count()  # warm

    t0 = time.perf_counter()
    out = extract_all(df)
    n = out.transactions.count() + out.spans.count()
    extract_wall = time.perf_counter() - t0

    import tempfile
    sink_dir = tempfile.mkdtemp(prefix="sf1audit-")
    ck = CheckpointedExtract(sink_dir, "audit", n_buckets=32,
                             buckets_per_job=32)
    t0 = time.perf_counter()
    res = ck.run(df)
    sink_wall = time.perf_counter() - t0
    rows_out = sum(m["rows_out"] for m in res.metrics)

    stop.set()
    t.join(2)

    # stage metrics from the REST API
    base = "http://localhost:4049/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=complete"))
    tot_spill_mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    tot_spill_disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    shuffle_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    top = sorted(stages, key=lambda s: -(s.get("executorRunTime", 0)))[:6]
    top_lines = "\n".join(
        f"| {s['stageId']} | {s.get('name','')[:48]} | "
        f"{s.get('executorRunTime',0)/1000:.1f} | "
        f"{s.get('shuffleWriteBytes',0)/2**20:.0f} | "
        f"{s.get('memoryBytesSpilled',0)/2**20:.0f} | "
        f"{s.get('diskBytesSpilled',0)/2**20:.0f} |"
        for s in top)

    gb = 2**30
    md = f"""# BENCH/SF1_AUDIT — memory / spill at sf{sf} (round 7)

Corpus: tpch + synthetic bench corpora ({df.count():,} turns),
local[{cpus}], task.cpus=2, Arrow batch 1024 rows. Workload: the two
bench extraction counts ({n:,} rows) then a full 32-bucket sink run
({rows_out:,} rows written). Metrics from the Spark REST API
(per-stage) + a 2 Hz /proc RSS sampler over the whole process tree.

| measurement | value |
|---|---|
| extraction (2 counts) wall | {extract_wall:.1f} s |
| sink run wall | {sink_wall:.1f} s |
| peak RSS, process tree | {rss.get('peak_total',0)/gb:.2f} GiB |
| ... of which JVM | {rss.get('peak_breakdown',{}).get('java',0)/gb:.2f} GiB |
| ... of which python workers | {rss.get('peak_breakdown',{}).get('python',0)/gb:.2f} GiB |
| total shuffle write, all stages | {shuffle_w/2**20:.0f} MiB |
| total memory spilled | {tot_spill_mem/2**20:.0f} MiB |
| total disk spilled | {tot_spill_disk/2**20:.0f} MiB |

Heaviest stages (executor run time):

| stage | name | run s | shuffleW MiB | memSpill MiB | diskSpill MiB |
|---|---|---|---|---|---|
{top_lines}

Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} by
BENCH/run_sf1_audit.py.
"""
    with open(os.path.join(REPO, "BENCH", "SF1_AUDIT.md"), "w") as fh:
        fh.write(md)
    print(md)
    import shutil
    shutil.rmtree(sink_dir)
    spark.stop()


if __name__ == "__main__":
    main()
