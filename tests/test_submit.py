"""Real `spark-submit --py-files engine.zip` deployment smoke test
(BASELINE.json north_star: "packaged for spark-submit --py-files").

Runs the actual spark-submit binary from a CLEAN temp cwd with the
repo absent from PYTHONPATH, so the driver can only import the engine
from the zip (zipimport) — which also exercises the
`package_zip`-under-zipimport path (session._containing_zip): without
it `ensure_shipped` would distribute an EMPTY archive to executors.
A second identical invocation proves checkpoint resume across
*processes* (the manifest store, not driver state).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    from pyspark.find_spark_home import _find_spark_home
    return os.path.join(_find_spark_home(), "bin", "spark-submit")


def _clean_env() -> dict:
    env = dict(os.environ)
    # drop any path that could let the child import the repo directly
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and os.path.abspath(p) != REPO]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("SPARK_GRAFT_CPUS", None)
    return env


def _submit(tmp: str, zpath: str, script: str, corpus: str,
            out_dir: str) -> dict:
    cmd = [
        _spark_submit_bin(), "--master", "local[4]",
        "--py-files", zpath, script,
        "--input", corpus, "--output", out_dir,
        "--run-id", "submit-test", "--buckets", "4",
        "--buckets-per-job", "4", "--master", "local[4]",
    ]
    proc = subprocess.run(cmd, cwd=tmp, env=_clean_env(),
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("{")]
    assert summary, proc.stdout[-2000:]
    return json.loads(summary[-1])


def test_spark_submit_py_files_roundtrip_and_resume(
        tmp_path, spark, transcripts_path):
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.session import package_zip

    tmp = str(tmp_path)
    zpath = package_zip(dest_dir=tmp)
    script = os.path.join(tmp, "run_extract.py")
    with open(os.path.join(REPO, "run_extract.py")) as fh:
        src = fh.read()
    with open(script, "w") as fh:
        fh.write(src)
    out_dir = os.path.join(tmp, "out")

    first = _submit(tmp, zpath, script, transcripts_path, out_dir)
    assert sorted(first["buckets_done"]) == [0, 1, 2, 3]
    assert first["buckets_skipped_resume"] == []
    assert first["rows_out"] > 0
    manifests = os.listdir(os.path.join(out_dir, "_manifest"))
    assert len([m for m in manifests if m.endswith(".json")]) == 4

    # the submitted job's outputs match the in-process plan exactly
    expect = extract_all(spark.read.parquet(transcripts_path))
    n_txn = spark.read.parquet(
        os.path.join(out_dir, "transactions")).count()
    n_spans = spark.read.parquet(os.path.join(out_dir, "spans")).count()
    assert n_txn == expect.transactions.count()
    assert n_spans == expect.spans.count()
    assert first["rows_out"] == n_txn + n_spans

    # second process: manifest-driven resume, nothing reprocessed
    second = _submit(tmp, zpath, script, transcripts_path, out_dir)
    assert sorted(second["buckets_skipped_resume"]) == [0, 1, 2, 3]
    assert second["buckets_done"] == []
    assert second["rows_out"] == 0
