from __future__ import annotations

import os

from pyspark.sql import functions as F

from bank_statement_pdf_parser_spark.functions.validate import (
    balance_check, balance_violations)
from bank_statement_pdf_parser_spark.plans.extract import extract_all
from bank_statement_pdf_parser_spark.sources.sink import (
    write_excel_preview, write_standardized)


def test_balance_check_on_clean_statements(spark, transcripts_path):
    txns = extract_all(spark.read.parquet(transcripts_path)).transactions
    # non-adversarial UOB/DBS/HDFC statements book every txn, so the
    # running balance must reconcile exactly on docs with no B/F carry
    checked = balance_check(txns)
    clean = checked.filter(F.col("prev_balance").isNotNull())
    assert clean.count() > 200
    viol = balance_violations(txns)
    ok_docs = viol.filter(F.col("n_bad") == 0).count()
    assert ok_docs > viol.count() * 0.5  # adversarial docs may not balance


def test_standardized_sinks(spark, transcripts_path, tmp_path):
    txns = extract_all(spark.read.parquet(transcripts_path)).transactions
    p = str(tmp_path / "std_parquet")
    write_standardized(txns, p, "parquet", partition_by=("bank",))
    back = spark.read.parquet(p)
    assert back.count() == txns.count()
    assert {r.bank for r in back.select("bank").distinct().collect()} <= {
        "UOB", "DBS", "OCBC", "HDFC"}

    c = str(tmp_path / "std_csv")
    write_standardized(txns.drop("value_date"), c, "csv")
    assert spark.read.option("header", "true").csv(c).count() == txns.count()

    # xlsx convenience: openpyxl absent in sandbox -> csv fallback
    out = write_excel_preview(txns, str(tmp_path / "tail.xlsx"), limit=50)
    assert os.path.exists(out)
    assert out.endswith(".csv") or out.endswith(".xlsx")
