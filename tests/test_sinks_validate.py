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

    # literal .xlsx (stdlib OOXML writer — no openpyxl needed)
    out = write_excel_preview(txns, str(tmp_path / "tail.xlsx"), limit=50)
    assert os.path.exists(out) and out.endswith(".xlsx")


def test_xlsx_roundtrip_types_and_escaping(tmp_path):
    """write_xlsx emits spec-conformant SpreadsheetML the companion
    stdlib reader can replay: numbers native, strings inline (XML
    escaping + preserved whitespace), bools, blanks for None/NaN."""
    from bank_statement_pdf_parser_spark.sources.sink import (
        read_xlsx_rows, write_xlsx)
    import zipfile
    p = str(tmp_path / "t.xlsx")
    rows = [[1, "a<b&c>", 2.5, True, None],
            [-7, "  spaced  ", float("nan"), False, "x"],
            [1234567890123, "", 0.125, True, "tail"]]
    write_xlsx(["n", "s", "f", "b", "opt"], rows, p)
    back = read_xlsx_rows(p)
    assert back[0] == ["n", "s", "f", "b", "opt"]
    assert back[1] == [1, "a<b&c>", 2.5, True, None]
    assert back[2] == [-7, "  spaced  ", None, False, "x"]
    assert back[3] == [1234567890123, "", 0.125, True, "tail"]
    # package structure: every required OOXML part present
    names = set(zipfile.ZipFile(p).namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/worksheets/sheet1.xml"} <= names


def test_xlsx_numpy_scalars_native(tmp_path):
    """numpy scalars (what pandas itertuples yields) must land as
    native cell types, not inline strings: np.bool_ is not a bool
    subclass, so without normalization bools serialized as the
    strings 'True'/'False' (ADVICE r6)."""
    import numpy as np
    from bank_statement_pdf_parser_spark.sources.sink import (
        read_xlsx_rows, write_xlsx)
    p = str(tmp_path / "np.xlsx")
    rows = [[np.bool_(True), np.int64(7), np.float64(2.5), np.bool_(False)]]
    write_xlsx(["b1", "n", "f", "b2"], rows, p)
    back = read_xlsx_rows(p)
    assert back[1] == [True, 7, 2.5, False]
    assert isinstance(back[1][0], bool) and isinstance(back[1][3], bool)
