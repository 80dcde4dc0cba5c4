"""F1/F2 grammar matrices: the Catalyst expressions in
functions/normalize.py must agree cell-for-cell with the oracle's
plain-Python grammar (and run clean under Spark 4 ANSI mode)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from bank_statement_pdf_parser_spark.functions.normalize import (
    amount_struct, date_from_cell)
from bank_statement_pdf_parser_spark.oracle.parser import (
    parse_amount, parse_date)

AMOUNT_CELLS = [
    "1,234.56", "(1,234.56)", "0.01", "999,999.99 CR", "(42.00) DR",
    "7.00 DR", "   12.34  ", "", "   ", None, "(0.99)", "123.45 CR",
]


def test_amount_matrix(spark):
    df = spark.createDataFrame([(c,) for c in AMOUNT_CELLS], "cell string")
    got = df.select(amount_struct(F.col("cell")).alias("a")).collect()
    for cell, row in zip(AMOUNT_CELLS, got):
        exp_val, exp_marker = (None, None) if cell is None else parse_amount(cell)
        if exp_val is None:
            assert row.a is None, cell
        else:
            assert Decimal(row.a.val).quantize(Decimal("0.01")) == exp_val, cell
            assert (row.a.marker or None) == exp_marker, cell


DATE_CASES = [
    ("UOB", "05 Jan 2026", None), ("UOB", "29 Feb 2024", None),
    ("UOB", "31 Dec 1999", None), ("DBS", "07/03/2026", None),
    ("HDFC", "05/01/26", None), ("HDFC", "05/01/69", None),
    ("HDFC", "05/01/70", None), ("HDFC", "31/12/99", None),
    ("OCBC", "05 Jan", (11, 2025, 2026)), ("OCBC", "05 Nov", (11, 2025, 2026)),
    ("OCBC", "29 Feb", (11, 2023, 2024)), ("OCBC", "01 Mar", (1, 2026, 2026)),
    ("UOB", "", None), ("HDFC", "   ", None),
]


def test_date_matrix(spark):
    from datetime import date
    for bank, cell, period in DATE_CASES:
        df = spark.createDataFrame([(cell,)], "cell string")
        if bank == "OCBC":
            m, y0, y1 = period
            col = date_from_cell(bank, F.col("cell"), F.lit(m), F.lit(y0),
                                 F.lit(y1))
            oracle_period = (date(y0, m, 1), date(y1, 12, 31))
        else:
            col = date_from_cell(bank, F.col("cell"))
            oracle_period = None
        got = df.select(col.alias("d")).collect()[0].d
        exp = parse_date(bank, cell, oracle_period) if cell.strip() else None
        assert got == exp, (bank, cell, got, exp)


def test_ansi_mode_safe(spark):
    """Blank/garbage cells must not raise under ANSI (guarded CASE)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([("",), ("   ",), (None,)], "cell string")
        rows = df.select(amount_struct(F.col("cell")).alias("a"),
                         date_from_cell("UOB", F.col("cell")).alias("d"),
                         date_from_cell("HDFC", F.col("cell")).alias("h"))
        assert all(r.a is None and r.d is None and r.h is None
                   for r in rows.collect())
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
