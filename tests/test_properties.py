"""Property-based tests (SURVEY.md §5.2.3) on the frozen grammar —
pure-Python oracle side; Spark parity is covered by the equality and
mode-equivalence suites."""

from __future__ import annotations

from datetime import date
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from bank_statement_pdf_parser_spark import spec
from bank_statement_pdf_parser_spark.oracle.parser import (
    parse_amount, parse_date)

amounts = st.decimals(min_value=Decimal("0.01"), max_value=Decimal("99999999.99"),
                      places=2)


@settings(max_examples=300, deadline=None)
@given(amounts, st.booleans(), st.sampled_from([None, "CR", "DR"]))
def test_amount_format_parse_roundtrip(v, paren, marker):
    s = f"{v:,.2f}"
    if paren:
        s = f"({s})"
    if marker:
        s = f"{s} {marker}"
    val, mk = parse_amount(s.rjust(20))
    assert mk == marker
    assert val == (-v if paren else v)
    assert spec.rx(spec.AMOUNT_VALID_RX).match(s)


@settings(max_examples=300, deadline=None)
@given(st.dates(min_value=date(1970, 1, 1), max_value=date(2069, 12, 31)))
def test_date_roundtrip_all_banks(d):
    uob = d.strftime("%d ") + spec.MONTHS[d.month - 1] + d.strftime(" %Y")
    assert parse_date("UOB", uob, None) == d
    assert parse_date("DBS", d.strftime("%d/%m/%Y"), None) == d
    hd = d.strftime("%d/%m/") + f"{d.year % 100:02d}"
    hdfc = parse_date("HDFC", hd, None)
    expected_year = (2000 + d.year % 100 if d.year % 100 < spec.HDFC_YY_PIVOT
                     else 1900 + d.year % 100)
    assert hdfc == date(expected_year, d.month, d.day)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 28), st.integers(1, 12),
       st.integers(1, 28), st.integers(1, 12), st.integers(2020, 2030))
def test_ocbc_year_inference(d1, m_start, d2, m_txn, y):
    period = (date(y, m_start, d1), date(y + 1, 3, 1))
    cell = f"{d2:02d} {spec.MONTHS[m_txn - 1]}"
    got = parse_date("OCBC", cell, period)
    assert got.month == m_txn and got.day == d2
    assert got.year == (y + 1 if m_txn < m_start else y)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**7))
def test_running_balance_invariant(seed):
    """V1: generated statements satisfy balance[i] = balance[i-1]
    + credit - debit (as booked by the generator's effective sign)."""
    import random

    from bank_statement_pdf_parser_spark import fixtures
    from bank_statement_pdf_parser_spark.oracle import parser as oracle
    rng = random.Random(seed)
    bank = rng.choice(["UOB", "DBS", "HDFC"])
    doc = fixtures.make_statement(bank, rng, adversarial=False)
    _, txns = oracle.parse_statement(doc, bank)
    assert txns, doc[:200]
    prev = None
    for t in txns:
        delta = (t["credit"] or 0) - (t["debit"] or 0)
        if prev is not None:
            assert t["balance"] == prev + delta
        prev = t["balance"]
