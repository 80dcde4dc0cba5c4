"""D7 stream-table column inference (SURVEY.md §2.3 D7): documents
whose columns do NOT sit at the frozen spec widths must still parse —
column cuts are inferred from the whitespace-gap histogram of the
anchor lines (>=2-wide gutters separate fields; single all-blank
columns, e.g. the spaces inside 'dd Mon yyyy', do not split).

Checked three ways: the frozen rule directly, and the full pipeline in
BOTH execution modes against the oracle on a jittered-width corpus.
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import pytest

from bank_statement_pdf_parser_spark import oracle, spec
from bank_statement_pdf_parser_spark.plans.extract import extract_all

from test_equality import _canon_spans, _canon_txns

# jittered UOB layout: date 13 / desc 46 / wdr 15 / dep 15 / bal 14
# (spec widths are 12/40/16/16/16 -> total 100; this doc is 103 wide)


def _jline(d, desc, wdr, dep, bal):
    return f"{d:<13}{desc:<46}{wdr:>15}{dep:>15}{bal:>14}"


def _jcont(desc):
    return f"{'':<13}{desc:<46}{'':<44}"


JITTER_ANCHORS = [
    _jline("05 Jan 2026", "PAYMENT ALPHA", "1,234.56", "", "5,000.00"),
    _jline("06 Jan 2026", "GROCERIES XY", "", "987.65", "5,987.65"),
    _jline("07 Jan 2026", "TRANSFER OMEGA Q", "12.34", "", "5,975.31"),
]


def _jitter_doc():
    return "\n".join(
        ["UNITED OVERSEAS BANK LIMITED", "Account: 0000000001",
         "Statement Period: x", "",
         JITTER_ANCHORS[0], _jcont("EXTRA LINE ONE"),
         JITTER_ANCHORS[1], JITTER_ANCHORS[2],
         "Page 1 of 1", "UOB is regulated by MAS"])


def test_rule_spec_width_uses_fixed():
    a = f"{'05 Jan 2026':<12}{'PAY A':<40}{'1.00':>16}{'':<16}{'5.00':>16}"
    assert len(a) == spec.STREAM_LINE_W["UOB"]
    assert spec.infer_stream_slices([a], "UOB") == spec.SLICES["UOB"]


def test_rule_infers_jittered_columns():
    got = spec.infer_stream_slices(JITTER_ANCHORS, "UOB")
    assert got == {"date": (0, 13), "description": (13, 66),
                   "withdrawal": (66, 83), "deposit": (83, 95),
                   "balance": (95, 103)}


def test_rule_rejects_ambiguous_layouts():
    # all-debit page: the deposit column is fully blank -> 4 runs -> the
    # frozen rule falls back to the fixed slices
    anchors = [
        _jline("05 Jan 2026", "PAYMENT ALPHA", "1,234.56", "", "5,000.00"),
        _jline("07 Jan 2026", "TRANSFER OMEGA Q", "12.34", "", "5,975.31"),
    ]
    assert spec.infer_stream_slices(anchors, "UOB") == spec.SLICES["UOB"]


@pytest.mark.parametrize("mode", ["fused", "relational"])
def test_jittered_doc_extracts_exactly(spark, mode, tmp_path):
    rows = [{"conv_id": "j-0", "turn_idx": 0, "role": "user",
             "text": _jitter_doc(), "tool": None,
             "ts": datetime(2026, 1, 1)}]
    from bank_statement_pdf_parser_spark import fixtures
    p = str(tmp_path / "t.parquet")
    fixtures.write_transcripts_parquet(rows, p)
    out = extract_all(spark.read.parquet(p), mode=mode)
    eng_txns = [r.asDict() for r in out.transactions.collect()]
    eng_spans = [r.asDict() for r in out.spans.collect()]
    ora_spans, ora_txns = oracle.parse_transcripts(rows)
    assert _canon_txns(eng_txns) == _canon_txns(ora_txns)
    assert _canon_spans(eng_spans) == _canon_spans(ora_spans)

    # and the values prove the inferred cuts were used, not the fixed
    got = sorted(((t["txn_date"], t["description"],
                   None if t["debit"] is None else Decimal(t["debit"]),
                   None if t["credit"] is None else Decimal(t["credit"]),
                   Decimal(t["balance"])) for t in eng_txns))
    assert got == [
        (date(2026, 1, 5), "PAYMENT ALPHA EXTRA LINE ONE",
         Decimal("1234.56"), None, Decimal("5000.00")),
        (date(2026, 1, 6), "GROCERIES XY",
         None, Decimal("987.65"), Decimal("5987.65")),
        (date(2026, 1, 7), "TRANSFER OMEGA Q",
         Decimal("12.34"), None, Decimal("5975.31")),
    ]
