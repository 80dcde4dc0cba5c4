"""The core correctness gate (SURVEY.md §5.2.1, BASELINE.json north_rule):

per-turn text equality + span-offset equality + exact transactions frame
equality between the distributed Spark pipeline and the plain-Python
oracle parser, under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from bank_statement_pdf_parser_spark import oracle
from bank_statement_pdf_parser_spark.plans.extract import extract_all


def _canon_spans(rows):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["span_idx"], r["span_start"],
         r["span_end"], r["span_kind"], r["text"]) for r in rows)


def _canon_txns(rows):
    def dec(x):
        return None if x is None else Decimal(x).quantize(Decimal("0.01"))
    return sorted(
        (r["conv_id"], r["turn_idx"], r["txn_idx"], r["bank"],
         r["txn_date"], r["value_date"], r["description"], r["ref"],
         dec(r["debit"]), dec(r["credit"]), dec(r["balance"]),
         r["page"], r["line_start"], r["line_end"]) for r in rows)


@pytest.fixture(scope="module")
def oracle_out(fixture_rows):
    return oracle.parse_transcripts(fixture_rows)


@pytest.fixture(scope="module", params=["fused", "relational"])
def engine_out(request, spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    out = extract_all(df, mode=request.param)
    spans = [r.asDict() for r in out.spans.collect()]
    txns = [r.asDict() for r in out.transactions.collect()]
    return spans, txns


def test_span_equality(oracle_out, engine_out):
    ora_spans, _ = oracle_out
    eng_spans, _ = engine_out
    assert len(eng_spans) > 100
    a, b = _canon_spans(ora_spans), _canon_spans(eng_spans)
    only_ora = [x for x in a if x not in set(b)][:5]
    only_eng = [x for x in b if x not in set(a)][:5]
    assert a == b, f"oracle-only={only_ora}\nengine-only={only_eng}"


def test_transaction_equality(oracle_out, engine_out):
    _, ora_txns = oracle_out
    _, eng_txns = engine_out
    assert len(eng_txns) > 100
    a, b = _canon_txns(ora_txns), _canon_txns(eng_txns)
    sa, sb = set(a), set(b)
    only_ora = [x for x in a if x not in sb][:3]
    only_eng = [x for x in b if x not in sa][:3]
    assert a == b, f"oracle-only={only_ora}\nengine-only={only_eng}"


def test_schemas(spark, transcripts_path):
    from bank_statement_pdf_parser_spark import spec
    out = extract_all(spark.read.parquet(transcripts_path))

    def nt(schema):
        return [(f.name, f.dataType) for f in schema.fields]

    assert nt(out.spans.schema) == nt(
        spark.createDataFrame([], spec.SPANS_DDL).schema)
    assert nt(out.transactions.schema) == nt(
        spark.createDataFrame([], spec.TRANSACTIONS_DDL).schema)


def test_noise_yields_zero_spans(spark):
    rows = [("c-0", 0, "user", "just a chat message no statement here", None, None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = extract_all(df)
    assert out.spans.count() == 0
    assert out.transactions.count() == 0
