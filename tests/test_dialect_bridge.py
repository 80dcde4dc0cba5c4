"""The dialect TPC-H bridges (DBS multi-page / OCBC lattice / HDFC
pivot) must round-trip through BOTH engine modes identically to the
plain-Python oracle — including spans, which the driver's DuckDB check
only covers for OCBC."""

from __future__ import annotations

import os

import pytest

from bank_statement_pdf_parser_spark import oracle
from bank_statement_pdf_parser_spark.plans.extract import extract_all

from test_equality import _canon_spans, _canon_txns

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


@pytest.mark.parametrize("maker", ["dbs_transcripts", "ocbc_transcripts",
                                   "hdfc_transcripts", "html_transcripts",
                                   "uob_jitter_transcripts"])
@pytest.mark.parametrize("mode", ["fused", "relational"])
def test_dialect_bridge_equals_oracle(spark, maker, mode, tmp_path):
    from bank_statement_pdf_parser_spark.sources import tpch_bridge
    df = getattr(tpch_bridge, maker)(spark, SF_DIR).orderBy("conv_id") \
        .limit(40)
    # materialize so both modes and the oracle see the same sample
    path = str(tmp_path / "sample.parquet")
    df.write.parquet(path)
    sample = spark.read.parquet(path)
    rows = [r.asDict() for r in sample.collect()]

    out = extract_all(sample, mode=mode)
    eng_spans = [r.asDict() for r in out.spans.collect()]
    eng_txns = [r.asDict() for r in out.transactions.collect()]
    ora_spans, ora_txns = oracle.parse_transcripts(rows)
    if maker == "html_transcripts":
        assert len(ora_spans) > 0  # D5 corpus: spans only, no txns
    else:
        assert len(ora_txns) > 0
    assert _canon_txns(eng_txns) == _canon_txns(ora_txns)
    assert _canon_spans(eng_spans) == _canon_spans(ora_spans)
    if maker == "uob_jitter_transcripts":
        # prove the D7 INFERENCE branch ran: no anchor line is the
        # frozen 100-char spec width, and conversations are multi-turn
        from bank_statement_pdf_parser_spark import spec
        anchor = spec.rx(spec.ANCHOR_RX["UOB"])
        widths = {len(l) for r in rows for l in r["text"].split("\n")
                  if anchor.match(l)}
        assert spec.STREAM_LINE_W["UOB"] not in widths
        assert len(widths) > 1
        assert {r["turn_idx"] for r in rows} == {0, 1}
    if maker == "dbs_transcripts":
        # D9/D11 shape: every kept txn has exactly one continuation and
        # the page-carried duplicate was dropped (4 txns per statement)
        by_conv = {}
        for t in ora_txns:
            by_conv.setdefault(t["conv_id"], []).append(t)
        assert all(len(v) == 4 for v in by_conv.values())
        assert all(t["line_end"] == t["line_start"] + 1 for t in ora_txns)
