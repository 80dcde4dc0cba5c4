"""Frozen format spec for the extraction engine.

The reference repo (`/root/reference/README.md:2`) states the capability —
"parses bank statement PDFs from UOB, DBS, OCBC, and HDFC, extracts all
transaction data, and outputs a clean, standardized Excel file" — but ships
no code, tests, or sample documents. FIXTURES.md therefore freezes the
per-bank statement text formats; this module is the single normative home
of those constants. Both the plain-Python oracle parser
(`bank_statement_pdf_parser_spark.oracle`) and the distributed Spark
pipeline (`bank_statement_pdf_parser_spark.plans.extract`) implement this
spec **independently** but share these constants so the spec cannot drift
between the two implementations.

Offsets are Python code-point indices (== Spark `length()` semantics) into
the resolved document text of a turn.
"""

from __future__ import annotations

import functools
import re

# ---------------------------------------------------------------------------
# Payload resolution (SURVEY.md S2): the `tool` column may carry a JSON
# envelope {"name": ..., "encoding": "base64"|"none", "payload": ...}.
# When a tool payload is present it takes precedence over `text`.
# ---------------------------------------------------------------------------
TOOL_PAYLOAD_JSONPATH = "$.payload"
TOOL_ENCODING_JSONPATH = "$.encoding"

# ---------------------------------------------------------------------------
# Classification (SURVEY.md P3). Checked in order; first hit wins.
# Signatures are literal substrings of the document text.
# ---------------------------------------------------------------------------
BANK_SIGNATURES: list[tuple[str, str]] = [
    ("UOB", "UNITED OVERSEAS BANK LIMITED"),
    ("DBS", "DBS BANK LTD"),
    ("OCBC", "OCBC BANK"),
    ("HDFC", "HDFC BANK LTD"),
]
HTML_PREFIX_RX = r"^\s*<html"

# Only these roles are parsed; turns with any other role (e.g. 'system')
# are ignored by BOTH the engine and the oracle.
ROLES = ("user", "assistant", "tool")

PAGE_SEP = "\f"
LINE_SEP = "\n"

# ---------------------------------------------------------------------------
# Boilerplate (SURVEY.md D3): per-bank header/footer line regexes. A line is
# positional/regex boilerplate iff it is blank or fully matches one of its
# bank's patterns. `BALANCE B/F` page-carry lines are dropped everywhere.
# ---------------------------------------------------------------------------
BALANCE_BF_RX = r"^BALANCE B/F.*$"

BOILER_RX: dict[str, list[str]] = {
    "UOB": [
        r"^UNITED OVERSEAS BANK LIMITED\s*$",
        r"^Account: \d{10}\s*$",
        r"^Statement Period: .*$",
        r"^Page \d+ of \d+\s*$",
        r"^UOB is regulated by MAS\s*$",
    ],
    "DBS": [
        r"^DBS BANK LTD\s*$",
        r"^Account No: \d{9}\s*$",
        r"^Statement Date: \d{2}/\d{2}/\d{4}\s*$",
        r"^Page \d+/\d+\s*$",
        r"^Deposit Insurance Scheme applies\s*$",
    ],
    "OCBC": [
        r"^OCBC BANK\s*$",
        r"^Account \d{12}\s*$",
        r"^Period .*$",
        r"^Page \d+ of \d+\s*$",
        r"^Co\. Reg\. No\. 193200032W\s*$",
    ],
    "HDFC": [
        r"^HDFC BANK LTD\s*$",
        r"^A/c No: \d{14}\s*$",
        r"^Statement From .*$",
        r"^Page No \.: \d+\s*$",
        r"^HDFC BANK is registered with RBI\s*$",
    ],
}


@functools.lru_cache(maxsize=None)
def boiler_rx_combined(bank: str) -> str:
    """One alternation regex per bank: blank OR any header/footer OR B/F.
    Memoized: the fused kernel asks once per document."""
    pats = [r"^\s*$", BALANCE_BF_RX] + BOILER_RX[bank]
    return "|".join(f"(?:{p})" for p in pats)


# Frequency rule (SURVEY.md D4): on multi-page documents, a stripped line
# that appears on EVERY page is chrome regardless of the regex list.
FREQ_RULE_MIN_PAGES = 2

# ---------------------------------------------------------------------------
# Transaction-line segmentation anchors (SURVEY.md D8).
# ---------------------------------------------------------------------------
ANCHOR_RX: dict[str, str] = {
    "UOB": r"^\d{2} [A-Z][a-z]{2} \d{4}\s",
    "DBS": r"^\d{2}/\d{2}/\d{4}\s",
    "OCBC": r"^\|\d{2} [A-Z][a-z]{2}\|",
    "HDFC": r"^\d{2}/\d{2}/\d{2}\s",
}
# OCBC lattice continuation rows: first cell is a single space.
OCBC_ROW_RX = r"^\|.*\|\s*$"

# ---------------------------------------------------------------------------
# Fixed column slices (code-point [start, end) into the anchor line) for the
# stream-table banks (SURVEY.md D7 column cuts, frozen per FIXTURES.md §2).
# ---------------------------------------------------------------------------
SLICES: dict[str, dict[str, tuple[int, int]]] = {
    "UOB": {
        "date": (0, 12),
        "description": (12, 52),
        "withdrawal": (52, 68),
        "deposit": (68, 84),
        "balance": (84, 100),
    },
    "DBS": {
        "date": (0, 11),
        "value_date": (11, 22),
        "description": (22, 62),
        "debit": (62, 78),
        "credit": (78, 94),
        "balance": (94, 110),
    },
    "HDFC": {
        "date": (0, 10),
        "description": (10, 50),
        "ref": (50, 66),
        "value_date": (66, 76),
        "withdrawal": (76, 92),
        "deposit": (92, 108),
        "balance": (108, 124),
    },
}
# Continuation lines carry description text in the description slice only.
CONT_SLICE: dict[str, tuple[int, int]] = {
    "UOB": SLICES["UOB"]["description"],
    "DBS": SLICES["DBS"]["description"],
    "HDFC": SLICES["HDFC"]["description"],
}

# Frozen total line width of each stream-table layout (end of the last
# fixed slice). Documents whose anchor lines ALL have exactly this
# width use the fixed SLICES; anything else triggers D7 inference.
STREAM_LINE_W: dict[str, int] = {b: max(e for _, e in sl.values())
                                 for b, sl in SLICES.items()}


def infer_stream_slices(anchor_lines: list[str],
                        bank: str) -> dict[str, tuple[int, int]]:
    """D7 (frozen): whitespace-gap column inference for stream tables.

    Trigger: if every anchor line of the document is exactly
    STREAM_LINE_W[bank] wide, the layout is the frozen one -> fixed
    SLICES (this keeps all spec-width corpora byte-identical).
    Otherwise, over the document's anchor lines:

      gap[x]  = every anchor line is blank (or ended) at position x
      gutter  = a run of >=2 consecutive gap positions (a single
                all-blank column does NOT split — 'dd Mon yyyy' dates
                and aligned word breaks have internal single spaces)
      columns = maximal runs between gutters; each column's slice
                extends through the following gutter up to the next
                column's start (the last one to the max line width)

    The columns map IN ORDER onto the bank's field list (the SLICES
    key order). If the inferred column count differs from the expected
    field count (e.g. an all-debit page leaves the deposit column
    fully blank, or two columns touch), inference is rejected and the
    fixed SLICES apply. Continuations use the inferred description
    column. Oracle, fused tokenizer and the relational plan all
    implement exactly this rule.
    """
    fixed = SLICES[bank]
    if all(len(a) == STREAM_LINE_W[bank] for a in anchor_lines):
        return fixed
    w = max(len(a) for a in anchor_lines)
    gap = [all(x >= len(a) or a[x] == " " for a in anchor_lines)
           for x in range(w)]
    # close single-column gaps: only >=2-wide blank runs separate
    gut = [gap[x] and ((x > 0 and gap[x - 1])
                       or (x + 1 < w and gap[x + 1]))
           for x in range(w)]
    gap = gut
    starts = [x for x in range(w)
              if not gap[x] and (x == 0 or gap[x - 1])]
    if len(starts) != len(fixed):
        return fixed
    ends = starts[1:] + [w]
    return {name: (s, e)
            for name, s, e in zip(fixed.keys(), starts, ends)}

# OCBC lattice cells, in order between `|` rails.
OCBC_CELLS = ["date", "description", "withdrawal", "deposit", "balance"]

# ---------------------------------------------------------------------------
# Field grammar (SURVEY.md F1/F2/F5).
# ---------------------------------------------------------------------------
# Amounts: optional parens => negative; thousands commas; optional trailing
# " CR"/" DR" marker which overrides debit/credit column position; 2dp.
# F3 assignment order (frozen): the withdrawal cell is assigned first,
# the deposit cell second — LAST WRITER WINS. So when both cells are
# populated, a DR-marked deposit overrides a debit taken from the
# withdrawal cell, and an unmarked deposit overrides a credit taken
# from a CR-marked withdrawal cell.
AMOUNT_MARKER_RX = r" (CR|DR)$"
AMOUNT_STRIP_RX = r"[(),]"
AMOUNT_VALID_RX = r"^\(?\d{1,3}(,\d{3})*\.\d{2}\)?( (CR|DR))?$"

DATE_FORMATS: dict[str, str] = {
    "UOB": "dd MMM yyyy",     # 05 Jan 2026
    "DBS": "dd/MM/yyyy",      # 05/01/2026
    "OCBC": "dd MMM",         # 05 Jan (year inferred from period header)
    "HDFC": "dd/MM/yy",       # 05/01/26 (explicit pivot below, not Java's)
}
HDFC_YY_PIVOT = 70  # yy < 70 -> 20yy else 19yy (frozen; FIXTURES.md §2)

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
MONTH_NUM = {m: i + 1 for i, m in enumerate(MONTHS)}

# OCBC year inference: statement period header; txn month < period-start
# month rolls to the period-end year, else the period-start year.
OCBC_PERIOD_RX = (
    r"Period (\d{2}) ([A-Z][a-z]{2}) (\d{4}) - (\d{2}) ([A-Z][a-z]{2}) (\d{4})"
)
# Documents missing the period header fall back to a fixed default
# period Jan-Dec of this year, so every txn month resolves to it.
OCBC_DEFAULT_START_MON = 1
OCBC_DEFAULT_YEAR = 2026

# Description ref extraction (F5): leading "REF <token> " prefix is pulled
# into the `ref` field (HDFC uses its chq_ref column instead).
REF_RX = r"^REF\s+(\S+)\s+(.*)$"

# ---------------------------------------------------------------------------
# HTML payloads (FIXTURES.md §3): keep text nodes inside the (single, non
# nested) `<div class="content">`; spans index the RAW html string; entities
# are decoded in the extracted text only.
# ---------------------------------------------------------------------------
HTML_CONTENT_OPEN = '<div class="content">'
HTML_CONTENT_CLOSE = "</div>"
HTML_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&nbsp;", " ")]
HTML_TAG_RX = r"<[^>]*>"

# ---------------------------------------------------------------------------
# Output schemas (FIXTURES.md §4) as DDL strings (usable from both pyspark
# and tests without importing pyspark at module import time).
# ---------------------------------------------------------------------------
SPANS_DDL = (
    "conv_id string, turn_idx int, span_idx int, span_start int, "
    "span_end int, span_kind string, text string"
)
TRANSACTIONS_DDL = (
    "conv_id string, turn_idx int, txn_idx int, bank string, "
    "txn_date date, value_date date, description string, ref string, "
    "debit decimal(18,2), credit decimal(18,2), balance decimal(18,2), "
    "page int, line_start int, line_end int"
)
TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

SPAN_KIND_TXN = "txn"
SPAN_KIND_CELL = "table_cell"
SPAN_KIND_MAIN = "main"

_COMPILED: dict[str, re.Pattern] = {}


def rx(pattern: str) -> re.Pattern:
    """Cached compile for oracle-side use."""
    p = _COMPILED.get(pattern)
    if p is None:
        p = _COMPILED[pattern] = re.compile(pattern)
    return p
