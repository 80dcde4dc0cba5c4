"""Plain-Python oracle parser — the reference implementation.

The reference repo publishes only its capability sentence
(`/root/reference/README.md:2`) and no code, so per BASELINE.json the
"reference parser" used for the per-turn text/span-offset equality
contract is this single-process implementation of the frozen spec in
`spec.py` / FIXTURES.md. It is deliberately written as straight-line,
row-at-a-time Python (the shape the reference tool would have had):
readable, obviously-correct, zero Spark. The distributed engine in
`plans/extract.py` must match its output exactly.
"""

from __future__ import annotations

import base64
import json
import re
from datetime import date
from decimal import Decimal

from .. import spec

TWO_DP = Decimal("0.01")


# ---------------------------------------------------------------------------
# payload resolution + classification
# ---------------------------------------------------------------------------

def resolve_payload(text: str | None, tool: str | None) -> str | None:
    """Tool payload (optionally base64) takes precedence over `text`."""
    if tool:
        try:
            env = json.loads(tool)
        except ValueError:
            env = None
        if isinstance(env, dict) and env.get("payload") is not None:
            payload = env["payload"]
            if env.get("encoding") == "base64":
                return base64.b64decode(payload).decode("utf-8")
            return str(payload)
    return text


def classify(doc: str) -> str | None:
    """'HTML', a bank code, or None (noise)."""
    if re.match(spec.HTML_PREFIX_RX, doc):
        return "HTML"
    for bank, sig in spec.BANK_SIGNATURES:
        if sig in doc:
            return bank
    return None


# ---------------------------------------------------------------------------
# field grammar
# ---------------------------------------------------------------------------

def parse_amount(cell: str) -> tuple[Decimal | None, str | None]:
    s = cell.strip()
    if not s:
        return None, None
    marker = None
    m = re.search(spec.AMOUNT_MARKER_RX, s)
    if m:
        marker = m.group(1)
        s = s[: m.start()]
    neg = s.startswith("(") and s.endswith(")")
    s = re.sub(spec.AMOUNT_STRIP_RX, "", s)
    val = Decimal(s).quantize(TWO_DP)
    return (-val if neg else val), marker


def _collapse(s: str) -> str:
    return " ".join(s.split())


def parse_date(bank: str, cell: str, period: tuple[date, date] | None) -> date | None:
    s = cell.strip()
    if not s:
        return None
    if bank == "UOB":
        dd, mon, yyyy = s[0:2], s[3:6], s[7:11]
        return date(int(yyyy), spec.MONTH_NUM[mon], int(dd))
    if bank == "DBS":
        dd, mm, yyyy = s[0:2], s[3:5], s[6:10]
        return date(int(yyyy), int(mm), int(dd))
    if bank == "HDFC":
        dd, mm, yy = int(s[0:2]), int(s[3:5]), int(s[6:8])
        year = 2000 + yy if yy < spec.HDFC_YY_PIVOT else 1900 + yy
        return date(year, mm, dd)
    if bank == "OCBC":
        dd, mon = int(s[0:2]), spec.MONTH_NUM[s[3:6]]
        start, end = period if period else (
            date(spec.OCBC_DEFAULT_YEAR, spec.OCBC_DEFAULT_START_MON, 1),
            date(spec.OCBC_DEFAULT_YEAR, 12, 31))
        year = end.year if mon < start.month else start.year
        return date(year, mon, dd)
    raise ValueError(bank)


def _ocbc_period(doc: str) -> tuple[date, date] | None:
    m = re.search(spec.OCBC_PERIOD_RX, doc)
    if not m:
        return None
    d1, m1, y1, d2, m2, y2 = m.groups()
    return (date(int(y1), spec.MONTH_NUM[m1], int(d1)),
            date(int(y2), spec.MONTH_NUM[m2], int(d2)))


# ---------------------------------------------------------------------------
# statement parsing
# ---------------------------------------------------------------------------

def _lines_with_offsets(doc: str):
    """(page_1based, line_no_global, char_off_global, raw_line) per line."""
    out = []
    page_off = 0
    line_no = 0
    for pi, page in enumerate(doc.split(spec.PAGE_SEP)):
        line_off = 0
        for raw in page.split(spec.LINE_SEP):
            out.append((pi + 1, line_no, page_off + line_off, raw))
            line_off += len(raw) + 1
            line_no += 1
        page_off += len(page) + 1
    return out


def _freq_boiler_set(doc: str) -> set[str]:
    pages = doc.split(spec.PAGE_SEP)
    if len(pages) < spec.FREQ_RULE_MIN_PAGES:
        return set()
    sets = [set(l.strip() for l in p.split(spec.LINE_SEP)) for p in pages]
    inter = sets[0]
    for s in sets[1:]:
        inter = inter & s
    return inter


def _ocbc_cells(raw: str, line_off: int):
    """(cell_name_idx, start, end, stripped_text) for non-empty cells."""
    parts = raw.split("|")
    pos = 0
    out = []
    for i, part in enumerate(parts):
        if 1 <= i <= len(parts) - 2:
            stripped = part.strip()
            if stripped:
                lead = len(part) - len(part.lstrip())
                start = line_off + pos + lead
                out.append((i - 1, start, start + len(stripped), stripped))
        pos += len(part) + 1
    return out


def parse_statement(doc: str, bank: str):
    """Returns (spans, txns) — span/txn dicts without conv/turn keys."""
    boiler = spec.rx(spec.boiler_rx_combined(bank))
    anchor = spec.rx(spec.ANCHOR_RX[bank])
    freq = _freq_boiler_set(doc)
    period = _ocbc_period(doc) if bank == "OCBC" else None

    content = []
    for page, line_no, off, raw in _lines_with_offsets(doc):
        if boiler.match(raw) or raw.strip() in freq:
            continue
        content.append((page, line_no, off, raw))

    # group into transactions: anchor line + following continuations
    groups: list[list[tuple[int, int, int, str]]] = []
    for item in content:
        if anchor.match(item[3]):
            groups.append([item])
        elif groups:
            groups[-1].append(item)
        # lines before the first anchor are dropped

    # dedup page-carry duplicates on exact raw anchor text, keep first
    seen: set[str] = set()
    kept = []
    for g in groups:
        key = g[0][3]
        if key in seen:
            continue
        seen.add(key)
        kept.append(g)

    # D7: column cuts for stream-table banks — fixed SLICES when the
    # layout is spec-width, whitespace-gap inference otherwise
    if bank != "OCBC" and groups:
        sl_doc = spec.infer_stream_slices([g[0][3] for g in groups], bank)
        cont_slice = sl_doc["description"]
    else:
        sl_doc, cont_slice = None, None

    spans = []
    txns = []
    for txn_i, g in enumerate(kept):
        a_page, a_line, a_off, a_raw = g[0]
        l_page, l_line, l_off, l_raw = g[-1]
        span_start = a_off
        span_end = l_off + len(l_raw.rstrip())
        spans.append({"span_start": span_start, "span_end": span_end,
                      "span_kind": spec.SPAN_KIND_TXN,
                      "text": doc[span_start:span_end]})

        if bank == "OCBC":
            cells = {n: t for n, _s, _e, t in
                     ((spec.OCBC_CELLS[i], s, e, t)
                      for i, s, e, t in _ocbc_cells(a_raw, a_off))}
            desc_parts = [cells.get("description", "")]
            for page, line_no, off, raw in g[1:]:
                for i, s, e, t in _ocbc_cells(raw, off):
                    if spec.OCBC_CELLS[i] == "description":
                        desc_parts.append(t)
            for page, line_no, off, raw in g:
                for i, s, e, t in _ocbc_cells(raw, off):
                    spans.append({"span_start": s, "span_end": e,
                                  "span_kind": spec.SPAN_KIND_CELL, "text": t})
            w_val, w_mark = parse_amount(cells.get("withdrawal", ""))
            d_val, d_mark = parse_amount(cells.get("deposit", ""))
            bal, _ = parse_amount(cells.get("balance", ""))
            txn_date = parse_date(bank, cells.get("date", ""), period)
            value_date = None
            ref_cell = None
        else:
            sl = sl_doc
            def cut(field: str) -> str:
                s, e = sl[field]
                return a_raw[s:e]
            desc_parts = [cut("description")]
            cs, ce = cont_slice
            for page, line_no, off, raw in g[1:]:
                desc_parts.append(raw[cs:ce])
            if bank == "DBS":
                w_val, w_mark = parse_amount(cut("debit"))
                d_val, d_mark = parse_amount(cut("credit"))
                value_date = parse_date(bank, cut("value_date"), None)
            else:
                w_val, w_mark = parse_amount(cut("withdrawal"))
                d_val, d_mark = parse_amount(cut("deposit"))
                value_date = (parse_date(bank, cut("value_date"), None)
                              if bank == "HDFC" else None)
            bal, _ = parse_amount(cut("balance"))
            txn_date = parse_date(bank, cut("date"), None)
            ref_cell = cut("ref").strip() if bank == "HDFC" else None

        # debit/credit assignment with CR/DR marker override (spec F2/F3)
        debit = credit = None
        if w_val is not None:
            if w_mark == "CR":
                credit = w_val
            else:
                debit = w_val
        if d_val is not None:
            if d_mark == "DR":
                debit = d_val
            else:
                credit = d_val

        desc = " ".join(p for p in (_collapse(x) for x in desc_parts) if p)
        ref = ref_cell or None
        if bank != "HDFC":
            m = re.match(spec.REF_RX, desc)
            if m:
                ref, desc = m.group(1), m.group(2)

        txns.append({
            "txn_idx": txn_i, "bank": bank, "txn_date": txn_date,
            "value_date": value_date, "description": desc, "ref": ref,
            "debit": debit, "credit": credit, "balance": bal,
            "page": a_page, "line_start": a_line, "line_end": l_line,
        })
    return spans, txns


# ---------------------------------------------------------------------------
# HTML parsing
# ---------------------------------------------------------------------------

def _decode_entities(s: str) -> str:
    for ent, ch in spec.HTML_ENTITIES:
        s = s.replace(ent, ch)
    return s


def parse_html(doc: str):
    start = doc.find(spec.HTML_CONTENT_OPEN)
    if start < 0:
        return []
    start += len(spec.HTML_CONTENT_OPEN)
    end = doc.find(spec.HTML_CONTENT_CLOSE, start)
    if end < 0:
        end = len(doc)
    spans = []
    pos = start
    tag = spec.rx(spec.HTML_TAG_RX)
    for m in tag.finditer(doc, start, end):
        seg_a, seg_b = pos, m.start()
        pos = m.end()
        spans.extend(_text_node(doc, seg_a, seg_b))
    spans.extend(_text_node(doc, pos, end))
    return spans


def _text_node(doc: str, a: int, b: int):
    raw = doc[a:b]
    stripped = raw.strip()
    if not stripped:
        return []
    lead = len(raw) - len(raw.lstrip())
    s = a + lead
    e = s + len(stripped)
    return [{"span_start": s, "span_end": e,
             "span_kind": spec.SPAN_KIND_MAIN,
             "text": _decode_entities(stripped)}]


# ---------------------------------------------------------------------------
# per-turn + whole-table entry points
# ---------------------------------------------------------------------------

def parse_document(doc: str | None):
    """(spans, txns) for one resolved document; spans get dense span_idx
    ordered by span_start."""
    if not doc:
        return [], []
    kind = classify(doc)
    if kind is None:
        return [], []
    if kind == "HTML":
        spans, txns = parse_html(doc), []
    else:
        spans, txns = parse_statement(doc, kind)
    spans.sort(key=lambda s: s["span_start"])
    for i, s in enumerate(spans):
        s["span_idx"] = i
    return spans, txns


def parse_transcripts(rows: list[dict]):
    """rows: transcripts dicts -> (span_rows, txn_rows), stably ordered by
    (conv_id, turn_idx, idx) regardless of input row order."""
    span_rows, txn_rows = [], []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        if r.get("role") not in spec.ROLES:
            continue
        doc = resolve_payload(r.get("text"), r.get("tool"))
        spans, txns = parse_document(doc)
        for s in spans:
            span_rows.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], **s})
        for t in txns:
            txn_rows.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], **t})
    return span_rows, txn_rows
