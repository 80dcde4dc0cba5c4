"""Fused structural tokenizer (SURVEY.md D1,D2,D3,D4,D8,D9,D10,D11 — fused).

The whole structural stage of the extraction is *turn-local*: pages,
line offsets, boilerplate, anchors, continuation grouping, page-carry
dedup and span offsets of one turn depend only on that turn's document
text. Shuffling 100 TB of raw lines across the cluster just to window
them back per-turn would be the dominant cost at scale, so the default
plan fuses D2+D4+D8-D11 into ONE `mapInPandas` pass over Arrow batches
of turn rows: zero shuffles touch raw text; only extracted records
(~1000x smaller) ever hit an Exchange. SURVEY.md §4.2 explicitly
blesses this fusion; the un-fused pure-Catalyst composition of the same
operators lives in `relational.py` and is cross-checked for equality.

Inside the UDF, flags are compiled C regexes and offsets are a single
running accumulation over the line list — no Spark-row Python, no
per-character Python loops (NumPy cumsum was measured slower than the
accumulator for typical 10-60 line documents).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from .. import spec
from .html import _spans_one as _html_spans

# mapInPandas output: one row per surviving transaction record.
RECORDS_DDL = (
    "conv_id string, turn_idx int, bank string, page int, "
    "line_start int, line_end int, span_start int, span_end int, "
    "span_text string, date_cell string, vdate_cell string, "
    "wdr_cell string, dep_cell string, bal_cell string, ref_cell string, "
    "desc_parts array<string>, "
    "cells array<struct<start:int,end:int,text:string>>, "
    "p_start_mon int, p_start_year int, p_end_year int"
)

_RECORD_COLS = [
    "conv_id", "turn_idx", "bank", "page", "line_start", "line_end",
    "span_start", "span_end", "span_text", "date_cell", "vdate_cell",
    "wdr_cell", "dep_cell", "bal_cell", "ref_cell", "desc_parts", "cells",
    "p_start_mon", "p_start_year", "p_end_year",
]


def _ocbc_cells(raw: str, line_off: int):
    """[(cell_idx, start, end, stripped)] for non-empty cells of one row."""
    parts = raw.split("|")
    pos = 0
    out = []
    last = len(parts) - 2
    for i, part in enumerate(parts):
        if 1 <= i <= last:
            stripped = part.strip()
            if stripped:
                lead = len(part) - len(part.lstrip())
                s = line_off + pos + lead
                out.append((i - 1, s, s + len(stripped), stripped))
        pos += len(part) + 1
    return out


def _parse_doc(doc: str, bank: str):
    """Structural parse of one document -> list of record tuples
    (page, line_start, line_end, span_start, span_end, span_text,
    date, vdate, wdr, dep, bal, ref, desc_parts, cells)."""
    boiler = spec.rx(spec.boiler_rx_combined(bank))
    anchor = spec.rx(spec.ANCHOR_RX[bank])

    pages = doc.split(spec.PAGE_SEP)
    lines: list[str] = []
    page_of: list[int] = []
    offs: list[int] = []
    # offset of line i = sum(len+1 of previous lines); the +1 covers both
    # '\n' within a page and the '\f' between pages (single-char each).
    off = 0
    page_line_lists = []
    for pi, page in enumerate(pages):
        pl = page.split(spec.LINE_SEP)
        page_line_lists.append(pl)
        lines.extend(pl)
        page_of.extend([pi + 1] * len(pl))
        for raw in pl:
            offs.append(off)
            off += len(raw) + 1

    if len(pages) >= spec.FREQ_RULE_MIN_PAGES:
        page_sets = [set(l.strip() for l in pl) for pl in page_line_lists]
        freq = set.intersection(*page_sets)
    else:
        freq = ()

    # content lines -> transaction groups (running anchor sessionization)
    boiler_match = boiler.match
    anchor_match = anchor.match
    groups: list[list[int]] = []
    append_group = groups.append
    for i, raw in enumerate(lines):
        if boiler_match(raw) or raw.strip() in freq:
            continue
        if anchor_match(raw):
            append_group([i])
        elif groups:
            groups[-1].append(i)

    seen: set[str] = set()
    records = []
    if bank != "OCBC" and groups:
        # D7: fixed SLICES for spec-width layouts, whitespace-gap
        # inference otherwise (frozen rule in spec.infer_stream_slices)
        sl = spec.infer_stream_slices([lines[g[0]] for g in groups], bank)
        cs_ce = sl["description"]
    else:
        sl, cs_ce = None, None
    for g in groups:
        a = g[0]
        a_raw = lines[a]
        if a_raw in seen:  # D11 page-carry dedup, keep first
            continue
        seen.add(a_raw)
        last = g[-1]
        span_start = offs[a]
        span_end = offs[last] + len(lines[last].rstrip())
        span_text = doc[span_start:span_end]

        if bank == "OCBC":
            cells_all = []
            a_cells = {}
            desc_parts = []
            for j, li in enumerate(g):
                for ci, s, e, t in _ocbc_cells(lines[li], offs[li]):
                    cells_all.append({"start": s, "end": e, "text": t})
                    name = spec.OCBC_CELLS[ci]
                    if j == 0:
                        a_cells[name] = t
                    elif name == "description":
                        desc_parts.append(t)
            desc_parts.insert(0, a_cells.get("description", ""))
            rec = (page_of[a], a, last, span_start, span_end, span_text,
                   a_cells.get("date"), None,
                   a_cells.get("withdrawal"), a_cells.get("deposit"),
                   a_cells.get("balance"), None, desc_parts, cells_all)
        else:
            def cut(f):
                s, e = sl[f]
                return a_raw[s:e]
            desc_parts = [cut("description")]
            desc_parts += [lines[li][cs_ce[0]:cs_ce[1]] for li in g[1:]]
            if bank == "DBS":
                wdr, dep = cut("debit"), cut("credit")
                vdate, ref = cut("value_date"), None
            elif bank == "HDFC":
                wdr, dep = cut("withdrawal"), cut("deposit")
                vdate, ref = cut("value_date"), cut("ref")
            else:  # UOB
                wdr, dep = cut("withdrawal"), cut("deposit")
                vdate, ref = None, None
            rec = (page_of[a], a, last, span_start, span_end, span_text,
                   cut("date"), vdate, wdr, dep, cut("balance"), ref,
                   desc_parts, [])
        records.append(rec)
    return records


def tokenize_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: turn rows -> records, ONE raw-text pass.

    Statement turns yield transaction records; HTML turns yield one
    pseudo-record per main-content span (bank='HTML', span fields set,
    cell/amount fields NULL — same D5 logic as operators/html.py, fused
    here so spans AND transactions derive from a single scan of the
    corpus: at 100 TB a second raw pass for the HTML branch would be
    the dominant extra cost)."""
    for pdf in batches:
        out = {c: [] for c in _RECORD_COLS}
        for row in pdf.itertuples(index=False):
            if row.kind == "HTML":
                for s in _html_spans(row.doc):
                    for c in _RECORD_COLS:
                        out[c].append(None)
                    n = len(out["conv_id"])
                    out["conv_id"][n - 1] = row.conv_id
                    out["turn_idx"][n - 1] = row.turn_idx
                    out["bank"][n - 1] = "HTML"
                    out["span_start"][n - 1] = s["span_start"]
                    out["span_end"][n - 1] = s["span_end"]
                    out["span_text"][n - 1] = s["text"]
                    out["desc_parts"][n - 1] = []
                    out["cells"][n - 1] = []
                continue
            psm = None if pd.isna(row.p_start_mon) else int(row.p_start_mon)
            psy = None if pd.isna(row.p_start_year) else int(row.p_start_year)
            pey = None if pd.isna(row.p_end_year) else int(row.p_end_year)
            recs = _parse_doc(row.doc, row.kind)
            for (page, ls, le, ss, se, stext, dte, vd, wdr, dep, bal, ref,
                 dparts, cells) in recs:
                out["conv_id"].append(row.conv_id)
                out["turn_idx"].append(row.turn_idx)
                out["bank"].append(row.kind)
                out["page"].append(page)
                out["line_start"].append(ls)
                out["line_end"].append(le)
                out["span_start"].append(ss)
                out["span_end"].append(se)
                out["span_text"].append(stext)
                out["date_cell"].append(dte)
                out["vdate_cell"].append(vd)
                out["wdr_cell"].append(wdr)
                out["dep_cell"].append(dep)
                out["bal_cell"].append(bal)
                out["ref_cell"].append(ref)
                out["desc_parts"].append(dparts)
                out["cells"].append(cells)
                out["p_start_mon"].append(psm)
                out["p_start_year"].append(psy)
                out["p_end_year"].append(pey)
        if out["conv_id"]:
            # empty frames are skipped: all-empty object columns cannot be
            # Arrow-converted to array<string>/struct types
            yield pd.DataFrame(out)
