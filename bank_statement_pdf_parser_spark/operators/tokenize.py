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

Inside the UDF, per-core throughput is the engine's ceiling, so the
kernel is shaped around the measured hot spots (round-4 profile):

- ONE combined `boiler|anchor` alternation match per line instead of
  two passes (boiler alternatives first, so precedence is identical to
  the sequential checks);
- records accumulate as full row TUPLES and the output frame is built
  by `zip(*rows)` into object ndarrays concatenated without block
  consolidation — 3x faster to build than per-column list appends +
  `pd.DataFrame(dict)`, and ~2x faster for Arrow to serialize (object
  columns skip pandas' numeric re-inference);
- stream-table field cells are cut with precomputed slice locals, not
  a per-record closure;
- line offsets come from one C-level `itertools.accumulate`, and the
  frequency-rule strip pass only runs on multi-page documents.

All of this is plumbing only: `_parse_doc` output is byte-identical to
the oracle (`oracle/parser.py`) and the relational plan — the frozen
spec triple-equality (CLAUDE.md) is untouched.
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import accumulate, chain

import numpy as np
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

# (date, value_date, withdrawal-like, deposit-like, balance, ref) SLICES
# keys per bank; None = field absent for that bank.
_FIELD_KEYS = {
    "DBS": ("date", "value_date", "debit", "credit", "balance", None),
    "HDFC": ("date", "value_date", "withdrawal", "deposit", "balance",
             "ref"),
    "UOB": ("date", None, "withdrawal", "deposit", "balance", None),
}


def _combined_rx(bank: str):
    """One alternation: boiler patterns first (same precedence as the
    sequential boiler-then-anchor checks), anchor as named group A."""
    return spec.rx("(?:" + spec.boiler_rx_combined(bank) + ")|(?P<A>"
                   + spec.ANCHOR_RX[bank] + ")")


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
    comb_match = _combined_rx(bank).match

    pages = doc.split(spec.PAGE_SEP)
    lines: list[str] = []
    page_of: list[int] = []
    page_line_lists = []
    for pi, page in enumerate(pages):
        pl = page.split(spec.LINE_SEP)
        page_line_lists.append(pl)
        lines.extend(pl)
        page_of.extend([pi + 1] * len(pl))
    # offset of line i = sum(len+1 of previous lines); the +1 covers both
    # '\n' within a page and the '\f' between pages (single-char each).
    offs = list(accumulate(chain((0,), (len(r) + 1 for r in lines))))

    if len(pages) >= spec.FREQ_RULE_MIN_PAGES:
        page_sets = [set(map(str.strip, pl)) for pl in page_line_lists]
        freq = set.intersection(*page_sets)
    else:
        freq = None

    # content lines -> transaction groups (running anchor sessionization)
    groups: list[list[int]] = []
    anchor_raws: list[str] = []
    append_group = groups.append
    append_anchor = anchor_raws.append
    for i, raw in enumerate(lines):
        m = comb_match(raw)
        if m is not None and m.lastgroup != "A":
            continue  # boilerplate (regex rule)
        if freq is not None and raw.strip() in freq:
            continue  # boilerplate (frequency rule)
        if m is not None:
            append_group([i])
            append_anchor(raw)
        elif groups:
            groups[-1].append(i)

    seen: set[str] = set()
    records = []
    append_record = records.append
    if bank == "OCBC":
        for g in groups:
            a = g[0]
            a_raw = lines[a]
            if a_raw in seen:  # D11 page-carry dedup, keep first
                continue
            seen.add(a_raw)
            last = g[-1]
            span_start = offs[a]
            span_end = offs[last] + len(lines[last].rstrip())
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
            append_record(
                (page_of[a], a, last, span_start, span_end,
                 doc[span_start:span_end], a_cells.get("date"), None,
                 a_cells.get("withdrawal"), a_cells.get("deposit"),
                 a_cells.get("balance"), None, desc_parts, cells_all))
        return records

    if not groups:
        return records
    # D7: fixed SLICES for spec-width layouts, whitespace-gap inference
    # otherwise (frozen rule in spec.infer_stream_slices)
    sl = spec.infer_stream_slices(anchor_raws, bank)
    cs, ce = sl["description"]
    dk, vk, wk, pk, bk, rk = _FIELD_KEYS[bank]
    d0, d1 = sl[dk]
    v01 = sl[vk] if vk else None
    w0, w1 = sl[wk]
    p0, p1 = sl[pk]
    b0, b1 = sl[bk]
    r01 = sl[rk] if rk else None
    for g in groups:
        a = g[0]
        a_raw = lines[a]
        if a_raw in seen:  # D11 page-carry dedup, keep first
            continue
        seen.add(a_raw)
        last = g[-1]
        span_start = offs[a]
        span_end = offs[last] + len(lines[last].rstrip())
        desc_parts = [a_raw[cs:ce]]
        desc_parts += [lines[li][cs:ce] for li in g[1:]]
        append_record(
            (page_of[a], a, last, span_start, span_end,
             doc[span_start:span_end], a_raw[d0:d1],
             a_raw[v01[0]:v01[1]] if v01 else None,
             a_raw[w0:w1], a_raw[p0:p1], a_raw[b0:b1],
             a_raw[r01[0]:r01[1]] if r01 else None, desc_parts, []))
    return records


def tokenize_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: turn rows -> records, ONE raw-text pass.

    Statement turns yield transaction records; HTML turns yield one
    pseudo-record per main-content span (bank='HTML', span fields set,
    cell/amount fields NULL — same D5 logic as operators/html.py, fused
    here so spans AND transactions derive from a single scan of the
    corpus: at 100 TB a second raw pass for the HTML branch would be
    the dominant extra cost)."""
    isna = pd.isna
    for pdf in batches:
        rows: list[tuple] = []
        append = rows.append
        for cid, ti, doc, kind, psm, psy, pey in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["doc"], pdf["kind"],
                pdf["p_start_mon"], pdf["p_start_year"],
                pdf["p_end_year"]):
            if kind == "HTML":
                for s in _html_spans(doc):
                    append((cid, ti, "HTML", None, None, None,
                            s["span_start"], s["span_end"], s["text"],
                            None, None, None, None, None, None, [], [],
                            None, None, None))
                continue
            tail = (None if isna(psm) else int(psm),
                    None if isna(psy) else int(psy),
                    None if isna(pey) else int(pey))
            head = (cid, ti, kind)
            for rec in _parse_doc(doc, kind):
                append(head + rec + tail)
        if rows:
            # empty frames are skipped: all-empty object columns cannot
            # be Arrow-converted to array<string>/struct types.
            # Column-major object arrays, concatenated WITHOUT block
            # consolidation (a dict ctor would vstack all columns into
            # one block) — see module docstring for the measurements.
            series = []
            for name, col in zip(_RECORD_COLS, zip(*rows)):
                arr = np.empty(len(col), dtype=object)
                arr[:] = col
                series.append(pd.Series(arr, name=name, copy=False))
            yield pd.concat(series, axis=1, copy=False)
