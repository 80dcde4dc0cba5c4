"""Arrow-vectorized structural tokenizer fast path (round 7, guide §4.2).

`mapInArrow` kernel for the extraction's per-consumer record profiles:
documents that satisfy a strict eligibility predicate are parsed with
vectorized `pyarrow.compute` / numpy kernels — RE2 line classification
over ALL lines of a batch at once, offset arithmetic as cumsums, field
cells as vectorized codepoint slices of the anchor-line array — so no
per-line Python loop and (for the vectorized subset) no per-record
Python object ever exists. Everything else falls back, per document,
to the frozen python parser (`tokenize.py`), which remains the single
normative implementation.

Eligibility is chosen so every vectorized operation is EXACTLY
equivalent to the python/oracle semantics, not approximately:

- kind in {UOB, DBS, HDFC} (stream-table slicing; OCBC lattice and
  HTML keep their python kernels);
- pure ASCII and no [\\v\\f\\x1c-\\x1f]: python's unicode `\\s` /
  `str.rstrip()` then coincide with RE2's `[\\t\\n\\f\\r ]` and an
  explicit `" \\t\\r"` rtrim on the split lines, and the absence of
  `\\f` means single page — no D4 frequency rule, page == 1;
- every anchor line exactly STREAM_LINE_W wide: the frozen fixed
  SLICES apply (no D7 inference);
- no continuation lines (every anchor group is single-line): no D9
  merge, span_end = anchor offset + rstripped length.

D11 page-carry dedup IS handled vectorized (first occurrence per
duplicate anchor text, C-level hashing). Any document failing a
predicate routes to the python kernel in the same batch; the corpus
mix therefore never changes results, only the cost of the eligible
subset. Equivalence is enforced by tests/test_operators.py::
test_arrow_kernel_matches_pandas on a corpus that straddles every
eligibility boundary, plus the full oracle-equality/property suites
(extract_all wires this kernel for the spans/transactions branches).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec
from .tokenize import _SPAN_COLS, _TXN_COLS, tokenize_kernel

_FAST_BANKS = ("UOB", "DBS", "HDFC")
# chars that break python<->RE2 whitespace equivalence, plus the page
# separator \f (multi-page docs use the python path anyway)
_BAD_CHARS_RX = "[\x0b\x0c\x1c-\x1f]"
_RTRIM_SET = " \t\r"

_CELL_STRUCT = pa.struct([("start", pa.int32()), ("end", pa.int32()),
                          ("text", pa.string())])
_TYPES = {
    "conv_id": pa.string(), "turn_idx": pa.int32(), "bank": pa.string(),
    "page": pa.int32(), "line_start": pa.int32(), "line_end": pa.int32(),
    "span_start": pa.int32(), "span_end": pa.int32(),
    "span_text": pa.string(), "date_cell": pa.string(),
    "vdate_cell": pa.string(), "wdr_cell": pa.string(),
    "dep_cell": pa.string(), "bal_cell": pa.string(),
    "ref_cell": pa.string(), "desc_parts": pa.list_(pa.string()),
    "cells": pa.list_(_CELL_STRUCT),
    "p_start_mon": pa.int32(), "p_start_year": pa.int32(),
    "p_end_year": pa.int32(),
}

_PROFILE_COLS = {"transactions": _TXN_COLS, "spans": _SPAN_COLS}


def _schema_for(profile: str) -> pa.Schema:
    return pa.schema([(c, _TYPES[c]) for c in _PROFILE_COLS[profile]])


def _fast_bank_records(bank: str, docs: pa.Array, profile: str):
    """Vectorized parse of one bank's ASCII single-page docs.

    Returns (per-record doc index ndarray, {col: pa.Array} of the
    record-level columns, ndarray of doc indices needing the python
    fallback). Doc indices index `docs`.
    """
    n_docs = len(docs)
    ll = pc.split_pattern(docs, spec.LINE_SEP)
    doc_offs = ll.offsets.to_numpy()          # len n_docs+1
    flat = ll.values
    lines_per_doc = np.diff(doc_offs)
    doc_of_line = np.repeat(np.arange(n_docs), lines_per_doc)

    boiler = pc.match_substring_regex(
        flat, spec.boiler_rx_combined(bank)).to_numpy(zero_copy_only=False)
    anchor = pc.match_substring_regex(
        flat, spec.ANCHOR_RX[bank]).to_numpy(zero_copy_only=False)
    anchor &= ~boiler                          # boiler precedence
    line_len = pc.utf8_length(flat).to_numpy().astype(np.int64)

    # offset of each line within its doc (lines + 1-char separators)
    cum = np.concatenate(([0], np.cumsum(line_len + 1)[:-1]))
    doc_start_flat = doc_offs[:-1]
    line_off = cum - np.repeat(cum[doc_start_flat], lines_per_doc)
    line_idx = np.arange(len(flat)) - np.repeat(doc_start_flat,
                                                lines_per_doc)

    # group-within-doc: cumsum of anchors, reset per doc
    ac = np.cumsum(anchor)
    base = ac[doc_start_flat] - anchor[doc_start_flat]
    within = ac - np.repeat(base, lines_per_doc)

    # eligibility refinements (per doc)
    cont = (~boiler) & (~anchor) & (within > 0)
    has_cont = np.bincount(doc_of_line[cont], minlength=n_docs) > 0
    w = spec.STREAM_LINE_W[bank]
    bad_w = anchor & (line_len != w)
    has_bad_w = np.bincount(doc_of_line[bad_w], minlength=n_docs) > 0
    doc_ok = ~(has_cont | has_bad_w)
    fallback_docs = np.flatnonzero(~doc_ok)

    a_mask = anchor & doc_ok[doc_of_line]
    a_idx = np.flatnonzero(a_mask)
    if a_idx.size == 0:
        return a_idx, {}, fallback_docs
    a_doc = doc_of_line[a_idx]
    a_lines = flat.take(pa.array(a_idx))

    # D11 page-carry dedup: first occurrence per (doc, raw anchor)
    import pandas as pd
    dup = pd.DataFrame(
        {"d": a_doc,
         "s": a_lines.to_pandas()}).duplicated().to_numpy()
    if dup.any():
        keep = ~dup
        a_idx, a_doc = a_idx[keep], a_doc[keep]
        a_lines = a_lines.take(pa.array(np.flatnonzero(keep)))

    n = a_idx.size
    sl = spec.SLICES[bank]
    cols: dict[str, pa.Array] = {
        "bank": pa.array(np.full(n, bank, dtype=object), pa.string()),
        "page": pa.array(np.ones(n, dtype=np.int32), pa.int32()),
        "line_start": pa.array(line_idx[a_idx].astype(np.int32)),
        "line_end": pa.array(line_idx[a_idx].astype(np.int32)),
        "span_start": pa.array(line_off[a_idx].astype(np.int32)),
    }

    def cut(name):
        s, e = sl[name]
        return pc.utf8_slice_codeunits(a_lines, s, e)

    if profile in ("transactions", "full"):
        field_of = {"date_cell": "date", "vdate_cell": "value_date",
                    "wdr_cell": ("debit" if bank == "DBS"
                                 else "withdrawal"),
                    "dep_cell": ("credit" if bank == "DBS"
                                 else "deposit"),
                    "bal_cell": "balance",
                    "ref_cell": "ref"}
        for out_name, key in field_of.items():
            cols[out_name] = (cut(key) if key in sl
                              else pa.nulls(n, pa.string()))
        cols["desc_parts"] = pa.ListArray.from_arrays(
            np.arange(n + 1, dtype=np.int32), cut("description"))
    if profile in ("spans", "full"):
        txt = pc.utf8_rtrim(a_lines, _RTRIM_SET)
        cols["span_text"] = txt
        cols["span_end"] = pa.array(
            (line_off[a_idx]
             + pc.utf8_length(txt).to_numpy()).astype(np.int32))
        cols["cells"] = pa.ListArray.from_arrays(
            np.zeros(n + 1, dtype=np.int32),
            pa.array([], _CELL_STRUCT))
    return a_doc, cols, fallback_docs


def tokenize_arrow_kernel(profile: str):
    """mapInArrow kernel for the given output profile ('transactions'
    or 'spans'): vectorized fast path + per-doc python fallback. The
    'full' staged-records profile keeps the pandas kernel
    (tokenize.tokenize_records) — sink staging and streaming are
    unchanged."""
    cols_out = _PROFILE_COLS[profile]
    schema = _schema_for(profile)
    py_kernel = tokenize_kernel(profile)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            kinds = batch.column("kind")
            docs = batch.column("doc")
            ascii_ok = pc.string_is_ascii(docs)
            bad = pc.match_substring_regex(docs, _BAD_CHARS_RX)
            clean = pc.and_kleene(ascii_ok, pc.invert(bad))
            clean_np = clean.to_numpy(zero_copy_only=False)
            # nulls (shouldn't occur on the turns contract) -> python
            clean_np = np.where(pd_isna(clean_np), False, clean_np) \
                .astype(bool)
            kinds_np = kinds.to_numpy(zero_copy_only=False)

            py_rows = np.ones(batch.num_rows, dtype=bool)
            for bank in _FAST_BANKS:
                bank_idx = np.flatnonzero((kinds_np == bank) & clean_np)
                if bank_idx.size == 0:
                    continue
                bdocs = docs.take(pa.array(bank_idx))
                a_doc, cols, fb = _fast_bank_records(bank, bdocs, profile)
                py_rows[bank_idx] = False
                if fb.size:
                    py_rows[bank_idx[fb]] = True
                if len(a_doc) == 0:
                    continue
                # record-level row index into the ORIGINAL batch
                rec_row = pa.array(bank_idx[a_doc])
                arrays = []
                for c in cols_out:
                    if c in cols:
                        arrays.append(cols[c])
                    else:  # conv_id / turn_idx / p_* ride from input
                        arrays.append(
                            batch.column(c).take(rec_row)
                            .cast(_TYPES[c]))
                yield pa.RecordBatch.from_arrays(arrays, schema=schema)

            fb_idx = np.flatnonzero(py_rows)
            if fb_idx.size:
                sub = batch.take(pa.array(fb_idx)).to_pandas()
                for pdf_out in py_kernel(iter([sub])):
                    yield pa.RecordBatch.from_pandas(
                        pdf_out, schema=schema, preserve_index=False)

    return kernel


def pd_isna(arr):
    import pandas as pd
    return pd.isna(arr)
