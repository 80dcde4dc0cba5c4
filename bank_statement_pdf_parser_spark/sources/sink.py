"""S5: standardized tabular sink.

The reference's terminal step is "outputs a clean, standardized Excel
file" (/root/reference/README.md:2). Distributed outputs are
Parquet/CSV (the scalable equivalents of that standardized table); the
literal .xlsx is inherently a single-file, driver-side convenience —
written natively here as minimal OOXML (stdlib zipfile + XML, round 6:
inline strings so no sharedStrings part, numbers as <v>), so the
sandbox needs no openpyxl and the output is deterministic. openpyxl,
when present, is still preferred for its richer type handling.
"""

from __future__ import annotations

import datetime
import decimal
import numbers
import re
import zipfile

import numpy as _np
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame


def write_standardized(df: DataFrame, path: str, fmt: str = "parquet",
                       partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        w.option("header", "true").csv(path)
    else:
        raise ValueError(fmt)


def _col_ref(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ... (bijective b26)."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


_XLSX_STATIC = {
    "[Content_Types].xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        "</Types>"),
    "_rels/.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>"),
    "xl/workbook.xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"),
    "xl/_rels/workbook.xml.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        "</Relationships>"),
}


def _cell_xml(ref: str, v) -> str:
    if isinstance(v, _np.generic):
        # numpy scalars (np.bool_, np.int64, ...) from pandas
        # itertuples are not instances of bool/numbers.Integral, so
        # without this they would all fall through to the inline-string
        # branch (ADVICE r6: bools were written as 'True'/'False'
        # strings). .item() yields the native Python scalar.
        v = v.item()
    if v is None:
        return ""
    if isinstance(v, float) and v != v:                 # NaN
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (numbers.Integral, float, decimal.Decimal)):
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, (datetime.datetime, datetime.date)):
        v = v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
            else v.isoformat()
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(_xstring(str(v)))}</t></is></c>")


_XESC = re.compile("_x[0-9A-Fa-f]{4}_")


def _xstring(s: str) -> str:
    """ECMA-376 ST_Xstring encoding: characters illegal in XML 1.0
    (control chars, U+FFFE/F) AND carriage return (XML parsers
    normalize a literal \r in text to \n) become _xHHHH_;
    pre-existing literal _xHHHH_ runs are protected as
    _x005F_xHHHH_. read_xlsx_rows reverses both."""
    s = _XESC.sub(lambda m: "_x005F" + m.group(0), s)
    return "".join(
        c if (c in "\t\n" or 0x20 <= ord(c) not in (0xFFFE, 0xFFFF))
        else f"_x{ord(c):04X}_" for c in s)


def _xstring_decode(s: str) -> str:
    return _XESC.sub(lambda m: chr(int(m.group(0)[2:6], 16)), s)


def write_xlsx(header: list[str], rows, path: str) -> None:
    """Minimal spec-conformant .xlsx (ECMA-376 SpreadsheetML) via
    stdlib zipfile: one worksheet, inline strings (no sharedStrings
    part), numbers/bools as native cell types, None/NaN as blank
    cells. Driver-side by nature — the distributed outputs stay
    parquet/CSV."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    all_rows = [list(header)] + [list(r) for r in rows]
    for ri, row in enumerate(all_rows, start=1):
        parts.append(f'<row r="{ri}">')
        for ci, v in enumerate(row):
            parts.append(_cell_xml(f"{_col_ref(ci)}{ri}", v))
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, body in _XLSX_STATIC.items():
            z.writestr(name, body)
        z.writestr("xl/worksheets/sheet1.xml", "".join(parts))


def read_xlsx_rows(path: str) -> list[list]:
    """Companion reader (stdlib zip + ElementTree): header + typed
    rows back out of a write_xlsx workbook — the round-trip check the
    sandbox can run without openpyxl. Numbers come back as float (or
    int when exact), inline strings as str, blanks as None."""
    import xml.etree.ElementTree as ET
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in root.iter(f"{ns}row"):
        cells = {}
        for c in row.iter(f"{ns}c"):
            ref = c.attrib["r"]
            ci = 0
            for ch in ref:
                if ch.isalpha():
                    ci = ci * 26 + (ord(ch) - ord("A") + 1)
                else:
                    break
            ci -= 1
            t = c.attrib.get("t", "n")
            if t == "inlineStr":
                tnode = c.find(f"{ns}is/{ns}t")
                cells[ci] = "" if tnode is None else _xstring_decode(
                    tnode.text or "")
            else:
                vnode = c.find(f"{ns}v")
                if vnode is None:
                    cells[ci] = None
                elif t == "b":
                    cells[ci] = bool(int(vnode.text))
                else:
                    f = float(vnode.text)
                    cells[ci] = int(f) if f.is_integer() else f
        width = max(cells) + 1 if cells else 0
        out.append([cells.get(i) for i in range(width)])
    # trailing blank cells emit no XML — pad to the table width so
    # every row aligns with the header
    width = max((len(r) for r in out), default=0)
    return [r + [None] * (width - len(r)) for r in out]


def write_excel_preview(df: DataFrame, path: str, limit: int = 10_000) -> str:
    """Driver-side .xlsx tail of the standardized table. openpyxl when
    available (richer types); otherwise the stdlib OOXML writer above —
    a real .xlsx either way. Returns the path written."""
    pdf = df.limit(limit).toPandas()
    try:
        import openpyxl  # noqa: F401
        pdf.to_excel(path, index=False)
    except ImportError:
        write_xlsx([str(c) for c in pdf.columns],
                   (tuple(r) for r in pdf.itertuples(index=False)),
                   path)
    return path
