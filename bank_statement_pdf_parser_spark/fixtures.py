"""Deterministic synthetic transcript generator (SURVEY.md S3).

The reference ships no sample PDFs (`/root/reference/` holds only a
2-line README + stock .gitignore), so fixtures are generated to the
frozen FIXTURES.md spec: multi-turn agent transcripts whose `text` /
`tool` payloads embed UOB/DBS/OCBC/HDFC statement text, HTML pages,
plain-chat noise, and adversarial statements (page breaks mid
transaction, repeated boilerplate, parenthesised negatives, CR/DR
markers, year-less OCBC dates, page-carry duplicate rows).

Everything is seeded — same (seed, n_convs) => byte-identical rows.
No external data.
"""

from __future__ import annotations

import base64
import json
import random
from datetime import date, datetime, timedelta

from . import spec

EPOCH = datetime(2026, 1, 1, 0, 0, 0)

WORDS = (
    "transfer payment salary invoice refund grocery utilities rent "
    "dividend interest subscription insurance topup withdrawal atm "
    "cheque giro fastpay remittance merchant online retail fuel dining"
).split()

NOISE_WORDS = (
    "hello thanks please could you check the latest numbers for me "
    "sure here is what i found let me know if anything looks off "
    "great that matches my records appreciated talk soon regards"
).split()


def _fmt_amount(v: float, paren: bool, marker: str | None) -> str:
    s = f"{abs(v):,.2f}"
    if paren:
        s = f"({s})"
    if marker:
        s = f"{s} {marker}"
    return s


def _desc(rng: random.Random, with_ref: bool) -> str:
    d = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 4))).upper()
    if with_ref:
        d = f"REF {rng.randint(10_000_000, 99_999_999)} {d}"
    return d[:38]


def _cont_descs(rng: random.Random) -> list[str]:
    n = rng.choice([0, 0, 0, 1, 1, 2])
    return [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 4))).upper()[:38]
        for _ in range(n)
    ]


class _Txn:
    __slots__ = ("d", "desc", "conts", "amount", "is_debit", "paren",
                 "marker", "balance", "ref16", "vdate")

    def __init__(self, d, desc, conts, amount, is_debit, paren, marker,
                 balance, ref16, vdate):
        self.d, self.desc, self.conts = d, desc, conts
        self.amount, self.is_debit = amount, is_debit
        self.paren, self.marker = paren, marker
        self.balance, self.ref16, self.vdate = balance, ref16, vdate


def _gen_txns(rng: random.Random, bank: str, start: date, n: int,
              adversarial: bool) -> list[_Txn]:
    bal = round(rng.uniform(10_000, 50_000), 2)
    out = []
    d = start
    for _ in range(n):
        d = d + timedelta(days=rng.randint(0, 3))
        cap = 9_999.99 if bank == "OCBC" else 99_999.99
        amount = round(rng.uniform(1, cap), 2)
        is_debit = rng.random() < 0.55
        paren = adversarial and rng.random() < 0.2
        marker = None
        if adversarial and rng.random() < 0.25:
            # marker overrides the column the amount sits in
            marker = rng.choice(["CR", "DR"])
        effective_credit = (marker == "CR") or (marker is None and not is_debit)
        signed = amount if not paren else -amount
        bal = round(bal + (signed if effective_credit else -signed), 2)
        out.append(_Txn(
            d=d,
            desc=_desc(rng, rng.random() < 0.3),
            conts=_cont_descs(rng),
            amount=amount, is_debit=is_debit, paren=paren, marker=marker,
            balance=bal,
            ref16=f"CHQ{rng.randint(10_000_000, 99_999_999)}",
            vdate=d + timedelta(days=rng.randint(0, 2)),
        ))
    return out


def _amount_cell(t: _Txn, width: int) -> tuple[str, str]:
    """(withdrawal_cell, deposit_cell) honouring the column the txn sits in."""
    cell = _fmt_amount(t.amount, t.paren, t.marker)
    if t.is_debit:
        return cell.rjust(width), " " * width
    return " " * width, cell.rjust(width)


def _bal_cell(t: _Txn, width: int) -> str:
    return _fmt_amount(t.balance, t.balance < 0, None).rjust(width)


def _render_lines(bank: str, t: _Txn) -> list[str]:
    """Anchor + continuation physical lines, exact frozen widths."""
    if bank == "UOB":
        w, dep = _amount_cell(t, 16)
        date_s = t.d.strftime("%d ") + spec.MONTHS[t.d.month - 1] + t.d.strftime(" %Y")
        lines = [f"{date_s:<12}{t.desc:<40}{w}{dep}{_bal_cell(t, 16)}"]
        lines += [f"{'':<12}{c:<40}{'':<48}" for c in t.conts]
        return lines
    if bank == "DBS":
        w, dep = _amount_cell(t, 16)
        lines = [
            f"{t.d.strftime('%d/%m/%Y'):<11}{t.vdate.strftime('%d/%m/%Y'):<11}"
            f"{t.desc:<40}{w}{dep}{_bal_cell(t, 16)}"
        ]
        lines += [f"{'':<22}{c:<40}{'':<48}" for c in t.conts]
        return lines
    if bank == "HDFC":
        w, dep = _amount_cell(t, 16)
        yy = t.d.strftime("%d/%m/") + f"{t.d.year % 100:02d}"
        vy = t.vdate.strftime("%d/%m/") + f"{t.vdate.year % 100:02d}"
        lines = [
            f"{yy:<10}{t.desc:<40}{t.ref16:<16}{vy:<10}{w}{dep}{_bal_cell(t, 16)}"
        ]
        lines += [f"{'':<10}{c:<40}{'':<74}" for c in t.conts]
        return lines
    if bank == "OCBC":
        w, dep = _amount_cell(t, 12)
        date_s = t.d.strftime("%d ") + spec.MONTHS[t.d.month - 1]
        lines = [f"|{date_s:<6}|{t.desc:<40}|{w}|{dep}|{_bal_cell(t, 12)}|"]
        lines += [f"| |{c:<40}| | | |" for c in t.conts]
        return lines
    raise ValueError(bank)


def _header(bank: str, rng: random.Random, p_start: date, p_end: date) -> list[str]:
    if bank == "UOB":
        acct = f"{rng.randrange(10**9, 10**10)}"
        per = (f"{p_start.strftime('%d ')}{spec.MONTHS[p_start.month-1]}"
               f"{p_start.strftime(' %Y')} to {p_end.strftime('%d ')}"
               f"{spec.MONTHS[p_end.month-1]}{p_end.strftime(' %Y')}")
        return ["UNITED OVERSEAS BANK LIMITED", f"Account: {acct}",
                f"Statement Period: {per}", ""]
    if bank == "DBS":
        acct = f"{rng.randrange(10**8, 10**9)}"
        return ["DBS BANK LTD", f"Account No: {acct}",
                f"Statement Date: {p_end.strftime('%d/%m/%Y')}", ""]
    if bank == "OCBC":
        acct = f"{rng.randrange(10**11, 10**12)}"
        per = (f"{p_start.strftime('%d ')}{spec.MONTHS[p_start.month-1]}"
               f"{p_start.strftime(' %Y')} - {p_end.strftime('%d ')}"
               f"{spec.MONTHS[p_end.month-1]}{p_end.strftime(' %Y')}")
        return ["OCBC BANK", f"Account {acct}", f"Period {per}", ""]
    if bank == "HDFC":
        acct = f"{rng.randrange(10**13, 10**14)}"
        return ["HDFC BANK LTD", f"A/c No: {acct}",
                f"Statement From {p_start.strftime('%d/%m/')}"
                f"{p_start.year % 100:02d} To {p_end.strftime('%d/%m/')}"
                f"{p_end.year % 100:02d}", ""]
    raise ValueError(bank)


def _footer(bank: str, page: int, n_pages: int) -> list[str]:
    if bank == "UOB":
        return [f"Page {page} of {n_pages}", "UOB is regulated by MAS"]
    if bank == "DBS":
        return [f"Page {page}/{n_pages}", "Deposit Insurance Scheme applies"]
    if bank == "OCBC":
        return [f"Page {page} of {n_pages}", "Co. Reg. No. 193200032W"]
    if bank == "HDFC":
        return [f"Page No .: {page}", "HDFC BANK is registered with RBI"]
    raise ValueError(bank)


def make_statement(bank: str, rng: random.Random, adversarial: bool) -> str:
    """Render one synthetic statement to the frozen FIXTURES.md §2 spec."""
    n_pages = rng.randint(2, 4) if adversarial else rng.randint(1, 3)
    if bank == "OCBC" and adversarial:
        # year-less dates crossing a year boundary
        p_start = date(2025, rng.choice([10, 11, 12]), rng.randint(1, 28))
        p_end = date(2026, rng.choice([1, 2, 3]), rng.randint(1, 28))
    else:
        y = 2026
        m = rng.randint(1, 9)
        p_start = date(y, m, rng.randint(1, 15))
        p_end = date(y, min(m + rng.randint(0, 2), 12), rng.randint(16, 28))
    txns = _gen_txns(rng, bank, p_start, rng.randint(3, 7) * n_pages, adversarial)
    per_page = max(1, len(txns) // n_pages)

    freq_boiler = (adversarial and rng.random() < 0.7)
    pages: list[list[str]] = []
    i = 0
    carry_conts: list[str] = []
    prev_last_anchor: str | None = None
    for p in range(1, n_pages + 1):
        body: list[str] = []
        boundary_kind = None
        if p > 1 and adversarial and not carry_conts:
            boundary_kind = rng.choice(["carry", "split", None])
        if boundary_kind == "carry" and prev_last_anchor is not None:
            # page-carry duplicate: B/F marker line + repeat of the previous
            # page's last anchor row; both must be dropped exactly once.
            body.append("BALANCE B/F")
            body.append(prev_last_anchor)
        if carry_conts:
            body.extend(carry_conts)
            carry_conts = []
        take = txns[i:i + per_page] if p < n_pages else txns[i:]
        i += len(take)
        for j, t in enumerate(take):
            lines = _render_lines(bank, t)
            is_last = (j == len(take) - 1)
            if (is_last and boundary_kind != "carry" and p < n_pages
                    and adversarial and len(lines) > 1 and rng.random() < 0.6):
                # split txn across the page boundary
                body.extend(lines[:1])
                carry_conts = lines[1:]
            else:
                body.extend(lines)
            if is_last:
                prev_last_anchor = lines[0]
        page_lines = _header(bank, rng, p_start, p_end) + body
        if freq_boiler:
            page_lines.append("All amounts are in SGD unless otherwise stated")
        page_lines += _footer(bank, p, n_pages)
        pages.append(page_lines)
    # retro-fix: footer page counts were rendered with n_pages already; fine.
    return spec.PAGE_SEP.join(spec.LINE_SEP.join(pl) for pl in pages)


def make_html(rng: random.Random) -> str:
    paras = []
    for _ in range(rng.randint(1, 4)):
        words = [rng.choice(WORDS) for _ in range(rng.randint(3, 8))]
        if rng.random() < 0.5:
            words.insert(rng.randrange(len(words)),
                         rng.choice(["&amp;", "&lt;", "&gt;", "&nbsp;"]))
        paras.append("<p>" + " ".join(words) + "</p>")
    return (
        "<html><head><title>Statement portal</title>"
        "<style>body{font:12px sans-serif}</style></head>"
        "<body><nav>Home | Accounts | Logout</nav>"
        f'{spec.HTML_CONTENT_OPEN}{"".join(paras)}{spec.HTML_CONTENT_CLOSE}'
        "<footer>(c) 2026 bank portal</footer></body></html>"
    )


def make_noise(rng: random.Random) -> str:
    return " ".join(rng.choice(NOISE_WORDS) for _ in range(rng.randint(5, 40)))


def gen_transcripts(n_convs: int = 30, seed: int = 42,
                    skew_frac: float = 0.08) -> list[dict]:
    """Rows matching spec.TRANSCRIPTS_DDL. Deterministic in (n_convs, seed)."""
    rows = []
    for ci in range(n_convs):
        rng = random.Random((seed << 20) ^ ci)
        conv_id = f"conv-{ci:06d}"
        n_turns = rng.randint(50, 120) if rng.random() < skew_frac else rng.randint(2, 10)
        for ti in range(n_turns):
            role = ("user", "assistant", "tool")[ti % 3]
            kind = rng.choices(
                ["noise", "statement", "html", "adversarial"],
                weights=[0.45, 0.3, 0.12, 0.13], k=1)[0]
            text: str
            tool: str | None = None
            if kind == "noise":
                text = make_noise(rng)
            elif kind == "html":
                text = make_html(rng)
            else:
                bank = rng.choice(["UOB", "DBS", "OCBC", "HDFC"])
                stmt = make_statement(bank, rng, adversarial=(kind == "adversarial"))
                if role == "tool" and rng.random() < 0.5:
                    tool = json.dumps({
                        "name": "fetch_statement",
                        "encoding": "base64",
                        "payload": base64.b64encode(stmt.encode("utf-8")).decode("ascii"),
                    })
                    text = make_noise(rng)
                else:
                    text = stmt
            rows.append({
                "conv_id": conv_id,
                "turn_idx": ti,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": EPOCH + timedelta(seconds=ci * 3600 + ti * 60),
            })
    return rows


def write_transcripts_parquet(rows: list[dict], path: str,
                              shuffle_seed: int | None = 7,
                              row_group_size: int = 1024,
                              n_files: int = 1) -> None:
    """Write rows via pyarrow; physical order shuffled so nothing may rely
    on it (FIXTURES.md §1). Small row groups + optional multi-file layout
    keep the corpus splittable: Spark's scan parallelism is bounded by
    files x maxPartitionBytes, so a single-file corpus serializes the
    whole read side (a real table is always many files)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(rows)
    if shuffle_seed is not None:
        random.Random(shuffle_seed).shuffle(rows)

    def to_table(chunk):
        return pa.table({
            "conv_id": pa.array([r["conv_id"] for r in chunk], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in chunk], pa.int32()),
            "role": pa.array([r["role"] for r in chunk], pa.string()),
            "text": pa.array([r["text"] for r in chunk], pa.string()),
            "tool": pa.array([r["tool"] for r in chunk], pa.string()),
            "ts": pa.array([r["ts"] for r in chunk], pa.timestamp("us")),
        })

    if n_files <= 1:
        pq.write_table(to_table(rows), path, row_group_size=row_group_size)
        return
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per:(i + 1) * per]
        if chunk:
            pq.write_table(to_table(chunk),
                           os.path.join(path, f"part-{i:05d}.parquet"),
                           row_group_size=row_group_size)
