"""PII redaction for training-data curation — the scrub stage that
replaces personal identifiers with typed placeholder tokens before a
corpus is used for training. Pure Catalyst `regexp_replace` chains
(whole-stage codegen, no UDFs), so the scrub costs one projection over
the scan with nothing shuffled.

Pattern dialect is deliberately the INTERSECTION of Java regex (Spark)
and RE2 (DuckDB and most scan-side engines): character classes,
bounded repetition, and ASCII `\\b` word boundaries only — no
backreferences, no lookaround — so the same pattern strings drive both
the engine and the SQL oracle byte-for-byte. Replacement order is part
of the contract: patterns apply in the declared sequence, and a match
consumed by an earlier pattern (an email's digit run, say) is not
re-matched by a later one because the placeholder contains no
pattern-matchable characters.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F

# (name, pattern, replacement) applied IN ORDER; placeholders use <>
# which no pattern matches, so chaining is confluent.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone",
     "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
     "<PHONE>"),
    ("longnum",
     "\\b[0-9]{10,}\\b",
     "<ACCT>"),
)


def redact_pii(text: Column) -> Column:
    """Text with every PII_PATTERNS match replaced by its placeholder
    (all occurrences, ordered chain)."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Exact per-pattern match counts, chain-order semantics (audit
    metric: how much was scrubbed). Each pattern is counted on the
    progressively-redacted text exactly as the chain sees it, so
    counts always sum to the number of placeholders inserted (for
    overlapping matches this differs from counting every pattern on
    the original text — ADVICE r6)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, rep in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, rep)
    return out
