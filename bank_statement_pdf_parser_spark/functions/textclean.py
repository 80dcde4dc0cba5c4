"""Unicode text canonicalization for corpus curation.

Spark exposes no NFC/NFD normalization builtin (collation-aware
comparison arrived in 4.0, but not a normalize *function*), so this is
one of the few legitimate pandas-UDF sites in the repo: Arrow-batched
transfer, CPython's `unicodedata` (a C extension) per row, NULL-safe.
The scrub runs as a projection — no shuffle — so at 100 TB it costs
one pass over the text column inside whatever job already reads it.

DuckDB's `nfc_normalize` implements the same UAX #15 NFC form, so the
oracle compares md5 of the normalized bytes exactly.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc(s: pd.Series) -> pd.Series:
    import unicodedata
    return s.map(lambda t: None if t is None
                 else unicodedata.normalize("NFC", t))


def nfc_normalize(text: Column) -> Column:
    """NFC-normalized text (canonical composition: combining marks
    fold into precomposed codepoints; singletons map to canonical
    equivalents). Ligature/compatibility folding (NFKC) is *not*
    applied — canonical forms preserve rendering."""
    return nfc(text)
