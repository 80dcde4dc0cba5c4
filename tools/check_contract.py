"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir,
compare row count + column names + order-insensitive canonical values.
"""
from __future__ import annotations

import sys
import os
import decimal
import datetime

sys.path.insert(0, "/root/repo")
import duckdb


def canon_cell(v):
    """Faithful to the driver: values stringify AS THEIR OWN TYPE.
    Decimal('511634.00') is NOT laundered through float (that masked the
    round-1 hash failures) — a Spark Decimal column vs a DuckDB float64
    column must FAIL here exactly like it fails the driver's hash."""
    import numbers
    try:
        import pandas as pd
        if v is None or (not isinstance(v, str) and pd.isna(v)):
            return ""
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, numbers.Integral):
        return str(int(v))
    if isinstance(v, numbers.Real):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return (v.date().isoformat() if (v.hour, v.minute, v.second) == (0, 0, 0)
                else v.isoformat())
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for t in df_pandas[cols].itertuples(index=False):
        rows.append(tuple(canon_cell(v) for v in t))
    rows.sort()
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    import __spark_entry__ as entry_mod
    from bank_statement_pdf_parser_spark.session import get_spark
    spark = get_spark(app="contract-check", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in os_:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        sc, sr = canon(sdf)
        dc, dr = canon(ddf)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failures += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            failures += 1
        elif sr != dr:
            diff_a = [r for r in sr if r not in set(dr)][:3]
            diff_b = [r for r in dr if r not in set(sr)][:3]
            print(f"FAIL {name}: values differ; spark-only={diff_a} duck-only={diff_b}")
            failures += 1
        else:
            # wall time catches plan pathologies (a round-3 optimizer
            # trap made one green query take minutes) before they eat
            # the driver's budget
            print(f"OK   {name}: {len(sr)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
    print(f"\n{failures} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
