"""S5: standardized tabular sink.

The reference's terminal step is "outputs a clean, standardized Excel
file" (/root/reference/README.md:2). Distributed outputs are
Parquet/CSV (the scalable equivalents of that standardized table); the
literal .xlsx is inherently a single-file, driver-side convenience, so
it is a `limit(n).toPandas()` tail gated on openpyxl (not installed in
this sandbox -> falls back to CSV next to the requested path).
"""

from __future__ import annotations

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


def write_excel_preview(df: DataFrame, path: str, limit: int = 10_000) -> str:
    """Driver-side .xlsx tail of the standardized table; CSV fallback
    when openpyxl is unavailable. Returns the path actually written."""
    pdf = df.limit(limit).toPandas()
    try:
        import openpyxl  # noqa: F401
        pdf.to_excel(path, index=False)
        return path
    except ImportError:
        alt = path.rsplit(".", 1)[0] + ".csv"
        pdf.to_csv(alt, index=False)
        return alt
