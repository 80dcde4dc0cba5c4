"""Render driver-provided TPC-H-ish tables into synthetic UOB statements.

This is the self-validating bridge behind `__spark_entry__.entry()` and
the flagship DuckDB cross-checks: each order becomes a one-turn
conversation whose `text` is a spec-exact single-page UOB statement of
its lineitems. Because every cell is derived from integer arithmetic
(`cents = l_quantity*100 + l_linenumber`), an independent ANSI-SQL
oracle can predict the extraction output — dates, decimals, span
offsets, even the raw span text — with zero float-formatting ambiguity.

Rendering is fully distributed Catalyst (rpad/lpad/format_number/
collect_list); no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed geometry of the rendered statement (see oracle SQL in
# __spark_entry__.py, which hard-codes the same numbers)
HDR1 = "UNITED OVERSEAS BANK LIMITED"
FOOT1 = "Page 1 of 1"
FOOT2 = "UOB is regulated by MAS"
LINE_W = 100
FIRST_TXN_OFF = 95  # (28+1)+(19+1)+(44+1)+(0+1)


def money_str(cents: F.Column) -> F.Column:
    """Exact comma-grouped 2dp rendering from integer cents."""
    units = (cents / 100).cast("long")
    frac = F.lpad((cents % 100).cast("string"), 2, "0")
    return F.concat(F.format_number(units, 0), F.lit("."), frac)


def amount_cents(df_cols=None) -> F.Column:
    return (F.col("l_quantity").cast("long") * 100 + F.col("l_linenumber"))


def balance_cents() -> F.Column:
    return (F.col("o_orderkey") % 1_000_000) + 1


def transcripts_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # (orderkey, linenumber, partkey, suppkey, quantity, shipdate) is unique,
    # so rendered anchor lines are unique (no spurious D11 dedup) and the
    # per-order sort below is deterministic despite duplicate linenumbers.
    date_s = F.date_format("l_shipdate", "dd MMM yyyy")
    desc = F.substring(
        F.concat(F.lit("O"), F.col("l_orderkey").cast("string"),
                 F.lit(" L"), F.col("l_linenumber").cast("string"),
                 F.lit(" P"), F.col("l_partkey").cast("string"),
                 F.lit(" S"), F.col("l_suppkey").cast("string")),
        1, 38)
    amt = money_str(amount_cents())
    bal = money_str(balance_cents())
    is_wdr = F.col("l_returnflag") == "R"
    blank16 = F.lit(" " * 16)
    line = F.concat(
        F.rpad(date_s, 12, " "), F.rpad(desc, 40, " "),
        F.when(is_wdr, F.lpad(amt, 16, " ")).otherwise(blank16),
        F.when(is_wdr, blank16).otherwise(F.lpad(amt, 16, " ")),
        F.lpad(bal, 16, " "))

    li = (lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                  "l_quantity", "o_custkey", "o_orderdate",
                  line.alias("line"), F.col("l_shipdate")))

    per_order = li.groupBy("l_orderkey").agg(
        F.first("o_custkey").alias("custkey"),
        F.first("o_orderdate").alias("orderdate"),
        F.date_format(F.min("l_shipdate"), "dd MMM yyyy").alias("d0"),
        F.date_format(F.max("l_shipdate"), "dd MMM yyyy").alias("d1"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
                    "l_shipdate", "line"))),
                lambda x: x["line"]),
            "\n").alias("body"),
    )
    text = F.concat_ws(
        "\n",
        F.lit(HDR1),
        F.concat(F.lit("Account: "),
                 F.lpad(F.col("custkey").cast("string"), 10, "0")),
        F.concat(F.lit("Statement Period: "), F.col("d0"),
                 F.lit(" to "), F.col("d1")),
        F.lit(""),
        F.col("body"),
        F.lit(FOOT1), F.lit(FOOT2))
    return per_order.select(
        F.concat(F.lit("conv-"), F.col("l_orderkey").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("orderdate").alias("ts"))
