"""V1: running-balance consistency check (SURVEY.md §2.9).

"Clean" output (README.md:2) implies internal consistency: within one
statement, balance[i] - balance[i-1] must equal credit[i] - debit[i].
Violations are counted to metrics, never fatal — real statements carry
fee lines and opening balances the parser may legitimately skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def balance_check(transactions: DataFrame, tol: str = "0.00") -> DataFrame:
    """Adds prev_balance/delta/balance_ok per txn (W3 lag window)."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("txn_idx")
    prev = F.lag("balance").over(w)
    delta = (F.coalesce(F.col("credit"), F.lit(0))
             - F.coalesce(F.col("debit"), F.lit(0)))
    ok = (prev.isNull()
          | (F.abs(F.col("balance") - prev - delta) <= F.lit(tol).cast(
              "decimal(18,2)")))
    return (transactions
            .withColumn("prev_balance", prev)
            .withColumn("delta", delta.cast("decimal(18,2)"))
            .withColumn("balance_ok", ok))


def balance_violations(transactions: DataFrame) -> DataFrame:
    """Per-document violation counts -> metrics sink."""
    return (balance_check(transactions)
            .groupBy("conv_id", "turn_idx", "bank")
            .agg(F.count("*").alias("n_txns"),
                 F.sum((~F.col("balance_ok")).cast("int")).alias("n_bad")))
