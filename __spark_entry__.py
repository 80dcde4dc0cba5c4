"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship extraction: TPC-H-ish orders/lineitems
are rendered (distributed, Catalyst-only) into spec-exact UOB statement
turns, pushed through the full extraction pipeline, and returned as the
normalized `transactions` frame. Because the rendering derives every
cell from integer arithmetic, the DuckDB oracles below predict the
extraction output — decimals, dates, span offsets, raw span text —
exactly (see sources/tpch_bridge.py).

`queries()` covers SURVEY.md §2 operator rows plus the training-data
ops (dedup/token-stats/lang-id/quality/ANN); `oracle_sql()` carries the
matching ANSI SQL for the driver's DuckDB cross-check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # see session.get_spark: the inferred size(e)>0 filter under explode
    # inlines expensive HOF array expressions (x_fingerprint would run
    # O(len^2) per row); the driver's session needs the exclusion too
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    from bank_statement_pdf_parser_spark.session import ensure_shipped
    ensure_shipped(spark)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: full extraction pipeline over TPC-H-rendered statements
# ---------------------------------------------------------------------------

def _flagship_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        transcripts_from_tpch)
    txns = extract_all(transcripts_from_tpch(spark, sf_dir)).transactions
    # Money columns are decimal(18,2) inside the pipeline; the driver's
    # value hash stringifies cells as their own type, so emit them as
    # double to match DuckDB's float64 fetch (exact: every cell is
    # integer-cents/100, and decimal->double is correctly rounded on
    # both engines).
    return txns.select(
        *[F.col(c).cast("double").alias(c)
          if c in ("debit", "credit", "balance") else F.col(c)
          for c in txns.columns])


def _flagship_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        transcripts_from_tpch)
    return extract_all(transcripts_from_tpch(spark, sf_dir)).spans


def _flagship_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-Catalyst cross-implementation, driver-checked against
    the SAME SQL oracle as the fused flagship (the two engine modes are
    also directly compared in tests/test_modes.py)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        transcripts_from_tpch)
    txns = extract_all(transcripts_from_tpch(spark, sf_dir),
                       mode="relational").transactions
    return txns.select(
        *[F.col(c).cast("double").alias(c)
          if c in ("debit", "credit", "balance") else F.col(c)
          for c in txns.columns])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship_transactions(spark, "/root/testdata/sf0.001")


_FLAGSHIP_BASE_SQL = """
WITH li AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_returnflag,
         l.l_shipdate,
         l.l_partkey, l.l_suppkey,
         row_number() OVER (PARTITION BY l.l_orderkey
                            ORDER BY l.l_linenumber, l.l_partkey,
                                     l.l_suppkey, l.l_quantity,
                                     l.l_shipdate) AS rn
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
"""

_FLAGSHIP_TXNS_SQL = _FLAGSHIP_BASE_SQL + """
SELECT 'conv-' || CAST(l_orderkey AS VARCHAR) AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST(rn - 1 AS INTEGER) AS txn_idx,
       'UOB' AS bank,
       CAST(l_shipdate AS DATE) AS txn_date,
       CAST(NULL AS DATE) AS value_date,
       substr('O' || CAST(l_orderkey AS VARCHAR) || ' L'
              || CAST(l_linenumber AS VARCHAR) || ' P'
              || CAST(l_partkey AS VARCHAR) || ' S'
              || CAST(l_suppkey AS VARCHAR), 1, 38) AS description,
       CAST(NULL AS VARCHAR) AS ref,
       CASE WHEN l_returnflag = 'R' THEN CAST(CAST(
          (CAST(l_quantity AS BIGINT)*100 + l_linenumber)/100.0
          AS DECIMAL(18,2)) AS DOUBLE) END AS debit,
       CASE WHEN l_returnflag <> 'R' THEN CAST(CAST(
          (CAST(l_quantity AS BIGINT)*100 + l_linenumber)/100.0
          AS DECIMAL(18,2)) AS DOUBLE) END AS credit,
       CAST(CAST(((l_orderkey % 1000000) + 1)/100.0 AS DECIMAL(18,2))
            AS DOUBLE) AS balance,
       CAST(1 AS INTEGER) AS page,
       CAST(3 + rn AS INTEGER) AS line_start,
       CAST(3 + rn AS INTEGER) AS line_end
FROM li
"""

_FLAGSHIP_SPANS_SQL = _FLAGSHIP_BASE_SQL + """
SELECT 'conv-' || CAST(l_orderkey AS VARCHAR) AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST(rn - 1 AS INTEGER) AS span_idx,
       CAST(95 + (rn-1)*101 AS INTEGER) AS span_start,
       CAST(95 + (rn-1)*101 + 100 AS INTEGER) AS span_end,
       'txn' AS span_kind,
       rpad(strftime(l_shipdate, '%d %b %Y'), 12, ' ')
       || rpad('O' || CAST(l_orderkey AS VARCHAR) || ' L'
               || CAST(l_linenumber AS VARCHAR) || ' P'
               || CAST(l_partkey AS VARCHAR) || ' S'
               || CAST(l_suppkey AS VARCHAR), 40, ' ')
       || CASE WHEN l_returnflag = 'R'
               THEN lpad(format('{:,}', CAST(l_quantity AS BIGINT)) || '.'
                         || lpad(CAST(l_linenumber AS VARCHAR), 2, '0'),
                         16, ' ')
               ELSE repeat(' ', 16) END
       || CASE WHEN l_returnflag <> 'R'
               THEN lpad(format('{:,}', CAST(l_quantity AS BIGINT)) || '.'
                         || lpad(CAST(l_linenumber AS VARCHAR), 2, '0'),
                         16, ' ')
               ELSE repeat(' ', 16) END
       || lpad(format('{:,}', ((l_orderkey % 1000000) + 1) // 100) || '.'
               || lpad(CAST(((l_orderkey % 1000000) + 1) % 100 AS VARCHAR),
                       2, '0'), 16, ' ') AS text
FROM li
"""


# ---------------------------------------------------------------------------
# dialect flagships: DBS (multi-page/continuations/page-carry/freq-
# boilerplate/markers), OCBC (lattice + year inference, incl. cell-span
# offsets), HDFC (yy pivot both sides + ref column)
# ---------------------------------------------------------------------------

def _cast_money(df: DataFrame) -> DataFrame:
    return df.select(
        *[F.col(c).cast("double").alias(c)
          if c in ("debit", "credit", "balance") else F.col(c)
          for c in df.columns])


def _dialect_txns(maker_name: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prep(spark)
        from bank_statement_pdf_parser_spark.plans.extract import extract_all
        from bank_statement_pdf_parser_spark.sources import tpch_bridge
        maker = getattr(tpch_bridge, maker_name)
        return _cast_money(extract_all(maker(spark, sf_dir)).transactions)
    return q


def _q_flagship_ocbc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        ocbc_transcripts)
    return extract_all(ocbc_transcripts(spark, sf_dir)).spans


def _q_flagship_html_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 under the oracle gate: the html bridge corpus has fixed
    geometry, so all three main-span offsets are integer literals."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        html_transcripts)
    return extract_all(html_transcripts(spark, sf_dir)).spans


def _ranked_sql(k: int) -> str:
    return f"""
WITH li0 AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
         l.l_quantity, l.l_returnflag, l.l_linestatus, l.l_shipdate,
         o.o_custkey,
         row_number() OVER (PARTITION BY l.l_orderkey
                            ORDER BY l.l_linenumber, l.l_partkey,
                                     l.l_suppkey, l.l_quantity,
                                     l.l_shipdate) AS rn,
         count(*) OVER (PARTITION BY l.l_orderkey) AS n_li
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), li AS (SELECT * FROM li0 WHERE n_li >= {k} AND rn <= {k})
"""


_AMT_SQL = ("CAST(CAST((CAST(l_quantity AS BIGINT)*100 + l_linenumber)"
            "/100.0 AS DECIMAL(18,2)) AS DOUBLE)")
_BAL_SQL = ("CAST(CAST(((l_orderkey % 1000000) + 1)/100.0 "
            "AS DECIMAL(18,2)) AS DOUBLE)")
_OKEY_SQL = "CAST(l_orderkey AS VARCHAR)"
_BASE_DESC_SQL = (
    "rtrim(substr('O' || CAST(l_orderkey AS VARCHAR) || ' L' "
    "|| CAST(l_linenumber AS VARCHAR) || ' P' "
    "|| CAST(l_partkey AS VARCHAR) || ' S' "
    "|| CAST(l_suppkey AS VARCHAR), 1, 38))")

_FLAGSHIP_DBS_SQL = _ranked_sql(4) + f"""
SELECT 'dbs-' || {_OKEY_SQL} AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST(rn - 1 AS INTEGER) AS txn_idx,
       'DBS' AS bank,
       CAST(l_shipdate AS DATE) AS txn_date,
       CAST(CAST(l_shipdate AS DATE) + (l_linenumber % 7) AS DATE)
           AS value_date,
       CASE WHEN rn = 2
            THEN 'O' || {_OKEY_SQL} || ' CONT O' || {_OKEY_SQL} || ' N2'
            ELSE {_BASE_DESC_SQL} || ' CONT O' || {_OKEY_SQL}
                 || ' N' || CAST(rn AS VARCHAR)
       END AS description,
       CASE WHEN rn = 2 THEN 'K' || {_OKEY_SQL} END AS ref,
       CASE WHEN (l_returnflag = 'R') <> (l_linestatus = 'O')
            THEN {_AMT_SQL} END AS debit,
       CASE WHEN (l_returnflag = 'R') = (l_linestatus = 'O')
            THEN {_AMT_SQL} END AS credit,
       {_BAL_SQL} AS balance,
       CAST(CASE WHEN rn <= 2 THEN 1 WHEN rn = 3 THEN 2 ELSE 3 END
            AS INTEGER) AS page,
       CAST(CASE rn WHEN 1 THEN 4 WHEN 2 THEN 6 WHEN 3 THEN 17 ELSE 26 END
            AS INTEGER) AS line_start,
       CAST(CASE rn WHEN 1 THEN 5 WHEN 2 THEN 7 WHEN 3 THEN 18 ELSE 27 END
            AS INTEGER) AS line_end
FROM li
"""

_FLAGSHIP_OCBC_TXNS_SQL = _ranked_sql(3) + f"""
SELECT 'ocbc-' || {_OKEY_SQL} AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST(rn - 1 AS INTEGER) AS txn_idx,
       'OCBC' AS bank,
       CASE WHEN rn % 2 = 1
            THEN make_date(2025, 12, CAST(EXTRACT(DAY FROM l_shipdate)
                                          AS INTEGER))
            ELSE make_date(2026, 1, CAST(EXTRACT(DAY FROM l_shipdate)
                                         AS INTEGER)) END AS txn_date,
       CAST(NULL AS DATE) AS value_date,
       {_BASE_DESC_SQL} AS description,
       CAST(NULL AS VARCHAR) AS ref,
       CASE WHEN l_returnflag = 'R' THEN {_AMT_SQL} END AS debit,
       CASE WHEN l_returnflag <> 'R' THEN {_AMT_SQL} END AS credit,
       {_BAL_SQL} AS balance,
       CAST(1 AS INTEGER) AS page,
       CAST(3 + rn AS INTEGER) AS line_start,
       CAST(3 + rn AS INTEGER) AS line_end
FROM li
"""

# fixed OCBC geometry: header lines 9/20/32/0 chars -> first lattice line
# starts at offset 65; every lattice line is 88 chars (+1 separator)
_OCBC_SPAN_CTE = _ranked_sql(3) + """
, c AS (SELECT l_orderkey, rn, l_returnflag,
        65 + (rn - 1) * 89 AS off,
        lpad(CAST(EXTRACT(DAY FROM l_shipdate) AS VARCHAR), 2, '0') || ' ' ||
          CASE WHEN rn % 2 = 1 THEN 'Dec' ELSE 'Jan' END AS date6,
        substr('O' || CAST(l_orderkey AS VARCHAR) || ' L'
               || CAST(l_linenumber AS VARCHAR) || ' P'
               || CAST(l_partkey AS VARCHAR) || ' S'
               || CAST(l_suppkey AS VARCHAR), 1, 38) AS d38,
        format('{:,}', CAST(l_quantity AS BIGINT)) || '.'
          || lpad(CAST(l_linenumber AS VARCHAR), 2, '0') AS amt,
        format('{:,}', ((l_orderkey % 1000000) + 1) // 100) || '.'
          || lpad(CAST(((l_orderkey % 1000000) + 1) % 100 AS VARCHAR),
                  2, '0') AS bal
        FROM li)
"""

_FLAGSHIP_OCBC_SPANS_SQL = _OCBC_SPAN_CTE + """
SELECT 'ocbc-' || CAST(l_orderkey AS VARCHAR) AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST((rn - 1) * 5 + k AS INTEGER) AS span_idx,
       CAST(s AS INTEGER) AS span_start,
       CAST(e AS INTEGER) AS span_end,
       kind AS span_kind, text
FROM (
  SELECT *, 0 AS k, off AS s, off + 88 AS e, 'txn' AS kind,
         '|' || date6 || '|' || rpad(d38, 40, ' ') || '|' ||
         CASE WHEN l_returnflag = 'R' THEN lpad(amt, 12, ' ')
              ELSE repeat(' ', 12) END || '|' ||
         CASE WHEN l_returnflag <> 'R' THEN lpad(amt, 12, ' ')
              ELSE repeat(' ', 12) END || '|' ||
         lpad(bal, 12, ' ') || '|' AS text
  FROM c
  UNION ALL
  SELECT *, 1 AS k, off + 1 AS s, off + 7 AS e, 'table_cell' AS kind,
         date6 AS text FROM c
  UNION ALL
  SELECT *, 2 AS k, off + 8 AS s, off + 8 + length(rtrim(d38)) AS e,
         'table_cell' AS kind, rtrim(d38) AS text FROM c
  UNION ALL
  SELECT *, 3 AS k,
         CASE WHEN l_returnflag = 'R' THEN off + 49 + (12 - length(amt))
              ELSE off + 62 + (12 - length(amt)) END AS s,
         CASE WHEN l_returnflag = 'R' THEN off + 61 ELSE off + 74 END AS e,
         'table_cell' AS kind, amt AS text FROM c
  UNION ALL
  SELECT *, 4 AS k, off + 75 + (12 - length(bal)) AS s, off + 87 AS e,
         'table_cell' AS kind, bal AS text FROM c
)
"""

_FLAGSHIP_HTML_SPANS_SQL = """
WITH b AS (
  SELECT o_orderkey,
         lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS okey10,
         lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS cust10,
         lpad(CAST((o_orderkey % 1000000) + 1 AS VARCHAR), 8, '0') AS bal8
  FROM orders)
SELECT 'html-' || CAST(o_orderkey AS VARCHAR) AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST(k AS INTEGER) AS span_idx,
       CAST(s AS INTEGER) AS span_start,
       CAST(e AS INTEGER) AS span_end,
       'main' AS span_kind, text
FROM (
  SELECT o_orderkey, 0 AS k, 62 AS s, 96 AS e,
         'Stmt O' || okey10 || ' & C' || cust10 AS text FROM b
  UNION ALL
  SELECT o_orderkey, 1, 100, 125,
         'Bal B' || bal8 || ' <SGD>' FROM b
  UNION ALL
  SELECT o_orderkey, 2, 130, 150,
         'End' || chr(160) || 'O' || okey10 FROM b
)
"""

# jitter corpus: widths change per (order, turn) but the PARSED values
# are width-independent once D7 inference lands the cuts correctly —
# the oracle predicts them straight from the lineitems.
_FLAGSHIP_JITTER_SQL = _ranked_sql(4) + f"""
SELECT 'jit-' || {_OKEY_SQL} AS conv_id,
       CAST((rn - 1) // 2 AS INTEGER) AS turn_idx,
       CAST((rn - 1) % 2 AS INTEGER) AS txn_idx,
       'UOB' AS bank,
       CAST(l_shipdate AS DATE) AS txn_date,
       CAST(NULL AS DATE) AS value_date,
       {_BASE_DESC_SQL} AS description,
       CAST(NULL AS VARCHAR) AS ref,
       CASE WHEN rn % 2 = 1 THEN {_AMT_SQL} END AS debit,
       CASE WHEN rn % 2 = 0 THEN {_AMT_SQL} END AS credit,
       {_BAL_SQL} AS balance,
       CAST(1 AS INTEGER) AS page,
       CAST(4 + (rn - 1) % 2 AS INTEGER) AS line_start,
       CAST(4 + (rn - 1) % 2 AS INTEGER) AS line_end
FROM li
"""

_FLAGSHIP_HDFC_SQL = _ranked_sql(3) + f"""
SELECT 'hdfc-' || {_OKEY_SQL} AS conv_id,
       CAST(0 AS INTEGER) AS turn_idx,
       CAST(rn - 1 AS INTEGER) AS txn_idx,
       'HDFC' AS bank,
       CAST(l_shipdate AS DATE) AS txn_date,
       make_date(CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) + 30,
                 CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER),
                 LEAST(CAST(EXTRACT(DAY FROM l_shipdate) AS INTEGER), 28))
           AS value_date,
       CASE WHEN rn = 2 THEN 'REF K' || {_OKEY_SQL} || ' O' || {_OKEY_SQL}
            ELSE {_BASE_DESC_SQL} END AS description,
       'CHQ' || lpad(CAST(l_orderkey % 100000000 AS VARCHAR), 8, '0') AS ref,
       CASE WHEN l_returnflag = 'R' THEN {_AMT_SQL} END AS debit,
       CASE WHEN l_returnflag <> 'R' THEN {_AMT_SQL} END AS credit,
       {_BAL_SQL} AS balance,
       CAST(1 AS INTEGER) AS page,
       CAST(3 + rn AS INTEGER) AS line_start,
       CAST(3 + rn AS INTEGER) AS line_end
FROM li
"""


# ---------------------------------------------------------------------------
# operator battery (SURVEY.md §2) + training-data ops
# ---------------------------------------------------------------------------

def _q_p2_filter_project(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "events")
            .filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0))
            .select("event_id", "user_id", "value"))


def _q_p3_classify(spark, sf_dir):
    _prep(spark)
    cls = (F.when(F.col("text").contains("spark"), "spark")
           .when(F.col("text").contains("window"), "window")
           .otherwise("other"))
    return (_t(spark, sf_dir, "documents").select(cls.alias("cls"))
            .groupBy("cls").agg(F.count("*").alias("n")))


def _q_d1_token_count(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens")))


def _q_d3_regex_filter(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents")
            .filter(~F.col("text").rlike("^(the|a) "))
            .select("doc_id", "lang"))


def _q_d4_token_freq(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 200))


def _q_d8_sessionize(spark, sf_dir):
    _prep(spark)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    anchor = F.when(F.col("event_type") == "signup", 1).otherwise(0)
    return (_t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.sum(anchor).over(w).cast("long").alias("sess")))


def _q_d11_dedup(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents").select("text").distinct()
            .agg(F.count("*").cast("long").alias("n_unique")))


def _q_f1_date_bins(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "orders")
            .groupBy(F.year("o_orderdate").cast("long").alias("y"),
                     F.month("o_orderdate").cast("long").alias("m"))
            .agg(F.count("*").alias("n")))


def _q_f2_amount_parse(spark, sf_dir):
    _prep(spark)
    from bank_statement_pdf_parser_spark.functions.normalize import amount_struct
    s = F.concat(
        F.when(F.col("l_returnflag") == "R",
               F.concat(F.lit("("), F.col("l_quantity").cast("long").cast("string"),
                        F.lit(".25)")))
        .otherwise(F.concat(F.col("l_quantity").cast("long").cast("string"),
                            F.lit(".25"))),
        F.when(F.col("l_linestatus") == "O", F.lit(" CR")).otherwise(F.lit("")))
    amt = amount_struct(s)["val"]
    return (_t(spark, sf_dir, "lineitem")
            .select("l_returnflag", amt.alias("amt"))
            .groupBy("l_returnflag")
            .agg(F.sum("amt").cast("double").alias("amt_sum")))


def _q_f8_json(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "events")
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("int").alias("k"))
            .filter(F.col("k") > 50))


def _q_j1_broadcast_join(spark, sf_dir):
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("revenue"),
                 F.count("*").alias("n")))


def _q_j3_anti_join(spark, sf_dir):
    _prep(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("c_mktsegment").agg(F.count("*").alias("n")))


def _q_j4_semi_join(spark, sf_dir):
    _prep(spark)
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (part.join(li, part.p_partkey == li.l_partkey, "left_semi")
            .groupBy("p_brand").agg(F.count("*").alias("n")))


def _q_a1_agg_metrics(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_base_price"),
                 F.count("*").alias("count_order")))


def _q_a2_ordered_collect(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("ts", "event_id", "event_type"))),
                    lambda x: x["event_type"]), ",").alias("seq")))


def _q_a3_minmax(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"),
                 F.min(F.col("ts").cast("date")).alias("first_day"),
                 F.max(F.col("ts").cast("date")).alias("last_day")))


def _q_a4_distinct(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").cast("long").alias("n_users")))


def _q_a5_rollup(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n")))


def _q_w3_lag_delta(spark, sf_dir):
    _prep(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = F.col("value") - F.lag("value").over(w)
    return (_t(spark, sf_dir, "events")
            .select("user_id", d.alias("d"))
            .filter(F.col("d").isNotNull() & (F.col("d") > 50.0))
            .groupBy("user_id").agg(F.count("*").alias("n_jumps")))


def _q_w4_rank_topk(spark, sf_dir):
    _prep(spark)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (_t(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "value"))


def _q_o1_topk_orders(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.col("o_totalprice").cast("decimal(18,2)").alias("total"))
            .orderBy(F.col("total").desc(), "o_orderkey").limit(20)
            .select("o_orderkey", F.col("total").cast("double").alias("total")))


def _q_o3_union(spark, sf_dir):
    _prep(spark)
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


def _q_o4_except(spark, sf_dir):
    _prep(spark)
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics


def _q_s6_partition_metrics(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.count("*").alias("rows"),
                 F.sum("n_chars").cast("long").alias("bytes_in")))


# --- training-data pipeline ops -------------------------------------------

def _q_x_dedup_md5(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents")
            .select(F.md5(F.col("text").cast("binary")).alias("h"))
            .agg(F.countDistinct("h").cast("long").alias("n_unique")))


def _q_x_token_stats(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents")
            .select("lang", F.size(F.split("text", " ")).alias("nt"),
                    "n_chars")
            .groupBy("lang")
            .agg(F.sum(F.col("nt").cast("long")).alias("total_tokens"),
                 F.sum("n_chars").cast("long").alias("total_chars")))


def _q_x_percentile(spark, sf_dir):
    """Exact distribution statistics (A-class coverage beyond A1-A5):
    per-group EXACT percentiles (not approx sketches — those differ by
    implementation and can't hash-match an oracle) of lineitem
    quantity via F.percentile, plus an exact integer median check on
    discount cents. Interpolation runs in float64 with exact binary
    fractions (.25/.5/.75) on decimal(15,2)-sourced values, rounded to
    4dp so both engines' doubles collapse to the same hash. DuckDB
    oracle: quantile_cont."""
    _prep(spark)
    q = F.col("l_quantity").cast("double")
    cents = (F.col("l_discount").cast("decimal(12,2)") * 100).cast("long")
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(*[F.round(F.percentile(q, F.lit(p)), 4).alias(n)
                   for p, n in ((0.25, "q25"), (0.5, "q50"),
                                (0.75, "q75"))],
                 F.percentile(cents, F.lit(0.5)).cast("double")
                 .alias("disc_med")))


_X_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 4) AS q25,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.50), 4) AS q50,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 4) AS q75,
       CAST(quantile_cont(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
                               AS BIGINT), 0.5) AS DOUBLE) AS disc_med
FROM lineitem GROUP BY l_returnflag
"""


def _q_x_quality(spark, sf_dir):
    _prep(spark)
    stripped = F.regexp_replace(F.col("text"), "[a-z ]", "")
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.length("text").cast("long").alias("n_chars_total"),
                    F.length(stripped).cast("long").alias("n_nonalpha")))


def _q_x_langid(spark, sf_dir):
    _prep(spark)
    n_the = ((F.length("text")
              - F.length(F.replace(F.col("text"), F.lit(" the "), F.lit(""))))
             / 5).cast("long")
    pred = F.when(n_the >= 1, "en").otherwise("other")
    return (_t(spark, sf_dir, "documents")
            .select("lang", pred.alias("pred"))
            .groupBy("lang", "pred").agg(F.count("*").alias("n")))


def _q_x_ann_cosine(spark, sf_dir):
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import cosine_to_query
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"))
    scored = cosine_to_query(emb, q)
    return (scored.select("vec_id", "label",
                          F.round("cos", 6).alias("cos_r"))
            .filter(F.col("cos_r") >= 0.25))


def _q_x_neardup_pipeline(spark, sf_dir):
    """MinHash -> LSH banding -> exact-Jaccard verify, end-to-end.

    The corpus is documents UNION an exact copy shifted by +100000, so
    the verified >=0.99 pairs are exactly {(i, i+100000)} — an ANSI-SQL
    oracle can predict the full pipeline output."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import (
        lsh_candidates, minhash_signatures, ngram_jaccard_pairs, shingles)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    sig = minhash_signatures(shingles(corpus), n_hashes=32)
    cand = lsh_candidates(sig, n_bands=8)
    pairs = ngram_jaccard_pairs(corpus, cand)
    return (pairs.filter(F.col("jaccard") >= 0.99)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def _q_x_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN, end-to-end: bucket -> candidate join ->
    exact-cosine verify. Corpus is embeddings UNION an exact copy shifted
    by +100000; identical vectors share every sign bit, so the verified
    >=0.99 pairs are exactly {(i, i+100000)} — ANSI-SQL-predictable."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import (
        ann_candidate_pairs, rhp_buckets, verified_cosine_pairs)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    sig = rhp_buckets(corpus, n_planes=14, n_tables=2)
    cand = ann_candidate_pairs(sig)
    pairs = verified_cosine_pairs(corpus, cand)
    return (pairs.filter(F.round("cos", 6) >= 0.99)
            .select("a", "b", F.round("cos", 6).alias("cos_r")))


def _q_x_ann_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN end-to-end (one table, least-confident bit
    probes). Same shifted-copy corpus trick as x_ann_lsh: identical
    vectors share the home bucket, so the verified >=0.99 pairs are
    exactly {(i, i+100000)} regardless of probing."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import (
        ann_multiprobe_pairs, rhp_probe_buckets, verified_cosine_pairs)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    sig = rhp_probe_buckets(corpus, n_planes=14, n_probes=2, dim=64)
    cand = ann_multiprobe_pairs(sig)
    pairs = verified_cosine_pairs(corpus, cand)
    return (pairs.filter(F.round("cos", 6) >= 0.99)
            .select("a", "b", F.round("cos", 6).alias("cos_r")))


def _q_x_ann_ivf(spark, sf_dir):
    """IVF ANN end-to-end: k-means coarse quantizer (pyspark.ml) ->
    nearest-centroid buckets + 1 probe -> candidate join -> exact
    cosine verify. Shifted-copy corpus again: identical vectors share
    their nearest centroid whatever the clustering looks like, so the
    verified >=0.99 pairs are exactly {(i, i+100000)}. k=64 is a
    realistic coarse-quantizer size — the centers ride as ONE broadcast
    array row, so the plan is O(1) in k (round-3 watch-item closed)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import (
        ann_multiprobe_pairs, ivf_buckets, ivf_fit_centers,
        verified_cosine_pairs)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    # cheap-fit mode (max_iter=3): the gate's invariant — identical
    # vectors share their nearest centroid — holds for ANY clustering,
    # and at gate scale each Lloyd iteration is fixed multi-job
    # overhead (the KMeans fit was ~half the whole contract-gate wall,
    # VERDICT r5 task #6)
    centers = ivf_fit_centers(emb, k=64, seed=7, max_iter=3,
                              init_mode="random")
    # arrow engine: the interpreted-HOF Catalyst assignment was ~20 s
    # for this 2000 x (64 centers x 64 dims) corpus; the batched numpy
    # matmul is sub-second with identical bucket semantics (parity
    # asserted in test_ivf_arrow_engine_parity)
    sig = ivf_buckets(corpus, centers, n_probes=2, arrow=True)
    cand = ann_multiprobe_pairs(sig)
    pairs = verified_cosine_pairs(corpus, cand, arrow=True)
    return (pairs.filter(F.round("cos", 6) >= 0.99)
            .select("a", "b", F.round("cos", 6).alias("cos_r")))


def _q_x_simhash(spark, sf_dir):
    """SimHash64 with an exact ANSI-SQL oracle via two invariants:
    (a) order-insensitivity — the simhash of the REVERSED token stream
    (same token bag) has hamming distance 0 to the original; (b)
    content-sensitivity — flooding the token stream with a dominating
    alien token flips the majority vote, so hamming > 0 (verified to
    hold for every row of the deterministic test corpus)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import simhash64
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
            .select("doc_id", "text"))
    rev = docs.select(
        "doc_id",
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"))
    # flood size 512 strictly dominates every bit's majority vote: the
    # corpus max is 99 tokens/doc (all SFs), so the 512 identical
    # alien contributions outvote the [-99, +99] rest per bit — same
    # invariant as the old 4000-token flood at 1/8 the exploded volume
    pert = docs.select(
        "doc_id",
        F.concat("text", F.lit(" "),
                 F.rtrim(F.repeat(F.lit("zzzq "), 512))).alias("text"))
    h0 = simhash64(docs).withColumnRenamed("simhash", "h0")
    h1 = simhash64(rev).withColumnRenamed("simhash", "h1")
    h2 = simhash64(pert).withColumnRenamed("simhash", "h2")
    return (h0.join(h1, "doc_id").join(h2, "doc_id")
            .select("doc_id",
                    F.bit_count(F.col("h0").bitwiseXOR(F.col("h1")))
                    .cast("long").alias("ham_reorder"),
                    (F.bit_count(F.col("h0").bitwiseXOR(F.col("h2"))) > 0)
                    .alias("pert_differs")))


def _q_x_simhash_neardup(spark, sf_dir):
    """SimHash Hamming near-dup PAIRS (bit-banding -> capped equi-join
    -> exact bit_count(xor) verify) with an exact ANSI-SQL oracle via
    salt dominance: every doc's token stream is flooded with 128 copies
    of a token derived from its SORTED token bag (md5), and 128
    strictly outvotes the corpus max of 100 real tokens per bit, so the
    final simhash equals the salt token's xxhash64 bit pattern exactly.
    Multiset-equal texts therefore collide at hamming 0 while any other
    pair sits ~32 bits apart (P[ham<=3] ~ 2.4e-15 per cross-bag pair),
    so the emitted pair set is EXACTLY the bag-equality self-join the
    DuckDB oracle replays. Pairs are planted by unioning a
    reversed-token copy of every 7th doc (same bag, different byte
    order — md5(text) dedup would NOT catch these); the banding,
    bucket-cap and verify stages all run for real over 4x16-bit
    chunks."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import (
        simhash64, simhash_neardup_pairs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rev = (docs.filter(F.col("doc_id") % 7 == 0)
           .select((F.col("doc_id") + 100000).alias("doc_id"),
                   F.array_join(F.reverse(F.split("text", " ")), " ")
                   .alias("text")))
    corpus = docs.unionByName(rev)
    salt = F.md5(F.array_join(F.array_sort(F.split("text", " ")), " "))
    salted = corpus.select(
        "doc_id",
        F.concat("text", F.lit(" "),
                 F.rtrim(F.repeat(F.concat(salt, F.lit(" ")), 128)))
        .alias("text"))
    pairs = simhash_neardup_pairs(simhash64(salted), max_hamming=3)
    return pairs.select(
        "a", "b", F.col("hamming").cast("int").alias("hamming"))


def _q_x_dedup_keep_one(spark, sf_dir):
    """The composed near-dup DEDUP pipeline — signatures -> banded
    pairs -> connected components -> keep the min-id representative of
    every duplicate family. Same salt-dominance corpus construction as
    x_simhash_neardup (pairs == token-bag equality, exactly) plus a
    THIRD copy family (sorted-token text at +200000 for doc_id%14==0)
    so some components are 3-cliques and keep-one actually has to pick
    across a multi-member family, not just pairs. Because bag equality
    is transitive, the component structure is exactly group-by-bag, so
    the DuckDB oracle is MIN(doc_id) per token bag — the keep-one-of
    semantics stated in SQL with no graph machinery."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.components import (
        connected_components)
    from bank_statement_pdf_parser_spark.operators.neardup import (
        simhash64, simhash_neardup_pairs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rev = (docs.filter(F.col("doc_id") % 7 == 0)
           .select((F.col("doc_id") + 100000).alias("doc_id"),
                   F.array_join(F.reverse(F.split("text", " ")), " ")
                   .alias("text")))
    srt = (docs.filter(F.col("doc_id") % 14 == 0)
           .select((F.col("doc_id") + 200000).alias("doc_id"),
                   F.array_join(F.array_sort(F.split("text", " ")), " ")
                   .alias("text")))
    corpus = docs.unionByName(rev).unionByName(srt)
    salt = F.md5(F.array_join(F.array_sort(F.split("text", " ")), " "))
    salted = corpus.select(
        "doc_id",
        F.concat("text", F.lit(" "),
                 F.rtrim(F.repeat(F.concat(salt, F.lit(" ")), 128)))
        .alias("text"))
    pairs = simhash_neardup_pairs(simhash64(salted), max_hamming=3)
    comp = connected_components(
        pairs.select("a", "b"),
        nodes=corpus.select(F.col("doc_id").alias("id")))
    # component label IS the min id, so representatives are the rows
    # whose own id equals their label
    return (comp.filter(F.col("id") == F.col("component"))
            .select(F.col("id").alias("doc_id")))


def _q_x_lattice_rails(spark, sf_dir):
    """D6 generic lattice at corpus scale: every order is its OWN
    document (group_cols=['l_orderkey']), rails are majority-voted
    WITHIN each document, and every row is sliced at its document's
    rails. Damage is keyed on the per-document row_number (never more
    than floor(n/3) of a document's rows, so the final rail always
    survives the >=50% vote); per-line pipe splitting would drop the
    damaged rows' last cell, per-group rail voting recovers it — the
    oracle predicts all three cells for every row."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.lattice import (
        cells_at_rails, vote_rails)
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        amount_cents, money_str)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 10000)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    li = li.withColumn("rn", F.row_number().over(w))
    qty = F.col("l_quantity").cast("long").cast("string")
    desc = F.concat(F.lit("P"), F.col("l_partkey").cast("string"))
    base = F.concat(F.lit("|"), F.lpad(qty, 8, " "),
                    F.lit("|"), F.rpad(desc, 20, " "),
                    F.lit("|"), F.lpad(money_str(amount_cents()), 12, " "),
                    F.lit("|"))
    damaged = F.col("rn") % 3 == 0
    line = F.when(damaged, F.substring(base, 1, 43)).otherwise(base)
    df = li.select("l_orderkey", "rn", line.alias("line"))
    out = cells_at_rails(df, vote_rails(df, group_cols=["l_orderkey"]),
                         group_cols=["l_orderkey"])
    return out.select(
        "l_orderkey", F.col("rn").cast("int").alias("rn"),
        F.get(F.col("cells"), 0).alias("qty_cell"),
        F.get(F.col("cells"), 1).alias("desc_cell"),
        F.get(F.col("cells"), 2).alias("amt_cell"),
        damaged.alias("damaged"))


def _q_x_exact_dedup_groups(spark, sf_dir):
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import exact_dedup
    g = exact_dedup(_t(spark, sf_dir, "documents"))
    return g.agg(F.count("*").alias("n_groups"),
                 F.max("n_copies").alias("max_copies"),
                 F.sum("keep_id").cast("long").alias("sum_keep"))


def _q_x_pii_redact(spark, sf_dir):
    """PII scrub: chained regexp_replace (email -> phone -> long
    account number) over a corpus with deterministically PLANTED PII
    (email, phone, 12-digit account derived from doc_id, appended to
    every doc so both engines build the identical input). Output is
    the md5 of the fully-redacted text (byte-exact cross-engine
    equality of the scrub) plus exact per-pattern counts as the chain
    sees them. Patterns live in functions/redact.py and are restricted
    to the Java-regex/RE2 intersection dialect."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.functions.redact import (
        pii_counts, redact_pii)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id").cast("string")
    planted = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" user"), d, F.lit("@mail.example.com 415-555-"),
                 F.lpad(d, 4, "0"), F.lit(" "),
                 F.lpad(d, 12, "0")).alias("text"))
    cnt = pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        F.md5(redact_pii(F.col("text"))).alias("red_md5"),
        *[c.alias(k) for k, c in cnt.items()])


def _q_x_pack_shards(spark, sf_dir):
    """Token-budget sequence sharding (the dataset-loader packing op):
    docs in doc_id order are assigned to shards of >= 2000 whitespace
    tokens each via an exact GLOBAL running token count. The cumsum is
    the two-level distributed prefix sum (operators/sharding.py) —
    block-local hash-partitioned windows plus a one-row-per-block
    offset frame broadcast back — never a single-partition window over
    the corpus. block_size=64 forces ~8 blocks at 500 docs so the
    offset composition is actually exercised. Output aggregates verify
    both the cumsum values and the integer-DIV shard assignment."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        token_budget_shards)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long")
        .alias("toks"))
    sh = token_budget_shards(docs, "doc_id", F.col("toks"),
                             budget=2000, block_size=64)
    return (sh.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("toks").alias("tok_sum"),
                 F.sum("doc_id").alias("id_sum")))


def _q_x_quantile_gate(spark, sf_dir):
    """Per-language quality-quantile gate (keep each language's top
    quarter by length): exact per-lang 0.75 percentile computed as ONE
    row per lang and broadcast back, so the gate itself is a map-side
    filter (the 100 TB shape; swap percentile -> approx_percentile at
    scale, same plan). Integer scores + a quarter quantile make the
    linear interpolation exact in binary floating point, so Spark's
    percentile and DuckDB's quantile_cont agree bit-for-bit."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        group_quantile_thresholds)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    thr = group_quantile_thresholds(docs, "lang", "n_chars", 0.75)
    return (docs.join(F.broadcast(thr), "lang")
            .filter(F.col("n_chars") >= F.col("thr"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("id_sum"),
                 F.min("n_chars").alias("min_chars")))


def _q_x_corpus_mix(spark, sf_dir):
    """Corpus mixing: deterministic per-language sampling rates (en
    50%, de 75%, fr 25%, other langs 12.5%) via md5-prefix thresholds
    — a pure projection-side predicate (no shuffle, no floats), stable
    under re-runs/resumes, so the mixed corpus is reproducible from
    the weight table alone."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        hash_mix)
    docs = _t(spark, sf_dir, "documents")
    keep = hash_mix(docs, "lang", {"en": "8", "de": "c", "fr": "4"},
                    default_hex="2")
    return (docs.filter(keep).groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("id_sum")))


def _q_x_line_dedup(spark, sf_dir):
    """Sub-document line dedup (CCNet/C4-style): 8-token lines, only
    the corpus-wide FIRST occurrence of each distinct line survives.
    Boilerplate is PLANTED at line-aligned positions so the dedup
    provably discriminates: one 8-token footer prefixed to EVERY doc
    (kept once, in doc 0 — which also exercises the (doc, idx)
    tie-break, since doc 0 carries it at idx 1) and a second 8-token
    page-marker on every third doc. Output: per-doc line totals, kept
    counts and the md5 of the reassembled cleaned text."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import (
        dedup_lines)
    p1 = "all rights reserved by the example corpus authors"
    p2 = "this page is intentionally left blank today ok"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.when(F.col("doc_id") % 3 == 0, F.lit(p2 + " "))
                 .otherwise(F.lit("")),
                 F.lit(p1 + " "), F.col("text")).alias("text"))
    inst = dedup_lines(docs, tokens_per_line=8)
    kept = F.when(F.col("is_first"), F.struct("line_idx", "line"))
    return (inst.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("is_first").cast("long")).alias("n_kept"),
        F.md5(F.array_join(
            F.transform(F.sort_array(F.collect_list(kept)),
                        lambda x: x["line"]), " ")
            .cast("binary")).alias("clean_md5")))


def _q_x_asof_nearest(spark, sf_dir):
    """J5 as-of join, direction='nearest' (pandas merge_asof parity):
    every purchase takes whichever signup sits closer in time, ties
    going backward. One hash exchange carries BOTH traversals (the
    second is a within-partition re-sort). The signed gap_us pins
    which side won every row; DuckDB replays it as backward ASOF +
    forward ASOF + the same distance CASE."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.joins import asof_join
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts")
    right = (ev.filter(F.col("event_type") == "signup")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("s_id")))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("s_id",), dedup_right=False,
                    direction="nearest")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return out.select(
        "p_id", "user_id", us("ts").alias("p_us"),
        F.col("r_s_id").alias("s_id"),
        (us("ts") - us("r_ts")).alias("gap_us"))


_X_ASOF_NEAREST_SQL = """
WITH l AS (SELECT event_id AS p_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts, max(event_id) AS s_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
b AS (SELECT l.p_id, l.user_id, l.ts, r.s_id AS b_id, r.ts AS b_ts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts),
f AS (SELECT l.p_id, r.s_id AS f_id, r.ts AS f_ts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts <= r.ts)
SELECT b.p_id, b.user_id, epoch_us(b.ts) AS p_us,
  CASE WHEN b_ts IS NULL THEN f_id WHEN f_ts IS NULL THEN b_id
       WHEN epoch_us(f_ts) - epoch_us(b.ts)
            < epoch_us(b.ts) - epoch_us(b_ts) THEN f_id
       ELSE b_id END AS s_id,
  CASE WHEN b_ts IS NULL THEN epoch_us(b.ts) - epoch_us(f_ts)
       WHEN f_ts IS NULL THEN epoch_us(b.ts) - epoch_us(b_ts)
       WHEN epoch_us(f_ts) - epoch_us(b.ts)
            < epoch_us(b.ts) - epoch_us(b_ts)
            THEN epoch_us(b.ts) - epoch_us(f_ts)
       ELSE epoch_us(b.ts) - epoch_us(b_ts) END AS gap_us
FROM b JOIN f USING (p_id)
"""


def _q_x_curation_v2(spark, sf_dir):
    """Composed curation pipeline over the round-6 operators, ONE
    Spark job end to end: planted corpus -> PII scrub (regexp chain)
    -> unicode NFC (pandas UDF mid-plan) -> sub-document line dedup +
    cleaned-text reassembly -> per-lang length-quantile gate (keep top
    75%) -> token-budget packing of the survivors. Every stage
    discriminates (planted PII, planted decomposed accents, planted
    cross-doc boilerplate lines, a real quantile cut) and DuckDB
    replays all five stages; per-shard id/token sums pin the entire
    composition."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.functions.redact import (
        redact_pii)
    from bank_statement_pdf_parser_spark.functions.textclean import (
        nfc_normalize)
    from bank_statement_pdf_parser_spark.operators.neardup import (
        dedup_lines, reassemble_lines)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        group_quantile_thresholds, token_budget_shards)
    p1 = "all rights reserved by the example corpus authors"
    d = F.col("doc_id").cast("string")
    planted = F.concat(
        F.lit(p1 + " "), F.col("text"),
        F.lit(" user"), d, F.lit("@mail.example.com 415-555-"),
        F.lpad(d, 4, "0"), F.lit(" cafe\u0301"))
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", "lang", planted.alias("text")))
    # STAGE the scrub once: dedup_lines consumes its input twice
    # (winners groupBy + join back) and everything downstream branches
    # again, so without a stage the regexp chain + NFC pandas UDF
    # re-evaluate per branch (measured: 8 ArrowEvalPython nodes, 12
    # scans — the CLAUDE.md sibling-duplication trap). localCheckpoint
    # truncates the lineage (components.py precedent); a production
    # pipeline writes a real parquet stage here, exactly like the
    # sink stages records.
    scrubbed = docs.select(
        "doc_id", "lang", nfc_normalize(redact_pii(F.col("text")))
        .alias("text")).localCheckpoint(eager=False)
    inst = dedup_lines(scrubbed, tokens_per_line=8)
    clean = reassemble_lines(inst)
    clean = (clean.join(scrubbed.select("doc_id", "lang"), "doc_id")
             .withColumn("n_chars", F.length("clean").cast("long"))
             .localCheckpoint(eager=False))  # feeds thr + gate + pack
    thr = group_quantile_thresholds(clean, "lang", "n_chars", 0.25)
    gated = (clean.join(F.broadcast(thr), "lang")
             .filter(F.col("n_chars") >= F.col("thr"))
             .select("doc_id",
                     F.size(F.split("clean", " ")).cast("long")
                     .alias("toks")))
    packed = token_budget_shards(gated, "doc_id", F.col("toks"),
                                 budget=1500, block_size=64)
    return (packed.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("toks").alias("tok_sum"),
                 F.sum("doc_id").alias("id_sum")))


def _q_x_group_cap(spark, sf_dir):
    """Exact per-source cap (k=20 docs per language, deterministic):
    the winners are the k smallest md5(doc_id:salt) hashes per group,
    computed with the two-phase prefix-cut sampler (sharding.py
    exact_k_per_group — the window only ever sorts ~4k survivors per
    group, never the group). id_sum pins the exact winner SET against
    DuckDB ranking the full corpus."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        exact_k_per_group)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = exact_k_per_group(docs, "lang", k=20)
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("id_sum")))


def _q_x_tfidf_terms(spark, sf_dir):
    """Per-language distinctive terms (TF-IDF family): term frequency
    within the language vs document frequency across the corpus, top 5
    per language. Ranking is INTEGER-ONLY (tf desc, global df asc,
    term asc) so cross-engine order can't flip on a 1-ulp float
    difference; the float idf score is carried as a round(·, 6) value
    column only. Shape: one explode + two partial-aggregatable
    groupBys + a broadcast-sized per-term df join + per-lang top-k
    window (the window partitions by lang — bounded group count)."""
    _prep(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
    tf = (terms.groupBy("lang", "term")
          .agg(F.count("*").alias("tf")))
    dfreq = (terms.groupBy("term")
             .agg(F.countDistinct("doc_id").alias("df")))
    w = Window.partitionBy("lang").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (tf.join(dfreq, "term")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("lang", "rk", "term", "tf", "df",
                    F.round(F.col("tf") * F.log(
                        (F.lit(float(n_docs)) + 1.0)
                        / (F.col("df") + 1.0)), 6).alias("tfidf_r")))


def _q_x_context_windows(spark, sf_dir):
    """Token-level context-window packing (W=512): the corpus,
    space-concatenated in doc_id order, cut into exact 512-token
    windows — computed distributed (offset from the two-level prefix
    sum, one exploded row per (doc, straddled window), groupBy window
    reassembly) and verified byte-exact: per-window md5 of the
    reassembled text, contributing-doc count and token count against
    DuckDB replaying the identical slice arithmetic sequentially."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        context_windows)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pieces = context_windows(docs, "doc_id", "text",
                             window_tokens=512, block_size=64)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("piece_start", "piece"))),
        lambda x: x["piece"])
    return (pieces.groupBy("window_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("piece", " ")).cast("long"))
        .alias("n_tokens"),
        F.md5(F.array_join(ordered, " ").cast("binary")).alias("w_md5")))


def _q_x_centroid_gate(spark, sf_dir):
    """Model-based quality gate (seed-centroid scoring, the
    fineweb-style pattern): the label=0 rows are the trusted seed set;
    their mean embedding is computed DISTRIBUTED (posexplode +
    partial-aggregatable groupBy(dim) avg — see ann.seed_centroid),
    reassembled as one broadcast row, and every corpus vector is
    cosine-scored against it. round(·, 6) on both engines absorbs
    float-summation-order noise, same discipline as x_ann_cosine."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import (
        cosine_to_query, seed_centroid)
    emb = _t(spark, sf_dir, "embeddings")
    cent = seed_centroid(emb.filter(F.col("label") == 0))
    scored = cosine_to_query(emb, cent)
    return (scored.select("vec_id", "label",
                          F.round("cos", 6).alias("cos_r"))
            .filter(F.col("cos_r") >= 0.2))


def _q_x_unicode_nfc(spark, sf_dir):
    """Unicode NFC canonicalization (curation scrub stage): the ASCII
    corpus is enriched with a decomposed 'e' + COMBINING ACUTE (U+0301)
    per doc, so normalization provably composes codepoints (the char
    count drops by one). Spark side is the Arrow-batched unicodedata
    pandas UDF (no NFC builtin exists); oracle is DuckDB's
    nfc_normalize — same UAX #15 form, md5-compared byte-exact."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.functions.textclean import (
        nfc_normalize)
    planted = F.concat(F.col("text"), F.lit(" cafe\u0301 n"),
                       F.col("doc_id").cast("string"))
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", planted.alias("raw"))
    n = nfc_normalize(F.col("raw"))
    return docs.select(
        "doc_id",
        F.md5(n.cast("binary")).alias("nfc_md5"),
        F.length(n).cast("long").alias("n_chars_nfc"),
        F.length("raw").cast("long").alias("n_chars_raw"))


def _q_x_repetition(spark, sf_dir):
    """Repetition-based quality signals (duplicate n-gram fraction
    family, Gopher/MassiveText-style): exact total + distinct bigram
    and trigram counts per document, computed SHUFFLE-FREE inside the
    row via array_distinct over the staged gram arrays (the explode ->
    groupBy alternative would push every shingle of every document
    through an exchange for a row-local statistic)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        repetition_signals)
    docs = (_t(spark, sf_dir, "documents").select("doc_id", "text")
            .withColumn("_toks", F.split("text", " ")))
    sig = repetition_signals(F.col("_toks"), ns=(2, 3))
    return docs.select(
        "doc_id", *[c.alias(k) for k, c in sig.items()])


def _q_x_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag every corpus doc containing any
    contiguous 13-token shingle from a 'benchmark' set (the published
    n-gram-overlap rule; probes here are 13-token slices cut from
    every doc_id%50==0 document with >=17 tokens, so probe sources
    self-flag and genuine cross-doc hits surface too). Broadcast
    LEFT SEMI against the exploded corpus shingles — no corpus
    shuffle. Oracle replays the identical slice arithmetic with
    DuckDB list slicing + generate_series."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        contaminated_doc_ids)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.withColumn("_toks", F.split("text", " "))
    probes = (toks.filter((F.col("doc_id") % 50 == 0)
                          & (F.size("_toks") >= 17))
              .select(F.array_join(F.slice("_toks", 5, 13), " ")
                      .alias("ngram")))
    return contaminated_doc_ids(docs, probes, n=13)


def _q_x_dedup_components(spark, sf_dir):
    """Near-dup clustering: pair edges -> connected components via
    iterative hash-min label propagation (operators/components.py),
    labelling every doc with the min doc_id reachable through any
    chain of links — the keep-one-of unit a curation pipeline dedups
    by when similarity chains A~B~C without A~C. Edges are synthesized
    deterministically from the documents table so both engines build
    the identical graph: intra-decade chains doc->doc-1 for
    doc_id%10 in 1..3 (components of 4, propagation depth 3) plus
    bridges doc->doc-13 for doc_id%40==0 (merges a chain into a
    distant singleton whose SMALLER id must flow back across the
    bridge and down the whole chain — 4+ rounds of real iteration).
    Oracle: DuckDB WITH RECURSIVE transitive closure + MIN — the
    SQL-native statement of the same fixpoint."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.components import (
        connected_components)
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    dec = F.col("doc_id") % 10
    chain = (docs.filter((dec >= 1) & (dec <= 3))
             .select(F.col("doc_id").alias("a"),
                     (F.col("doc_id") - 1).alias("b")))
    bridge = (docs.filter((F.col("doc_id") % 40 == 0)
                          & (F.col("doc_id") >= 13))
              .select(F.col("doc_id").alias("a"),
                      (F.col("doc_id") - 13).alias("b")))
    comp = connected_components(
        chain.unionByName(bridge),
        nodes=docs.select(F.col("doc_id").alias("id")))
    return comp.select(F.col("id").alias("doc_id"), "component")


def _q_x_binary_checksum(spark, sf_dir):
    """Binary-column plumbing: text -> binary payload -> Arrow-batched
    pandas kernel computing byte length + checksum (multimodal seam)."""
    _prep(spark)
    import pandas as pd

    def kernel(batches):
        import numpy as np
        for pdf in batches:
            ids, nb, ck = [], [], []
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                ids.append(int(i))
                nb.append(int(b.size))
                ck.append(int(b.sum()))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "n_bytes": nb, "checksum": ck})

    df = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
          .select("doc_id", F.encode("text", "UTF-8").alias("payload")))
    return df.mapInPandas(kernel, "doc_id long, n_bytes long, checksum long")


def _q_f6_string_utils(spark, sf_dir):
    _prep(spark)
    return (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
            .select("doc_id",
                    F.upper(F.substring("text", 1, 10)).alias("head10"),
                    F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded"),
                    F.length(F.translate("text", "aeiou", ""))
                    .cast("long").alias("n_non_vowel"),
                    F.locate(" the ", F.col("text")).cast("long").alias("pos_the")))


def _q_f7_math_dates(spark, sf_dir):
    _prep(spark)
    d = F.col("o_orderdate").cast("date")
    return (_t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
            .select("o_orderkey",
                    F.last_day(d).alias("month_end"),
                    F.datediff(F.last_day(d), d).cast("long").alias("days_to_me"),
                    F.abs(F.round(F.col("o_totalprice").cast("decimal(18,2)"), 0))
                    .cast("long").alias("rounded_total")))


def _q_x_token_bpe(spark, sf_dir):
    """BPE-ish pre-tokenization count over a text enriched with
    deterministic digits/punctuation (the corpus is lowercase words, so
    the raw text would only exercise the letter class)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        bpe_token_count)
    enriched = F.concat(F.col("doc_id").cast("string"), F.lit("! "),
                        F.col("text"), F.lit(" v2.0?"))
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", bpe_token_count(enriched).alias("n_bpe")))


def _q_x_quality_score(spark, sf_dir):
    """Quality signals as exact integers (stopword hits, punctuation
    chars, token count/length) — callers derive the ratios."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        quality_signals)
    enriched = F.concat(F.col("doc_id").cast("string"), F.lit("! "),
                        F.col("text"), F.lit(" v2.0?"))
    q = quality_signals(enriched)
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", q["n_tokens"].alias("n_tokens"),
                    q["stop_hits"].alias("stop_hits"),
                    q["punct_chars"].alias("punct_chars"),
                    q["sum_token_len"].alias("sum_token_len")))


def _q_x_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (rolling k-gram hash + window min),
    exploded to distinct (doc_id, fp) rows — the DuckDB oracle computes
    the identical polynomial hashes and window minima."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        winnow_fingerprints)
    # the documents parquet is one row group -> one scan partition;
    # spread the HOF-heavy hashing across cores before computing
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
            .select("doc_id", "text").repartition(16, "doc_id"))
    # plus one deterministic >=10 KB document (both engines synthesize
    # the identical string) so the long-document cost class of the
    # fingerprint plan stays pinned by this gate
    long_doc = spark.range(1).select(
        F.lit(100000).cast("long").alias("doc_id"),
        F.concat_ws("", F.transform(
            F.sequence(F.lit(0), F.lit(11999)),
            lambda i: F.char(F.lit(97)
                             + ((i % 251) * (i % 241) * 31) % 26)))
        .alias("text"))
    fps = winnow_fingerprints(docs.unionByName(long_doc), k=8, w=4)
    # fps is array_distinct per doc and there is one row per doc_id, so
    # the exploded (doc_id, fp) rows are already unique — no distinct()
    # shuffle (the oracle needs SELECT DISTINCT because its window scan
    # does emit duplicates)
    return fps.select("doc_id", F.explode("fps").alias("fp"))


_X_FINGERPRINT_SQL = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300
           UNION ALL
           SELECT CAST(100000 AS BIGINT),
                  array_to_string(list_transform(range(0, 12000),
                    i -> chr(CAST(97 + ((i % 251) * (i % 241) * 31) % 26
                             AS INTEGER))), '')),
g AS (
  SELECT doc_id, text,
         CAST(unnest(range(length(text) - 7)) AS INTEGER) AS i
  FROM d
),
h AS (
  SELECT doc_id, i,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             [CAST(ascii(substr(text, i+1+j, 1)) AS BIGINT)
              FOR j IN range(8)]),
           (acc, c) -> (acc*257 + c) % 1000000007) AS hv,
         length(text) - 7 AS ng
  FROM g
),
wmin AS (
  SELECT doc_id, i, ng,
         min(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM h
)
SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= ng - 4
"""


def _q_p4_noise_reject(spark, sf_dir):
    """P4 under the gate: the balance corpus is polluted with three
    noise turns per order — a disallowed role carrying a parseable
    statement, an unclassifiable text (no bank signature), and an
    empty payload. The oracle predicts the extraction output from the
    CLEAN corpus alone: exactly 4 transactions per eligible order and
    zero from any noise conv, proving every rejection rule fired."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        uob_balance_transcripts)
    clean = uob_balance_transcripts(spark, sf_dir)
    okey = F.regexp_replace("conv_id", "^bal-", "")
    noise = clean.select(
        F.concat(F.lit("noise-"), okey).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("system").alias("role"),   # disallowed role, valid text
        "text", "tool", "ts").unionByName(clean.select(
            F.concat(F.lit("nosig-"), okey).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("no known bank here O"), okey).alias("text"),
            "tool", "ts")).unionByName(clean.select(
            F.concat(F.lit("empty-"), okey).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit("").alias("text"), "tool", "ts"))
    txns = extract_all(clean.unionByName(noise)).transactions
    return txns.agg(
        F.count("*").cast("long").alias("n_txns"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.sum((~F.col("conv_id").startswith("bal-")).cast("long"))
        .alias("n_from_noise"))


_P4_NOISE_SQL = _ranked_sql(4) + """
SELECT CAST(count(*) AS BIGINT) AS n_txns,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_convs,
       CAST(0 AS BIGINT) AS n_from_noise
FROM li
"""


def _q_x_image_stats(spark, sf_dir):
    """REAL image decode inside Spark, oracle-gated: each doc_id
    becomes a genuine 2x2 P6 PPM whose 12 pixel bytes are
    (doc_id*13 + j*7) % 256, so the decoded per-channel means are pure
    integer arithmetic in ANSI SQL while the engine actually parses
    the PPM header and raster (operators/multimodal.decode_ppm)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from bank_statement_pdf_parser_spark.operators.multimodal import (
        IMAGE_STATS_DDL, image_stats_kernel)

    def build(batches):
        from bank_statement_pdf_parser_spark.operators.multimodal import (
            encode_ppm)
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            pays = [encode_ppm(np.array(
                [(i * 13 + j * 7) % 256 for j in range(12)],
                dtype=np.uint8).reshape(2, 2, 3)) for i in ids]
            if ids:
                yield pd.DataFrame({"media_id": ids, "payload": pays})

    media = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
             .select("doc_id")
             .mapInPandas(build, "media_id long, payload binary"))
    stats = media.mapInPandas(image_stats_kernel(thumb=2), IMAGE_STATS_DDL)
    return stats.select(
        "media_id", "height", "width",
        F.round(F.get("mean_rgb", 0), 6).alias("mean_r"),
        F.round(F.get("mean_rgb", 1), 6).alias("mean_g"),
        F.round(F.get("mean_rgb", 2), 6).alias("mean_b"))


_X_IMAGE_STATS_SQL = """
SELECT doc_id AS media_id, CAST(2 AS INTEGER) AS height,
       CAST(2 AS INTEGER) AS width,
       round(((doc_id*13 + 0*7)%256 + (doc_id*13 + 3*7)%256
            + (doc_id*13 + 6*7)%256 + (doc_id*13 + 9*7)%256)/4.0, 6)
           AS mean_r,
       round(((doc_id*13 + 1*7)%256 + (doc_id*13 + 4*7)%256
            + (doc_id*13 + 7*7)%256 + (doc_id*13 + 10*7)%256)/4.0, 6)
           AS mean_g,
       round(((doc_id*13 + 2*7)%256 + (doc_id*13 + 5*7)%256
            + (doc_id*13 + 8*7)%256 + (doc_id*13 + 11*7)%256)/4.0, 6)
           AS mean_b
FROM documents WHERE doc_id < 200
"""


def _q_x_png_stats(spark, sf_dir):
    """REAL compressed-image decode inside Spark (round 6), oracle-
    gated: each doc_id becomes a genuine PNG — stdlib-zlib deflate,
    CRC-framed critical chunks, scanline filter doc_id % 5 so all five
    PNG filters (none/sub/up/average/paeth) are exercised in the gate —
    whose 4x4 RGB pixels are (doc_id*17 + j*5) % 256. The engine
    inflates, CRC-checks and un-filters for real
    (operators/multimodal.decode_png); the per-channel SUMS are pure
    integer arithmetic for the SQL oracle (sum = mean*16 exactly:
    /16 is a power-of-two division, lossless in float64)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from bank_statement_pdf_parser_spark.operators.multimodal import (
        IMAGE_STATS_DDL, image_stats_kernel)

    def build(batches):
        from bank_statement_pdf_parser_spark.operators.multimodal import (
            encode_png)
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            pays = [encode_png(np.array(
                [(i * 17 + j * 5) % 256 for j in range(48)],
                dtype=np.uint8).reshape(4, 4, 3), filter_type=i % 5)
                for i in ids]
            if ids:
                yield pd.DataFrame({"media_id": ids, "payload": pays})

    media = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
             .select("doc_id")
             .mapInPandas(build, "media_id long, payload binary"))
    stats = media.mapInPandas(image_stats_kernel(thumb=2), IMAGE_STATS_DDL)
    return stats.select(
        "media_id", "height", "width",
        F.round(F.get("mean_rgb", 0) * 16).cast("long").alias("sum_r"),
        F.round(F.get("mean_rgb", 1) * 16).cast("long").alias("sum_g"),
        F.round(F.get("mean_rgb", 2) * 16).cast("long").alias("sum_b"))


_X_PNG_STATS_SQL = """
SELECT d.doc_id AS media_id, CAST(4 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS width,
       CAST(sum(CASE WHEN t.j % 3 = 0
                THEN (d.doc_id*17 + t.j*5) % 256 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN t.j % 3 = 1
                THEN (d.doc_id*17 + t.j*5) % 256 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN t.j % 3 = 2
                THEN (d.doc_id*17 + t.j*5) % 256 END) AS BIGINT) AS sum_b
FROM documents d CROSS JOIN range(0, 48) t(j)
WHERE d.doc_id < 200
GROUP BY d.doc_id
"""


def _q_x_audio_stats(spark, sf_dir):
    """REAL audio decode inside Spark, oracle-gated: each doc_id
    becomes a genuine RIFF/WAVE PCM16 file whose 64 samples are
    ((doc_id*7 + j*11) % 256 - 128) * 255, so energy (sum of squares)
    and strict zero crossings are exact integer arithmetic in ANSI SQL
    while the engine actually walks the RIFF chunks
    (operators/multimodal.decode_wav)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from bank_statement_pdf_parser_spark.operators.multimodal import (
        AUDIO_STATS_DDL, audio_stats_kernel)

    def build(batches):
        from bank_statement_pdf_parser_spark.operators.multimodal import (
            encode_wav)
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            pays = []
            for i in ids:
                s = np.array([((i * 7 + j * 11) % 256 - 128) * 255
                              for j in range(64)], dtype=np.int16)
                pays.append(encode_wav(s, 8000 + (i % 2) * 8000))
            if ids:
                yield pd.DataFrame({"media_id": ids, "payload": pays})

    media = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
             .select("doc_id")
             .mapInPandas(build, "media_id long, payload binary"))
    return media.mapInPandas(audio_stats_kernel(), AUDIO_STATS_DDL)


_X_AUDIO_STATS_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
s AS (SELECT doc_id, CAST(unnest(range(64)) AS BIGINT) AS j FROM d),
v AS (SELECT doc_id, j,
             ((doc_id*7 + j*11) % 256 - 128) * 255 AS smp FROM s),
w AS (SELECT doc_id, j, smp,
             lag(smp) OVER (PARTITION BY doc_id ORDER BY j) AS prev
      FROM v)
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 2) * 8000 AS INTEGER) AS sample_rate,
       CAST(64 AS BIGINT) AS n_samples,
       CAST(SUM(smp*smp) AS BIGINT) AS sum_sq,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev*smp < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
FROM w GROUP BY doc_id
"""


def _q_x_video_frames(spark, sf_dir):
    """REAL video container decode inside Spark, oracle-gated: each
    doc_id becomes a genuine Y4M stream of 2 + doc_id%3 mono 4x2
    frames with luma bytes (doc_id*3 + f*17 + p*5) % 256; every 2nd
    frame is sampled and its exact integer luma sum emitted, all pure
    integer arithmetic for the DuckDB oracle while the engine walks
    the actual FRAME markers (operators/multimodal.decode_y4m)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from bank_statement_pdf_parser_spark.operators.multimodal import (
        VIDEO_FRAMES_DDL, video_frames_kernel)

    def build(batches):
        from bank_statement_pdf_parser_spark.operators.multimodal import (
            encode_y4m)
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            pays = []
            for i in ids:
                frames = [np.array([(i * 3 + f * 17 + p * 5) % 256
                                    for p in range(8)],
                                   dtype=np.uint8).reshape(2, 4)
                          for f in range(2 + i % 3)]
                pays.append(encode_y4m(frames, 4, 2))
            if ids:
                yield pd.DataFrame({"media_id": ids, "payload": pays})

    media = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
             .select("doc_id")
             .mapInPandas(build, "media_id long, payload binary"))
    return media.mapInPandas(video_frames_kernel(every_k=2),
                             VIDEO_FRAMES_DDL)


_X_VIDEO_FRAMES_SQL = """
WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents
           WHERE doc_id < 300),
f AS (SELECT doc_id, CAST(unnest(range(nf)) AS BIGINT) AS fi FROM d),
s AS (SELECT doc_id, fi, CAST(unnest(range(8)) AS BIGINT) AS p FROM f)
SELECT doc_id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
       CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
       CAST(SUM((doc_id*3 + fi*17 + p*5) % 256) AS BIGINT) AS sum_y
FROM s WHERE fi % 2 = 0 GROUP BY doc_id, fi
"""


def _q_v1_balance_check(spark, sf_dir):
    """V1 as a gated row: extract the planted-error corpus, run the
    running-balance validator, return ONLY the violations — exactly
    txn_idx 2 and 3 of every statement (the +1-cent plant corrupts the
    jump into rn=3 and the jump out of it)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.functions.validate import (
        balance_check)
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark.sources.tpch_bridge import (
        uob_balance_transcripts)
    txns = extract_all(uob_balance_transcripts(spark, sf_dir)).transactions
    bad = balance_check(txns).filter(~F.col("balance_ok"))
    return bad.select(
        "conv_id", "txn_idx",
        F.col("balance").cast("double").alias("balance"),
        F.col("prev_balance").cast("double").alias("prev_balance"),
        F.col("delta").cast("double").alias("delta"))


_V1_BALANCE_SQL = _ranked_sql(4) + """
, s AS (
  SELECT l_orderkey, rn,
         (CAST(l_quantity AS BIGINT)*100 + l_linenumber)
         * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS signed
  FROM li
), r AS (
  SELECT l_orderkey, rn, signed,
         (l_orderkey % 1000000) + 100000
         + SUM(signed) OVER (PARTITION BY l_orderkey ORDER BY rn)
         + CASE WHEN rn = 3 THEN 1 ELSE 0 END AS bal
  FROM s
), w AS (
  SELECT *, lag(bal) OVER (PARTITION BY l_orderkey ORDER BY rn) AS prev
  FROM r
)
SELECT 'bal-' || CAST(l_orderkey AS VARCHAR) AS conv_id,
       CAST(rn - 1 AS INTEGER) AS txn_idx,
       CAST(CAST(bal/100.0 AS DECIMAL(18,2)) AS DOUBLE) AS balance,
       CAST(CAST(prev/100.0 AS DECIMAL(18,2)) AS DOUBLE) AS prev_balance,
       CAST(CAST(signed/100.0 AS DECIMAL(18,2)) AS DOUBLE) AS delta
FROM w WHERE rn IN (3, 4)
"""


def _q_w5_frame_agg(spark, sf_dir):
    _prep(spark)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (_t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.first("event_type").over(w).alias("first_type"),
                    F.last("event_type").over(w).alias("last_type")))


def _q_x_asof_join(spark, sf_dir):
    """J5 as-of join (SURVEY §2.5, implemented round 4): every purchase
    event gets the most recent signup (same user, signup.ts <=
    purchase.ts, inclusive) via the union-and-window composition —
    one shuffle on user_id, no join node. DuckDB verifies with its
    NATIVE ASOF LEFT JOIN."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.joins import asof_join
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts")
    right = (ev.filter(F.col("event_type") == "signup")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("s_id"),
                  F.max_by("value", "event_id").alias("s_value")))
    # right is already unique per (user_id, ts) from the groupBy above
    # — skip the operator's built-in dedup shuffle
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("s_id", "s_value"), dedup_right=False)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return out.select(
        "p_id", "user_id",
        us("ts").alias("p_us"),
        F.col("r_s_id").alias("s_id"),
        F.col("r_s_value").alias("s_value"),
        (us("ts") - us("r_ts")).alias("gap_us"))


_X_ASOF_SQL = """
WITH l AS (SELECT event_id AS p_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts, max(event_id) AS s_id,
             arg_max(value, event_id) AS s_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
SELECT l.p_id, l.user_id, epoch_us(l.ts) AS p_us, r.s_id, r.s_value,
       epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def _q_x_asof_within(spark, sf_dir):
    """J5 as-of join with a tolerance window (round 6): same
    purchase<-signup carry as x_asof_join, but a match staler than 2
    days yields NULLs for the whole payload (row-atomic) — DuckDB/kdb
    `within` semantics. The oracle replays its native ASOF LEFT JOIN
    and nulls the payload with the same inclusive epoch-us bound.
    sf0.01: ~35% of carried matches exceed the bound, so the window
    genuinely discriminates."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.joins import asof_join
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts")
    right = (ev.filter(F.col("event_type") == "signup")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("s_id"),
                  F.max_by("value", "event_id").alias("s_value")))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("s_id", "s_value"), dedup_right=False,
                    within="2 days")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return out.select(
        "p_id", "user_id",
        us("ts").alias("p_us"),
        F.col("r_s_id").alias("s_id"),
        F.col("r_s_value").alias("s_value"),
        (us("ts") - us("r_ts")).alias("gap_us"))


_X_ASOF_WITHIN_SQL = """
WITH l AS (SELECT event_id AS p_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts, max(event_id) AS s_id,
             arg_max(value, event_id) AS s_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
a AS (SELECT l.p_id, l.user_id, l.ts, r.s_id, r.s_value, r.ts AS r_ts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts),
b AS (SELECT *, epoch_us(ts) - epoch_us(r_ts) <= 172800000000 AS ok
      FROM a)
SELECT p_id, user_id, epoch_us(ts) AS p_us,
       CASE WHEN ok THEN s_id END AS s_id,
       CASE WHEN ok THEN s_value END AS s_value,
       CASE WHEN ok THEN epoch_us(ts) - epoch_us(r_ts) END AS gap_us
FROM b
"""


def _q_x_asof_forward(spark, sf_dir):
    """J5 forward as-of join (round 6): for every purchase, the
    EARLIEST error event at-or-after it (same user) — the look-ahead
    direction (label joining, next-event attribution). Same
    union-and-window single-shuffle plan traversed in reverse; DuckDB
    verifies with its native ASOF LEFT JOIN ON l.ts <= r.ts."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.joins import asof_join
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts")
    right = (ev.filter(F.col("event_type") == "error")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("e_id")))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("e_id",), dedup_right=False,
                    direction="forward")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return out.select(
        "p_id", "user_id",
        us("ts").alias("p_us"),
        F.col("r_e_id").alias("e_id"),
        (us("r_ts") - us("ts")).alias("lead_us"))


_X_ASOF_FORWARD_SQL = """
WITH l AS (SELECT event_id AS p_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts, max(event_id) AS e_id
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
SELECT l.p_id, l.user_id, epoch_us(l.ts) AS p_us, r.e_id,
       epoch_us(r.ts) - epoch_us(l.ts) AS lead_us
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts <= r.ts
"""


def _q_x_stratified_split(spark, sf_dir):
    """Deterministic stratified train/val split (round 6) — the
    reproducible-sampling primitive every training-data pipeline
    needs: assignment is a pure function of the row key (md5 of
    doc_id + salt, compared lexicographically against a hex threshold
    — 'cc' ~ 79.7% of the hash space), so it is shuffle-free,
    engine-independent and stable under re-runs / resumes. Verified
    stratum-by-stratum: per (lang, split) row counts and exact doc_id
    sums must match DuckDB computing the same md5 rule."""
    _prep(spark)
    h = F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(":split7")).cast("binary"))
    split = F.when(h < F.lit("cc"), F.lit("train")).otherwise(F.lit("val"))
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", "lang", split.alias("split"))
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n"),
                 F.sum("doc_id").alias("id_sum")))


_X_STRATIFIED_SPLIT_SQL = """
SELECT lang,
       CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split7') < 'cc'
            THEN 'train' ELSE 'val' END AS split,
       count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents GROUP BY 1, 2
"""


def _q_x_range_join(spark, sf_dir):
    """J5 range join (SURVEY §2.5, implemented round 4): purchases
    falling inside [error.ts, error.ts + 1h) per error event, via the
    epoch-bucket equi-join (each interval explodes into <= 2 buckets;
    never the all-pairs inequality compare). DuckDB verifies with the
    plain inequality join — same semantics, oracle-scale plan."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.joins import range_join
    ev = _t(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"))
    pts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "ts",
        F.col("value").alias("p_value"))
    out = range_join(iv, pts, bucket_s=3600)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return out.select(
        "err_id", "p_id", "p_value",
        (us("ts") - us("t0")).alias("off_us"))


_X_RANGE_SQL = """
SELECT e.event_id AS err_id, p.event_id AS p_id, p.value AS p_value,
       epoch_us(p.ts) - epoch_us(e.ts) AS off_us
FROM events e JOIN events p
  ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
"""


def _q_x_stream_assemble(spark, sf_dir):
    """Stateful streaming turn assembler (applyInPandasWithState) under
    the DuckDB gate: each document's text is split into 3 character
    chunks SCATTERED across 3 micro-batch files ((doc_id + chunk_idx)
    mod 3, so most turns need cross-batch GroupState), streamed through
    assemble_turns, and the assembled text must equal the original
    document byte-for-byte — the oracle is simply the documents table."""
    _prep(spark)
    import tempfile
    from bank_statement_pdf_parser_spark.streaming.assembler import (
        CHUNKS_DDL, assemble_turns)
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
            .select("doc_id", "text"))
    third = (F.length("text") + 2 - ((F.length("text") + 2) % 3)) / 3
    clen = third.cast("int")
    chunks = (docs.select(
        "doc_id", "text", clen.alias("clen"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("ci"))
        .select(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("ci").cast("int").alias("chunk_idx"),
            F.lit(3).cast("int").alias("n_chunks"),
            F.substring("text", F.col("ci") * F.col("clen") + 1,
                        F.col("clen")).alias("chunk"),
            F.lit(None).cast("string").alias("tool"),
            F.lit("2026-01-05 10:00:00").cast("timestamp").alias("ts"),
            F.pmod(F.col("doc_id") + F.col("ci"), F.lit(3)).alias("f")))
    import shutil
    tmp = tempfile.mkdtemp(prefix="x-stream-assemble-")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # narrow state partitions: same per-partition state-store
        # overhead economics as x_stream_window (throwaway checkpoint)
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        for f in range(3):
            (chunks.filter(F.col("f") == f).drop("f").coalesce(1)
             .write.parquet(f"{tmp}/src/f{f}"))
        stream = (spark.readStream.schema(CHUNKS_DDL)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/src/*"))
        q = (assemble_turns(stream, timeout_ms=None)
             .writeStream.format("memory").queryName("x_stream_assemble")
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ck").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        # the memory sink holds the rows; the staging corpus +
        # checkpoint are never needed again — clean up even on failure
        # so repeated gate runs don't accumulate tempdirs (ADVICE r5)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return (spark.sql("SELECT * FROM x_stream_assemble")
            .select(F.regexp_replace("conv_id", "^doc-", "")
                    .cast("long").alias("doc_id"), "text"))


_X_STREAM_ASSEMBLE_SQL = (
    "SELECT doc_id, text FROM documents WHERE doc_id < 100")


def _q_x_stream_curate(spark, sf_dir):
    """The composed streaming ingest under the DuckDB gate:
    dedup_chunks -> assemble_turns in ONE query (streaming/
    batch_stream.curate_stream's stateful stages). Beyond
    x_stream_assemble's scattering, the stream carries REDELIVERIES an
    at-least-once upstream produces: a duplicate chunk file AND a
    whole-turn redelivery file arriving AFTER those turns were
    assembled, emitted and dropped from GroupState — only the
    watermarked chunk dedup stops the re-emit (the assembler alone
    would assemble the second copy again). Oracle: the documents
    table, each doc exactly once."""
    _prep(spark)
    import shutil
    import tempfile
    from bank_statement_pdf_parser_spark.streaming.assembler import (
        CHUNKS_DDL, assemble_turns)
    from bank_statement_pdf_parser_spark.streaming.dedup_stream import (
        dedup_chunks)
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
            .select("doc_id", "text"))
    third = (F.length("text") + 2 - ((F.length("text") + 2) % 3)) / 3
    clen = third.cast("int")
    chunks = (docs.select(
        "doc_id", "text", clen.alias("clen"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("ci"))
        .select(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("ci").cast("int").alias("chunk_idx"),
            F.lit(3).cast("int").alias("n_chunks"),
            F.substring("text", F.col("ci") * F.col("clen") + 1,
                        F.col("clen")).alias("chunk"),
            F.lit(None).cast("string").alias("tool"),
            F.lit("2026-01-05 10:00:00").cast("timestamp").alias("ts"),
            F.pmod(F.col("doc_id") + F.col("ci"), F.lit(3)).alias("f")))
    tmp = tempfile.mkdtemp(prefix="x-stream-curate-")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        for f in range(3):
            (chunks.filter(F.col("f") == f).drop("f").coalesce(1)
             .write.parquet(f"{tmp}/src/f{f}"))
        # f3: duplicate chunk deliveries; f4: whole-turn redeliveries
        # of the first 25 docs — both AFTER every original chunk
        (chunks.filter(F.col("f") == 0).drop("f").coalesce(1)
         .write.parquet(f"{tmp}/src/f3"))
        (chunks.filter(F.col("doc_id") < 25).drop("f").coalesce(1)
         .write.parquet(f"{tmp}/src/f4"))
        stream = (spark.readStream.schema(CHUNKS_DDL)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/src/*"))
        q = (assemble_turns(dedup_chunks(stream, within="365 days"),
                            timeout_ms=None)
             .writeStream.format("memory").queryName("x_stream_curate")
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ck").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        # clean up even on failure so repeated gate runs don't
        # accumulate x-stream-curate-* tempdirs (ADVICE r5)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return (spark.sql("SELECT * FROM x_stream_curate")
            .select(F.regexp_replace("conv_id", "^doc-", "")
                    .cast("long").alias("doc_id"), "text"))


def _q_x_pivot(spark, sf_dir):
    """Pivot (long -> wide conditional aggregation): per-user event
    value totals by event_type. Sums run in decimal(18,2) so the hash
    comparison is exact regardless of either engine's addition order."""
    _prep(spark)
    dec = F.col("value").cast("decimal(18,2)")
    return (_t(spark, sf_dir, "events")
            .withColumn("v", dec)
            .groupBy("user_id")
            .pivot("event_type", ["signup", "purchase", "error"])
            .agg(F.coalesce(F.sum("v"), F.lit(0).cast("decimal(18,2)"))
                 # decimal keeps the SUM exact in any addition order;
                 # double on the way out matches DuckDB's float64 fetch
                 .cast("double"))
            .withColumnsRenamed({"signup": "v_signup",
                                 "purchase": "v_purchase",
                                 "error": "v_error"}))


_X_PIVOT_SQL = """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'
                         THEN CAST(value AS DECIMAL(18,2)) END),
                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS v_signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) END),
                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS v_purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error'
                         THEN CAST(value AS DECIMAL(18,2)) END),
                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS v_error
FROM events GROUP BY user_id
"""


def _q_x_cube(spark, sf_dir):
    """CUBE aggregate (all grouping-set combinations) with grouping_id
    to disambiguate the NULL rollup rows; decimal-exact sums."""
    _prep(spark)
    return (_t(spark, sf_dir, "events")
            .withColumn("v", F.col("value").cast("decimal(18,2)"))
            .withColumn("par", (F.col("user_id") % 2).cast("int"))
            .cube("event_type", "par")
            .agg(F.count("*").alias("n"),
                 F.sum("v").cast("double").alias("total"),
                 F.grouping_id().alias("gid")))


_X_CUBE_SQL = """
SELECT event_type, CAST(user_id % 2 AS INTEGER) AS par,
       count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       GROUPING(event_type) * 2 + GROUPING(user_id % 2) AS gid
FROM events GROUP BY CUBE (event_type, user_id % 2)
"""


def _q_x_curation_pipeline(spark, sf_dir):
    """End-to-end training-data curation — the composition the x_*
    operators exist for, verified as ONE pipeline: (1) exact dedup
    (md5 groupBy, keep min doc_id), (2) near-dup removal (winnowing
    fingerprints; a doc sharing >= 3 fingerprints with ANY lower-id
    stage-1 survivor is dropped — non-cascading, deterministic),
    (3) quality gate (>= 10 tokens and >= 1% stopwords). Near-dup is
    RELATIVE overlap — drop b when the shared fingerprints cover >=
    half of b's fingerprint set (an absolute count is meaningless on
    a small shared vocabulary: at >=3 shared this corpus collapses to
    1 survivor). Every stage is a hash/fingerprint equi-join or
    per-doc expression — nothing pairwise, the same shapes already
    gated individually.

    The fingerprint self-join is CAPPED (neardup.capped_shared_fp_counts,
    max_fp_freq=256): fingerprints held by more docs are dropped before
    the pair join, with drop counts riding an Observation. 256 exceeds
    this corpus's hottest fingerprint (242 at sf0.001, 233 at sf0.01 —
    output unchanged here) and the cap is MIRRORED in the oracle SQL
    (HAVING count(*) <= 256), so the gate verifies the capped
    semantics, not just this corpus. The relative-overlap DENOMINATOR
    stays the full fingerprint set: capping can only reduce n_shared,
    so a hot fingerprint can only make the rule more conservative,
    never drop extra docs."""
    _prep(spark)
    from pyspark.sql import Observation
    from bank_statement_pdf_parser_spark.operators.neardup import (
        capped_shared_fp_counts, exact_dedup)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        quality_signals, winnow_fingerprints)
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
            .select("doc_id", "text"))
    groups = exact_dedup(docs).select(
        F.col("keep_id").alias("doc_id"), "n_copies")
    uniq = docs.join(groups, "doc_id").repartition(16, "doc_id")
    fps = (winnow_fingerprints(uniq, k=8, w=4)
           .select("doc_id", F.explode("fps").alias("fp")))
    nfp = fps.groupBy("doc_id").agg(F.count("*").alias("nfp"))
    shared = capped_shared_fp_counts(
        fps, max_fp_freq=256, observation=Observation("curation_cap"))
    drop = (shared.join(nfp, shared.b == nfp.doc_id)
            .filter(2 * F.col("n_shared") >= F.col("nfp"))
            .select(F.col("b").alias("doc_id")).distinct())
    s2 = uniq.join(drop, "doc_id", "left_anti")
    q = quality_signals(F.col("text"))
    return (s2.select("doc_id", "n_copies",
                      q["n_tokens"].alias("n_tokens"),
                      q["stop_hits"].alias("stop_hits"))
            .filter((F.col("n_tokens") >= 10)
                    & (100 * F.col("stop_hits") >= F.col("n_tokens"))))


_X_CURATION_SQL = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
g AS (SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM d GROUP BY md5(text)),
u AS (SELECT d.doc_id, d.text, g.n_copies
      FROM d JOIN g ON d.doc_id = g.keep_id),
gr AS (SELECT doc_id, text,
              CAST(unnest(range(length(text) - 7)) AS INTEGER) AS i
       FROM u),
h AS (SELECT doc_id, i,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 [CAST(ascii(substr(text, i+1+j, 1)) AS BIGINT)
                  FOR j IN range(8)]),
               (acc, c) -> (acc*257 + c) % 1000000007) AS hv,
             length(text) - 7 AS ng
      FROM gr),
wmin AS (SELECT doc_id, i, ng,
                min(hv) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                  AS fp
         FROM h),
fp AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= ng - 4),
cnt AS (SELECT doc_id, count(*) AS nfp FROM fp GROUP BY doc_id),
okfp AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 256),
fpc AS (SELECT f.doc_id, f.fp FROM fp f JOIN okfp USING (fp)),
pair AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared
         FROM fpc l JOIN fpc r ON l.fp = r.fp AND l.doc_id < r.doc_id
         GROUP BY l.doc_id, r.doc_id),
dropped AS (SELECT DISTINCT p.b AS doc_id FROM pair p
            JOIN cnt c ON p.b = c.doc_id
            WHERE 2 * p.n_shared >= c.nfp),
s2 AS (SELECT * FROM u
       WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
q AS (SELECT doc_id, n_copies,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '), x -> x IN
               ('the','a','of','and','to','in'))) AS BIGINT) AS stop_hits
      FROM s2)
SELECT doc_id, n_copies, n_tokens, stop_hits FROM q
WHERE n_tokens >= 10 AND 100 * stop_hits >= n_tokens
"""


def _q_x_longdoc(spark, sf_dir):
    """Long-document cost class, pinned by the gate (round-4 VERDICT
    task #4): x_fingerprint already carries a 12 KB doc through the
    winnowing plan; this query runs the REMAINING per-doc text
    operators — quality signals, BPE-ish token count, SimHash — over
    >=10 KB documents (each base doc repeated 160x: 12-77 KB here),
    synthesized identically in both engines so no fixture change is
    needed. SimHash is gated via its order-insensitivity invariant
    (reversed token stream -> hamming 0), computed as a real
    bit_count(xor) Spark-side and predicted as 0 by the oracle.
    check_contract records this query's wall per round, which is the
    long-doc cost trend line."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import simhash64
    from bank_statement_pdf_parser_spark.operators.textstats import (
        bpe_token_count, quality_signals)
    docs = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 8)
            .select("doc_id",
                    F.rtrim(F.repeat(F.concat(F.col("text"), F.lit(" ")),
                                     160)).alias("text"))
            .repartition(8, "doc_id"))
    q = quality_signals(F.col("text"))
    stats = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["stop_hits"].alias("stop_hits"),
        q["punct_chars"].alias("punct_chars"),
        q["sum_token_len"].alias("sum_token_len"),
        bpe_token_count(F.col("text")).alias("n_bpe"))
    rev = docs.select(
        "doc_id",
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"))
    h0 = simhash64(docs).withColumnRenamed("simhash", "h0")
    h1 = simhash64(rev).withColumnRenamed("simhash", "h1")
    ham = h0.join(h1, "doc_id").select(
        "doc_id",
        F.bit_count(F.col("h0").bitwiseXOR(F.col("h1"))).cast("long")
        .alias("ham_rev"))
    return stats.join(ham, "doc_id")


_X_LONGDOC_SQL = """
WITH d AS (SELECT doc_id, rtrim(repeat(text || ' ', 160)) AS t
           FROM documents WHERE doc_id < 8),
s AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM d)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, x -> x IN
         ('the','a','of','and','to','in'))) AS BIGINT) AS stop_hits,
       CAST(length(regexp_replace(t, '[a-zA-Z0-9\\s]', '', 'g'))
         AS BIGINT) AS punct_chars,
       CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
         AS BIGINT) AS sum_token_len,
       CAST(len(regexp_extract_all(t,
         '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS INTEGER) AS n_bpe,
       CAST(0 AS BIGINT) AS ham_rev
FROM s
"""


def _q_x_session_gap(spark, sf_dir):
    """Gap-based sessionization (the classic idle-timeout rule, distinct
    from D8's anchor rule): a new session starts when a user's gap
    since their previous event exceeds 30 minutes; session ids are the
    running count of session starts — lag + conditional cumsum over
    one window, a single shuffle on the user key."""
    _prep(spark)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us("ts")).over(w)
    new_sess = (prev.isNull()
                | ((us("ts") - prev) > 30 * 60 * 1_000_000)).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (_t(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.sum(new_sess).over(wsum).alias("session_id")))


_X_SESSION_GAP_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR t - prev > 30*60*1000000
                     THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_id
FROM e
"""


def _q_x_retention(spark, sf_dir):
    """Weekly cohort retention matrix: cohort = epoch-week of a
    user's FIRST event, cell (cohort, offset) = distinct users from
    that cohort active `offset` weeks later. Two partial-aggregatable
    groupBys (per-user first-ts, then per-cell distinct count) — the
    standard warehouse retention workload at the cost class of two
    slim shuffles. Week arithmetic is integer epoch-day DIV 7 so both
    engines bucket identically (no timezone/week-start dialects)."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"))
    # single floor(micros / week_us): for positive epochs this equals
    # the day-then-week nesting and is the form both engines compute
    # identically (DuckDB's // on DOUBLE does not floor stepwise)
    week = (F.unix_micros(F.col("ts"))
            / F.lit(604800000000)).cast("long")
    acts = ev.select("user_id", week.alias("week")).distinct()
    cohort = acts.groupBy("user_id").agg(F.min("week").alias("cohort"))
    cells = (acts.join(cohort, "user_id")
             .groupBy("cohort", (F.col("week") - F.col("cohort"))
                      .alias("offset"))
             .agg(F.countDistinct("user_id").alias("n_users")))
    return cells.select("cohort", "offset", "n_users")


_X_RETENTION_SQL = """
WITH acts AS (SELECT DISTINCT user_id,
        CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week FROM events),
coh AS (SELECT user_id, min(week) AS cohort FROM acts GROUP BY user_id)
SELECT c.cohort, a.week - c.cohort AS offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM acts a JOIN coh c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


def _q_x_event_funnel(spark, sf_dir):
    """Ordered event-SEQUENCE funnel (first-touch attribution):
    signup -> click -> purchase per user, each later stage requiring
    its first occurrence STRICTLY after the previous stage's first
    occurrence. Unlike x_filter_funnel (per-row predicates), this is
    cross-row per-user sequencing — one partial-aggregatable
    groupBy(user) of conditional MINs plus a single global fold, the
    same cost class as one count(distinct user) at any corpus size."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")

    def first(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first("signup").alias("t_s"), first("click").alias("t_c"),
        first("purchase").alias("t_p"))
    s1 = F.col("t_s").isNotNull()
    s2 = s1 & (F.col("t_c") > F.col("t_s"))
    s3 = s2 & (F.col("t_p") > F.col("t_c"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s1.cast("long")).alias("n_signup"),
        F.sum(s2.cast("long")).alias("n_click_after"),
        F.sum(s3.cast("long")).alias("n_purchase_after"))


_X_EVENT_FUNNEL_SQL = """
WITH f AS (SELECT user_id,
       min(CASE WHEN event_type = 'signup' THEN ts END) AS t_s,
       min(CASE WHEN event_type = 'click' THEN ts END) AS t_c,
       min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_p
  FROM events GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(CASE WHEN t_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_signup,
  CAST(sum(CASE WHEN t_c > t_s THEN 1 ELSE 0 END) AS BIGINT)
    AS n_click_after,
  CAST(sum(CASE WHEN t_c > t_s AND t_p > t_c THEN 1 ELSE 0 END)
    AS BIGINT) AS n_purchase_after
FROM f
"""


def _q_x_semdedup(spark, sf_dir):
    """SEMANTIC dedup end-to-end over the embedding column: RHP-LSH
    buckets -> capped candidate pairs -> exact-cosine verify (arrow
    kernel) -> connected components -> keep min-id representative +
    family size. Corpus = embeddings U a +100000 copy U a +200000 copy
    of every 5th vector, so families have size 2 and 3 and components
    must CHAIN (1e5<->2e5 may only connect through the original or
    directly — either way min-label propagation folds them). Identical
    vectors share every sign bit (recall 1.0 by construction) and the
    base corpus's max distinct-pair cosine is 0.51, so the >=0.99
    verify keeps exactly the identical-vector edges — the oracle is a
    plain GROUP BY embedding. All 500 isolated vectors ride the
    `nodes` frame (a dedup must keep singletons, not drop them)."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import (
        ann_candidate_pairs, rhp_buckets, verified_cosine_pairs)
    from bank_statement_pdf_parser_spark.operators.components import (
        connected_components)
    # fixture-scale partition sizing (1.2k vectors): the component
    # iterations are tiny-frame joins where per-task overhead
    # dominates at 16+ partitions (17s -> 8s measured); production
    # sizes shuffle partitions to data volume as usual
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = (emb
              .unionByName(emb.select((F.col("vec_id") + 100000)
                                      .alias("vec_id"), "embedding"))
              .unionByName(emb.filter(F.col("vec_id") % 5 == 0)
                           .select((F.col("vec_id") + 200000)
                                   .alias("vec_id"), "embedding")))
    sig = rhp_buckets(corpus, n_planes=14, n_tables=2)
    cand = ann_candidate_pairs(sig)
    pairs = (verified_cosine_pairs(corpus, cand, arrow=True)
             .filter(F.round("cos", 6) >= 0.99))
    try:
        labels = connected_components(
            pairs, nodes=corpus.select(F.col("vec_id").alias("id")))
        out = (labels.groupBy("component")
               .agg(F.min("id").alias("keep_id"),
                    F.count("*").alias("family_n"))
               .select("keep_id", "family_n"))
        # the iterative localCheckpoints already materialized under
        # the narrow setting; the final groupBy is records-sized
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


_X_SEMDEDUP_SQL = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings
  UNION ALL SELECT vec_id + 200000, embedding FROM embeddings
  WHERE vec_id % 5 = 0)
SELECT CAST(min(vec_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS family_n
FROM corpus GROUP BY embedding::VARCHAR
"""


def _q_x_jpeg_stats(spark, sf_dir):
    """REAL baseline-JPEG decode inside Spark (round 6, closing the
    last decodable codec gap): each doc_id becomes a standard-
    conformant grayscale JPEG (Annex K huffman tables, byte stuffing,
    all-ones quant) of 2x2 flat 8x8 blocks valued
    (doc_id*29 + b*13) % 256. The engine runs the FULL entropy-decode
    + dequant + IDCT path (operators/multimodal.decode_jpeg); flat
    blocks make the decode integer-exact (IDCT of a DC-only block is
    S00/8, a float64-exact power-of-two scale), so the SQL oracle
    predicts the pixel sum as pure integer arithmetic."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from bank_statement_pdf_parser_spark.operators.multimodal import (
        IMAGE_STATS_DDL, image_stats_kernel)

    def build(batches):
        from bank_statement_pdf_parser_spark.operators.multimodal import (
            encode_jpeg_flat_blocks)
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            pays = [encode_jpeg_flat_blocks(np.array(
                [(i * 29 + b * 13) % 256 for b in range(4)],
                dtype=np.uint8).reshape(2, 2)) for i in ids]
            if ids:
                yield pd.DataFrame({"media_id": ids, "payload": pays})

    media = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
             .select("doc_id")
             .mapInPandas(build, "media_id long, payload binary"))
    stats = media.mapInPandas(image_stats_kernel(thumb=2), IMAGE_STATS_DDL)
    return stats.select(
        "media_id", "height", "width",
        F.round(F.get("mean_rgb", 0) * 256).cast("long").alias("sum_px"))


_X_JPEG_STATS_SQL = """
SELECT d.doc_id AS media_id, CAST(16 AS INTEGER) AS height,
       CAST(16 AS INTEGER) AS width,
       CAST(sum(64 * ((d.doc_id*29 + t.b*13) % 256)) AS BIGINT) AS sum_px
FROM documents d CROSS JOIN range(0, 4) t(b)
WHERE d.doc_id < 200
GROUP BY d.doc_id
"""


def _q_x_filter_funnel(spark, sf_dir):
    """Single-pass curation funnel (textstats.filter_funnel): three
    chained quality gates (min length, non-alpha ratio as an integer
    cross-product — no float ratios — and an ' the '-count English
    heuristic) reported as per-stage in/out/dropped counts from ONE
    aggregation over the corpus. The oracle replays the cumulative-AND
    conditional sums."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.textstats import (
        filter_funnel)
    docs = _t(spark, sf_dir, "documents")
    txt = F.col("text")
    n = F.length(txt)
    nonalpha = F.length(F.regexp_replace(txt, "[a-z ]", ""))
    the_cnt = n - F.length(F.replace(txt, F.lit(" the "), F.lit("")))
    return filter_funnel(docs, [
        ("min_length", n >= 200),
        ("alpha_ratio", nonalpha * 10 < n * 3),
        ("english", the_cnt >= 5)])


_X_FILTER_FUNNEL_SQL = """
WITH c AS (SELECT length(text) AS n,
                  length(regexp_replace(text, '[a-z ]', '', 'g')) AS na,
                  length(text) - length(replace(text, ' the ', '')) AS th
           FROM documents),
t AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN n >= 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN n >= 200 AND na * 10 < n * 3
                      THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN n >= 200 AND na * 10 < n * 3
                       AND th >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n3
      FROM c)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'min_length' AS stage,
       n0 AS n_in, n1 AS n_out, n0 - n1 AS n_dropped FROM t
UNION ALL SELECT 1, 'alpha_ratio', n1, n2, n1 - n2 FROM t
UNION ALL SELECT 2, 'english', n2, n3, n2 - n3 FROM t
"""


def _q_x_repeat_upsample(spark, sf_dir):
    """Deterministic mixture UP-sampling (sharding.repeat_upsample):
    en docs get 2 + (md5 < '8' ? 1 : 0) copies (~2.5 epochs), de
    1 + (md5 < '4') (~1.25), fr 0 + (md5 < '8') (~0.5 — fractional-
    only keeps double as downsampling), everything else exactly 1.
    Pure projection + explode, no RNG state — the oracle replays the
    md5 threshold and generate_series exactly."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.sharding import (
        repeat_upsample)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = repeat_upsample(docs, "lang",
                          {"en": (2, "8"), "de": (1, "4"),
                           "fr": (0, "8")})
    return out.select("doc_id", "lang", "copy_idx")


_X_REPEAT_UPSAMPLE_SQL = """
WITH f AS (SELECT doc_id, lang,
  CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 1 WHEN 'fr' THEN 0
            ELSE 1 END
  + CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':up1') <
      CASE lang WHEN 'en' THEN '8' WHEN 'de' THEN '4'
                WHEN 'fr' THEN '8' ELSE '0' END
    THEN 1 ELSE 0 END AS n
  FROM documents)
SELECT doc_id, lang, CAST(ci AS BIGINT) AS copy_idx
FROM f, UNNEST(generate_series(1, n)) AS g(ci)
"""


def _q_x_stream_window(spark, sf_dir):
    """Watermarked event-time windowed aggregation (§2.10:
    streaming/metrics_stream.windowed_turn_metrics) under the DuckDB
    gate. Events stream in THREE micro-batches: every day but the
    last; the last day's morning; then its evening PLUS planted late
    copies of first-day rows. Batch 0 advances the watermark past
    every early window's end, batch 1 EVICTS them (emission), so the
    batch-2 plants hit an already-finalized window and are DROPPED
    (measured semantics, Spark 4: a late row merging into still-LIVE
    state is accepted — the drop predicate is the previous batch's
    committed watermark, hence the middle batch); append mode
    withholds the still-open last-day window. The oracle replays the
    watermark arithmetic in ANSI SQL: a plain day-bucket aggregation
    of events (plants dropped => totals equal the batch aggregation)
    filtered to window_end <= max(ts) - 1h. Late-drop and emission
    discipline are both value-checked, not just row-counted."""
    _prep(spark)
    import shutil
    import tempfile
    from bank_statement_pdf_parser_spark.streaming.metrics_stream import (
        windowed_turn_metrics)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_type").alias("role"), F.col("props").alias("text"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    day1_end = lo.replace(hour=0, minute=0, second=0,
                          microsecond=0) + __import__(
                              "datetime").timedelta(days=1)
    cut = hi.replace(hour=0, minute=0, second=0, microsecond=0)
    noon = cut + __import__("datetime").timedelta(hours=12)
    early = ev.filter(F.col("ts") < F.lit(cut))
    morning = ev.filter((F.col("ts") >= F.lit(cut))
                        & (F.col("ts") < F.lit(noon)))
    # late-beyond-watermark plants: first-day rows re-delivered in
    # batch 2 — batch 1 ran with batch 0's committed watermark and
    # evicted their window, so batch 2's filter drops them
    late = early.filter((F.col("ts") < F.lit(day1_end))
                        & (F.col("event_id") % 5 == 0))
    evening = ev.filter(F.col("ts") >= F.lit(noon)).unionByName(late)
    tmp = tempfile.mkdtemp(prefix="x-stream-window-")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        sel = ("ts", "role", "text")
        early.select(*sel).coalesce(1).write.parquet(f"{tmp}/src/f0")
        morning.select(*sel).coalesce(1).write.parquet(f"{tmp}/src/f1")
        evening.select(*sel).coalesce(1).write.parquet(f"{tmp}/src/f2")
        stream = (spark.readStream
                  .schema("ts timestamp, role string, text string")
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/src/*"))
        # state-store partition count is fixed at the checkpoint's
        # first batch; 16 partitions x 5 micro-batches of per-partition
        # store overhead was ~4x this query's wall (measured 13.4s ->
        # 3.3s). The checkpoint is a fresh tempdir, so the narrow
        # setting never leaks into a real pipeline's state.
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (windowed_turn_metrics(stream, window_dur="1 day",
                                   watermark="1 hour")
             .writeStream.format("memory").queryName("x_stream_window")
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ck").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return (spark.sql("SELECT * FROM x_stream_window")
            .select(F.unix_micros(F.col("win.start").cast("timestamp"))
                    .alias("w_us"), "role", "n_turns", "bytes_in"))


_X_STREAM_WINDOW_SQL = """
WITH mx AS (SELECT max(ts) AS m FROM events),
agg AS (SELECT time_bucket(INTERVAL 1 DAY, ts) AS ws,
               event_type AS role, count(*) AS n_turns,
               CAST(sum(strlen(props)) AS BIGINT) AS bytes_in
        FROM events GROUP BY 1, 2)
SELECT epoch_us(ws) AS w_us, role, n_turns, bytes_in
FROM agg, mx WHERE ws + INTERVAL 1 DAY <= m - INTERVAL 1 HOUR
"""


def _q_x_knn_batch(spark, sf_dir):
    """Batched exact top-k cosine: 4 probe vectors scored against the
    whole embeddings corpus in ONE scan (ann.knn_topk_batch, arrow
    engine: per-Arrow-batch float64 matmul + lossless local top-k cut,
    so only batches x M x k slim rows leave the scan; final window
    runs over 4 tiny groups). Ranking order (round(cos,6) DESC,
    vec_id ASC) is the oracle's ORDER BY, verbatim — exact top-k, not
    approximate."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.ann import knn_topk_batch
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 125 == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    return knn_topk_batch(emb, qs, k=5)


_X_KNN_BATCH_SQL = """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
           WHERE vec_id % 125 = 3),
z AS (SELECT q.q_id, e.vec_id, unnest(e.embedding)::DOUBLE AS a,
             unnest(q.q_emb)::DOUBLE AS b
      FROM embeddings e CROSS JOIN q),
d AS (SELECT q_id, vec_id, SUM(a * b) AS dot,
             sqrt(SUM(a * a)) * sqrt(SUM(b * b)) AS nrm
      FROM z GROUP BY q_id, vec_id),
r AS (SELECT q_id, vec_id, round(dot / nrm, 6) AS cos_r,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY round(dot / nrm, 6) DESC, vec_id) AS BIGINT)
             AS rnk
      FROM d)
SELECT q_id, vec_id, cos_r, rnk FROM r WHERE rnk <= 5
"""


def _q_x_minhash_est(spark, sf_dir):
    """MinHash Jaccard ESTIMATOR, engine-portable and oracle-exact:
    16 md5 min-hashes per doc (neardup.minhash_md5_long — md5 hex +
    lexicographic min replay identically in ANSI SQL) joined against
    the exact shingle Jaccard on the same pairs, so the gate verifies
    the estimator's VALUE — not just the LSH banding built on top of
    it (x_neardup_pipeline). Corpus: docs with >=40 tokens UNION a
    +100000 copy with the first 30 tokens dropped; pairs (i, i+1e5)
    span a full range of true Jaccards, every one ANSI-predicted."""
    _prep(spark)
    from bank_statement_pdf_parser_spark.operators.neardup import (
        minhash_estimate_pairs, minhash_md5_long, ngram_jaccard_pairs,
        shingles)
    toks = F.split(F.col("text"), " ")
    base = (_t(spark, sf_dir, "documents")
            .filter((F.col("doc_id") % 3 == 0) & (F.size(toks) >= 40))
            .select("doc_id", "text"))
    tail = F.array_join(F.slice(toks, 31, F.size(toks) - 30), " ")
    corpus = base.unionByName(base.select(
        (F.col("doc_id") + 100000).alias("doc_id"), tail.alias("text")))
    pairs = base.select(F.col("doc_id").alias("a"),
                        (F.col("doc_id") + 100000).alias("b"))
    sig = minhash_md5_long(shingles(corpus), n_hashes=16)
    est = minhash_estimate_pairs(sig, pairs)
    ex = ngram_jaccard_pairs(corpus, pairs)
    return (est.join(ex, ["a", "b"])
            .select("a", "b", F.round("est_jaccard", 6).alias("est_j"),
                    F.round("jaccard", 6).alias("exact_j")))


_X_MINHASH_EST_SQL = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
              WHERE doc_id % 3 = 0
                AND len(string_split(text, ' ')) >= 40),
corpus AS (SELECT doc_id, t FROM base
           UNION ALL SELECT doc_id + 100000, t[31:] FROM base),
grams AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ')
                 AS shingle
          FROM corpus, UNNEST(generate_series(1, len(t) - 4)) AS g(i)),
sig AS (SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS mh
        FROM grams CROSS JOIN UNNEST(generate_series(0, 15)) AS s(seed)
        GROUP BY doc_id, seed),
pairs AS (SELECT doc_id AS a, doc_id + 100000 AS b FROM base),
est AS (SELECT p.a, p.b,
               avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS e
        FROM pairs p JOIN sig sa ON sa.doc_id = p.a
        JOIN sig sb ON sb.doc_id = p.b AND sb.seed = sa.seed
        GROUP BY p.a, p.b),
sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (SELECT p.a, p.b, count(*) AS ni
          FROM pairs p JOIN grams ga ON ga.doc_id = p.a
          JOIN grams gb ON gb.doc_id = p.b AND gb.shingle = ga.shingle
          GROUP BY p.a, p.b)
SELECT e.a, e.b, round(e.e, 6) AS est_j,
       round(CAST(i.ni AS DOUBLE) / (za.n + zb.n - i.ni), 6) AS exact_j
FROM est e JOIN inter i ON i.a = e.a AND i.b = e.b
JOIN sz za ON za.doc_id = e.a JOIN sz zb ON zb.doc_id = e.b
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness harness records only the
    # first ~50 registry entries (CORRECTNESS_r03/r04 both stopped at
    # the same 50 keys while tools/check_contract.py passes the full
    # registry), so the keys with the OLDEST driver evidence lead.
    # Round-7 rotation (VERDICT r6 task #1): the 47 keys whose only
    # driver rows are r05 move to the front, so CORRECTNESS_r06 ∪ r07
    # gives every one of the 97 registered keys a ≤2-round-old driver
    # row. The 50 keys recorded in CORRECTNESS_r06 follow; their
    # regression signal this round is the committed
    # tools/CONTRACT_GATE_r07.log (full registry, both SFs).
    return {
        # --- 47 keys whose newest driver row is CORRECTNESS_r05 ---
        "x_token_bpe": _q_x_token_bpe,
        "x_quality_score": _q_x_quality_score,
        "x_fingerprint": _q_x_fingerprint,
        "x_image_stats": _q_x_image_stats,
        "x_audio_stats": _q_x_audio_stats,
        "x_video_frames": _q_x_video_frames,
        "x_binary_checksum": _q_x_binary_checksum,
        "x_asof_join": _q_x_asof_join,
        "x_range_join": _q_x_range_join,
        "x_stream_assemble": _q_x_stream_assemble,
        "x_pivot": _q_x_pivot,
        "x_cube": _q_x_cube,
        "x_curation_pipeline": _q_x_curation_pipeline,
        "x_session_gap": _q_x_session_gap,
        "flagship_extract_transactions": _flagship_transactions,
        "flagship_extract_spans": _flagship_spans,
        "flagship_relational_txns": _flagship_relational,
        "flagship_dbs_txns": _dialect_txns("dbs_transcripts"),
        "flagship_ocbc_txns": _dialect_txns("ocbc_transcripts"),
        "flagship_ocbc_spans": _q_flagship_ocbc_spans,
        "flagship_hdfc_txns": _dialect_txns("hdfc_transcripts"),
        "flagship_html_spans": _q_flagship_html_spans,
        "flagship_jitter_txns": _dialect_txns("uob_jitter_transcripts"),
        "p4_noise_reject": _q_p4_noise_reject,
        "p2_filter_project": _q_p2_filter_project,
        "p3_classify": _q_p3_classify,
        "d1_token_count": _q_d1_token_count,
        "d3_regex_filter": _q_d3_regex_filter,
        "d4_token_freq": _q_d4_token_freq,
        "d8_sessionize": _q_d8_sessionize,
        "d11_dedup": _q_d11_dedup,
        "f1_date_bins": _q_f1_date_bins,
        "f2_amount_parse": _q_f2_amount_parse,
        "f8_json": _q_f8_json,
        "j1_broadcast_join": _q_j1_broadcast_join,
        "j3_anti_join": _q_j3_anti_join,
        "j4_semi_join": _q_j4_semi_join,
        "a1_agg_metrics": _q_a1_agg_metrics,
        "a2_ordered_collect": _q_a2_ordered_collect,
        "a3_minmax": _q_a3_minmax,
        "a4_distinct": _q_a4_distinct,
        "a5_rollup": _q_a5_rollup,
        "w3_lag_delta": _q_w3_lag_delta,
        "w4_rank_topk": _q_w4_rank_topk,
        "o1_topk_orders": _q_o1_topk_orders,
        "o3_union": _q_o3_union,
        "o4_except": _q_o4_except,
        # --- 50 keys recorded green in CORRECTNESS_r06 ---
        "x_retention": _q_x_retention,
        "x_event_funnel": _q_x_event_funnel,
        "x_semdedup": _q_x_semdedup,
        "x_jpeg_stats": _q_x_jpeg_stats,
        "x_filter_funnel": _q_x_filter_funnel,
        "x_repeat_upsample": _q_x_repeat_upsample,
        "x_stream_window": _q_x_stream_window,
        "x_knn_batch": _q_x_knn_batch,
        "x_minhash_est": _q_x_minhash_est,
        "x_asof_nearest": _q_x_asof_nearest,
        "x_curation_v2": _q_x_curation_v2,
        "x_group_cap": _q_x_group_cap,
        "x_tfidf_terms": _q_x_tfidf_terms,
        "x_context_windows": _q_x_context_windows,
        "x_centroid_gate": _q_x_centroid_gate,
        "x_unicode_nfc": _q_x_unicode_nfc,
        "x_line_dedup": _q_x_line_dedup,
        "x_pack_shards": _q_x_pack_shards,
        "x_quantile_gate": _q_x_quantile_gate,
        "x_corpus_mix": _q_x_corpus_mix,
        "x_simhash_neardup": _q_x_simhash_neardup,
        "x_dedup_components": _q_x_dedup_components,
        "x_dedup_keep_one": _q_x_dedup_keep_one,
        "x_decontaminate": _q_x_decontaminate,
        "x_repetition": _q_x_repetition,
        "x_pii_redact": _q_x_pii_redact,
        "x_png_stats": _q_x_png_stats,
        "x_asof_within": _q_x_asof_within,
        "x_asof_forward": _q_x_asof_forward,
        "x_stratified_split": _q_x_stratified_split,
        "s6_partition_metrics": _q_s6_partition_metrics,
        "x_dedup_md5": _q_x_dedup_md5,
        "x_token_stats": _q_x_token_stats,
        "x_quality": _q_x_quality,
        "x_langid": _q_x_langid,
        "x_ann_cosine": _q_x_ann_cosine,
        "f6_string_utils": _q_f6_string_utils,
        "f7_math_dates": _q_f7_math_dates,
        "w5_frame_agg": _q_w5_frame_agg,
        "v1_balance_check": _q_v1_balance_check,
        "x_neardup_pipeline": _q_x_neardup_pipeline,
        "x_ann_lsh": _q_x_ann_lsh,
        "x_ann_multiprobe": _q_x_ann_multiprobe,
        "x_ann_ivf": _q_x_ann_ivf,
        "x_simhash": _q_x_simhash,
        "x_lattice_rails": _q_x_lattice_rails,
        "x_exact_dedup_groups": _q_x_exact_dedup_groups,
        "x_longdoc": _q_x_longdoc,
        "x_stream_curate": _q_x_stream_curate,
        "x_percentile": _q_x_percentile,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "x_retention": _X_RETENTION_SQL,
        "x_event_funnel": _X_EVENT_FUNNEL_SQL,
        "x_semdedup": _X_SEMDEDUP_SQL,
        "x_jpeg_stats": _X_JPEG_STATS_SQL,
        "x_filter_funnel": _X_FILTER_FUNNEL_SQL,
        "x_repeat_upsample": _X_REPEAT_UPSAMPLE_SQL,
        "x_stream_window": _X_STREAM_WINDOW_SQL,
        "x_knn_batch": _X_KNN_BATCH_SQL,
        "x_minhash_est": _X_MINHASH_EST_SQL,
        "flagship_extract_transactions": _FLAGSHIP_TXNS_SQL,
        "flagship_extract_spans": _FLAGSHIP_SPANS_SQL,
        "flagship_relational_txns": _FLAGSHIP_TXNS_SQL,
        "flagship_dbs_txns": _FLAGSHIP_DBS_SQL,
        "flagship_ocbc_txns": _FLAGSHIP_OCBC_TXNS_SQL,
        "flagship_ocbc_spans": _FLAGSHIP_OCBC_SPANS_SQL,
        "flagship_hdfc_txns": _FLAGSHIP_HDFC_SQL,
        "flagship_html_spans": _FLAGSHIP_HTML_SPANS_SQL,
        "flagship_jitter_txns": _FLAGSHIP_JITTER_SQL,
        "p4_noise_reject": _P4_NOISE_SQL,
        "p2_filter_project": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_type = 'purchase' AND value > 50.0"),
        "p3_classify": (
            "SELECT CASE WHEN text LIKE '%spark%' THEN 'spark' "
            "WHEN text LIKE '%window%' THEN 'window' ELSE 'other' END AS cls, "
            "count(*) AS n FROM documents GROUP BY 1"),
        "d1_token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) "
            "AS n_tokens FROM documents"),
        "d3_regex_filter": (
            "SELECT doc_id, lang FROM documents "
            "WHERE NOT regexp_matches(text, '^(the|a) ')"),
        "d4_token_freq": (
            "SELECT tok, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) "
            "AS tok FROM documents) GROUP BY tok HAVING count(*) > 200"),
        "d8_sessionize": (
            "SELECT event_id, user_id, CAST(SUM(CASE WHEN event_type='signup' "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM events"),
        "d11_dedup": (
            "SELECT count(*) AS n_unique FROM (SELECT DISTINCT text FROM documents)"),
        "f1_date_bins": (
            "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y, "
            "CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m, "
            "count(*) AS n FROM orders GROUP BY 1, 2"),
        "f2_amount_parse": (
            "WITH s AS (SELECT l_returnflag, "
            "CASE WHEN l_returnflag = 'R' THEN '(' || "
            "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '.25)' "
            "ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '.25' END || "
            "CASE WHEN l_linestatus = 'O' THEN ' CR' ELSE '' END AS cell "
            "FROM lineitem) "
            "SELECT l_returnflag, CAST(SUM("
            "CAST(regexp_replace(regexp_replace(cell, ' (CR|DR)$', ''), "
            "'[(),]', '', 'g') AS DECIMAL(18,2)) * "
            "CASE WHEN cell LIKE '(%' THEN -1 ELSE 1 END) AS DOUBLE) "
            "AS amt_sum FROM s GROUP BY l_returnflag"),
        "f8_json": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) "
            "AS k FROM events WHERE CAST(json_extract_string(props, '$.k') "
            "AS INTEGER) > 50"),
        "j1_broadcast_join": (
            "SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) "
            "AS DOUBLE) AS revenue, count(*) AS n FROM lineitem "
            "JOIN part ON l_partkey = p_partkey GROUP BY p_brand"),
        "j3_anti_join": (
            "SELECT c_mktsegment, count(*) AS n FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) "
            "GROUP BY c_mktsegment"),
        "j4_semi_join": (
            "SELECT p_brand, count(*) AS n FROM part "
            "WHERE p_partkey IN (SELECT l_partkey FROM lineitem) "
            "GROUP BY p_brand"),
        "a1_agg_metrics": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) "
            "AS sum_qty, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
            "AS sum_base_price, count(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
        "a2_ordered_collect": (
            "SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) "
            "AS seq FROM events GROUP BY user_id"),
        "a3_minmax": (
            "SELECT user_id, min(value) AS min_value, max(value) AS max_value, "
            "CAST(min(ts) AS DATE) AS first_day, CAST(max(ts) AS DATE) "
            "AS last_day FROM events GROUP BY user_id"),
        "a4_distinct": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY event_type"),
        "a5_rollup": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem "
            "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
        "w3_lag_delta": (
            "SELECT user_id, count(*) AS n_jumps FROM ("
            "SELECT user_id, value - LAG(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS d FROM events) "
            "WHERE d IS NOT NULL AND d > 50.0 GROUP BY user_id"),
        "w4_rank_topk": (
            "SELECT user_id, event_id, value FROM ("
            "SELECT user_id, event_id, value, row_number() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) AS rn "
            "FROM events WHERE event_type = 'purchase') WHERE rn = 1"),
        "o1_topk_orders": (
            "SELECT o_orderkey, CAST(total AS DOUBLE) AS total FROM ("
            "SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total "
            "FROM orders ORDER BY total DESC, o_orderkey LIMIT 20)"),
        "o3_union": (
            "SELECT DISTINCT nationkey FROM ("
            "SELECT c_nationkey AS nationkey FROM customer "
            "UNION ALL SELECT s_nationkey FROM supplier)"),
        "o4_except": (
            "SELECT DISTINCT c_nationkey AS nationkey FROM customer "
            "WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier)"),
        "s6_partition_metrics": (
            "SELECT lang, count(*) AS rows, CAST(SUM(n_chars) AS BIGINT) "
            "AS bytes_in FROM documents GROUP BY lang"),
        "x_dedup_md5": (
            "SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique "
            "FROM documents"),
        "x_token_stats": (
            "SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) "
            "AS total_tokens, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang"),
        "x_quality": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_total, "
            "CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS BIGINT) "
            "AS n_nonalpha FROM documents"),
        "x_langid": (
            "SELECT lang, CASE WHEN (length(text) - length(replace(text, "
            "' the ', ''))) / 5 >= 1 THEN 'en' ELSE 'other' END AS pred, "
            "count(*) AS n FROM documents GROUP BY 1, 2"),
        "x_ann_cosine": (
            "WITH q AS (SELECT embedding AS q_emb FROM embeddings "
            "WHERE vec_id = 0), "
            "z AS (SELECT e.vec_id, e.label, "
            "unnest(e.embedding)::DOUBLE AS a, unnest(q.q_emb)::DOUBLE AS b "
            "FROM embeddings e CROSS JOIN q), "
            "d AS (SELECT vec_id, label, SUM(a*b) AS dot, "
            "sqrt(SUM(a*a)) * sqrt(SUM(b*b)) AS nrm FROM z "
            "GROUP BY vec_id, label) "
            "SELECT vec_id, label, round(dot/nrm, 6) AS cos_r FROM d "
            "WHERE round(dot/nrm, 6) >= 0.25"),
        "f6_string_utils": (
            "SELECT doc_id, upper(substring(text, 1, 10)) AS head10, "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded, "
            "CAST(length(translate(text, 'aeiou', '')) AS BIGINT) "
            "AS n_non_vowel, "
            "CAST(strpos(text, ' the ') AS BIGINT) AS pos_the "
            "FROM documents WHERE doc_id < 300"),
        "f7_math_dates": (
            "SELECT o_orderkey, CAST(last_day(CAST(o_orderdate AS DATE)) "
            "AS DATE) AS month_end, "
            "CAST(date_diff('day', CAST(o_orderdate AS DATE), "
            "last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_to_me, "
            "CAST(abs(round(CAST(o_totalprice AS DECIMAL(18,2)), 0)) "
            "AS BIGINT) AS rounded_total "
            "FROM orders WHERE o_orderkey < 2000"),
        "w5_frame_agg": (
            "SELECT event_id, user_id, "
            "first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
            "FOLLOWING) AS first_type, "
            "last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
            "FOLLOWING) AS last_type FROM events"),
        "v1_balance_check": _V1_BALANCE_SQL,
        "x_simhash": (
            "SELECT doc_id, CAST(0 AS BIGINT) AS ham_reorder, "
            "true AS pert_differs FROM documents WHERE doc_id < 300"),
        "x_simhash_neardup": (
            # salt dominance makes the emitted pair set exactly the
            # bag-equality self-join over the identically-built corpus
            # (see _q_x_simhash_neardup docstring)
            "WITH corpus AS ("
            "SELECT doc_id, text FROM documents "
            "UNION ALL "
            "SELECT doc_id + 100000, "
            "array_to_string(list_reverse(string_split(text, ' ')), ' ') "
            "FROM documents WHERE doc_id % 7 = 0), "
            "b AS (SELECT doc_id, "
            "list_sort(string_split(text, ' ')) AS bag FROM corpus) "
            "SELECT l.doc_id AS a, r.doc_id AS b, "
            "CAST(0 AS INTEGER) AS hamming "
            "FROM b l JOIN b r ON l.bag = r.bag AND l.doc_id < r.doc_id"),
        "x_dedup_components": (
            # same deterministic edge synthesis; the recursive CTE is
            # the SQL fixpoint of the hash-min propagation
            "WITH RECURSIVE "
            "edges AS ("
            "SELECT doc_id AS a, doc_id - 1 AS b FROM documents "
            "WHERE doc_id % 10 BETWEEN 1 AND 3 "
            "UNION ALL "
            "SELECT doc_id, doc_id - 13 FROM documents "
            "WHERE doc_id % 40 = 0 AND doc_id >= 13), "
            "sym AS (SELECT a, b FROM edges "
            "UNION SELECT b, a FROM edges), "
            "reach(id, comp) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.id) "
            "SELECT id AS doc_id, MIN(comp) AS component "
            "FROM reach GROUP BY id"),
        "x_asof_nearest": _X_ASOF_NEAREST_SQL,
        "x_curation_v2": (
            # full five-stage replay: scrub -> NFC -> line dedup ->
            # quantile gate -> pack, all arithmetic identical
            "WITH planted AS (SELECT doc_id, lang, "
            "'all rights reserved by the example corpus authors ' "
            "|| text || ' user' || doc_id || '@mail.example.com "
            "415-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') "
            "|| ' cafe' || chr(769) AS text FROM documents), "
            "scrub AS (SELECT doc_id, lang, nfc_normalize("
            "regexp_replace(regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g'), "
            "'\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g'), "
            "'\\b[0-9]{10,}\\b', '<ACCT>', 'g')) AS text "
            "FROM planted), "
            "tok AS (SELECT doc_id, lang, string_split(text, ' ') AS t "
            "FROM scrub), "
            "lines AS (SELECT doc_id, i AS line_idx, "
            "array_to_string(t[(i*8+1):(i*8+8)], ' ') AS line "
            "FROM tok, UNNEST(generate_series(0, "
            "CAST((len(t) + 7) // 8 AS BIGINT) - 1)) AS g(i)), "
            "kept AS (SELECT *, row_number() OVER (PARTITION BY line "
            "ORDER BY doc_id, line_idx) AS rn FROM lines), "
            "clean AS (SELECT doc_id, COALESCE(string_agg("
            "CASE WHEN rn = 1 THEN line END, ' ' ORDER BY line_idx), "
            "'') AS clean FROM kept GROUP BY doc_id), "
            "cl AS (SELECT c.doc_id, d.lang, c.clean, "
            "CAST(length(c.clean) AS BIGINT) AS n_chars "
            "FROM clean c JOIN documents d USING (doc_id)), "
            "thr AS (SELECT lang, quantile_cont(n_chars, 0.25) AS thr "
            "FROM cl GROUP BY lang), "
            "gated AS (SELECT cl.doc_id, "
            "CAST(len(string_split(cl.clean, ' ')) AS BIGINT) AS toks "
            "FROM cl JOIN thr USING (lang) "
            "WHERE cl.n_chars >= thr.thr), "
            "cum AS (SELECT doc_id, toks, CAST(SUM(toks) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS BIGINT) AS cum FROM gated) "
            "SELECT CAST((cum - toks) // 1500 AS BIGINT) AS shard, "
            "count(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tok_sum, "
            "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
            "FROM cum GROUP BY 1"),
        "x_group_cap": (
            # full ranking over every row — the two-phase sampler's
            # winner set must equal it exactly
            "WITH h AS (SELECT lang, doc_id, "
            "md5(CAST(doc_id AS VARCHAR) || ':k1') AS hh "
            "FROM documents), "
            "r AS (SELECT lang, doc_id, row_number() OVER ("
            "PARTITION BY lang ORDER BY hh, doc_id) AS rn FROM h) "
            "SELECT lang, count(*) AS n_kept, "
            "CAST(sum(doc_id) AS BIGINT) AS id_sum "
            "FROM r WHERE rn <= 20 GROUP BY lang"),
        "x_tfidf_terms": (
            "WITH terms AS (SELECT doc_id, lang, unnest(t) AS term "
            "FROM (SELECT doc_id, lang, string_split(text, ' ') AS t "
            "FROM documents)), "
            "tf AS (SELECT lang, term, count(*) AS tf FROM terms "
            "GROUP BY lang, term), "
            "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df "
            "FROM terms GROUP BY term), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "rk AS (SELECT lang, term, tf, df, row_number() OVER ("
            "PARTITION BY lang ORDER BY tf DESC, df ASC, term ASC) "
            "AS rk FROM tf JOIN dfreq USING (term)) "
            "SELECT lang, CAST(rk AS BIGINT) AS rk, term, "
            "CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, "
            "round(tf * ln(((SELECT n FROM n) + 1.0) / (df + 1.0)), 6) "
            "AS tfidf_r FROM rk WHERE rk <= 5"),
        "x_context_windows": (
            # sequential replay of the same arithmetic: global token
            # offset o per doc, window span o//512 .. (o+n-1)//512,
            # slice t[(lo-o+1):(hi-o)] (1-based INCLUSIVE = Spark's
            # slice(start, length)), reassembled in offset order
            "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "c AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n, "
            "CAST(SUM(len(t)) OVER (ORDER BY doc_id ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
            "FROM tok), "
            "p AS (SELECT doc_id, t, n, cum - n AS o FROM c), "
            "pieces AS (SELECT doc_id, t, o, w AS window_id, "
            "GREATEST(o, w * 512) AS lo, "
            "LEAST(o + n, (w + 1) * 512) AS hi "
            "FROM p, UNNEST(generate_series(o // 512, "
            "(o + n - 1) // 512)) AS g(w)) "
            "SELECT window_id, count(*) AS n_docs, "
            "CAST(SUM(hi - lo) AS BIGINT) AS n_tokens, "
            "md5(string_agg(array_to_string("
            "t[(lo - o + 1):(hi - o)], ' '), ' ' ORDER BY lo)) AS w_md5 "
            "FROM pieces GROUP BY window_id"),
        "x_centroid_gate": (
            # same centroid (per-dim mean over the label-0 seed set,
            # floats cast to double BEFORE averaging) and the same
            # round-6 cosine discipline as x_ann_cosine
            "WITH c AS (SELECT i AS dim, avg(embedding[i]::DOUBLE) AS c "
            "FROM embeddings, "
            "UNNEST(generate_series(1, len(embedding))) AS g(i) "
            "WHERE label = 0 GROUP BY i), "
            "z AS (SELECT e.vec_id, e.label, "
            "e.embedding[c.dim]::DOUBLE AS a, c.c AS b "
            "FROM embeddings e CROSS JOIN c), "
            "d AS (SELECT vec_id, label, SUM(a*b) AS dot, "
            "sqrt(SUM(a*a)) * sqrt(SUM(b*b)) AS nrm FROM z "
            "GROUP BY vec_id, label) "
            "SELECT vec_id, label, round(dot/nrm, 6) AS cos_r FROM d "
            "WHERE round(dot/nrm, 6) >= 0.2"),
        "x_unicode_nfc": (
            "SELECT doc_id, "
            "md5(nfc_normalize(text || ' cafe' || chr(769) || ' n' || "
            "CAST(doc_id AS VARCHAR))) AS nfc_md5, "
            "CAST(length(nfc_normalize(text || ' cafe' || chr(769) || "
            "' n' || CAST(doc_id AS VARCHAR))) AS BIGINT) "
            "AS n_chars_nfc, "
            "CAST(length(text || ' cafe' || chr(769) || ' n' || "
            "CAST(doc_id AS VARCHAR)) AS BIGINT) AS n_chars_raw "
            "FROM documents"),
        "x_line_dedup": (
            # same planted boilerplate, same 8-token line cut (list
            # slice is 1-based inclusive like Spark's), winner =
            # row_number over (doc_id, line_idx) == min-struct
            "WITH planted AS (SELECT doc_id, "
            "CASE WHEN doc_id % 3 = 0 THEN "
            "'this page is intentionally left blank today ok ' "
            "ELSE '' END || "
            "'all rights reserved by the example corpus authors ' "
            "|| text AS text FROM documents), "
            "tok AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM planted), "
            "lines AS (SELECT doc_id, i AS line_idx, "
            "array_to_string(t[(i*8+1):(i*8+8)], ' ') AS line "
            "FROM tok, UNNEST(generate_series(0, "
            "CAST((len(t) + 7) // 8 AS BIGINT) - 1)) AS g(i)), "
            "kept AS (SELECT *, row_number() OVER (PARTITION BY line "
            "ORDER BY doc_id, line_idx) AS rn FROM lines) "
            "SELECT doc_id, count(*) AS n_lines, "
            "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_kept, "
            "md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, "
            "' ' ORDER BY line_idx), '')) AS clean_md5 "
            "FROM kept GROUP BY doc_id"),
        "x_pack_shards": (
            # same rule, plain SQL window: exact global running token
            # count in doc_id order, shard = tokens-before DIV 2000
            "WITH w AS (SELECT doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS toks "
            "FROM documents), "
            "c AS (SELECT doc_id, toks, SUM(toks) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS cum FROM w) "
            "SELECT CAST(CAST(cum - toks AS BIGINT) // 2000 "
            "AS BIGINT) AS shard, "
            "count(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tok_sum, "
            "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
            "FROM c GROUP BY 1"),
        "x_quantile_gate": (
            "WITH thr AS (SELECT lang, "
            "quantile_cont(n_chars, 0.75) AS thr "
            "FROM documents GROUP BY lang) "
            "SELECT d.lang, count(*) AS n_kept, "
            "CAST(sum(doc_id) AS BIGINT) AS id_sum, "
            "CAST(min(n_chars) AS BIGINT) AS min_chars "
            "FROM documents d JOIN thr USING (lang) "
            "WHERE d.n_chars >= thr.thr GROUP BY d.lang"),
        "x_corpus_mix": (
            "SELECT lang, count(*) AS n_kept, "
            "CAST(sum(doc_id) AS BIGINT) AS id_sum "
            "FROM documents "
            "WHERE md5(CAST(doc_id AS VARCHAR) || ':mix1') < "
            "CASE lang WHEN 'en' THEN '8' WHEN 'de' THEN 'c' "
            "WHEN 'fr' THEN '4' ELSE '2' END "
            "GROUP BY lang"),
        "x_pii_redact": (
            # identical planted PII + the same chain order; RE2 'g'
            # flag mirrors Spark's replace-all default
            "WITH planted AS (SELECT doc_id, "
            "text || ' user' || doc_id || '@mail.example.com 415-555-' "
            "|| lpad(CAST(doc_id AS VARCHAR), 4, '0') || ' ' "
            "|| lpad(CAST(doc_id AS VARCHAR), 12, '0') AS text "
            "FROM documents), "
            "s1 AS (SELECT doc_id, text, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "AS BIGINT) AS n_email, "
            "regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g') AS t1 FROM planted), "
            "s2 AS (SELECT doc_id, n_email, "
            "CAST(len(regexp_extract_all(t1, "
            "'\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) "
            "AS n_phone, "
            "regexp_replace(t1, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', "
            "'<PHONE>', 'g') AS t2 FROM s1) "
            "SELECT doc_id, md5(regexp_replace(t2, "
            "'\\b[0-9]{10,}\\b', '<ACCT>', 'g')) AS red_md5, "
            "n_email, n_phone, "
            "CAST(len(regexp_extract_all(t2, '\\b[0-9]{10,}\\b')) "
            "AS BIGINT) AS n_longnum FROM s2"),
        "x_repetition": (
            "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "g AS (SELECT doc_id, "
            "[array_to_string(t[i:i+1], ' ') "
            "FOR i IN generate_series(1, len(t)-1)] AS g2, "
            "[array_to_string(t[i:i+2], ' ') "
            "FOR i IN generate_series(1, len(t)-2)] AS g3 FROM tok) "
            "SELECT doc_id, CAST(len(g2) AS BIGINT) AS n_2grams, "
            "CAST(len(list_distinct(g2)) AS BIGINT) "
            "AS n_distinct_2grams, "
            "CAST(len(g3) AS BIGINT) AS n_3grams, "
            "CAST(len(list_distinct(g3)) AS BIGINT) "
            "AS n_distinct_3grams FROM g"),
        "x_decontaminate": (
            # identical slice arithmetic: t[i:i+12] is 13 elements
            # 1-based inclusive, matching Spark's slice(toks, i, 13)
            "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "bench AS (SELECT array_to_string(t[5:17], ' ') AS ng "
            "FROM tok WHERE doc_id % 50 = 0 AND len(t) >= 17), "
            "grams AS (SELECT doc_id, "
            "array_to_string(t[i:i+12], ' ') AS ng "
            "FROM tok, UNNEST(generate_series(1, len(t) - 12)) AS g(i)) "
            "SELECT DISTINCT doc_id FROM grams "
            "WHERE ng IN (SELECT ng FROM bench)"),
        "x_dedup_keep_one": (
            # bag equality is transitive, so keep-one-per-component ==
            # MIN(doc_id) per token bag (see _q_x_dedup_keep_one)
            "WITH corpus AS ("
            "SELECT doc_id, text FROM documents "
            "UNION ALL "
            "SELECT doc_id + 100000, "
            "array_to_string(list_reverse(string_split(text, ' ')), ' ') "
            "FROM documents WHERE doc_id % 7 = 0 "
            "UNION ALL "
            "SELECT doc_id + 200000, "
            "array_to_string(list_sort(string_split(text, ' ')), ' ') "
            "FROM documents WHERE doc_id % 14 = 0), "
            "b AS (SELECT doc_id, "
            "list_sort(string_split(text, ' ')) AS bag FROM corpus) "
            "SELECT MIN(doc_id) AS doc_id FROM b GROUP BY bag"),
        "x_neardup_pipeline": (
            "SELECT doc_id AS a, doc_id + 100000 AS b, "
            "CAST(1.0 AS DOUBLE) AS jaccard FROM documents"),
        "x_ann_lsh": (
            "SELECT vec_id AS a, vec_id + 100000 AS b, "
            "CAST(1.0 AS DOUBLE) AS cos_r FROM embeddings"),
        "x_ann_multiprobe": (
            "SELECT vec_id AS a, vec_id + 100000 AS b, "
            "CAST(1.0 AS DOUBLE) AS cos_r FROM embeddings"),
        "x_ann_ivf": (
            "SELECT vec_id AS a, vec_id + 100000 AS b, "
            "CAST(1.0 AS DOUBLE) AS cos_r FROM embeddings"),
        "x_lattice_rails": (
            "SELECT l_orderkey, CAST(rn AS INTEGER) AS rn, "
            "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS qty_cell, "
            "'P' || CAST(l_partkey AS VARCHAR) AS desc_cell, "
            "format('{:,}', CAST(l_quantity AS BIGINT)) || '.' || "
            "lpad(CAST(l_linenumber AS VARCHAR), 2, '0') AS amt_cell, "
            "rn % 3 = 0 AS damaged FROM ("
            "SELECT *, row_number() OVER (PARTITION BY l_orderkey "
            "ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, "
            "l_shipdate) AS rn FROM lineitem WHERE l_orderkey < 10000)"),
        "x_exact_dedup_groups": (
            "SELECT count(*) AS n_groups, max(cnt) AS max_copies, "
            "CAST(SUM(keep_id) AS BIGINT) AS sum_keep FROM ("
            "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS cnt "
            "FROM documents GROUP BY md5(text))"),
        "x_longdoc": _X_LONGDOC_SQL,
        "x_stream_curate": _X_STREAM_ASSEMBLE_SQL,
        "x_percentile": _X_PERCENTILE_SQL,
        "x_token_bpe": (
            "SELECT doc_id, CAST(len(regexp_extract_all("
            "CAST(doc_id AS VARCHAR) || '! ' || text || ' v2.0?', "
            "'[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS INTEGER) "
            "AS n_bpe FROM documents"),
        "x_quality_score": (
            "WITH e AS (SELECT doc_id, CAST(doc_id AS VARCHAR) || '! ' "
            "|| text || ' v2.0?' AS t FROM documents), "
            "s AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM e) "
            "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "CAST(len(list_filter(toks, x -> x IN "
            "('the','a','of','and','to','in'))) AS BIGINT) AS stop_hits, "
            "CAST(length(regexp_replace(t, '[a-zA-Z0-9\\s]', '', 'g')) "
            "AS BIGINT) AS punct_chars, "
            "CAST(list_aggregate(list_transform(toks, x -> length(x)), "
            "'sum') AS BIGINT) AS sum_token_len FROM s"),
        "x_fingerprint": _X_FINGERPRINT_SQL,
        "x_asof_join": _X_ASOF_SQL,
        "x_asof_within": _X_ASOF_WITHIN_SQL,
        "x_asof_forward": _X_ASOF_FORWARD_SQL,
        "x_stratified_split": _X_STRATIFIED_SPLIT_SQL,
        "x_png_stats": _X_PNG_STATS_SQL,
        "x_range_join": _X_RANGE_SQL,
        "x_stream_assemble": _X_STREAM_ASSEMBLE_SQL,
        "x_pivot": _X_PIVOT_SQL,
        "x_cube": _X_CUBE_SQL,
        "x_curation_pipeline": _X_CURATION_SQL,
        "x_session_gap": _X_SESSION_GAP_SQL,
        "x_image_stats": _X_IMAGE_STATS_SQL,
        "x_audio_stats": _X_AUDIO_STATS_SQL,
        "x_video_frames": _X_VIDEO_FRAMES_SQL,
        "x_binary_checksum": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, "
            "CAST(list_aggregate(list_transform(string_split(text, ''), "
            "x -> ascii(x)), 'sum') AS BIGINT) AS checksum "
            "FROM documents WHERE doc_id < 200"),
    }
