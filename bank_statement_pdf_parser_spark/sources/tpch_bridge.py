"""Render driver-provided TPC-H-ish tables into synthetic statements.

This is the self-validating bridge behind `__spark_entry__.entry()` and
the flagship DuckDB cross-checks: each order becomes a one-turn
conversation whose `text` is a spec-exact statement of its lineitems.
Because every cell is derived from integer arithmetic
(`cents = l_quantity*100 + l_linenumber`), an independent ANSI-SQL
oracle can predict the extraction output — dates, decimals, span
offsets, even the raw span text — with zero float-formatting ambiguity.

Renderers:
- `transcripts_from_tpch` — single-page UOB statements over ALL
  lineitems of every order (the flagship corpus).
- `dbs_transcripts` — THREE-page DBS statements over the first 4
  lineitems of every >=4-line order, with continuation lines under
  every anchor (D9), a non-regex footer line repeated on both pages
  (D4 frequency rule), a BALANCE B/F + duplicated anchor at the page
  boundary (D11 page-carry dedup), CR/DR markers that override the
  amount column (F3), and a REF-prefixed description (F5).
- `ocbc_transcripts` — single-page OCBC `|`-lattice statements (D6)
  whose year-less dates straddle a Dec->Jan period boundary (F1 year
  inference); cell spans have fixed-geometry offsets so even the spans
  frame is SQL-predictable.
- `hdfc_transcripts` — single-page HDFC statements exercising both
  sides of the two-digit-year pivot (txn dates 19xx, value dates
  20xx), the dedicated ref column, and HDFC's keep-REF-in-description
  rule.
- `html_transcripts` — HTML payload turns (D5): nav/footer chrome
  around one `<div class="content">` with three text nodes covering
  all four frozen entities; every key is lpad'd to fixed width so the
  main-span offsets are literal integers in the oracle SQL.
- `uob_jitter_transcripts` — TWO-turn conversations of UOB statements
  whose column widths are jittered per (order, turn) so the D7
  whitespace-gap INFERENCE branch (not the fixed SLICES) produces the
  cuts, and W1 per-turn index restarts are oracle-checked.
- `uob_balance_transcripts` — UOB statements with a true running
  balance and one planted +1-cent error (V1 validator corpus).

Rendering is fully distributed Catalyst (rpad/lpad/format_number/
collect_list); no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# fixed geometry of the rendered statement (see oracle SQL in
# __spark_entry__.py, which hard-codes the same numbers)
HDR1 = "UNITED OVERSEAS BANK LIMITED"
FOOT1 = "Page 1 of 1"
FOOT2 = "UOB is regulated by MAS"
LINE_W = 100
FIRST_TXN_OFF = 95  # (28+1)+(19+1)+(44+1)+(0+1)


def money_str(cents: F.Column) -> F.Column:
    """Exact comma-grouped 2dp rendering from integer cents. Manual
    single-group commas (measured ~1.8x faster than the locale-aware
    format_number, byte-identical for units < 1e6 — all bridge amounts
    and balances); format_number fallback above that."""
    units = (cents / 100).cast("long")
    frac = F.lpad((cents % 100).cast("string"), 2, "0")
    grouped = (
        F.when(units >= 1_000_000, F.format_number(units, 0))
        .when(units >= 1000,
              F.concat((units / 1000).cast("long").cast("string"),
                       F.lit(","),
                       F.lpad((units % 1000).cast("string"), 3, "0")))
        .otherwise(units.cast("string")))
    return F.concat(grouped, F.lit("."), frac)


def amount_cents(df_cols=None) -> F.Column:
    return (F.col("l_quantity").cast("long") * 100 + F.col("l_linenumber"))


def balance_cents(key: str = "o_orderkey") -> F.Column:
    return (F.col(key) % 1_000_000) + 1


def _lineitem_by_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem hash-partitioned on l_orderkey straight off the scan.
    The testdata parquet is ONE row group per table, so the scan stage
    cannot split; without this, Catalyst evaluates the whole statement-
    rendering projection scan-side — in a single task (measured 6x
    slower at sf0.1). Shuffling the raw columns first moves the
    rendering behind the exchange onto all cores, and the downstream
    groupBy("l_orderkey") REUSES the hash partitioning, so the plan
    still has exactly one exchange before the per-order aggregation."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .repartition(n, "l_orderkey"))


def transcripts_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Slim projection: the statement header only needs these three.
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    lineitem = _lineitem_by_order(spark, sf_dir)

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
    # o_orderkey == l_orderkey on every joined row, and the join now
    # happens after aggregation — derive the balance from the lineitem
    # key (identical value).
    bal = money_str(balance_cents("l_orderkey"))
    is_wdr = F.col("l_returnflag") == "R"
    blank16 = F.lit(" " * 16)
    line = F.concat(
        F.rpad(date_s, 12, " "), F.rpad(desc, 40, " "),
        F.when(is_wdr, F.lpad(amt, 16, " ")).otherwise(blank16),
        F.when(is_wdr, blank16).otherwise(F.lpad(amt, 16, " ")),
        F.lpad(bal, 16, " "))

    # Every rendered cell derives from lineitem columns alone, so the
    # orders join belongs AFTER the per-order aggregation (round 7,
    # guide §2.3/§3): joining first shuffled+sorted all N lineitem rows
    # against orders inside a sort-merge join; joining the aggregated
    # frame touches one row per order, and broadcasting the 3-column
    # orders side removes the orders exchange and both SMJ sorts
    # (o_orderkey is unique, so first(o_custkey) == the joined value).
    li = lineitem.select("l_orderkey", "l_linenumber", "l_partkey",
                         "l_suppkey", "l_quantity",
                         line.alias("line"), F.col("l_shipdate"))

    per_order = li.groupBy("l_orderkey").agg(
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
    # ~20 bytes/row projected: sf10 orders is ~300 MB built — far under
    # the broadcast cap; at a scale where it no longer fits, drop the
    # hint and the planner's SMJ costs one slim exchange.
    per_order = (per_order.join(F.broadcast(orders),
                                per_order.l_orderkey == orders.o_orderkey)
                 .withColumnRenamed("o_custkey", "custkey")
                 .withColumnRenamed("o_orderdate", "orderdate"))
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


# ---------------------------------------------------------------------------
# dialect corpora: fixed-K-transaction statements with fixed geometry so
# page/line/offset predictions stay pure integer arithmetic in the oracle
# ---------------------------------------------------------------------------

DBS_HOTLINE = "Hotline 1800 111 1111"  # NOT in BOILER_RX: D4-only chrome


def _ranked_lineitems(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """First k lineitems (by the flagship's deterministic rank) of every
    order that has at least k lineitems."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    lineitem = _lineitem_by_order(spark, sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    wc = Window.partitionBy("l_orderkey")
    # Rank/count windows read lineitem columns only, so the orders join
    # moves BELOW the windows and AFTER the top-k filter (round 7): the
    # windows reuse the scan repartition's clustering, and the broadcast
    # join then touches k rows per order instead of all of them.
    ranked = (lineitem
              .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                      "l_quantity", "l_returnflag", "l_linestatus",
                      "l_shipdate")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n_li", F.count("*").over(wc))
              .filter((F.col("n_li") >= k) & (F.col("rn") <= k)))
    return (ranked.join(F.broadcast(orders),
                        ranked.l_orderkey == orders.o_orderkey)
            .drop("o_orderkey"))


def _base_desc() -> F.Column:
    return F.substring(
        F.concat(F.lit("O"), F.col("l_orderkey").cast("string"),
                 F.lit(" L"), F.col("l_linenumber").cast("string"),
                 F.lit(" P"), F.col("l_partkey").cast("string"),
                 F.lit(" S"), F.col("l_suppkey").cast("string")),
        1, 38)


def _ref_desc() -> F.Column:
    okey = F.col("l_orderkey").cast("string")
    return F.concat(F.lit("REF K"), okey, F.lit(" O"), okey)


def _collect_k(rows: DataFrame, cols: list[str]) -> DataFrame:
    return rows.groupBy("l_orderkey").agg(
        F.first("o_custkey").alias("custkey"),
        F.first("o_orderdate").alias("orderdate"),
        F.array_sort(F.collect_list(F.struct("rn", *cols))).alias("a"))


def _as_transcripts(per: DataFrame, prefix: str, text: F.Column) -> DataFrame:
    return per.select(
        F.concat(F.lit(prefix), F.col("l_orderkey").cast("string"))
        .alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("orderdate").alias("ts"))


def dbs_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-page DBS statements: 4 txns, each with a continuation line
    (D9); a non-regex hotline footer on every page (D4); BALANCE B/F +
    duplicated anchor at the page-1/2 boundary (D11); CR/DR markers
    that flip the amount column (F3); rn=2 carries a REF-prefixed
    description (F5). Three pages, not two: on a 2-page doc the
    page-carried anchor would sit on EVERY page and the D4 frequency
    rule would (per spec) strip both copies."""
    li = _ranked_lineitems(spark, sf_dir, 4)
    okey = F.col("l_orderkey").cast("string")
    date_s = F.date_format("l_shipdate", "dd/MM/yyyy")
    vdate_s = F.date_format(
        F.date_add(F.col("l_shipdate"), F.col("l_linenumber") % 7),
        "dd/MM/yyyy")
    desc = F.when(F.col("rn") == 2, _ref_desc()).otherwise(_base_desc())
    amt = money_str(amount_cents())
    is_wdr = F.col("l_returnflag") == "R"
    mark = F.col("l_linestatus") == "O"
    blank16 = F.lit(" " * 16)
    wdr_cell = F.when(
        is_wdr, F.lpad(F.concat(amt, F.when(mark, F.lit(" CR"))
                                .otherwise(F.lit(""))), 16, " ")) \
        .otherwise(blank16)
    dep_cell = F.when(
        ~is_wdr, F.lpad(F.concat(amt, F.when(mark, F.lit(" DR"))
                                 .otherwise(F.lit(""))), 16, " ")) \
        .otherwise(blank16)
    anchor = F.concat(F.rpad(date_s, 11, " "), F.rpad(vdate_s, 11, " "),
                      F.rpad(desc, 40, " "), wdr_cell, dep_cell,
                      F.lpad(money_str(balance_cents("l_orderkey")), 16, " "))
    cont = F.concat(F.lit(" " * 22),
                    F.rpad(F.concat(F.lit("CONT O"), okey, F.lit(" N"),
                                    F.col("rn").cast("string")), 40, " "),
                    F.lit(" " * 48))
    per = _collect_k(li.select("l_orderkey", "o_custkey", "o_orderdate",
                               "rn", anchor.alias("anchor"),
                               cont.alias("cont")),
                     ["anchor", "cont"])
    e = lambda i: F.element_at(F.col("a"), i)  # noqa: E731
    hdr = [F.lit("DBS BANK LTD"),
           F.concat(F.lit("Account No: "),
                    F.lpad((F.col("custkey") % 1_000_000_000).cast("string"),
                           9, "0")),
           F.lit("Statement Date: 28/02/2026"),
           F.lit("")]
    foot = [F.lit(DBS_HOTLINE)]
    page1 = F.concat_ws(
        "\n", *hdr, e(1)["anchor"], e(1)["cont"], e(2)["anchor"],
        e(2)["cont"], *foot, F.lit("Page 1/3"),
        F.lit("Deposit Insurance Scheme applies"))
    page2 = F.concat_ws(
        "\n", *hdr, F.lit("BALANCE B/F"), e(2)["anchor"], e(3)["anchor"],
        e(3)["cont"], *foot, F.lit("Page 2/3"),
        F.lit("Deposit Insurance Scheme applies"))
    page3 = F.concat_ws(
        "\n", *hdr, e(4)["anchor"], e(4)["cont"], *foot, F.lit("Page 3/3"),
        F.lit("Deposit Insurance Scheme applies"))
    return _as_transcripts(
        per, "dbs-",
        F.concat(page1, F.lit("\f"), page2, F.lit("\f"), page3))


def html_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML payload turns (D5): one doc per order. Geometry is fixed
    (every variable substring lpad'd to constant width), so the three
    main-content spans are at literal offsets [62,96) [100,125)
    [130,150) for every document — the DuckDB oracle needs no string
    search. Covers all four frozen entities (&amp; &lt; &gt; &nbsp;),
    lead/trail whitespace stripping inside a tag pair, and chrome
    (<nav>, <footer>) outside the content div that must NOT span."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    okey10 = F.lpad(F.col("o_orderkey").cast("string"), 10, "0")
    cust10 = F.lpad(F.col("o_custkey").cast("string"), 10, "0")
    bal8 = F.lpad(balance_cents().cast("string"), 8, "0")
    text = F.concat(
        F.lit('<html><body><nav>UOB &amp; Partners</nav>'
              '<div class="content">'),
        F.lit("Stmt O"), okey10, F.lit(" &amp; C"), cust10,
        F.lit("<p> Bal B"), bal8, F.lit(" &lt;SGD&gt; </p>"),
        F.lit("End&nbsp;O"), okey10,
        F.lit('</div><footer>Page 1 of 1</footer></body></html>'))
    return orders.select(
        F.concat(F.lit("html-"), F.col("o_orderkey").cast("string"))
        .alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("o_orderdate").alias("ts"))


def ocbc_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-page OCBC `|`-lattice statements (D6): 3 txns whose
    year-less dates alternate Dec/Jan across the period boundary of the
    fixed 'Period 01 Nov 2025 - 28 Feb 2026' header (F1 inference).
    Geometry is fixed (every lattice line is 88 chars) so cell-span
    offsets are SQL-predictable."""
    li = _ranked_lineitems(spark, sf_dir, 3)
    dd = F.lpad(F.dayofmonth("l_shipdate").cast("string"), 2, "0")
    mon = F.when(F.col("rn") % 2 == 1, F.lit("Dec")).otherwise(F.lit("Jan"))
    date6 = F.concat(dd, F.lit(" "), mon)
    amt = money_str(amount_cents())
    is_wdr = F.col("l_returnflag") == "R"
    blank12 = F.lit(" " * 12)
    line = F.concat(
        F.lit("|"), date6, F.lit("|"), F.rpad(_base_desc(), 40, " "),
        F.lit("|"), F.when(is_wdr, F.lpad(amt, 12, " ")).otherwise(blank12),
        F.lit("|"), F.when(~is_wdr, F.lpad(amt, 12, " ")).otherwise(blank12),
        F.lit("|"), F.lpad(money_str(balance_cents("l_orderkey")), 12, " "), F.lit("|"))
    per = _collect_k(li.select("l_orderkey", "o_custkey", "o_orderdate",
                               "rn", line.alias("line")), ["line"])
    e = lambda i: F.element_at(F.col("a"), i)  # noqa: E731
    text = F.concat_ws(
        "\n",
        F.lit("OCBC BANK"),
        F.concat(F.lit("Account "),
                 F.lpad(F.col("custkey").cast("string"), 12, "0")),
        F.lit("Period 01 Nov 2025 - 28 Feb 2026"),
        F.lit(""),
        e(1)["line"], e(2)["line"], e(3)["line"],
        F.lit("Page 1 of 1"), F.lit("Co. Reg. No. 193200032W"))
    return _as_transcripts(per, "ocbc-", text)


def uob_jitter_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-turn UOB statements with per-(order, turn) column-width
    jitter: the date field is 12+j1 wide and the description field
    40+j2 wide (j1 in 1..3, j2 in 0..3), so no anchor line is the
    frozen 100-char spec width and the D7 whitespace-gap INFERENCE
    branch (spec.infer_stream_slices / relational._with_stream_slices)
    must produce the column cuts. Each turn holds one withdrawal and
    one deposit anchor so every one of the five UOB columns has
    content and inference resolves exactly 5 columns. Two turns per
    conv_id put the W1 per-turn txn_idx/span_idx restarts under the
    DuckDB gate (every other flagship corpus is single-turn)."""
    li = _ranked_lineitems(spark, sf_dir, 4)
    turn = F.floor((F.col("rn") - 1) / 2).cast("int")
    j1 = (F.col("l_orderkey") + turn) % 3 + 1
    j2 = (F.col("l_orderkey") % 7 + turn) % 4
    # variable-width pad (rpad needs a literal length); desc pads up to
    # 40+3-11 = 32 spaces, so the source literal must exceed that
    pad = lambda n: F.lit(" " * 40).substr(F.lit(1), n)  # noqa: E731
    date_s = F.date_format("l_shipdate", "dd MMM yyyy")  # always 11 chars
    desc = _base_desc()
    amt = money_str(amount_cents())
    is_wdr = F.col("rn") % 2 == 1
    blank16 = F.lit(" " * 16)
    line = F.concat(
        date_s, pad(j1 + 1),                      # field width 12 + j1
        desc, pad(F.lit(40) + j2 - F.length(desc)),  # field width 40 + j2
        F.when(is_wdr, F.lpad(amt, 16, " ")).otherwise(blank16),
        F.when(is_wdr, blank16).otherwise(F.lpad(amt, 16, " ")),
        F.lpad(money_str(balance_cents("l_orderkey")), 16, " "))
    per = (li.select("l_orderkey", "o_custkey", "o_orderdate", "rn",
                     turn.alias("t"), line.alias("line"))
           .groupBy("l_orderkey", "t")
           .agg(F.first("o_custkey").alias("custkey"),
                F.first("o_orderdate").alias("orderdate"),
                F.array_sort(F.collect_list(F.struct("rn", "line")))
                .alias("a")))
    e = lambda i: F.element_at(F.col("a"), i)  # noqa: E731
    text = F.concat_ws(
        "\n",
        F.lit(HDR1),
        F.concat(F.lit("Account: "),
                 F.lpad(F.col("custkey").cast("string"), 10, "0")),
        F.lit("Statement Period: 01 Jan 2026 to 31 Dec 2026"),
        F.lit(""),
        e(1)["line"], e(2)["line"],
        F.lit(FOOT1), F.lit(FOOT2))
    return per.select(
        F.concat(F.lit("jit-"), F.col("l_orderkey").cast("string"))
        .alias("conv_id"),
        F.col("t").alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("orderdate").alias("ts"))


def uob_balance_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 corpus: 4-txn UOB statements whose balance column is a TRUE
    running balance (init + cumulative signed amounts) except for one
    planted +1-cent error on the rn=3 row — so the running-balance
    validator must flag exactly txn_idx 2 (wrong jump in) and 3 (wrong
    jump out) of every statement, and nothing else."""
    li = _ranked_lineitems(spark, sf_dir, 4)
    signed = amount_cents() * F.when(F.col("l_returnflag") == "R",
                                     F.lit(-1)).otherwise(F.lit(1))
    wsum = Window.partitionBy("l_orderkey").orderBy(
        "rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    init = (F.col("l_orderkey") % 1_000_000) + 100_000  # >= $1000: no
    # drawdown (4 txns x <= 5007 cents) can push the balance negative
    bal = (init + F.sum(signed).over(wsum)
           + F.when(F.col("rn") == 3, F.lit(1)).otherwise(F.lit(0)))
    date_s = F.date_format("l_shipdate", "dd MMM yyyy")
    amt = money_str(amount_cents())
    is_wdr = F.col("l_returnflag") == "R"
    blank16 = F.lit(" " * 16)
    line = F.concat(
        F.rpad(date_s, 12, " "), F.rpad(_base_desc(), 40, " "),
        F.when(is_wdr, F.lpad(amt, 16, " ")).otherwise(blank16),
        F.when(is_wdr, blank16).otherwise(F.lpad(amt, 16, " ")),
        F.lpad(money_str(bal), 16, " "))
    per = _collect_k(li.select("l_orderkey", "o_custkey", "o_orderdate",
                               "rn", line.alias("line")), ["line"])
    e = lambda i: F.element_at(F.col("a"), i)  # noqa: E731
    text = F.concat_ws(
        "\n",
        F.lit(HDR1),
        F.concat(F.lit("Account: "),
                 F.lpad(F.col("custkey").cast("string"), 10, "0")),
        F.lit("Statement Period: 01 Jan 2026 to 31 Dec 2026"),
        F.lit(""),
        e(1)["line"], e(2)["line"], e(3)["line"], e(4)["line"],
        F.lit(FOOT1), F.lit(FOOT2))
    return _as_transcripts(per, "bal-", text)


def hdfc_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-page HDFC statements: 3 txns; txn dates sit on the 19xx
    side of the two-digit-year pivot (1992-98), value dates on the 20xx
    side (+30y); the dedicated ref column is populated; rn=2 proves the
    HDFC keep-REF-in-description rule."""
    li = _ranked_lineitems(spark, sf_dir, 3)
    d10 = F.rpad(F.date_format("l_shipdate", "dd/MM/yy"), 10, " ")
    vd = F.make_date(F.year("l_shipdate") + 30, F.month("l_shipdate"),
                     F.least(F.dayofmonth("l_shipdate"), F.lit(28)))
    v10 = F.rpad(F.date_format(vd, "dd/MM/yy"), 10, " ")
    ref16 = F.rpad(
        F.concat(F.lit("CHQ"),
                 F.lpad((F.col("l_orderkey") % 100_000_000).cast("string"),
                        8, "0")), 16, " ")
    desc = F.when(F.col("rn") == 2, _ref_desc()).otherwise(_base_desc())
    amt = money_str(amount_cents())
    is_wdr = F.col("l_returnflag") == "R"
    blank16 = F.lit(" " * 16)
    line = F.concat(
        d10, F.rpad(desc, 40, " "), ref16, v10,
        F.when(is_wdr, F.lpad(amt, 16, " ")).otherwise(blank16),
        F.when(~is_wdr, F.lpad(amt, 16, " ")).otherwise(blank16),
        F.lpad(money_str(balance_cents("l_orderkey")), 16, " "))
    per = _collect_k(li.select("l_orderkey", "o_custkey", "o_orderdate",
                               "rn", line.alias("line")), ["line"])
    e = lambda i: F.element_at(F.col("a"), i)  # noqa: E731
    text = F.concat_ws(
        "\n",
        F.lit("HDFC BANK LTD"),
        F.concat(F.lit("A/c No: "),
                 F.lpad(F.col("custkey").cast("string"), 14, "0")),
        F.lit("Statement From 01/01/92 To 31/12/98"),
        F.lit(""),
        e(1)["line"], e(2)["line"], e(3)["line"],
        F.lit("Page No .: 1"), F.lit("HDFC BANK is registered with RBI"))
    return _as_transcripts(per, "hdfc-", text)
