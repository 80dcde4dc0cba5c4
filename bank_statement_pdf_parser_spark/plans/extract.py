"""End-to-end extraction plan (SURVEY.md §3.2).

fused (default): transcripts --(P1-P3 Catalyst)--> resolved turns
    --> ONE mapInPandas pass (D1-D11 + D5 HTML) --> records
        (txn records + bank='HTML' main-span pseudo-records)
    transactions = F1-F8 Catalyst over txn records
    spans = txn spans U table_cell spans U main spans   (O3)
relational: statement turns go through the pure-Catalyst operator
    composition; HTML turns through the D5 pandas UDF (U1) branch.
span_idx / txn_idx via W1 window over (conv_id, turn_idx)

Scale shape: in fused mode raw text is scanned ONCE per action and
never crosses an Exchange — the only shuffles are over extracted
*records* (orders of magnitude smaller than the corpus), for the
per-turn index windows. Long-document skew is structurally bounded
because every stage is turn-local (a group is one turn, never a whole
conversation); residual skew from statement-heavy input splits is
handled by AQE + the optional salt repartition below.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import spec
from ..functions.normalize import normalize_records
from ..operators.html import html_main_spans
from ..operators.tokenize import (RECORDS_DDL, RECORDS_SPAN_DDL,
                                  RECORDS_TXN_DDL)
from ..sources.transcripts import with_resolved_payload

_PROFILE_DDL = {"full": RECORDS_DDL, "transactions": RECORDS_TXN_DDL,
                "spans": RECORDS_SPAN_DDL}


@dataclass
class ExtractOutputs:
    turns: DataFrame       # resolved+classified turns
    records: DataFrame     # structural transaction records
    spans: DataFrame       # spec.SPANS_DDL
    transactions: DataFrame  # spec.TRANSACTIONS_DDL


def build_records(turns: DataFrame, mode: str = "fused",
                  salt_partitions: int | None = None,
                  probe=None, profile: str = "full") -> DataFrame:
    """Classified turns -> structural records.

    mode='fused': ONE mapInPandas pass over ALL turns (default; zero
    text shuffles, and HTML main-content spans ride along as
    bank='HTML' pseudo-records so downstream spans/transactions never
    re-scan raw text).
    mode='relational': pure-Catalyst composition (operators/relational.py)
    used to cross-validate operator semantics; HTML turns are handled
    separately by build_spans' pandas-UDF branch (U1).

    probe: optional Spark accumulator; when set, the fused kernel adds
    the number of input turn rows it sees (used by tests to prove the
    extraction DAG executes exactly once per sink job).

    profile (fused only): output column subset the kernel materializes
    ('full' | 'transactions' | 'spans' — operators/tokenize.py). The
    parse is identical; mapInPandas output is opaque to Catalyst's
    column pruning, so a consumer that never reads span_text/cells
    (the transactions branch) or the field cells (the spans branch)
    otherwise pays Python build + Arrow + JVM read for them anyway
    (guide §4.1 applied to the output side; measured round 7).
    """
    if mode == "fused":
        src = turns
        if salt_partitions:
            # Turn-granular salt (SURVEY.md §4.2): turns are independent,
            # so we may repartition on the full turn key to spread
            # statement-heavy input splits across the cluster.
            src = src.repartition(salt_partitions, "conv_id", "turn_idx")
        # Arrow-vectorized fast path + per-doc python fallback
        # (operators/tokenize_arrow.py) for every profile; the pandas
        # kernel (tokenize.tokenize_kernel) remains the normative
        # implementation and the fallback engine.
        from ..operators.tokenize_arrow import tokenize_arrow_kernel
        kernel = tokenize_arrow_kernel(profile)
        mapper, ddl = src.mapInArrow, _PROFILE_DDL[profile]
        if probe is not None:
            def kernel(batches, _inner=kernel, _probe=probe):
                def counted(it):
                    for pdf in it:
                        _probe.add(len(pdf))
                        yield pdf
                yield from _inner(counted(batches))
        return mapper(kernel, ddl)
    if mode == "relational":
        stmt = turns.filter(F.col("kind") != "HTML")
        if salt_partitions:
            stmt = stmt.repartition(salt_partitions, "conv_id", "turn_idx")
        from ..operators.relational import relational_records
        return relational_records(stmt)
    raise ValueError(mode)


def build_spans(turns: DataFrame | None, records: DataFrame,
                records_include_html: bool = False,
                window_prefix: tuple[str, ...] = ()) -> DataFrame:
    """All span kinds in ONE pass over records: each record explodes
    into its head span (txn, or main for HTML pseudo-records) plus its
    lattice cell spans. A union of sibling selects over `records`
    would duplicate the records SUBTREE (the tokenizer) per branch —
    one action would tokenize the corpus 2-3x — so the array-concat +
    single explode shape matters at scale.

    window_prefix: extra columns prepended to the span_idx window's
    partitionBy AND carried into the output. Meant for columns that
    are FUNCTIONS OF conv_id (the sink's bucket column): the window
    semantics are unchanged, but a child already hash-partitioned on
    the prefix then SATISFIES the window's required clustering — one
    upstream repartition(n, prefix) serves both the window and a
    bucket-aligned partitionBy write, instead of one exchange each
    (measured on the sink: two records-sized exchanges per derived
    output down to one). Only the fused path supports it (the
    relational cross-check branch unions spans from `turns`, which
    does not carry the prefix)."""
    if window_prefix and not records_include_html:
        raise ValueError("window_prefix requires records_include_html")
    head_kind = (F.when(F.col("bank") == "HTML",
                        F.lit(spec.SPAN_KIND_MAIN))
                 .otherwise(F.lit(spec.SPAN_KIND_TXN))
                 if records_include_html else F.lit(spec.SPAN_KIND_TXN))
    head = F.array(F.struct(
        F.col("span_start").alias("span_start"),
        F.col("span_end").alias("span_end"),
        head_kind.alias("span_kind"),
        F.col("span_text").alias("text")))
    cells = F.coalesce(
        F.col("cells"),
        F.array().cast("array<struct<start:int,end:int,text:string>>"))
    cell_spans = F.transform(cells, lambda c: F.struct(
        c["start"].alias("span_start"), c["end"].alias("span_end"),
        F.lit(spec.SPAN_KIND_CELL).alias("span_kind"),
        c["text"].alias("text")))
    rec_spans = (records.select(
        *window_prefix, "conv_id", "turn_idx",
        F.explode(F.concat(head, cell_spans)).alias("s"))
        .select(*window_prefix, "conv_id", "turn_idx",
                F.col("s.span_start").alias("span_start"),
                F.col("s.span_end").alias("span_end"),
                F.col("s.span_kind").alias("span_kind"),
                F.col("s.text").alias("text")))
    if records_include_html:
        allspans = rec_spans
    else:
        # relational cross-check mode: HTML turns via the D5 pandas UDF
        main_spans = (
            turns.filter(F.col("kind") == "HTML")
            .select("conv_id", "turn_idx",
                    F.explode(html_main_spans(F.col("doc"))).alias("s"))
            .select("conv_id", "turn_idx",
                    F.col("s.span_start").alias("span_start"),
                    F.col("s.span_end").alias("span_end"),
                    F.lit(spec.SPAN_KIND_MAIN).alias("span_kind"),
                    F.col("s.text").alias("text"))
        )
        allspans = rec_spans.unionByName(main_spans)
    w = (Window.partitionBy(*window_prefix, "conv_id", "turn_idx")
         .orderBy("span_start"))
    return allspans.select(
        *window_prefix, "conv_id", "turn_idx",
        (F.row_number().over(w) - 1).cast("int").alias("span_idx"),
        F.col("span_start").cast("int"), F.col("span_end").cast("int"),
        "span_kind", "text")


def build_transactions(records: DataFrame,
                       window_prefix: tuple[str, ...] = ()) -> DataFrame:
    """window_prefix: see build_spans — same contract (prefix columns
    must be functions of conv_id; they join the txn_idx window's
    partitionBy and the output)."""
    norm = normalize_records(records.filter(F.col("bank") != "HTML"),
                             carry=window_prefix)
    w = (Window.partitionBy(*window_prefix, "conv_id", "turn_idx")
         .orderBy("line_start"))
    return norm.select(
        *window_prefix, "conv_id", "turn_idx",
        (F.row_number().over(w) - 1).cast("int").alias("txn_idx"),
        "bank", "txn_date", "value_date", "description", "ref",
        "debit", "credit", "balance",
        F.col("page").cast("int"), F.col("line_start").cast("int"),
        F.col("line_end").cast("int"))


def extract_all(transcripts: DataFrame, mode: str = "fused",
                salt_partitions: int | None = None,
                probe=None) -> ExtractOutputs:
    from ..session import ensure_shipped
    ensure_shipped(transcripts.sparkSession)
    turns = with_resolved_payload(transcripts)
    records = build_records(turns, mode=mode, salt_partitions=salt_partitions,
                            probe=probe)
    if mode == "fused":
        # Per-consumer column profiles (see build_records): each action
        # pays exactly one tokenizer pass either way, but the spans and
        # transactions branches now ship only the record columns they
        # read across the Arrow boundary. `records` keeps the full
        # staged-records contract.
        rec_spans = build_records(turns, salt_partitions=salt_partitions,
                                  probe=probe, profile="spans")
        rec_txn = build_records(turns, salt_partitions=salt_partitions,
                                probe=probe, profile="transactions")
    else:
        rec_spans = rec_txn = records
    return ExtractOutputs(
        turns=turns,
        records=records,
        spans=build_spans(turns, rec_spans,
                          records_include_html=(mode == "fused")),
        transactions=build_transactions(rec_txn),
    )
