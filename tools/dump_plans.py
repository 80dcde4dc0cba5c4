"""Dump .explain('formatted') for the key plans into PLANS.md so plan
shape (pushdown, codegen spans, exchange count) is reviewable."""
from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from pyspark.sql import functions as F
    from bank_statement_pdf_parser_spark.session import get_spark
    from bank_statement_pdf_parser_spark.plans.extract import extract_all
    from bank_statement_pdf_parser_spark import fixtures
    import tempfile, os

    spark = get_spark(app="plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "t.parquet")
    fixtures.write_transcripts_parquet(fixtures.gen_transcripts(5, 1), path)
    df = spark.read.parquet(path)

    sections = []
    out = extract_all(df)
    sections.append(("fused pipeline — transactions", explain_str(out.transactions)))
    sections.append(("fused pipeline — spans", explain_str(out.spans)))
    rel = extract_all(df, mode="relational")
    sections.append(("relational mode — transactions", explain_str(rel.transactions)))

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    q = (li.filter(F.col("l_quantity") > 10)
         .join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .groupBy("p_brand").agg(F.sum("l_extendedprice").alias("rev"))
         .select("p_brand", "rev"))
    sections.append(("pushdown + broadcast join + partial agg", explain_str(q)))

    import __spark_entry__ as entry
    cur = entry.queries()["x_curation_pipeline"](spark, "/root/testdata/sf0.001")
    sections.append(
        ("curation pipeline — capped fingerprint self-join "
         "(the under-cap semi-join must sit between the fingerprint "
         "explode and the pair join)", explain_str(cur)))

    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write(
            "# Physical plans (explain formatted)\n\n"
            "Regenerate with `python tools/dump_plans.py`.\n\n"
            "Note on the repeated payload-resolution CASE visible in "
            "the scan Filter: Catalyst's project-collapse inlines the "
            "`doc` CASE into each predicate, so it appears ~10x in the "
            "plan TEXT. Measured cost is nil — running the same query "
            "with CollapseProject excluded (doc evaluated once in its "
            "own Project) is wall-time identical within noise "
            "(0.54-0.70s vs 0.53-0.62s on the 6k-conv corpus), i.e. "
            "codegen common-subexpression elimination + the NULL-tool "
            "short-circuit already dedup the work at runtime.\n")
        for title, body in sections:
            fh.write(f"\n## {title}\n\n```\n{body}\n```\n")
    print("written PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
