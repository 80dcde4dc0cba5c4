"""As-of and range joins (SURVEY.md §2.5 J5 — implemented round 4).

Spark has no native ASOF JOIN (DuckDB/Pandas do) and naive range joins
plan as BroadcastNestedLoopJoin — O(n*m) compares. Both operators here
are pure DataFrame compositions with the scale-correct shapes:

- `asof_join`: the classic union-and-window form. Left and right rows
  are tagged and unioned, ONE shuffle on the join key orders each
  key's timeline, and `last(<right cols>, ignorenulls=True)` over an
  unbounded-preceding frame carries the most recent right row forward
  onto every left row. O((n+m) log) per key, no join node at all —
  the same plan a 1000-executor cluster wants (single hash exchange
  on the key, AQE-balanced).
- `range_join`: interval buckets. Each interval [t0, t1) explodes
  into the epoch buckets of width `bucket` it overlaps (<= 2 when
  bucket >= interval length); each point lands in exactly one bucket;
  an equi-join on bucket + the exact range predicate yields the
  matches. Shuffle O(points + intervals * ceil(len/bucket)) — never
  the all-pairs compare of the naive inequality join.

Semantics frozen for the DuckDB gates (x_asof_join / x_range_join):
as-of is INCLUSIVE (right.ts == left.ts matches; at equal ts the
right row sorts before the left via the side tag) and the right side
must be unique per (key, ts) — callers dedupe with max_by first. The
range is half-open [t0, t1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts_col: str = "ts",
              right_cols: tuple[str, ...] = ()) -> DataFrame:
    """For every left row: the most recent right row with the same
    `on` key and right.ts <= left.ts (NULLs when none — left-join
    semantics). `right` must be unique per (on, ts). Output: all left
    columns plus `r_<c>` for each of right_cols and `r_ts`."""
    rtype = {f.name: f.dataType for f in right.schema.fields}
    carried = {"r_ts": ts_col, **{f"r_{c}": c for c in right_cols}}
    l = left.select(
        "*",
        *[F.lit(None).cast(rtype[src]).alias(dst)
          for dst, src in carried.items()],
        F.lit(1).alias("_side"))
    r = right.select(
        on, ts_col,
        *[F.col(src).alias(dst) for dst, src in carried.items()],
        F.lit(0).alias("_side"))
    lfields = {f.name: f.dataType for f in l.schema.fields}
    r = r.select("*", *[F.lit(None).cast(t).alias(n)
                        for n, t in lfields.items() if n not in r.columns])
    both = l.unionByName(r.select(*l.columns))
    # right rows sort BEFORE left rows at equal ts -> inclusive as-of
    w = (Window.partitionBy(on).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for dst in carried:
        both = both.withColumn(dst, F.last(dst, ignorenulls=True).over(w))
    return both.filter(F.col("_side") == 1).drop("_side")


def range_join(intervals: DataFrame, points: DataFrame,
               t0: str = "t0", t1: str = "t1", ts_col: str = "ts",
               bucket_s: int = 3600) -> DataFrame:
    """All (interval, point) pairs with t0 <= point.ts < t1, via
    epoch-bucket equi-join (bucket width `bucket_s` seconds; size it
    >= the typical interval length so each interval explodes into
    <= 2 buckets). Output: interval columns + point columns."""
    us = 1_000_000 * bucket_s

    def _us(c):
        # parquet timestamps load as TIMESTAMP_NTZ; unix_micros wants
        # TIMESTAMP (identity under a UTC session timezone)
        return F.unix_micros(F.col(c).cast("timestamp"))

    ib = F.explode(F.sequence(
        F.floor(_us(t0) / us),
        # t1 is EXCLUSIVE: a t1 on a bucket boundary contributes no
        # bucket of its own
        F.floor((_us(t1) - 1) / us))).alias("_b")
    iv = intervals.select("*", ib)
    pt = points.withColumn("_b", F.floor(_us(ts_col) / us))
    return (iv.join(pt, ["_b"])
            .filter((F.col(ts_col) >= F.col(t0))
                    & (F.col(ts_col) < F.col(t1)))
            .drop("_b"))
