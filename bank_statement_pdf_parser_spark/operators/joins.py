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
right row sorts before the left via the side tag). The range is
half-open [t0, t1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts_col: str = "ts",
              right_cols: tuple[str, ...] = (),
              dedup_right: bool = True,
              within: str | None = None,
              direction: str = "backward") -> DataFrame:
    """For every left row: the most recent right row with the same
    `on` key and right.ts <= left.ts (NULLs when none — left-join
    semantics). Output: all left columns plus `r_<c>` for each of
    right_cols and `r_ts`.

    `direction='forward'` flips the match to the EARLIEST right row
    with right.ts >= left.ts (look-ahead as-of, DuckDB `ON l.ts <=
    r.ts`) — the same union-and-window plan with the traversal order
    reversed; `within` then bounds how far AHEAD the match may be
    (inclusive), mirroring the backward staleness bound.
    `direction='nearest'` (pandas merge_asof parity) takes whichever
    of the two sits closer in time, ties and exact-ts matches going
    backward; both carries ride the SAME single hash exchange (the
    window re-sorts within partitions for the second traversal), and
    `within` bounds each side before the choice.

    `within` bounds match staleness (DuckDB/kdb-style tolerance): a
    SQL interval string such as '7 days' or '30 minutes'; a carried
    match older than `left.ts - within` yields NULLs for the whole
    payload (row-atomic), exactly as if no match existed. The bound is
    INCLUSIVE (left.ts - right.ts == within still matches). One extra
    CASE on the carried struct — the single-shuffle plan is unchanged.

    The carried payload travels as ONE struct(ts, *right_cols) column
    under a single last(ignorenulls=True) — row-atomic by
    construction: a NULL field inside a right row rides with its own
    row instead of being back-filled from an older row (the round-4
    per-column carry stitched together rows that never existed when a
    payload field was NULL; flagged in ADVICE r4).

    Duplicate right rows per (on, ts): with `dedup_right=True`
    (default) the operator keeps the struct-wise MAX payload per
    (key, ts) — deterministic, one extra partial-aggregating shuffle
    on the same key. With `dedup_right=False` the caller asserts
    uniqueness; duplicates then resolve to whichever row sorts last
    within the window partition (non-deterministic across runs)."""
    payload = F.struct(
        F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols])
    if dedup_right:
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _has_map(dt) -> bool:
            # maps are unorderable at ANY nesting depth (struct field,
            # array element) — walk the whole type, not just the top
            if isinstance(dt, MapType):
                return True
            if isinstance(dt, ArrayType):
                return _has_map(dt.elementType)
            if isinstance(dt, StructType):
                return any(_has_map(f.dataType) for f in dt.fields)
            return False

        rtypes = {f.name: f.dataType for f in right.schema.fields}
        bad = [c for c in right_cols if _has_map(rtypes[c])]
        if bad:
            raise ValueError(
                f"dedup_right=True orders the payload struct, and "
                f"columns {bad} contain map types (at any nesting "
                f"depth), which are not orderable — dedupe the right "
                f"side yourself and pass dedup_right=False")
        r = (right.groupBy(on, ts_col)
             .agg(F.max(payload).alias("_r"))
             .select(on, ts_col, "_r", F.lit(0).alias("_side")))
    else:
        r = right.select(on, ts_col, payload.alias("_r"),
                         F.lit(0).alias("_side"))
    rtype = r.schema["_r"].dataType
    l = left.select("*", F.lit(None).cast(rtype).alias("_r"),
                    F.lit(1).alias("_side"))
    lfields = {f.name: f.dataType for f in l.schema.fields}
    r = r.select("*", *[F.lit(None).cast(t).alias(n)
                        for n, t in lfields.items() if n not in r.columns])
    both = l.unionByName(r.select(*l.columns))
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction={direction!r}: expected "
                         f"'backward', 'forward' or 'nearest'")
    bound = None
    if within is not None:
        import re
        if not re.fullmatch(r"[0-9]+\s+[A-Za-z]+", within.strip()):
            raise ValueError(
                f"within={within!r}: expected a SQL interval string "
                f"like '7 days' or '30 minutes'")
        bound = F.expr(f"INTERVAL {within.strip()}")
    lts = F.col(ts_col).cast("timestamp")

    def _carry(dirn):
        # right rows sort BEFORE left rows at equal ts -> inclusive
        # as-of; forward traverses descending ts so last(non-null) is
        # the EARLIEST right row at-or-after each left row
        ts_order = (F.col(ts_col).desc() if dirn == "forward"
                    else F.col(ts_col).asc())
        w = (Window.partitionBy(on)
             .orderBy(ts_order, F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        c = F.last("_r", ignorenulls=True).over(w)
        if bound is not None:
            rts = c["r_ts"].cast("timestamp")
            fresh = (rts <= lts + bound if dirn == "forward"
                     else lts <= rts + bound)
            # NULL carry (no match at all) stays NULL: fresh is NULL
            c = F.when(fresh, c)
        return c

    if direction == "nearest":
        # pandas merge_asof 'nearest': whichever of the two carries
        # sits closer in time wins; EQUAL distances (incl. an exact
        # ts match, present in both carries) prefer the backward row.
        # Both windows share the ONE hash exchange on the key — the
        # plan re-sorts within partitions for the second traversal
        # but never reshuffles. `within` bounds each side before the
        # choice, so a one-sided stale match falls through to the
        # other side.
        both = (both.withColumn("_rb", _carry("backward"))
                .withColumn("_rf", _carry("forward")))
        db = F.unix_micros(lts) - F.unix_micros(
            F.col("_rb")["r_ts"].cast("timestamp"))
        df_ = F.unix_micros(
            F.col("_rf")["r_ts"].cast("timestamp")) - F.unix_micros(lts)
        both = both.withColumn(
            "_r",
            F.when(F.col("_rb").isNull(), F.col("_rf"))
            .when(F.col("_rf").isNull(), F.col("_rb"))
            .when(df_ < db, F.col("_rf"))
            .otherwise(F.col("_rb"))).drop("_rb", "_rf")
    else:
        both = both.withColumn("_r", _carry(direction))
    carried = ["r_ts"] + [f"r_{c}" for c in right_cols]
    return (both.filter(F.col("_side") == 1)
            .select(*left.columns,
                    *[F.col(f"_r.{c}").alias(c) for c in carried]))


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
