"""As-of / range join operators (SURVEY.md §2.5 J5): frozen edge
semantics — inclusive as-of ties, left-join NULLs for unmatched rows,
half-open [t0, t1) ranges, bucket-boundary points — plus the plan
shape (no cross/nested-loop join in the range plan)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bank_statement_pdf_parser_spark.operators.joins import (asof_join,
                                                             range_join)

T0 = dt.datetime(2026, 1, 5, 12, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_inclusive_latest_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(100)),   # matches r at 100 (tie -> inclusive)
         (2, 10, _ts(250)),   # matches r at 200, not 100
         (3, 10, _ts(50)),    # before any right row -> NULLs
         (4, 11, _ts(500))],  # user with no right rows -> NULLs
        "l_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(100), 7.0), (10, _ts(200), 8.0), (12, _ts(1), 9.0)],
        "user_id long, ts timestamp, v double")
    out = {r.l_id: r for r in
           asof_join(left, right, on="user_id", ts_col="ts",
                     right_cols=("v",)).collect()}
    assert out[1].r_ts == _ts(100) and out[1].r_v == 7.0
    assert out[2].r_ts == _ts(200) and out[2].r_v == 8.0
    assert out[3].r_ts is None and out[3].r_v is None
    assert out[4].r_ts is None and out[4].r_v is None
    assert len(out) == 4  # every left row survives exactly once


def test_asof_null_payload_field_stays_row_atomic(spark):
    """A NULL field inside the matched right row must surface as NULL —
    not be back-filled from an older right row. The round-4 per-column
    last(ignorenulls) carry stitched (newer r_ts, older r_v) rows that
    never existed (ADVICE r4); the struct carry keeps rows atomic."""
    left = spark.createDataFrame(
        [(1, 10, _ts(300))], "l_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(100), 7.0, "a"),
         (10, _ts(200), None, None)],  # most recent row: NULL payload
        "user_id long, ts timestamp, v double, tag string")
    row = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("v", "tag")).collect()[0]
    assert row.r_ts == _ts(200)
    assert row.r_v is None and row.r_tag is None


def test_asof_within_staleness_bound(spark):
    """within='...' tolerance (round 6): a carried match staler than
    the bound yields NULLs for the WHOLE payload, the bound is
    inclusive at exactly within, rows with no match at all still get
    NULLs, and a malformed interval string fails fast."""
    import pytest
    left = spark.createDataFrame(
        [(1, 10, _ts(100)),    # gap 0      -> fresh
         (2, 10, _ts(160)),    # gap 60 s   -> exactly at bound, keep
         (3, 10, _ts(161)),    # gap 61 s   -> stale, NULLs
         (4, 10, _ts(50)),     # no match   -> NULLs
         (5, 11, _ts(500))],   # no right rows for user -> NULLs
        "l_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(100), 7.0)],
        "user_id long, ts timestamp, v double")
    out = {r.l_id: r for r in
           asof_join(left, right, on="user_id", ts_col="ts",
                     right_cols=("v",), within="60 seconds").collect()}
    assert out[1].r_ts == _ts(100) and out[1].r_v == 7.0
    assert out[2].r_ts == _ts(100) and out[2].r_v == 7.0  # inclusive
    assert out[3].r_ts is None and out[3].r_v is None     # stale
    assert out[4].r_ts is None and out[4].r_v is None
    assert out[5].r_ts is None and out[5].r_v is None
    assert len(out) == 5
    with pytest.raises(ValueError, match="interval"):
        asof_join(left, right, on="user_id", ts_col="ts",
                  right_cols=("v",), within="60; DROP TABLE").collect()


def test_asof_forward_direction(spark):
    """direction='forward': earliest right row at-or-after each left
    row; inclusive at equal ts; NULLs when no later right row; within
    bounds the look-AHEAD distance (inclusive)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(100)),   # matches r at 100 (tie -> inclusive)
         (2, 10, _ts(150)),   # matches r at 200, not 100
         (3, 10, _ts(250)),   # after all right rows -> NULLs
         (4, 11, _ts(50))],   # user with no right rows -> NULLs
        "l_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(100), 7.0), (10, _ts(200), 8.0)],
        "user_id long, ts timestamp, v double")
    out = {r.l_id: r for r in
           asof_join(left, right, on="user_id", ts_col="ts",
                     right_cols=("v",), direction="forward").collect()}
    assert out[1].r_ts == _ts(100) and out[1].r_v == 7.0
    assert out[2].r_ts == _ts(200) and out[2].r_v == 8.0
    assert out[3].r_ts is None and out[3].r_v is None
    assert out[4].r_ts is None and out[4].r_v is None
    assert len(out) == 4
    # within: row 2's match is 50 s ahead — keep at 50, drop at 49
    for bound, want in (("50 seconds", 8.0), ("49 seconds", None)):
        got = {r.l_id: r for r in
               asof_join(left, right, on="user_id", ts_col="ts",
                         right_cols=("v",), direction="forward",
                         within=bound).collect()}
        assert got[2].r_v == want
    import pytest
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="user_id", ts_col="ts",
                  direction="sideways")


def test_asof_duplicate_right_rows_dedup_deterministic(spark):
    """Duplicate right rows per (key, ts): the operator's built-in
    dedup keeps the struct-wise MAX payload — deterministic, and the
    result is one output row per left row (no fan-out)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(150)), (2, 10, _ts(90))],
        "l_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(100), 3.0), (10, _ts(100), 9.0), (10, _ts(100), 5.0)],
        "user_id long, ts timestamp, v double")
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("v",)).collect()
    assert len(out) == 2  # no duplicate-driven fan-out
    by_id = {r.l_id: r for r in out}
    assert by_id[1].r_v == 9.0  # struct-wise max payload wins
    assert by_id[2].r_v is None


def test_asof_dedup_rejects_unorderable_payload(spark):
    """dedup_right=True orders the payload struct; map columns are not
    orderable, so the operator must fail FAST with guidance instead of
    a deep AnalysisException — and still accept them under
    dedup_right=False (the round-4 behavior for unique right sides)."""
    import pytest
    left = spark.createDataFrame(
        [(1, 10, _ts(150))], "l_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(100), {"k": "v"})],
        "user_id long, ts timestamp, attrs map<string,string>")
    with pytest.raises(ValueError, match="dedup_right=False"):
        asof_join(left, right, on="user_id", ts_col="ts",
                  right_cols=("attrs",))
    row = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("attrs",), dedup_right=False).collect()[0]
    assert row.r_attrs == {"k": "v"}
    # the guard must walk NESTED types too: a map inside a struct (or
    # an array of structs of maps) is just as unorderable (ADVICE r5)
    nested = spark.createDataFrame(
        [(10, _ts(100), ({"k": "v"},), [({"k": "v"},)])],
        "user_id long, ts timestamp, "
        "wrap struct<m: map<string,string>>, "
        "deep array<struct<m: map<string,string>>>")
    for col in ("wrap", "deep"):
        with pytest.raises(ValueError, match="dedup_right=False"):
            asof_join(left, nested, on="user_id", ts_col="ts",
                      right_cols=(col,))


def test_range_join_half_open_and_boundaries(spark):
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(3600)),        # [0, 3600)
         (2, _ts(3600), _ts(7200))],    # [3600, 7200) — adjacent
        "iv_id long, t0 timestamp, t1 timestamp")
    pts = spark.createDataFrame(
        [(10, _ts(0)),      # t0 inclusive -> iv 1
         (11, _ts(3599)),   # inside iv 1
         (12, _ts(3600)),   # t1 EXCLUSIVE for iv 1, t0 inclusive iv 2
         (13, _ts(7200)),   # outside both
         (14, _ts(5000))],  # iv 2, crosses the point's own bucket
        "p_id long, ts timestamp")
    got = {(r.iv_id, r.p_id) for r in
           range_join(iv, pts, bucket_s=3600).collect()}
    assert got == {(1, 10), (1, 11), (2, 12), (2, 14)}
    # interval spanning multiple buckets still finds far points
    wide = spark.createDataFrame([(9, _ts(0), _ts(90000))],
                                 "iv_id long, t0 timestamp, t1 timestamp")
    got2 = {(r.iv_id, r.p_id) for r in
            range_join(wide, pts, bucket_s=3600).collect()}
    assert got2 == {(9, 10), (9, 11), (9, 12), (9, 13), (9, 14)}


def test_range_join_plan_has_no_nested_loop(spark):
    iv = spark.createDataFrame([(1, _ts(0), _ts(3600))],
                               "iv_id long, t0 timestamp, t1 timestamp")
    pts = spark.createDataFrame([(10, _ts(5))], "p_id long, ts timestamp")
    plan = range_join(iv, pts)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_and_range_match_python_mirror_randomized(spark):
    """Seeded random corpora vs plain-Python mirrors: the window
    composition and the bucket join must reproduce brute-force as-of /
    range semantics exactly (including forced ts ties and multi-bucket
    intervals)."""
    import random
    for seed in (1, 7, 23):
        rng = random.Random(seed)
        right = {}
        for i in range(150):
            u, s = rng.randrange(8), rng.randrange(0, 100_000)
            right[(u, s)] = (1000 + i, rng.random())  # unique (u, ts)
        r_rows = [(u, _ts(s), rid, v)
                  for (u, s), (rid, v) in sorted(right.items())]
        left = []
        for i in range(200):
            u = rng.randrange(9)  # user 8: never has right rows
            if right and rng.random() < 0.2:
                ru, rs = rng.choice(sorted(right))
                u, s = ru, rs  # forced tie -> inclusive match
            else:
                s = rng.randrange(0, 100_000)
            left.append((i, u, s))

        ldf = spark.createDataFrame([(i, u, _ts(s)) for i, u, s in left],
                                    "l_id long, user_id long, ts timestamp")
        rdf = spark.createDataFrame(
            r_rows, "user_id long, ts timestamp, r_id long, v double")
        got = {r.l_id: (r.r_r_id, r.r_v) for r in
               asof_join(ldf, rdf, on="user_id", ts_col="ts",
                         right_cols=("r_id", "v")).collect()}
        for i, u, s in left:
            cands = [(rs, rv) for (ru, rs), rv in right.items()
                     if ru == u and rs <= s]
            want = (max(cands)[1] if cands else (None, None))
            assert got[i] == (want[0], want[1]), (seed, i)

        # range: every left row becomes an interval of random width
        iv = [(i, s, s + rng.randrange(1, 9000)) for i, _u, s in left[:60]]
        ivdf = spark.createDataFrame(
            [(i, _ts(a), _ts(b)) for i, a, b in iv],
            "iv_id long, t0 timestamp, t1 timestamp")
        pdf = spark.createDataFrame(
            [(rid, _ts(rs)) for (_u, rs), (rid, _v) in right.items()],
            "p_id long, ts timestamp")
        got_pairs = {(r.iv_id, r.p_id) for r in
                     range_join(ivdf, pdf, bucket_s=3600).collect()}
        want_pairs = {(i, rid)
                      for i, a, b in iv
                      for (_u, rs), (rid, _v) in right.items()
                      if a <= rs < b}
        assert got_pairs == want_pairs, seed


def test_asof_nearest_semantics(spark):
    """Closer side wins; exact-ts and equidistant ties go backward;
    one-sided cases fall through; no match at all stays NULL."""
    from pyspark.sql import functions as F

    from bank_statement_pdf_parser_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [("u", 100, "l1"), ("u", 205, "l2"), ("u", 260, "l3"),
         ("v", 50, "l4"), ("w", 10, "l5")],
        "user_id string, ts long, tag string")
    right = spark.createDataFrame(
        [("u", 100, "r100"), ("u", 200, "r200"), ("u", 300, "r300"),
         ("v", 90, "r90")],
        "user_id string, ts long, name string")
    out = {r.tag: (r.r_name, r.r_ts)
           for r in asof_join(left, right, on="user_id", ts_col="ts",
                              right_cols=("name",), dedup_right=False,
                              direction="nearest").collect()}
    assert out["l1"] == ("r100", 100)   # exact match (tie) -> backward
    assert out["l2"] == ("r200", 200)   # 5 behind vs 95 ahead
    assert out["l3"] == ("r300", 300)   # 60 behind vs 40 ahead -> fwd
    assert out["l4"] == ("r90", 90)     # only a forward match exists
    assert out["l5"] == (None, None)    # no right rows for the key


def test_asof_nearest_single_exchange(spark):
    """Both traversals must share one hash exchange on the key."""
    from pyspark.sql import functions as F

    from bank_statement_pdf_parser_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [("u", 1)], "user_id string, ts long")
    right = spark.createDataFrame(
        [("u", 2, 9)], "user_id string, ts long, v long")
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=("v",), dedup_right=False,
                    direction="nearest")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning(user_id") == 1
