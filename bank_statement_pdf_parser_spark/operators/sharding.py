"""Corpus sharding / mixing primitives for training-data pipelines.

Three operators a dataset builder runs right before materializing a
training corpus, each chosen for its 1000-executor shape:

- `distributed_cumsum`: a GLOBAL ordered running sum without the
  single-partition window (`Window.orderBy` with no partitionBy pulls
  the whole dataset through one task — the classic scale-killer). The
  two-level decomposition: block-local window cumsum (distributed,
  blocks are order-contiguous by construction) + a block-offset frame
  with ONE row per block (dataset_size / block_size rows — the only
  place a global sort order lives) broadcast-joined back. Textbook
  parallel prefix-sum, expressed in pure Catalyst.
- `token_budget_shards`: streaming shard assignment — shard k holds
  the docs whose cumulative token count (in key order) lands in
  [k*budget, (k+1)*budget). Every shard closes within one doc of its
  budget; assignment is a pure function of the ordered corpus, so
  re-runs and resumes agree.
- `hash_mix`: deterministic per-group sampling rates (corpus mixing
  weights) via md5-prefix thresholds — pure string comparison, no
  floats, engine-independent, shuffle-free (the weights ride a CASE
  expression or a broadcast map; nothing moves).

Quantile gating (`group_quantile_thresholds`) keeps the top fraction
of each group by an exact per-group percentile: the thresholds frame
is one row per group (broadcast), so the gate itself is a map-side
filter. The exact `percentile` aggregate buffers a group's values in
the agg buffer — at the 100 TB tier swap in `approx_percentile`
(same plan shape, sketch-mergeable) or pre-bin scores; the broadcast
threshold-join gate shape is the part that scales.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(df: DataFrame, order_col: str, weight_col: Column,
                       out_col: str = "cum", block_size: int = 1024,
                       ) -> DataFrame:
    """Running sum of `weight_col` over the GLOBAL `order_col` order,
    inclusive of the current row, as `out_col` (long). `order_col`
    values must be UNIQUE (the within-block window orders by them;
    with duplicates the default RANGE frame would sum ties together
    and the global order itself would be ill-defined).

    `order_col` must be numeric; blocks are `floor(order / block_size)`
    — order-contiguous, so within-block window cumsums compose with
    per-block offsets into the exact global prefix sum. The offsets
    frame has ~n/block_size rows; its own ordered cumsum runs on that
    tiny frame (the plan's ONLY single-partition exchange) and is
    broadcast back. Size block_size so the offsets frame stays
    driver-small (1e12 rows / 1e6 block = 1e6 offset rows).

    Two pruned passes over (order, weight) — an aggregation for block
    totals and the window pass — instead of persist(): column-pruned
    parquet scans are cheaper than caching the full rows (CLAUDE.md).
    """
    from pyspark.sql.types import NumericType
    t = df.schema[order_col].dataType
    if not isinstance(t, NumericType):
        # fail fast: a string key would still sort, but floor(key/N)
        # blocks would not be order-contiguous -> silently wrong sums
        raise ValueError(
            f"distributed_cumsum needs a numeric order column; "
            f"{order_col} is {t.simpleString()} (range-partition the "
            f"frame and derive a numeric rank first)")
    blk = F.floor(F.col(order_col) / F.lit(block_size))
    w_in = Window.partitionBy("_blk").orderBy(order_col)
    inner = (df.withColumn("_blk", blk)
             .withColumn("_w", weight_col.cast("long"))
             .withColumn("_cum_in", F.sum("_w").over(w_in)))
    totals = (df.select(blk.alias("_blk"), weight_col.cast("long").alias("_w"))
              .groupBy("_blk").agg(F.sum("_w").alias("_tot")))
    w_blk = (Window.orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_blk",
        F.coalesce(F.sum("_tot").over(w_blk), F.lit(0)).alias("_off"))
    return (inner.join(F.broadcast(offsets), "_blk")
            .withColumn(out_col, (F.col("_cum_in") + F.col("_off")))
            .drop("_blk", "_w", "_cum_in", "_off"))


def token_budget_shards(df: DataFrame, order_col: str, weight_col: Column,
                        budget: int, out_col: str = "shard",
                        block_size: int = 1024) -> DataFrame:
    """Assign each row the shard `cum_before DIV budget` where
    cum_before is the exact global running weight BEFORE the row in
    `order_col` order. Shard k's docs are exactly those straddling
    [k*budget, (k+1)*budget): every shard's total reaches its budget
    before closing (except the last) and overflows it by at most one
    doc — the standard approximate-packing contract sequence loaders
    use. Integer `DIV` (not float floor) so the assignment is exact
    past 2^53 cumulative tokens."""
    out = distributed_cumsum(df, order_col, weight_col,
                             out_col="_cum", block_size=block_size)
    return (out
            .withColumn("_before", F.col("_cum") - weight_col.cast("long"))
            .withColumn(out_col, F.expr(f"_before div {int(budget)}"))
            .drop("_cum", "_before"))


def hash_mix(df: DataFrame, group_col: str, weights_hex: dict[str, str],
             key_col: str = "doc_id", salt: str = "mix1",
             default_hex: str = "0") -> Column:
    """Keep-row predicate implementing deterministic corpus mixing:
    row survives iff md5(key:salt) < the group's hex threshold (e.g.
    '4' ~ 25% of the hash space, 'c' ~ 75%). Pure projection — no
    shuffle, no floats, reproducible across engines and re-runs."""
    h = F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(":" + salt)).cast("binary"))
    expr = F.lit(default_hex)
    for g, t in weights_hex.items():
        expr = F.when(F.col(group_col) == g, F.lit(t)).otherwise(expr)
    return h < expr


def context_windows(df: DataFrame, order_col: str, text_col: str,
                    window_tokens: int, block_size: int = 1024,
                    ) -> DataFrame:
    """Token-level context-window packing — the pretraining loader's
    "concatenate the whole corpus (space-separated, in key order) and
    cut it into fixed W-token windows" — WITHOUT ever concatenating:
    each doc learns its global token offset from the distributed
    prefix sum, then emits one row per window it straddles with the
    token slice that lands there. Window w's full content is the
    offset-ordered concatenation of its pieces, exactly equal to the
    sequential chunking, but computed as a projection + explode with
    no global structure beyond the cumsum's tiny offsets frame.

    Returns (order_col, window_id, piece_start, piece) where
    piece_start is the piece's global token offset (the reassembly
    sort key within a window) and piece is the token slice rejoined
    with spaces. A doc of n tokens at offset o spans windows
    o div W .. (o+n-1) div W — at most n/W + 1 rows; corpus-wide the
    explode emits ~total_tokens/W extra rows, not a blowup."""
    toks = (df.select(F.col(order_col), F.split(F.col(text_col), " ")
                      .alias("_t"))
            .withColumn("_n", F.size("_t").cast("long")))
    cum = distributed_cumsum(toks, order_col, F.col("_n"),
                             out_col="_cum", block_size=block_size)
    w = int(window_tokens)
    pieces = (cum
              .withColumn("_o", F.col("_cum") - F.col("_n"))
              .withColumn("_w0", F.expr(f"_o div {w}"))
              .withColumn("_w1", F.expr(f"(_o + _n - 1) div {w}"))
              .select(order_col, "_t", "_o", "_n",
                      F.explode(F.sequence(F.col("_w0"), F.col("_w1")))
                      .alias("window_id"))
              .withColumn("_lo", F.greatest(F.col("_o"),
                                            F.col("window_id") * w))
              .withColumn("_hi", F.least(F.col("_o") + F.col("_n"),
                                         (F.col("window_id") + 1) * w)))
    return pieces.select(
        order_col, "window_id",
        F.col("_lo").alias("piece_start"),
        F.array_join(F.slice(
            "_t", (F.col("_lo") - F.col("_o") + 1).cast("int"),
            (F.col("_hi") - F.col("_lo")).cast("int")), " ").alias("piece"))


def exact_k_per_group(df: DataFrame, group_col: str, k: int,
                      key_col: str = "doc_id", salt: str = "k1",
                      oversample: float = 4.0) -> DataFrame:
    """Exactly min(k, |group|) rows per group — the k smallest
    md5(key:salt) hashes — the deterministic per-source cap every
    corpus-mixing recipe needs (e.g. "at most 1M docs per domain"),
    stable under re-runs and engine-independent.

    Never sorts whole groups through a window. Phase 1 keeps rows
    whose 8-hex hash PREFIX is below a per-group threshold sized to
    pass ~oversample*k rows (map-side filter; thresholds ride a
    broadcast map built from the tiny per-group counts). Because a
    prefix cut selects an exact PREFIX of the full-hash order, the k
    smallest survivors ARE the k smallest of the whole group whenever
    the group kept >= min(k, n) — which is verified EXACTLY, and any
    deficient group (possible only through astronomically unlucky
    draws, P ~ e^-k at oversample 4) is re-ranked from its full rows.
    Phase 2's window therefore sorts ~oversample*k rows per group, not
    the group."""
    h = F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(":" + salt)).cast("binary"))
    src = df.withColumn("_h", h)
    space = float(16 ** 8)
    # thresholds computed IN-PLAN from the per-group counts frame —
    # never collected: with per-domain groups there can be millions of
    # groups, and a driver-side threshold map would be the same
    # driver-memory hazard the neardup metrics path was cured of. The
    # counts join is a plain equi-join (AQE may broadcast it when it
    # IS small; forcing broadcast here would not scale).
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    thr = (F.least(F.lit(1.0), F.lit(oversample * k) / F.col("_n"))
           * F.lit(space)).cast("long") + 1
    joined = src.join(counts.withColumn("_thr", thr), group_col)
    hv = F.conv(F.substring("_h", 1, 8), 16, 10).cast("long")
    surv = joined.filter(hv < F.col("_thr"))
    w = (Window.partitionBy(group_col).orderBy("_h", key_col))
    ranked = (surv.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= k))
    # exact deficiency check, also distributed; only the (normally
    # EMPTY) deficient group list ever reaches the driver
    kept = ranked.drop("_h", "_rn", "_n", "_thr")
    got = ranked.groupBy(group_col).agg(F.count("*").alias("_got"))
    deficient = [r[0] for r in
                 (counts.join(got, group_col, "left")
                  .filter(F.coalesce(F.col("_got"), F.lit(0))
                          < F.least(F.lit(k), F.col("_n")))
                  .select(group_col).collect())]
    if deficient:
        full = (src.filter(F.col(group_col).isin(deficient))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= k)
                .drop("_h", "_rn"))
        kept = (kept.filter(~F.col(group_col).isin(deficient))
                .unionByName(full))
    return kept


def group_quantile_thresholds(df: DataFrame, group_col: str,
                              score_col: str, q: float,
                              approx_accuracy: int | None = None,
                              ) -> DataFrame:
    """One row per group: the q-quantile of `score_col`, to be
    broadcast back as a map-side filter.

    Default = exact linear-interpolated percentile (SQL `percentile`,
    same definition as DuckDB's quantile_cont): with integer scores
    and q a multiple of 1/4 the interpolation is exact in binary
    floating point, so engines agree bit-for-bit — the testable form.
    The exact aggregate buffers each group's values, so at the 100 TB
    tier pass `approx_accuracy` (e.g. 10000) to switch to
    `approx_percentile`'s mergeable KLL-class sketch — identical plan
    shape and output schema, error <= 1/accuracy quantile mass."""
    col = F.col(score_col)
    agg = (F.percentile(col, F.lit(q)) if approx_accuracy is None
           else F.percentile_approx(col, F.lit(q),
                                    F.lit(int(approx_accuracy)))
           .cast("double"))
    return df.groupBy(group_col).agg(agg.alias("thr"))


def repeat_upsample(df: DataFrame, group_col: str,
                    factors: dict[str, tuple[int, str]],
                    key_col: str = "doc_id", salt: str = "up1",
                    default: tuple[int, str] = (1, "0")) -> DataFrame:
    """Deterministic mixture UP-sampling (the temperature-resampling
    companion to `hash_mix`'s downsampling): each row is emitted
    `int_copies` times plus one more iff md5(key:salt) falls under the
    fractional hex threshold — the "N epochs + fractional epoch"
    repeat schedule for under-represented sources, reproducible across
    engines and re-runs (no RNG state, no floats).

    `factors`: group -> (int_copies, frac_hex) where frac_hex is a
    1-char md5-prefix threshold ('8' ~ +0.5 epochs, '4' ~ +0.25,
    '0' ~ +0). int_copies=0 with a threshold gives plain downsampling.

    Shape: pure projection + explode — no shuffle, no driver state;
    `copy_idx` (1-based) makes the emitted rows distinct so downstream
    sharding/shuffles treat repeats as independent rows."""
    h = F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(":" + salt)).cast("binary"))
    base, thr = F.lit(default[0]), F.lit(default[1])
    for g, (b, t) in factors.items():
        cond = F.col(group_col) == g
        base = F.when(cond, F.lit(b)).otherwise(base)
        thr = F.when(cond, F.lit(t)).otherwise(thr)
    n = (base + (h < thr).cast("int")).cast("int")
    # explicit empty branch: Spark's sequence(1, 0) would count DOWN
    # (step defaults to -1 when start > stop), not yield []
    copies = (F.when(n >= 1, F.sequence(F.lit(1), n))
              .otherwise(F.array().cast("array<int>")))
    return (df.withColumn("copy_idx", F.explode(copies))
            .withColumn("copy_idx", F.col("copy_idx").cast("long")))
