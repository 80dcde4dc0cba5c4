"""Approximate nearest neighbour over embedding columns.

Two tiers (pure DataFrame ops; the one deliberate exception is the
IVF assignment's optional Arrow engine — a vectorized-numpy
mapInPandas matmul, never row-Python — because interpreted HOF
lambdas are the wrong tool for O(k*dim) arithmetic per row):

- brute-force cosine vs a query vector (`cosine_to_query`) — the exact
  baseline, O(n·d) per query, broadcast join;
- random-hyperplane LSH (`rhp_buckets` + `ann_candidate_pairs`) — the
  scale path for all-pairs search: sign-bit signatures bucket the
  vectors, candidates come from a bucket equi-join (shuffle O(n), never
  the O(n^2) cross join), and survivors are verified with the exact
  cosine. Identical vectors share every sign bit, so recall on
  exact-duplicate vectors is 1.0 by construction. Recall on NEAR
  neighbours amplifies two ways: OR over `n_tables` independent plane
  sets, or multi-probe (`rhp_probe_buckets` + `ann_multiprobe_pairs`) —
  one table probed at the least-confident flipped bits, fewer emitted
  rows for comparable recall;
- IVF (`ivf_fit_centers` + `ivf_buckets`) — a k-means coarse quantizer
  (pyspark.ml, trainable on a sample) whose nearest-centroid buckets +
  nprobe next-nearest probes feed the SAME `ann_multiprobe_pairs`
  candidate join. Identical vectors share their nearest centroid, so
  exact-duplicate recall is again 1.0 by construction.

Hyperplanes are seeded pseudo-random literals (driver-side, tiny), so
the whole plan is deterministic and JVM-evaluated.
"""

from __future__ import annotations

import random

# module-level so pandas_udf can resolve the 'pd.Series' type hints
# (PEP 563 stringifies them; resolution happens in module globals)
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def _planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def _dot(vec, plane_lits) -> F.Column:
    return F.aggregate(
        F.zip_with(vec, plane_lits,
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _bucket_expr(vec_col: str, n_planes: int, dim: int, seed: int):
    bucket = None
    for p, plane in enumerate(_planes(n_planes, dim, seed)):
        lit = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(F.col(vec_col), lit) >= 0).cast("long") * (1 << p)
        bucket = bit if bucket is None else bucket + bit
    return bucket


def rhp_buckets(df: DataFrame, vec_col: str = "embedding",
                n_planes: int = 12, dim: int = 64,
                seed: int = 9, n_tables: int = 1) -> DataFrame:
    """Adds (`table`, `bucket`): packed sign bits of `n_planes`
    hyperplane dots, for `n_tables` independent plane sets.

    One table ANDs all n_planes bits — recall on *near* (not identical)
    neighbours decays like (1 - theta/pi)^n_planes. Multiple tables
    OR-amplify: a pair is a candidate if it collides in ANY table,
    recall = 1 - (1 - p^k)^L. Cost is linear in n_tables (explode)."""
    tables = F.array(*[
        F.struct(F.lit(t).cast("int").alias("table"),
                 _bucket_expr(vec_col, n_planes, dim, seed + 101 * t)
                 .alias("bucket"))
        for t in range(n_tables)])
    return (df.select("*", F.explode(tables).alias("tb"))
            .withColumn("table", F.col("tb.table"))
            .withColumn("bucket", F.col("tb.bucket")).drop("tb"))


def ann_candidate_pairs(sig: DataFrame, id_col: str = "vec_id",
                        max_bucket: int = 500,
                        observation=None) -> DataFrame:
    """Bucket equi-join within each (table, bucket) -> distinct pairs
    (a < b). Buckets above max_bucket are dropped before the self-join
    (same adversarial-skew guard as neardup.lsh_candidates).

    Unlike neardup there is no exact-dedup fallback for dense embedding
    clusters, so the cap's recall loss must be OBSERVABLE (repo rule:
    no silent caps): pass a `pyspark.sql.Observation` and the job that
    consumes the returned frame records `dropped_rows` (exact — rows
    whose pairs the guard discarded) and `dropped_buckets` (HLL
    estimate). Without an observation the cap is applied with a plain
    semi-join and the planner picks the join strategy. With an
    observation only the OVER-cap bucket list rides a broadcast join —
    small by construction (at most rows / max_bucket heavy hitters),
    so the metrics seam scales even when the full bucket-count table
    (one row per distinct bucket) could never broadcast (ADVICE r5) —
    and the CollectMetrics node sits on the probe side (Spark never
    reports metrics nodes inside a
    broadcast exchange). AQE caveat, measured on 4.1: if the cap drops
    EVERY bucket, AQE's empty-relation propagation eliminates the
    CollectMetrics node with the pruned subtree and `observation.get`
    fails — metrics are reliable exactly when the operator returns any
    pairs at all."""
    sig = sig.select(id_col, "table", "bucket")
    counts = sig.groupBy("table", "bucket").agg(F.count("*").alias("n"))
    if observation is None:
        ok = counts.filter(F.col("n") <= max_bucket) \
            .select("table", "bucket")
        sig = sig.join(ok, ["table", "bucket"], "left_semi")
    else:
        over_list = (counts.filter(F.col("n") > max_bucket)
                     .select("table", "bucket",
                             F.lit(True).alias("_over")))
        over = F.col("_over").isNotNull()
        sig = (sig.join(F.broadcast(over_list), ["table", "bucket"],
                        "left")
               .observe(
                   observation,
                   F.sum(over.cast("long")).alias("dropped_rows"),
                   F.approx_count_distinct(
                       F.when(over, F.concat_ws(":", "table", "bucket")))
                   .alias("dropped_buckets"))
               .filter(~over).drop("_over"))
    l, r = sig.alias("l"), sig.alias("r")
    return (l.join(r, (F.col("l.table") == F.col("r.table"))
                   & (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("a"),
                    F.col(f"r.{id_col}").alias("b")).distinct())


def rhp_probe_buckets(df: DataFrame, vec_col: str = "embedding",
                      n_planes: int = 12, dim: int = 64,
                      seed: int = 9, n_probes: int = 2) -> DataFrame:
    """Multi-probe variant of `rhp_buckets`: ONE table, but each vector
    additionally lands in the `n_probes` neighbouring buckets obtained
    by flipping its LEAST-CONFIDENT sign bits (smallest |dot| — the
    bits a true near-neighbour is most likely to disagree on). Rows:
    (1 + n_probes) per vector with `is_probe`; recall comparable to
    several OR-amplified tables at a fraction of the emitted rows,
    because probes target the likely disagreements instead of rehashing
    everything (classic multi-probe LSH, public technique).

    All Catalyst: the per-plane dots are staged ONCE as an array column
    (HOF lambdas re-evaluate referenced array expressions per element,
    so the naive nested form would recompute every dot n_planes times)."""
    planes = _planes(n_planes, dim, seed)
    dots = F.array(*[_dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
                     for p in planes])
    out = df.withColumn("_dots", dots)
    d = F.col("_dots")
    bucket = None
    for p in range(n_planes):
        bit = (F.get(d, p) >= 0).cast("long") * (1 << p)
        bucket = bit if bucket is None else bucket + bit
    out = out.withColumn("_bucket", bucket)
    ranked = F.array_sort(F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda i: F.struct(F.abs(F.get(d, i)).alias("a"),
                           i.cast("int").alias("i"))))
    flips = F.slice(ranked, 1, n_probes)
    probes = F.transform(
        flips,
        lambda s: F.struct(
            F.col("_bucket").bitwiseXOR(
                F.pow(F.lit(2.0), s["i"]).cast("long")).alias("bucket"),
            F.lit(True).alias("is_probe")))
    home = F.array(F.struct(F.col("_bucket").alias("bucket"),
                            F.lit(False).alias("is_probe")))
    return (out.select("*", F.explode(F.concat(home, probes)).alias("bk"))
            .withColumn("bucket", F.col("bk.bucket"))
            .withColumn("is_probe", F.col("bk.is_probe"))
            .drop("bk", "_dots", "_bucket"))


def ann_multiprobe_pairs(sig: DataFrame, id_col: str = "vec_id",
                         max_bucket: int = 500,
                         observation=None) -> DataFrame:
    """Candidates from multi-probe signatures: a pair is a candidate
    when EITHER side's probe ring reaches the other's home bucket, so
    the join is home-side x all-rows (both directions covered by
    normalizing a=min, b=max). Same bucket-size cap as the table
    variant, counted over all emitted rows (a flood floods its probe
    ring too), and the same observation seam — capped recall loss must
    never be silent (see ann_candidate_pairs for the AQE caveat)."""
    sig = sig.select(id_col, "bucket", "is_probe")
    counts = sig.groupBy("bucket").agg(F.count("*").alias("n"))
    if observation is None:
        ok = counts.filter(F.col("n") <= max_bucket).select("bucket")
        sig = sig.join(ok, ["bucket"], "left_semi")
    else:
        over_list = (counts.filter(F.col("n") > max_bucket)
                     .select("bucket", F.lit(True).alias("_over")))
        over = F.col("_over").isNotNull()
        sig = (sig.join(F.broadcast(over_list), ["bucket"], "left")
               .observe(
                   observation,
                   F.sum(over.cast("long")).alias("dropped_rows"),
                   F.approx_count_distinct(F.when(over, F.col("bucket")))
                   .alias("dropped_buckets"))
               .filter(~over).drop("_over"))
    home = sig.filter(~F.col("is_probe")).alias("l")
    allr = sig.alias("r")
    lid, rid = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    return (home.join(allr, (F.col("l.bucket") == F.col("r.bucket"))
                      & (lid != rid))
            .select(F.least(lid, rid).alias("a"),
                    F.greatest(lid, rid).alias("b")).distinct())


def ivf_fit_centers(df: DataFrame, vec_col: str = "embedding",
                    k: int = 16, seed: int = 7,
                    sample_frac: float | None = None,
                    max_iter: int = 20,
                    init_mode: str = "k-means||") -> list[list[float]]:
    """IVF coarse quantizer: fit k-means (pyspark.ml, distributed) on
    the corpus — optionally on a sample, which is how a 100 TB corpus
    trains its quantizer — and return the centers as plain lists;
    `ivf_buckets` ships them as one broadcast data row.

    `max_iter` caps Lloyd iterations (pyspark.ml default 20) and
    `init_mode` picks the seeding ('k-means||' default, or 'random'
    to skip the multi-pass parallel init). Recall depends on
    clustering QUALITY only through bucket balance, never correctness
    — a coarser quantizer just shifts the cap/probe trade-off — so
    few-iteration/random-init fits are a legitimate cheap mode (at
    small data every init step and iteration is a fixed multi-job
    overhead and dominates wall time)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    train = df if sample_frac is None else df.sample(sample_frac, seed=seed)
    feats = train.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter,
                   initMode=init_mode).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_buckets(df: DataFrame, centers: list[list[float]],
                vec_col: str = "embedding",
                n_probes: int = 1, arrow: bool = False) -> DataFrame:
    """IVF assignment: every vector lands in its NEAREST centroid's
    bucket (is_probe=false) and, with n_probes > 1, also in the
    next-nearest (n_probes-1) buckets (is_probe=true) — the classic
    IVF nprobe trade-off, expressed so `ann_multiprobe_pairs` consumes
    it unchanged (home x all join).

    Two assignment engines, identical semantics (same stable
    smaller-index tie-break):

    - `arrow=False` (default): pure Catalyst. The centers travel as
      DATA — one broadcast row carrying an array<array<double>>
      column — not as plan literals: at production k literal
      embedding bloats the plan and analysis time linearly in k*dim,
      while the broadcast keeps the plan O(1) in k (round-3 VERDICT
      watch-item). Shuffle-free: a BroadcastNestedLoopJoin of one
      row, squared distances staged once as an array column (HOF
      lambdas re-evaluate referenced array expressions per element).
      Caveat: higher-order functions are CodegenFallback —
      INTERPRETED, O(k*dim) lambda dispatches per row. Fine for small
      k; measured ~20 s for 2000 rows at k=64 x dim=64.
    - `arrow=True`: one Arrow-batched numpy matmul per batch
      (`mapInPandas`; centers ride the task closure when small,
      a SparkContext broadcast above 4 MB). The
      same 2000 x 64 x 64 assignment is a sub-millisecond BLAS call —
      the engine you want whenever k*dim is large enough that the
      interpreted HOF path dominates (production IVF: k in the
      thousands). Ranking key is |c|^2 - 2 v.c (dropping the per-row
      |v|^2 constant), mathematically the same d2 ordering.
    """
    if arrow:
        return _ivf_buckets_arrow(df, centers, vec_col, n_probes)
    spark = df.sparkSession
    centers_df = spark.createDataFrame(
        [([[float(x) for x in c] for c in centers],)],
        "_cvecs array<array<double>>")

    def d2(c) -> Column:
        return F.aggregate(
            F.zip_with(F.col(vec_col), c,
                       lambda x, cc: (x.cast("double") - cc)
                       * (x.cast("double") - cc)),
            F.lit(0.0), lambda acc, v: acc + v)

    out = (df.crossJoin(F.broadcast(centers_df))
           .withColumn("_d2", F.transform(F.col("_cvecs"), d2))
           .drop("_cvecs"))
    dd = F.col("_d2")
    ranked = F.array_sort(F.transform(
        F.sequence(F.lit(0), F.lit(len(centers) - 1)),
        lambda i: F.struct(F.get(dd, i).alias("d"),
                           i.cast("int").alias("i"))))
    out = out.withColumn("_rk", ranked)
    rk = F.col("_rk")
    rows = F.concat(
        F.array(F.struct(F.get(rk, 0)["i"].cast("long").alias("bucket"),
                         F.lit(False).alias("is_probe"))),
        F.transform(
            F.slice(rk, 2, max(n_probes - 1, 0)),
            lambda s: F.struct(s["i"].cast("long").alias("bucket"),
                               F.lit(True).alias("is_probe"))))
    return (out.select("*", F.explode(rows).alias("bk"))
            .withColumn("bucket", F.col("bk.bucket"))
            .withColumn("is_probe", F.col("bk.is_probe"))
            .drop("bk", "_d2", "_rk"))


def _ivf_buckets_arrow(df: DataFrame, centers: list[list[float]],
                       vec_col: str, n_probes: int) -> DataFrame:
    """Arrow engine for ivf_buckets: batch matmul distance ranking.
    Output schema/semantics identical to the Catalyst engine (input
    columns + bucket long + is_probe boolean, home bucket first, then
    n_probes-1 probe buckets; stable smaller-index tie-break)."""
    import numpy as np
    from pyspark.sql.types import (BooleanType, LongType, StructField,
                                   StructType)
    out_schema = StructType(list(df.schema.fields)
                            + [StructField("bucket", LongType()),
                               StructField("is_probe", BooleanType())])
    cmat = np.asarray(centers, dtype=np.float64)
    payload = (cmat, (cmat * cmat).sum(axis=1))
    if cmat.nbytes < (4 << 20):
        # small quantizers ride the task closure — GC'd with the plan,
        # no broadcast to leak (sc.broadcast has no auto-destroy and a
        # long-lived session calling this repeatedly would accumulate
        # one blob per call; review r6)
        local, bc = payload, None
    else:
        local, bc = None, df.sparkSession.sparkContext.broadcast(payload)

    def kernel(batches):
        import numpy as np
        import pandas as pd
        cm, cn = local if bc is None else bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack([np.asarray(v, dtype=np.float64)
                             for v in pdf[vec_col]])
            # |v - c|^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 is constant per
            # row, so rank by |c|^2 - 2 v.c — one BLAS matmul
            d2 = cn[None, :] - 2.0 * (vecs @ cm.T)
            order = np.argsort(d2, axis=1, kind="stable")
            reps = []
            for p in range(min(n_probes, order.shape[1])):
                rep = pdf.copy()
                rep["bucket"] = order[:, p].astype("int64")
                rep["is_probe"] = bool(p > 0)
                reps.append(rep)
            yield pd.concat(reps) if len(reps) > 1 else reps[0]

    return df.mapInPandas(kernel, out_schema)


def verified_cosine_pairs(df: DataFrame, cand: DataFrame,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          arrow: bool = False) -> DataFrame:
    """Exact-cosine verification of candidate pairs. The joins are
    always Catalyst; `arrow=True` swaps the per-pair cosine from the
    interpreted zip_with/aggregate HOF (O(dim) lambda dispatches per
    pair) to one Arrow-batched numpy reduction — at verification
    volume (pairs x dim) the vectorized kernel is the scale path,
    same math in float64."""
    def cos(va, vb):
        return _dotv(va, vb) / (F.sqrt(_dotv(va, va)) * F.sqrt(_dotv(vb, vb)))

    def _dotv(va, vb):
        return F.aggregate(
            F.zip_with(va, vb,
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)

    x = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    y = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    joined = cand.join(x, "a").join(y, "b")
    if arrow:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _cos_vec(va: pd.Series, vb: pd.Series) -> pd.Series:
            import numpy as np
            a = np.stack([np.asarray(v, dtype=np.float64) for v in va])
            b = np.stack([np.asarray(v, dtype=np.float64) for v in vb])
            num = (a * b).sum(axis=1)
            den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
            return pd.Series(num / den)

        return joined.select("a", "b", _cos_vec("va", "vb").alias("cos"))
    return joined.select("a", "b", cos(F.col("va"), F.col("vb")).alias("cos"))


def cosine_to_query(df: DataFrame, query_df: DataFrame,
                    vec_col: str = "embedding") -> DataFrame:
    """Brute-force baseline: cosine of every row against one broadcast
    query vector (alias column `q_emb` in query_df)."""
    def d(va, vb):
        return F.aggregate(
            F.zip_with(va, vb,
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)

    e = df.crossJoin(F.broadcast(query_df))
    v, q = F.col(vec_col), F.col("q_emb")
    return e.withColumn("cos", d(v, q) / (F.sqrt(d(v, v)) * F.sqrt(d(q, q))))


def seed_centroid(df: DataFrame, vec_col: str = "embedding",
                  out_col: str = "q_emb") -> DataFrame:
    """Mean vector of `df`'s embeddings as ONE row (`out_col`
    array<double>), ready to broadcast into `cosine_to_query` — the
    model-based quality-gate pattern (score the corpus against a
    trusted seed set's centroid).

    Distributed shape: posexplode to (dim, value) then a
    partial-aggregatable groupBy(dim) avg — map-side combine collapses
    each task to `dim` rows, so 10^9 seed vectors cost one narrow
    shuffle of dim-sized partials (an interpreted array-fold over the
    whole set, or a driver-side collect, would not scale). The final
    sort+collect runs on `dim` rows."""
    dims = df.select(F.posexplode(vec_col).alias("_dim", "_v"))
    per_dim = (dims.groupBy("_dim")
               .agg(F.avg(F.col("_v").cast("double")).alias("_c")))
    return (per_dim.groupBy()
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_dim", "_c"))),
                lambda x: x["_c"]).alias(out_col)))


def knn_topk_batch(df: DataFrame, queries: DataFrame, k: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   arrow: bool = True) -> DataFrame:
    """Exact top-k cosine neighbours for a BATCH of query vectors in
    ONE scan of the corpus (the "score a benchmark/probe set against
    the whole training corpus" shape).

    `queries` is a small frame (`q_id`, `q_emb`) — bounded by contract
    (a probe set, not a second corpus; for corpus x corpus use the LSH
    /IVF pair path). It is collected once on the driver (tiny) and
    rides the task closure / a broadcast into the kernel.

    Scale shape (arrow=True, the default): each Arrow batch computes
    the full [batch x M] cosine matrix with one float64 matmul and
    emits only its LOCAL top-k rows per query — at most
    (batches x M x k) slim rows ever leave the scan, so the corpus
    itself is never shuffled. A final window over the M tiny groups
    ranks the partials. Top-k by a TOTAL order (round(cos, 6) DESC,
    id ASC) composes: the global top-k is a subset of the union of
    per-batch top-k under the same order, so the local cut is
    lossless. The same order is applied in the local cut (numpy) and
    the global rank (Catalyst), making the plan exact, not
    approximate.

    arrow=False is the interpreted-HOF Catalyst baseline (broadcast
    cross join + zip_with dot), kept for engine-parity tests.
    """
    import numpy as np

    qrows = queries.select("q_id", "q_emb").collect()
    if not qrows:
        # empty probe set: an empty (q_id, id, cos_r, rnk) frame, not
        # a kernel-side pd.concat([]) crash
        return df.sparkSession.createDataFrame(
            [], f"q_id bigint, {id_col} bigint, cos_r double, rnk bigint")
    if arrow:
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)
        qids = np.asarray([r["q_id"] for r in qrows], dtype=np.int64)
        qmat = np.asarray([[float(x) for x in r["q_emb"]] for r in qrows],
                          dtype=np.float64)
        qnrm = np.sqrt((qmat * qmat).sum(axis=1))
        payload = (qids, qmat, qnrm)
        # same closure-vs-broadcast rule as the IVF kernel: small probe
        # sets ride the task closure (no broadcast blob to leak across
        # a long-lived session); big ones go through one broadcast
        if qmat.nbytes < (4 << 20):
            local, bc = payload, None
        else:
            local, bc = None, df.sparkSession.sparkContext.broadcast(
                payload)
        out_schema = StructType([StructField("q_id", LongType()),
                                 StructField(id_col, LongType()),
                                 StructField("cos", DoubleType())])
        slim = df.select(F.col(id_col).cast("long").alias(id_col),
                         F.col(vec_col).alias("_v"))

        def kernel(batches):
            import numpy as np
            import pandas as pd
            qi, qm, qn = local if bc is None else bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.stack([np.asarray(v, dtype=np.float64)
                                 for v in pdf["_v"]])
                vn = np.sqrt((vecs * vecs).sum(axis=1))
                cos = (vecs @ qm.T) / (vn[:, None] * qn[None, :])
                cos_r = np.round(cos, 6)
                ids = pdf[id_col].to_numpy()
                outs = []
                for j in range(len(qi)):
                    # lexsort: last key is primary -> (-cos_r, id)
                    order = np.lexsort((ids, -cos_r[:, j]))[:k]
                    outs.append(pd.DataFrame({
                        "q_id": np.full(len(order), qi[j]),
                        id_col: ids[order],
                        "cos": cos[order, j]}))
                yield pd.concat(outs)

        partial = slim.mapInPandas(kernel, out_schema)
    else:
        spark = df.sparkSession
        qdf = spark.createDataFrame(
            [(int(r["q_id"]), [float(x) for x in r["q_emb"]])
             for r in qrows],
            "q_id bigint, q_emb array<double>")

        def dot(va, vb):
            return F.aggregate(
                F.zip_with(va, vb,
                           lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0), lambda acc, v: acc + v)

        e = df.crossJoin(F.broadcast(qdf))
        v, q = F.col(vec_col), F.col("q_emb")
        partial = e.select(
            "q_id", F.col(id_col).cast("long").alias(id_col),
            (dot(v, q) / (F.sqrt(dot(v, v)) * F.sqrt(dot(q, q))))
            .alias("cos"))

    from pyspark.sql.window import Window
    w = (Window.partitionBy("q_id")
         .orderBy(F.round("cos", 6).desc(), F.col(id_col)))
    return (partial
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k)
            .select("q_id", id_col, F.round("cos", 6).alias("cos_r"),
                    "rnk"))
