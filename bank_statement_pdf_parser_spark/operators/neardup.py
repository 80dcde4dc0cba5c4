"""Near-duplicate detection operators for training-data pipelines:
exact hash dedup, MinHash+LSH banding, SimHash, n-gram Jaccard.

All are pure DataFrame compositions (explode/groupBy/join) over
Catalyst hash built-ins — no UDFs — so they scale like any shuffle
workload: candidate generation is band-bucket equi-join (AQE skew
handling applies), never an O(n^2) cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic affine permutation constants (public textbook scheme:
# h_i(x) = (a_i * x + b_i) mod p). p is the Mersenne prime 2^31-1 so
# a*h + b stays well inside int64 — Spark 4 ANSI mode makes silent
# wraparound a hard error.
P = (1 << 31) - 1


def _perm_consts(n: int, seed: int = 7):
    import random
    rng = random.Random(seed)
    return [(rng.randrange(1, P), rng.randrange(0, P)) for _ in range(n)]


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             k: int = 5) -> DataFrame:
    """Distinct k-token shingles per doc (token = whitespace split)."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.array_distinct(F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")))
    return df.select(F.col(id_col).alias("doc_id"),
                     F.explode(sh).alias("shingle"))


def minhash_signatures(sh: DataFrame, n_hashes: int = 32,
                       seed: int = 7) -> DataFrame:
    """doc_id -> array<long> of n_hashes min-hashes, via one groupBy."""
    h = F.pmod(F.xxhash64("shingle"), F.lit(P))
    consts = _perm_consts(n_hashes, seed)
    mins = [F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(P)))
            .alias(f"h{i}") for i, (a, b) in enumerate(consts)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(
        *[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"))


def lsh_candidates(sig: DataFrame, n_bands: int = 8,
                   max_bucket: int = 200) -> DataFrame:
    """Band the signature, bucket-join within bands -> candidate pairs
    (a < b). Shuffle cost = O(docs * bands), not O(docs^2).

    max_bucket guards the self-join against adversarial skew: a bucket
    of k members yields k^2/2 pairs, so a degenerate bucket (thousands
    of boilerplate-identical docs) would go quadratic. Buckets above
    the cap are dropped BEFORE the join (left_semi against the under-
    cap bucket list) — identical-document floods are exact duplicates
    and belong to `exact_dedup`, not pairwise LSH."""
    bands = sig.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.xxhash64(F.concat_ws(
                ",", F.transform(
                    F.slice(F.col("sig"),
                            b * (F.size("sig") / n_bands).cast("int") + 1,
                            (F.size("sig") / n_bands).cast("int")),
                    lambda x: x.cast("string"))),
                b))).alias("band", "bucket"))
    ok = (bands.groupBy("band", "bucket")
          .agg(F.count("*").alias("n"))
          .filter(F.col("n") <= max_bucket)
          .select("band", "bucket"))
    bands = bands.join(ok, ["band", "bucket"], "left_semi")
    left = bands.alias("l")
    right = bands.alias("r")
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bucket") == F.col("r.bucket"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("a"),
                    F.col("r.doc_id").alias("b")).distinct())


def ngram_jaccard_pairs(df: DataFrame, candidates: DataFrame,
                        k: int = 5) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification stage)."""
    sh = shingles(df, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (sh.alias("x")
             .join(candidates, F.col("x.doc_id") == F.col("a"))
             .join(sh.alias("y"),
                   (F.col("y.doc_id") == F.col("b"))
                   & (F.col("x.shingle") == F.col("y.shingle")))
             .groupBy("a", "b").agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "a")
                  .withColumnRenamed("n", "na"), "a")
            .join(sizes.withColumnRenamed("doc_id", "b")
                  .withColumnRenamed("n", "nb"), "b")
            .select("a", "b",
                    (F.col("n_inter")
                     / (F.col("na") + F.col("nb") - F.col("n_inter")))
                    .alias("jaccard")))


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per-token hash bits majority-voted, bit-parallel
    via explode + sum of bit indicators."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.split(text_col, " ")).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    bits = toks.select(
        "doc_id",
        *[(F.shiftright("h", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
          for i in range(64)])
    agg = bits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)])
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else \
            F.when(F.col(f"b{i}") > 0,
                   F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_neardup_pairs(sig: DataFrame, max_hamming: int = 3,
                          n_bands: int | None = None,
                          max_bucket: int = 200,
                          hash_col: str = "simhash",
                          observation=None) -> DataFrame:
    """SimHash Hamming near-dup — the pair-finding stage `simhash64`
    feeds (signatures alone don't dedup anything). Standard bit-banding
    (Manku/Jain/Sarma, WWW'07 §3): the 64-bit hash is split into
    `n_bands` contiguous chunks; by pigeonhole any pair within Hamming
    distance n_bands-1 agrees on at least one whole chunk, so an
    equi-join on (band_idx, chunk_value) has FULL recall for
    `max_hamming` <= n_bands-1 (the default n_bands = max_hamming+1
    guarantees it) while shuffling O(docs x bands), never O(docs^2).
    Candidates are then verified exactly: hamming =
    bit_count(xor(h_a, h_b)) <= max_hamming, all Catalyst built-ins.

    Skew cap, same rule as every candidate self-join in this repo: a
    band bucket of k members yields k^2/2 pairs, so buckets above
    `max_bucket` are dropped BEFORE the join. The over-cap bucket list
    is small by construction (<= rows/max_bucket entries), so it is
    broadcast and removed with a broadcast LEFT ANTI join — the
    under-cap list, which is ~one row per doc and could never
    broadcast, is never materialized driver-side. Cap losses must be
    observable (no silent caps): pass a `pyspark.sql.Observation` to
    record dropped_band_rows (exact) + docs_affected (HLL estimate);
    identical-hash floods belong to `exact_dedup`, which runs upstream
    in every curation composition."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if not 1 <= n_bands <= 64:
        raise ValueError(f"n_bands must be in [1, 64], got {n_bands}")
    # chunk widths: as even as possible (64 = sum of n_bands widths);
    # pigeonhole recall holds for ANY partition of the 64 bit positions
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offs = [sum(widths[:i]) for i in range(n_bands)]
    # width 64 (n_bands=1): (1<<64)-1 does not fit LongType — the
    # all-bits mask in two's complement is -1 (ADVICE r6).
    chunks = [
        F.shiftright(F.col(hash_col), offs[i])
        .bitwiseAND(F.lit(-1 if widths[i] == 64 else (1 << widths[i]) - 1))
        for i in range(n_bands)
    ]
    bands = sig.select(F.col("doc_id"), F.col(hash_col),
                       F.posexplode(F.array(*chunks))
                       .alias("band", "bucket"))
    over = (bands.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band", "bucket"))
    if observation is not None:
        flagged = (bands.join(
            F.broadcast(over.withColumn("_over", F.lit(True))),
            ["band", "bucket"], "left"))
        hit = F.col("_over").isNotNull()
        bands = (flagged.observe(
            observation,
            F.sum(hit.cast("long")).alias("dropped_band_rows"),
            F.approx_count_distinct(F.when(hit, F.col("doc_id")))
            .alias("docs_affected"))
            .filter(~hit).drop("_over"))
    else:
        bands = bands.join(F.broadcast(over), ["band", "bucket"],
                           "left_anti")
    left, right = bands.alias("l"), bands.alias("r")
    cand = (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bucket") == F.col("r.bucket"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("a"),
                    F.col(f"l.{hash_col}").alias("ha"),
                    F.col("r.doc_id").alias("b"),
                    F.col(f"r.{hash_col}").alias("hb"))
            .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.select("a", "b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def capped_shared_fp_counts(fps: DataFrame, max_fp_freq: int = 256,
                            observation=None) -> DataFrame:
    """Pairwise shared-fingerprint counts (a < b, `n_shared`) from an
    exploded (doc_id, fp) frame — the join stage of winnowing-based
    near-dup (textstats.winnow_fingerprints feeds this).

    The self-join is capped exactly like `lsh_candidates`: a
    fingerprint held by k docs yields k^2/2 pairs, so one ubiquitous
    fingerprint (an 8-gram of boilerplate shared by millions of docs at
    100 TB) makes a single hash bucket quadratic. Fingerprints above
    `max_fp_freq` are dropped BEFORE the join via a semi-join against
    the under-cap list; flood-duplicate docs belong to `exact_dedup`,
    which runs upstream in every curation composition.

    The cap's recall loss must be observable (repo rule: no silent
    caps): pass a `pyspark.sql.Observation` and the consuming job
    records `dropped_fp_rows` (exact), `dropped_fps` and
    `docs_affected` (HLL estimates). Only the OVER-cap fingerprint
    list is broadcast — it is small by construction (heavy hitters
    only: at most total_rows / max_fp_freq entries), so the metrics
    seam scales exactly like the silent semi-join path even when the
    full per-fingerprint frequency table has ~one row per distinct
    fingerprint and could never broadcast (ADVICE r5). Same seam as
    `ann.ann_candidate_pairs`, including its caveats: the
    CollectMetrics node sits on the probe side of the broadcast join,
    and AQE empty-relation propagation makes metrics unreliable only
    when the operator returns no pairs at all."""
    freq = fps.groupBy("fp").agg(F.count("*").alias("n_fp"))
    if observation is None:
        ok = freq.filter(F.col("n_fp") <= max_fp_freq).select("fp")
        capped = fps.join(ok, "fp", "left_semi")
    else:
        over_fps = (freq.filter(F.col("n_fp") > max_fp_freq)
                    .select("fp", F.lit(True).alias("_over")))
        over = F.col("_over").isNotNull()
        capped = (fps.join(F.broadcast(over_fps), "fp", "left")
                  .observe(
                      observation,
                      F.sum(over.cast("long")).alias("dropped_fp_rows"),
                      F.approx_count_distinct(F.when(over, F.col("fp")))
                      .alias("dropped_fps"),
                      F.approx_count_distinct(F.when(over,
                                                     F.col("doc_id")))
                      .alias("docs_affected"))
                  .filter(~over).drop("_over"))
    l, r = capped.alias("l"), capped.alias("r")
    return (l.join(r, (F.col("l.fp") == F.col("r.fp"))
                   & (F.col("l.doc_id") < F.col("r.doc_id")))
            .groupBy(F.col("l.doc_id").alias("a"),
                     F.col("r.doc_id").alias("b"))
            .agg(F.count("*").alias("n_shared")))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keeping the smallest id per identical text (hash
    groupBy; no text comparison shuffle beyond the hash key)."""
    return (df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("h"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


def dedup_lines(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                tokens_per_line: int = 8) -> DataFrame:
    """Sub-document (line-level) exact dedup, CCNet/C4-style: every
    doc is cut into fixed-width token lines; across the whole corpus
    only the FIRST occurrence of each distinct line (by (doc, idx)
    order) is kept, later repeats — boilerplate, mirrored passages —
    are dropped while the surrounding document survives. Returns ALL
    line instances as (id, line_idx, line, is_first) so callers can
    both reassemble cleaned docs and audit drop rates.

    Scale shape: the winner per line is min(struct(id, idx)) via a
    hash-keyed groupBy — partial-aggregatable, so a boilerplate line
    repeated 10^9 times collapses map-side instead of sorting through
    one window partition (the window formulation is NOT skew-safe
    here; hot lines are the expected input). The join back to
    instances is an equi-join on the same key (AQE skew split
    applies). Line identity travels as (length, xxhash64, salted
    xxhash64) — the streaming dedup's ~128-bit content key,
    collision-safe at 10^12 lines — never the line text itself."""
    toks = (df.select(F.col(id_col).alias("_id"),
                      F.split(F.col(text_col), " ").alias("_t"))
            # stage the array + count: expressions referenced inside a
            # transform lambda are re-evaluated per element (HOF rule)
            .withColumn("_n", F.size("_t"))
            .withColumn("_nl", F.expr(f"(_n + {tokens_per_line - 1}) "
                                      f"div {tokens_per_line}")))
    lines = (toks.select(
        "_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.col("_nl") - 1),
            lambda i: F.array_join(
                F.slice(F.col("_t"), i * tokens_per_line + 1,
                        tokens_per_line), " ")))
        .alias("line_idx", "line"))
        .withColumn("_k0", F.length("line"))
        .withColumn("_k1", F.xxhash64("line"))
        .withColumn("_k2", F.xxhash64(F.lit(41), F.col("line"))))
    key = ["_k0", "_k1", "_k2"]
    winners = (lines.groupBy(*key)
               .agg(F.min(F.struct(F.col("_id"), F.col("line_idx")))
                    .alias("_first")))
    return (lines.join(winners, key)
            .select(F.col("_id").alias(id_col), "line_idx", "line",
                    (F.struct(F.col("_id"), F.col("line_idx"))
                     == F.col("_first")).alias("is_first")))


def reassemble_lines(inst: DataFrame, id_col: str = "doc_id",
                     out_col: str = "clean") -> DataFrame:
    """Cleaned documents from `dedup_lines` instances: surviving lines
    rejoined in order (one row per doc; a doc whose every line lost
    comes back as the empty string, not NULL — kept-count callers can
    distinguish). Ordered reassembly is collect_list + array_sort on
    (line_idx, line) structs, so it is shuffle-bounded by the doc's
    own lines."""
    kept = F.when(F.col("is_first"), F.struct("line_idx", "line"))
    return (inst.groupBy(id_col).agg(
        F.array_join(F.transform(F.sort_array(F.collect_list(kept)),
                                 lambda x: x["line"]), " ")
        .alias(out_col)))


def minhash_md5_long(sh: DataFrame, n_hashes: int = 16) -> DataFrame:
    """Engine-portable MinHash in LONG form: one row per
    (doc_id, seed) with `mh` = min over the doc's shingles of
    md5(seed ':' shingle) as lowercase hex. md5-of-string and
    lexicographic MIN over fixed-width hex are identical in Spark and
    ANSI SQL engines, so an oracle can replay the signature EXACTLY —
    unlike the xxhash64 production path (`minhash_signatures`), which
    is faster but Spark-specific.

    Shape: explode the seed range over the shingle frame
    (n_hashes x shingles rows, map-side only) then ONE
    partial-aggregatable groupBy min — each task collapses to
    (docs-in-task x n_hashes) partial rows before the shuffle, the
    same scaling class as `minhash_signatures`."""
    e = sh.select(
        "doc_id", "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"))
    mh = F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))
               .cast("binary"))
    return e.groupBy("doc_id", "seed").agg(F.min(mh).alias("mh"))


def minhash_estimate_pairs(sig_long: DataFrame,
                           pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard per candidate pair = fraction of agreeing
    min-hash components (the textbook unbiased MinHash estimator,
    E[match] = J). Long-form signatures join per (doc, seed), so the
    whole estimate is two equi-joins + one partial-aggregatable
    groupBy avg — no arrays are materialized and no driver round-trip
    happens; at 10^9 docs the joins shuffle only
    (candidate-pairs x n_hashes) slim rows."""
    a = sig_long.select(F.col("doc_id").alias("a"), "seed",
                        F.col("mh").alias("mha"))
    b = sig_long.select(F.col("doc_id").alias("b"), "seed",
                        F.col("mh").alias("mhb"))
    j = pairs.join(a, "a").join(b, ["b", "seed"])
    return (j.groupBy("a", "b")
            .agg(F.avg((F.col("mha") == F.col("mhb")).cast("double"))
                 .alias("est_jaccard")))
