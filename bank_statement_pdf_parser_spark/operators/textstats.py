"""Text-analysis operators for training-data curation (SURVEY.md
training-data extensions): BPE-ish token counting, quality-signal
ratios, and winnowing document fingerprints (rolling k-gram hash +
window minimum, the public Schleimer/Wilkerson/Aiken SIGMOD'03
technique).

Everything is pure Catalyst — no UDFs — so the operators stay inside
the JVM and are shuffle-free per document (the fingerprint set of a
document is computed entirely from that document's row; only the
exploded (doc_id, fp) output ever shuffles, and only if the caller
aggregates it).

Per the repo's HOF rule (CLAUDE.md / round-3 lesson): intermediate
ARRAYS are staged as real columns before being referenced inside
lambdas — an array-valued expression referenced in a lambda is
re-evaluated per element, turning O(n) plans into O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# BPE-ish pre-tokenization: runs of letters / digits / other symbols
# (GPT-2-style contiguous-class splitting, ASCII classes so the Java
# and RE2 regex dialects agree byte-for-byte).
BPE_TOKEN_RX = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# rolling-hash parameters (frozen; the DuckDB oracles hard-code them)
FP_BASE = 257
FP_MOD = 1_000_000_007


def bpe_token_count(text: Column) -> Column:
    """Number of BPE-ish pre-tokens (whole-stage-codegen regexp_count)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RX))


def quality_signals(text: Column) -> dict[str, Column]:
    """Integer quality signals (integers, not ratios, so cross-engine
    comparison is exact; callers derive ratios): whitespace token
    count, stopword hits, punctuation chars, total token length."""
    toks = F.split(text, " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return {
        "n_tokens": F.size(toks).cast("long"),
        "stop_hits": F.size(
            F.filter(toks, lambda t: F.array_contains(stop, t)))
        .cast("long"),
        "punct_chars": F.length(
            F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("long"),
        "sum_token_len": F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t)).cast("long"),
    }


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        k: int = 8, w: int = 4) -> DataFrame:
    """Adds `fps`: the document's winnowing fingerprint set — the
    distinct minima of every w-window over the rolling hashes of all
    k-grams (hash = polynomial fold of char codes, base FP_BASE mod
    FP_MOD). Guarantee (SIGMOD'03): any match of length >= w+k-1
    between two documents shares at least one fingerprint, so a
    fingerprint equi-join finds long overlaps at O(|fps|) per doc —
    never pairwise comparison.

    Documents shorter than k+w-1 chars get an empty set (no window).

    Cost shape (round 4): the per-char integer CODES array is staged
    once per document (one O(len) split+transform pass), and each gram
    hash is an UNROLLED k-term polynomial over `element_at` integer
    lookups — O(len*k) integer mul-adds total. The round-3 version
    instead folded `ascii(text.substr(j,1))` per (gram, position):
    every substr re-seeks the string from the start (O(i) per call on
    UTF-8 data), so long documents paid O(len^2*k) string work. A true
    h[i+1]-from-h[i] rolling recurrence would be O(len), but Catalyst
    has no sequential-scan/cumulative-array primitive: expressing it
    needs either an O(len^2) aggregate-with-array-append accumulator
    (each append copies the array) or a per-char explode + window
    cumsum (a shuffle of every character — this module's contract is
    shuffle-free per document). With k=8 the unrolled form is within a
    small constant of the rolling one and stays whole-plan Catalyst."""
    text = F.col(text_col)
    n_grams = F.length(text) - (k - 1)
    out = df.withColumn("_ng", n_grams)
    # staged per the HOF rule: referenced by attribute inside lambdas
    out = out.withColumn(
        "_codes",
        F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long")))
    codes = F.col("_codes")

    def gram(i):
        h = F.element_at(codes, i + 1)
        for j in range(1, k):
            h = (h * FP_BASE + F.element_at(codes, i + 1 + j)) % FP_MOD
        return h

    hashes = F.when(
        F.col("_ng") >= 1,
        F.transform(F.sequence(F.lit(0), F.col("_ng") - 1), gram)) \
        .otherwise(F.array().cast("array<long>"))
    out = out.withColumn("_h", hashes)
    h = F.col("_h")
    fps = F.when(
        F.size(h) >= w,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(h) - w),
            lambda s: F.array_min(F.slice(h, s + 1, w))))) \
        .otherwise(F.array().cast("array<long>"))
    return out.withColumn("fps", fps).drop("_ng", "_h")


def token_ngrams(text: Column, n: int) -> Column:
    """Array of whitespace-token n-grams re-joined with single spaces
    (the canonical decontamination shingle: exact CONTIGUOUS token
    windows, not hashes, so membership tests are byte-exact). Empty
    array when the document is shorter than n tokens — the guard also
    keeps F.sequence from generating a DESCENDING range (Spark's
    sequence(1, stop) picks step -1 when stop < 1, which would emit
    garbage grams; DuckDB's generate_series is empty there, so the
    guard is what keeps the two engines identical). The token array
    and the index range are staged by the caller-visible expression
    itself being the only lambda input (HOF rule: nothing inside the
    lambda re-evaluates a nested array expression)."""
    toks = text if isinstance(text, Column) else F.col(text)
    # NOTE: callers pass a STAGED array column (withColumn) per the
    # HOF rule when text is an expression; plain column refs are fine.
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))) \
        .otherwise(F.array().cast("array<string>"))


def contaminated_doc_ids(corpus: DataFrame, probes: DataFrame,
                         n: int = 13, text_col: str = "text",
                         ngram_col: str = "ngram",
                         broadcast: bool = True) -> DataFrame:
    """Benchmark decontamination — the training-data pipeline stage
    that flags corpus documents containing ANY contiguous token n-gram
    from a benchmark/eval set, so they can be dropped before training
    (the standard n-gram-overlap rule used by public LLM data
    pipelines; n=13 is the widely-published default).

    `probes` is a one-column frame (`ngram_col`) of exact token
    n-grams. Benchmark suites are tiny next to a 100 TB corpus, so the
    probe side is broadcast by default and the membership test is a
    broadcast LEFT SEMI join against the exploded corpus shingles —
    per-task hash probes, no shuffle of the corpus. Set
    `broadcast=False` when the probe set is itself large (full eval-
    suite cross-products); the same plan then shuffles on the gram,
    which is the correct scale path because gram keys are near-unique
    (no skew). Returns DISTINCT contaminated `doc_id`s; callers
    anti-join the corpus against it to drop them."""
    toks_staged = corpus.withColumn("_toks", F.split(F.col(text_col), " "))
    grams = (toks_staged
             .withColumn("_grams", token_ngrams(F.col("_toks"), n))
             .select("doc_id", F.explode("_grams").alias(ngram_col)))
    p = probes.select(ngram_col)
    if broadcast:
        p = F.broadcast(p)
    return grams.join(p, ngram_col, "left_semi").select("doc_id").distinct()


def repetition_signals(text: Column, ns: tuple[int, ...] = (2, 3)) \
        -> dict[str, Column]:
    """Repetition-based quality signals (the published duplicate
    n-gram-fraction family of filters: a document whose n-grams are
    mostly repeats of each other is boilerplate/spam, not prose).
    Returns INTEGER columns — total and distinct n-gram counts per
    requested n — so cross-engine comparison is exact; callers derive
    the fraction 1 - distinct/total themselves.

    Deliberately SHUFFLE-FREE: distinct-counting per document uses
    array_distinct over the staged gram array, entirely inside the
    row, instead of the explode -> groupBy(doc, gram) formulation
    whose shuffle volume is every shingle of every document (at
    corpus scale that is tokens x n rows through an exchange, for a
    statistic each row can compute locally). Callers must stage the
    token array with withColumn per the HOF rule before passing it."""
    out: dict[str, Column] = {}
    for n in ns:
        grams = token_ngrams(text, n)
        out[f"n_{n}grams"] = F.size(grams).cast("long")
        out[f"n_distinct_{n}grams"] = \
            F.size(F.array_distinct(grams)).cast("long")
    return out


def filter_funnel(df: DataFrame,
                  stages: list[tuple[str, Column]]) -> DataFrame:
    """Single-pass quality-gate FUNNEL: for an ordered list of
    (stage_name, keep_predicate), report per stage how many rows
    entered, survived, and were dropped — the curation-pipeline
    observability table (where did my corpus go?).

    One aggregation job computes every stage count as a conditional
    sum over the cumulative AND of the predicates — the input is
    scanned ONCE with map-side partial aggregation to a single
    counters row (no per-stage jobs, no shuffle of data rows), then
    that one row is inlined into (stage_idx, stage, n_in, n_out,
    n_dropped). At 10^12 rows this is the same cost class as one
    count(*)."""
    aggs = [F.count(F.lit(1)).alias("_n0")]
    acc = F.lit(True)
    for i, (_, cond) in enumerate(stages):
        acc = acc & cond
        # coalesce: sum over an EMPTY frame is NULL — an empty corpus
        # must report a 0/0/0 funnel, not NULLs
        aggs.append(F.coalesce(F.sum(acc.cast("long")), F.lit(0))
                    .alias(f"_n{i + 1}"))
    row = df.agg(*aggs)
    structs = F.array(*[
        F.struct(F.lit(i).cast("long").alias("stage_idx"),
                 F.lit(name).alias("stage"),
                 F.col(f"_n{i}").alias("n_in"),
                 F.col(f"_n{i + 1}").alias("n_out"),
                 (F.col(f"_n{i}") - F.col(f"_n{i + 1}"))
                 .alias("n_dropped"))
        for i, (name, _) in enumerate(stages)])
    return row.select(F.inline(structs))
