"""D6 generic lattice detection: majority-vote rail x-positions.

The frozen OCBC path splits each row on its own `|` characters, which
is exact for well-formed lattices but drops cells when a row has lost
a rail (OCR noise: `|a|b|c` instead of `|a|b|c|` yields only a,b).
SURVEY.md §2.3 D6's generic capability — cluster separator x-positions
ACROSS rows — recovers them: rails are the x positions where at least
`min_frac` of the table's rows carry a `|`, and every row (damaged or
not) is sliced at the voted rails.

Voting scope: pass `group_cols` to vote per document/table (the corpus
shape — rails from one statement must never leak into another); omit it
for a single-table frame. Either way the vote is one explode + hash
aggregate (shuffle O(rows x rails), never row-pairs) and the rails come
back as one array row per group via an equi-join (broadcast-eligible:
one row per document, a few ints each). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EMPTY_CELLS = F.array().cast("array<string>")
_EMPTY_INTS = F.array().cast("array<int>")


def pipe_positions(line) -> F.Column:
    """0-based x positions of '|' in `line`; [] for empty lines (the
    unguarded sequence(0, -1) would be DESCENDING, not empty)."""
    xs = F.when(F.length(line) > 0,
                F.sequence(F.lit(0), F.length(line) - 1)) \
        .otherwise(_EMPTY_INTS)
    return F.filter(xs, lambda x: line.substr(x + 1, F.lit(1)) == "|")


def vote_rails(df: DataFrame, line_col: str = "line",
               min_frac: float = 0.5,
               group_cols: list[str] | None = None) -> DataFrame:
    """`rails` per group (or one global row): sorted x positions where
    >= min_frac of the group's rows have a '|'."""
    line = F.col(line_col)
    keys = list(group_cols or [])
    votes = (df.select(*keys, F.explode(pipe_positions(line)).alias("x"))
             .groupBy(*keys, "x").agg(F.count("*").alias("n")))
    total = df.groupBy(*keys).agg(F.count("*").alias("total"))
    if keys:
        joined = votes.join(total, keys)
    else:
        joined = votes.crossJoin(F.broadcast(total))
    hits = joined.filter(F.col("n") >= F.col("total") * min_frac)
    return hits.groupBy(*keys).agg(
        F.array_sort(F.collect_list("x")).alias("rails"))


def cells_at_rails(df: DataFrame, rails_df: DataFrame,
                   line_col: str = "line",
                   group_cols: list[str] | None = None) -> DataFrame:
    """Adds `cells`: trimmed text between consecutive voted rails, for
    EVERY row — including rows whose own rails are damaged/missing.
    With fewer than 2 voted rails there is no cell geometry: `cells`
    is [] (the unguarded sequence(0, size-2) would go DESCENDING and
    emit bogus cells — same bug class as relational._ocbc_cells_col)."""
    line = F.col(line_col)
    rails = F.col("rails")
    idxs = F.when(F.size(rails) >= 2, F.sequence(F.lit(0), F.size(rails) - 2)) \
        .otherwise(_EMPTY_INTS)
    cells = F.transform(
        idxs,
        lambda i: F.trim(line.substr(
            F.get(rails, i) + 2,
            F.get(rails, i + 1) - F.get(rails, i) - 1)))
    if group_cols:
        joined = df.join(rails_df, list(group_cols), "left")
        # rows whose group produced no rails row at all -> no cells
        cells = F.when(rails.isNotNull(), cells).otherwise(_EMPTY_CELLS)
    else:
        joined = df.crossJoin(F.broadcast(rails_df))
    return joined.withColumn("cells", cells).drop("rails")
