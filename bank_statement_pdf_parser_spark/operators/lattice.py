"""D6 generic lattice detection: majority-vote rail x-positions.

The frozen OCBC path splits each row on its own `|` characters, which
is exact for well-formed lattices but drops cells when a row has lost
a rail (OCR noise: `|a|b|c` instead of `|a|b|c|` yields only a,b).
SURVEY.md §2.3 D6's generic capability — cluster separator x-positions
ACROSS rows — recovers them: rails are the x positions where at least
`min_frac` of the table's rows carry a `|`, and every row (damaged or
not) is sliced at the voted rails.

Pure DataFrame ops: per-row pipe positions via HOFs, one explode +
hash aggregate for the vote (shuffle O(rows x rails), never row-pairs),
rails broadcast back as a one-row array. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pipe_positions(line) -> F.Column:
    xs = F.sequence(F.lit(0), F.length(line) - 1)
    return F.filter(xs, lambda x: line.substr(x + 1, F.lit(1)) == "|")


def vote_rails(df: DataFrame, line_col: str = "line",
               min_frac: float = 0.5) -> DataFrame:
    """One-row frame with `rails`: sorted x positions where >= min_frac
    of rows have a '|'."""
    line = F.col(line_col)
    votes = (df.select(F.explode(pipe_positions(line)).alias("x"))
             .groupBy("x").agg(F.count("*").alias("n")))
    total = df.agg(F.count("*").alias("total"))
    return (votes.crossJoin(F.broadcast(total))
            .filter(F.col("n") >= F.col("total") * min_frac)
            .agg(F.array_sort(F.collect_list("x")).alias("rails")))


def cells_at_rails(df: DataFrame, rails_df: DataFrame,
                   line_col: str = "line") -> DataFrame:
    """Adds `cells`: trimmed text between consecutive voted rails, for
    EVERY row — including rows whose own rails are damaged/missing."""
    line = F.col(line_col)
    rails = F.col("rails")
    cells = F.transform(
        F.sequence(F.lit(0), F.size(rails) - 2),
        lambda i: F.trim(line.substr(
            F.get(rails, i) + 2,
            F.get(rails, i + 1) - F.get(rails, i) - 1)))
    return df.crossJoin(F.broadcast(rails_df)).withColumn("cells", cells) \
        .drop("rails")
