"""Approximate nearest neighbour over embedding columns.

Two tiers (both pure DataFrame ops, no UDFs):

- brute-force cosine vs a query vector (`cosine_to_query`) — the exact
  baseline, O(n·d) per query, broadcast join;
- random-hyperplane LSH (`rhp_buckets` + `ann_candidate_pairs`) — the
  scale path for all-pairs search: sign-bit signatures bucket the
  vectors, candidates come from a bucket equi-join (shuffle O(n), never
  the O(n^2) cross join), and survivors are verified with the exact
  cosine. Identical vectors share every sign bit, so recall on
  exact-duplicate vectors is 1.0 by construction.

Hyperplanes are seeded pseudo-random literals (driver-side, tiny), so
the whole plan is deterministic and JVM-evaluated.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F


def _planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def _dot(vec, plane_lits) -> F.Column:
    return F.aggregate(
        F.zip_with(vec, plane_lits,
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def rhp_buckets(df: DataFrame, vec_col: str = "embedding",
                n_planes: int = 12, dim: int = 64,
                seed: int = 9) -> DataFrame:
    """Adds `bucket` (packed sign bits of `n_planes` hyperplane dots)."""
    bucket = None
    for p, plane in enumerate(_planes(n_planes, dim, seed)):
        lit = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(F.col(vec_col), lit) >= 0).cast("long") * (1 << p)
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket)


def ann_candidate_pairs(sig: DataFrame, id_col: str = "vec_id") -> DataFrame:
    l, r = sig.alias("l"), sig.alias("r")
    return (l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("a"),
                    F.col(f"r.{id_col}").alias("b")))


def verified_cosine_pairs(df: DataFrame, cand: DataFrame,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    def cos(va, vb):
        return _dotv(va, vb) / (F.sqrt(_dotv(va, va)) * F.sqrt(_dotv(vb, vb)))

    def _dotv(va, vb):
        return F.aggregate(
            F.zip_with(va, vb,
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)

    x = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    y = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (cand.join(x, "a").join(y, "b")
            .select("a", "b", cos(F.col("va"), F.col("vb")).alias("cos")))


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
