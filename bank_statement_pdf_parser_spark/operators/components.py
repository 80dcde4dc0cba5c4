"""Connected components over a near-dup pair list — the clustering
stage that turns pairwise similarity edges (MinHash/SimHash/cosine
pairs from `neardup.py` / `ann.py`) into dedup groups with a canonical
representative (the minimum doc id reachable through any chain of
near-dup links).

Reference parity: /root/reference README.md:2 names dedup as a
capability; pair emission alone does not dedup anything when similarity
chains A~B~C without A~C — the component, not the pair, is the unit a
curation pipeline keeps-one-of.

Algorithm: hash-min label propagation. Every node starts labelled with
its own id; each round every node takes the min of its label and its
neighbours' labels; fixpoint = components labelled by their min id.
This is the classic iterative-MapReduce formulation (e.g. Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — whose
two-phase large-star/small-star variant converges in O(log^2 n) rounds
and is the upgrade path for HIGH-DIAMETER graphs). For near-dup graphs
the diameter is tiny (dup clusters are dense, chains are short), so
plain hash-min converges in a handful of rounds and keeps per-round
shuffle at O(|E|) with no degree blowup.

Spark-iteration hygiene (what actually bites at 100 TB):
- `localCheckpoint(eager=True)` after every round truncates the
  lineage — without it the plan doubles per iteration and Catalyst
  analysis goes quadratic long before data size matters. On a real
  cluster with executor loss concerns, swap for `checkpoint()` against
  a reliable store; the driver loop is identical.
- Convergence is decided by an exact changed-label count (join old vs
  new on id, both sides already materialized by the checkpoint). A
  sum-of-labels probe would be one aggregate cheaper but silently
  false-converges once sums exceed 2^53 if the agg is ever relaxed to
  double; exactness wins.
- The per-round shuffle keys on node id for BOTH the message join and
  the min-aggregation, so AQE coalesces them back-to-back; skewed
  super-nodes (one doc near-dup to millions) are pre-capped upstream by
  the band/bucket caps in `neardup.py` — this operator assumes capped
  edges and documents that contract rather than re-capping.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, a_col: str = "a",
                         b_col: str = "b", *,
                         nodes: DataFrame | None = None,
                         id_col: str = "id",
                         max_iter: int = 30) -> DataFrame:
    """Label every node with the minimum id in its connected component.

    `edges` is an undirected pair list (each pair listed once in either
    orientation, duplicates tolerated). `nodes`, if given, contributes
    isolated nodes (single-column frame named `id_col`); nodes are
    otherwise inferred from edge endpoints. Returns (`id`, `component`)
    with one row per node. Raises RuntimeError if the propagation has
    not reached a fixpoint after `max_iter` rounds (each round extends
    the propagation frontier by one hop, so `max_iter` bounds the
    graph diameter the caller believes in — near-dup graphs sit far
    below the default).
    """
    e = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    ids = sym.select(F.col("src").alias(id_col))
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(id_col)))
    labels = (ids.distinct()
              .select(F.col(id_col), F.col(id_col).alias("component"))
              .localCheckpoint(eager=True))

    for _ in range(max_iter):
        # push every node's current label to each neighbour, then fold
        # the incoming mins together with the node's own label
        msgs = (sym.join(labels, sym["src"] == labels[id_col])
                .select(F.col("dst").alias(id_col), F.col("component")))
        new = (labels.unionByName(msgs)
               .groupBy(id_col)
               .agg(F.min("component").alias("component"))
               .localCheckpoint(eager=True))
        changed = (new.join(labels.withColumnRenamed("component", "_old"),
                            id_col)
                   .filter(F.col("component") != F.col("_old"))
                   .count())
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the edge graph has a longer path than max_iter allows — raise "
        "max_iter or switch to a large-star/small-star variant")
