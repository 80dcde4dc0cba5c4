from __future__ import annotations

import pytest

from bank_statement_pdf_parser_spark.operators.components import (
    connected_components)


def _labels(df):
    return {(r.id, r.component) for r in df.collect()}


def test_chain_clique_and_isolated(spark):
    """A 5-node chain (propagation needs 4 rounds — min sits at one
    end), a triangle, a duplicated/reversed edge, and an isolated node
    supplied only via `nodes`."""
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0),          # chain 0-1-2-3-4
         (10, 11), (11, 12), (12, 10), (10, 11),  # triangle, dup edge
         (20, 21), (21, 20)],                     # same edge both ways
        "a long, b long")
    nodes = spark.createDataFrame([(0,), (4,), (30,)], "id long")
    got = _labels(connected_components(edges, nodes=nodes))
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 0),
                   (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20), (30, 30)}


def test_bridge_merges_two_clusters(spark):
    """Two dense clusters connected by a single bridge edge collapse to
    one component labelled by the global min, which must cross the
    bridge to reach the far cluster."""
    c1 = [(1, 2), (2, 3), (1, 3)]
    c2 = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(c1 + c2 + [(3, 100)], "a long, b long")
    got = _labels(connected_components(edges))
    assert got == {(i, 1) for i in (1, 2, 3, 100, 101, 102)}


def test_empty_edges_yield_singletons(spark):
    edges = spark.createDataFrame([], "a long, b long")
    nodes = spark.createDataFrame([(7,), (8,)], "id long")
    got = _labels(connected_components(edges, nodes=nodes))
    assert got == {(7, 7), (8, 8)}


def test_max_iter_guard_raises(spark):
    """max_iter below the needed round count must fail loudly, never
    return partially-propagated labels."""
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(6)], "a long, b long")  # path 0..6
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_custom_columns(spark):
    edges = spark.createDataFrame([(5, 6)], "x long, y long")
    got = {(r.nid, r.component) for r in
           connected_components(edges, a_col="x", b_col="y",
                                id_col="nid").collect()}
    assert got == {(5, 5), (6, 5)}
