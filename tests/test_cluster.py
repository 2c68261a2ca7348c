"""Connected components (operators/cluster.py): transitive closure on
hand-built graphs — chains (labels must hop multiple rounds), independent
components, and singletons."""

from __future__ import annotations

from kafka_flink_processing_spark.operators.cluster import connected_components


def _run(spark, edges, node_ids):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    out = connected_components(pairs, nodes)
    return {r.doc_id: r.canonical_id for r in out.collect()}


def test_chain_needs_propagation(spark):
    # 1-2, 2-3, 3-4: label 1 must hop three times to reach node 4
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], [1, 2, 3, 4, 99])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 99: 99}


def test_two_components_and_transitivity(spark):
    # a~b, b~c clusters {5,6,7} though 5,7 never paired; {10,11} separate
    got = _run(spark, [(5, 6), (6, 7), (10, 11)], [5, 6, 7, 10, 11])
    assert got == {5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_empty_pairs_all_singletons(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {r.doc_id: r.canonical_id
           for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 2}
