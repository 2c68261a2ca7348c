"""Property-based check for connected components: on arbitrary small
graphs, the distributed min-label propagation must agree with a
straight-line union-find executed in plain Python (the spec)."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from kafka_flink_processing_spark.operators.cluster import connected_components

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from kafka_flink_processing_spark.session import get_spark
        _spark = get_spark("cc_prop")
    return _spark


def union_find_spec(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node of each component
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    max_size=18))
def test_components_match_union_find(edges):
    spark = _get_spark()
    nodes = sorted({n for e in edges for n in e} | {0, 14})
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "doc_a long, doc_b long")
    if not edges:
        pairs = pairs.filter("doc_a != doc_a")  # empty edge set
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {r.doc_id: r.canonical_id
           for r in connected_components(pairs, nodes_df).collect()}
    assert got == union_find_spec(edges, nodes)
