"""Connected components over the near-duplicate pair graph.

Pair mining (dedup.py) yields edges; production dedup needs CLUSTERS —
"keep one canonical document per component" requires the transitive
closure (a~b, b~c => one group {a,b,c} even if a,c never paired).

Algorithm: min-label propagation (the DataFrame form of Pregel CC, cf.
"hash-to-min"): every node starts labeled with itself; each round every
node takes the min of its own and its neighbors' labels; stop when no
label changed. Rounds = graph diameter, and near-dup components are
small/dense, so 2-4 rounds in practice. Everything per round is one
shuffle join + one aggregation — no driver-side data, only the converged
flag crosses to the driver (an O(diameter) loop of ACTIONS, not of rows).

Determinism: min() is order-free, so the result is independent of
partitioning — the DuckDB oracle reproduces it with a recursive CTE over
the same edge set (plans/extensions.py::dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         max_iter: int = 20) -> DataFrame:
    """(doc_id, canonical_id) for every node; canonical = min id reachable
    through the pair graph (nodes absent from `pairs` map to themselves).

    pairs: columns doc_a, doc_b (undirected edges). nodes: column doc_id.
    """
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst"))))
    # membership in few/small clusters => the label frontier stays tiny;
    # cache edges once, iterate on the label table only
    edges = edges.cache()
    labels = nodes.select(F.col("doc_id"),
                          F.col("doc_id").alias("canonical_id"))

    for _ in range(max_iter):
        neighbor_min = (edges.join(labels,
                                   edges.dst == labels.doc_id)
                        .groupBy("src")
                        .agg(F.min("canonical_id").alias("nbr_min")))
        new_labels = (labels.join(neighbor_min,
                                  labels.doc_id == neighbor_min.src, "left")
                      .select("doc_id",
                              F.least("canonical_id",
                                      F.coalesce("nbr_min", "canonical_id"))
                               .alias("canonical_id")))
        new_labels = new_labels.cache()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.canonical_id") != F.col("o.canonical_id"))
                   .limit(1).count())
        old = labels
        labels = new_labels
        if hasattr(old, "unpersist") and old is not nodes:
            old.unpersist()
        if changed == 0:
            break
    edges.unpersist()
    return labels
