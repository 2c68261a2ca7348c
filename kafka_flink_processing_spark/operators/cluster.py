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
    spark = pairs.sparkSession
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst"))))
    # membership in few/small clusters => the label frontier stays tiny;
    # cache edges once, iterate on the label table only
    edges = edges.cache()
    n_edges = edges.count()

    # Size the iteration's shuffle width to the EDGE volume (as a Pregel
    # runtime would), not the session default: a 32-way shuffle over a few
    # hundred edges is pure task overhead per round, while at billions of
    # edges the width grows back to the session setting. ~1M edge rows per
    # reduce task keeps partitions executor-sized either way. The width is
    # applied with explicit repartition() on the loop's own plans — NOT by
    # toggling spark.sql.shuffle.partitions, which is session-global and
    # would silently narrow any query planned concurrently (other threads,
    # streaming micro-batches). AQE's partition coalescing right-sizes the
    # loop's remaining small shuffles (groupBy, left join) at runtime.
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(1, min(default_parts, 1 + n_edges // 1_000_000))
    edges = edges.repartition(loop_parts, "dst").cache()
    old_total = None
    labels = nodes.select(F.col("doc_id"),
                          F.col("doc_id").alias("canonical_id")) \
                  .repartition(loop_parts, "doc_id")
    for _ in range(max_iter):
        # new label = min over {own label} ∪ {labels of in-neighbors},
        # expressed as union + one groupBy: a single exchange per round
        # (the aggregation), versus the groupBy + per-round broadcast +
        # left-join form — which also stops scaling once the neighbor-min
        # table is corpus-sized and can no longer broadcast. Nodes without
        # neighbors keep their label via the self-contribution row.
        nbr = (edges.join(labels, edges.dst == labels.doc_id)
               .select(F.col("src").alias("doc_id"), "canonical_id"))
        new_labels = (labels.unionByName(nbr)
                      .groupBy("doc_id")
                      .agg(F.min("canonical_id").alias("canonical_id")))
        new_labels = new_labels.cache()
        # labels only ever DECREASE, so the label sum is strictly
        # monotone — equality means a fixpoint. One cheap aggregate
        # materializes the cache and tests convergence in a single
        # action (no compare-join).
        total = new_labels.agg(F.sum("canonical_id")).collect()[0][0]
        labels = new_labels
        if total == old_total:
            break
        old_total = total
    # Deliberately unpersist NOTHING here. uncacheQuery (even non-cascading)
    # clears the materialized buffers of every cached plan built on top of
    # the dropped one, so unpersisting a superseded round — or `edges` before
    # the caller consumes the result — silently turns the returned DataFrame
    # back into its full lineage (re-mines the pair graph on next action;
    # measured 9s vs 4s at sf0.1). The retained footprint is the edge list
    # plus one slim (id, label) row per node per round, spillable
    # (MEMORY_AND_DISK) and session-scoped; a production run persists the
    # final label table to storage and then frees the session caches.
    return labels
