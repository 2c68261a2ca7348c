"""Skew mitigation operators — salting patterns for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
automatically; these are the explicit forms for the two places AQE can't
help, kept deterministic (salt = hash of a data column, never rand()) so
results are reproducible and oracle-checkable:

- salted_distinct_count: exact COUNT(DISTINCT x) per key without shuffling
  every raw (key, x) pair to one reducer per key. Stage 1 groups by
  (key, hash(x) % n_salt) — the distinct DOMAIN is partitioned, so per-salt
  distinct counts add exactly. A hot key's work spreads over n_salt
  reducers; result is identical to the naive plan.
- salted_join: equi-join where one side has hot keys but is too big to
  broadcast. The skewed side gets salt = hash(tiebreak_col) % n_salt; the
  other side is replicated n_salt times (explode over the salt range); join
  on (key, salt). Row multiplicity is exactly preserved — the join output
  equals the unsalted join, which is what the oracle asserts.

Scale note: n_salt trades shuffle fan-out for replication. Size it to the
hottest key's row count / target partition size; at 1000 executors, 16-64
is typical. Salting costs (n_salt-1) extra copies of the replicated side,
so only reach for it when AQE's runtime splitting is unavailable (e.g.
aggregation skew, pre-AQE clusters, or deterministic-layout requirements).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(df: DataFrame, keys: Sequence[str],
                          value_col: str, n_salt: int = 16,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key distinct count via domain-partitioned two-stage agg.

    hash(value) % n_salt partitions the distinct domain, so the per-salt
    distinct counts are disjoint and sum exactly; a key with a billion rows
    occupies n_salt reducers instead of one. (Spark's own partial-agg helps
    plain sums but NOT distinct, which must co-locate the full domain per
    key in the naive plan.)
    """
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salt)).alias("__salt")
    stage1 = (df.select(*keys, F.col(value_col), salt)
                .groupBy(*keys, "__salt")
                .agg(F.count_distinct(F.col(value_col)).alias("__part")))
    return (stage1.groupBy(*keys)
                  .agg(F.sum("__part").alias(out_col)))


def salted_join(skewed: DataFrame, other: DataFrame,
                on: Sequence[str], tiebreak_col: str,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the skewed side salted and `other` replicated.

    tiebreak_col: any column of the skewed side with spread within a hot
    key (a row id, timestamp, line number); its hash assigns each skewed
    row to one of n_salt sub-keys deterministically. Every `other` row is
    exploded to all n_salt sub-keys, so each skewed row still meets every
    matching other row exactly once — multiplicities are preserved and the
    result equals the unsalted join.

    Only inner/left/left_semi are supported: those look at `other` rows
    solely through matches, so the n_salt replicas are transparent. For
    right/full/right-side-anti joins each UNMATCHED `other` row would be
    emitted once per replica, silently diverging from the unsalted join —
    salt the other side instead, or dedupe unmatched rows explicitly.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — replicating `other` "
            "n_salt times only preserves multiplicities for "
            "inner/left/left_semi joins")
    salt_col: Column = F.pmod(F.hash(F.col(tiebreak_col)), F.lit(n_salt))
    s = skewed.withColumn("__salt", salt_col)
    o = (other.withColumn(
            "__salt",
            F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))))
    out = s.join(o, [*on, "__salt"], how)
    return out.drop("__salt")
