"""TPC-H-shaped relational battery, round-4 widening (SURVEY.md §2.5).

The reference delegates every ad-hoc relational read to Postgres
(README.md:83-101); this module is the corresponding engine-native surface,
exercised through the classic TPC-H query shapes the driver's star schema
supports (the testdata has no partsupp table, so Q2/Q9/Q11/Q16/Q20 are
out of reach; Q4/Q12/Q21 are adapted to the columns that exist — the schema
carries no l_commitdate/l_receiptdate/l_shipmode, so "late" is defined
against o_orderdate and the priority split replaces the shipmode split.
Q21 was mis-binned as partsupp-dependent through r6: it needs only
supplier/lineitem/orders/nation, so it joined the battery late-r6).

Plan-shape notes (the 100 TB contract, same posture as plans/relational.py):
filters and projections push into every parquet scan; nation/region are
broadcast always, supplier/customer/part left to AQE's size estimate (they
grow with SF); every aggregate over a money measure goes through
functions.exact.dsum/davg so results are bit-identical across engines and
partition counts; top-k is orderBy+limit => TakeOrderedAndProject
(distributed partial top-k, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_processing_spark.functions.exact import (
    davg_sql,
    dsum,
    dsum_sql,
)
from kafka_flink_processing_spark.plans.registry import register
from kafka_flink_processing_spark.sources.parquet import load_table


def _rev(price="l_extendedprice", disc="l_discount"):
    return F.col(price) * (1 - F.col(disc))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


@register(
    "sql_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): orders in a one-year "
        "window having at least one lineitem shipped >90 days after the "
        "order date (the schema has no commit/receipt dates, so lateness "
        "is vs o_orderdate), counted per priority. Exercises EXISTS as a "
        "LEFT SEMI join with a non-equi conjunct riding the orderkey "
        "equi-join; the date filter pushes into the orders scan and the "
        "5-row aggregate is map-side-combined.",
)
def sql_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    cond = ((F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")))
    return (orders.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


@register(
    "sql_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql(_REV_SQL, 4)} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping): revenue between every "
        "(supplier-nation, customer-nation) pair over two ship years — "
        "the full 25x24 matrix rather than one hand-picked pair, which "
        "makes the grouped output a real (if small) relation. Five-way "
        "join; the two nation legs broadcast (self-joined dimension "
        "aliased twice), lineitem->orders->customer shuffle on their "
        "keys, final agg is ~1200 groups so its exchange is trivial.",
)
def sql_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    sup = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("c_nk"),
                                F.col("n_name").alias("cust_nation")))
    return (li.join(sup, li.l_suppkey == sup.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(n1, F.col("s_nationkey") == F.col("s_nk"))
            .join(n2, F.col("c_nationkey") == F.col("c_nk"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(dsum(_rev(), 4).alias("revenue")))


@register(
    "sql_q8_market_share",
    oracle=f"""
    WITH all_sales AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REV_SQL} AS volume, n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume "
                     "ELSE 0.0 END", 4)}
             / {dsum_sql("volume", 4)} AS mkt_share,
           {dsum_sql("volume", 4)} AS total_volume
    FROM all_sales GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): NATION_3's share of "
        "PROMO-part revenue sold into EUROPE customers, per order year. "
        "Seven-way join where region/nation broadcast and prune the "
        "customer side early; the share is a ratio of two exact decimal "
        "sums over the same grouped rows, so it is deterministic at any "
        "partition count.",
)
def sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.join(F.broadcast(reg),
                              nat.n_regionkey == reg.r_regionkey)
                     .select(F.col("n_nationkey").alias("c_nk")))
    sales = (li.join(part, li.l_partkey == part.p_partkey)
             .join(sup, li.l_suppkey == sup.s_suppkey)
             .join(orders, li.l_orderkey == orders.o_orderkey)
             .join(cust, orders.o_custkey == cust.c_custkey)
             .join(n1, F.col("s_nationkey") == F.col("s_nk"))
             .join(n2, F.col("c_nationkey") == F.col("c_nk"))
             .select(F.year("o_orderdate").cast("long").alias("o_year"),
                     _rev().alias("volume"), "supp_nation"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_3",
                        F.col("volume")).otherwise(F.lit(0.0))
    return (sales.groupBy("o_year")
            .agg((dsum(nation_vol, 4) / dsum(F.col("volume"), 4))
                 .alias("mkt_share"),
                 dsum(F.col("volume"), 4).alias("total_volume")))


@register(
    "sql_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dsum_sql(_REV_SQL, 4)} AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): top-20 customers by "
        "revenue lost to returns in a half-year window. The returnflag "
        "and date predicates push into the lineitem/orders scans, nation "
        "broadcasts, and the final top-20 is TakeOrderedAndProject over "
        "the grouped rows (deterministic via the c_custkey tie-break) — "
        "no global sort ever materializes.",
)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01"))
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R")
    nat = F.broadcast(load_table(spark, "nation", sf_dir))
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .join(nat, cust.c_nationkey == nat.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(dsum(_rev(), 4).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


@register(
    "sql_q12_late_lineitems",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                  THEN 'on_time'
                WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                  THEN 'late'
                ELSE 'very_late' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (shipping delay vs priority): lineitems shipped "
        "in one year bucketed by days-from-order (<=30 / <=90 / beyond — "
        "the schema has no shipmode, so the delay bucket plays its role), "
        "with urgent-vs-other conditional counts per bucket. Integer "
        "day-diff arithmetic on both engines; one join shuffle, 3-row "
        "map-side-combined aggregate.",
)
def sql_q12_late_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (F.when(delay <= 30, "on_time")
              .when(delay <= 90, "late")
              .otherwise("very_late"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    low = ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # two EXPLICIT predicates, not when(high,...).otherwise(1): the oracle's
    # NOT IN yields NULL (-> ELSE 0) for a NULL priority, while otherwise(1)
    # would count it — a latent hash divergence on nullable data
    return (orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy(bucket.alias("delay_bucket"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(low, 1).otherwise(0)).cast("long")
                 .alias("low_line_count")))


@register(
    "sql_q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN " + _REV_SQL +
                             " ELSE 0.0 END", 4)}
                 / {dsum_sql(_REV_SQL, 4)} AS promo_revenue_pct,
           COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14 (promotion effect): percentage of one ship-month's "
        "revenue from PROMO-type parts. Part joins on partkey (AQE "
        "broadcasts it at small SF; at 100 TB it shuffles — either way "
        "the month filter prunes lineitem first); the output is one row "
        "whose ratio divides two exact decimal sums.",
)
def sql_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01"))
    part = load_table(spark, "part", sf_dir)
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .agg((F.lit(100.0) * dsum(promo, 4) / dsum(_rev(), 4))
                 .alias("promo_revenue_pct"),
                 F.count("*").alias("n_lineitems")))


@register(
    "sql_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {dsum_sql(_REV_SQL, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): supplier(s) hitting the maximum quarter "
        "revenue. The per-supplier aggregate is the only real shuffle; "
        "the MAX scalar subquery runs over that already-tiny aggregate "
        "(#suppliers rows) and broadcasts back as a filter — expressed as "
        "a rank-1 window over the aggregate, which Spark plans the same "
        "way. Exact decimal revenue makes the max (and any revenue tie) "
        "engine-portable.",
)
def sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(dsum(_rev(), 4).alias("total_revenue")))
    # rank over the aggregated (#suppliers-row) relation — the single
    # partition is fine because this window's input IS the aggregate
    top = (rev.withColumn(
        "_r", F.rank().over(Window.orderBy(F.col("total_revenue").desc())))
        .filter(F.col("_r") == 1).drop("_r"))
    sup = load_table(spark, "supplier", sf_dir)
    return (sup.join(top, sup.s_suppkey == top.supplier_no)
            .select("s_suppkey", "s_name", "total_revenue"))


@register(
    "sql_q17_small_qty_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk, {davg_sql("l_quantity", 2)} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql("l_extendedprice", 2)} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * avg_qty
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): revenue from "
        "lineitems of one brand whose quantity sits under half the "
        "part's average quantity — the correlated-average pattern, "
        "decorrelated into a per-part aggregate joined back on partkey "
        "(exactly what Catalyst's decorrelation does to the textual "
        "form). The avg is exact-decimal so the 0.5*avg threshold "
        "comparison is engine-portable.",
)
def sql_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_processing_spark.functions.exact import davg
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") == "Brand#1")
    part_avg = (li.groupBy(F.col("l_partkey").alias("pk"))
                .agg(davg("l_quantity", 2).alias("avg_qty")))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .join(part_avg, li.l_partkey == part_avg.pk)
            .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
            .agg((dsum(F.col("l_extendedprice"), 2) / 7.0)
                 .alias("avg_yearly"),
                 F.count("*").alias("n_lineitems")))


@register(
    "sql_q18_large_volume_customer",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {dsum_sql("l_quantity", 2)} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {dsum_sql("l_quantity", 2)} > 200
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 (large-volume customer): orders whose total quantity "
        "exceeds 200, joined back to orders+customer, top-20 by order "
        "price. The HAVING aggregate shrinks lineitem to the qualifying "
        "orderkeys BEFORE the joins (at 100 TB that pre-aggregation is "
        "the whole ballgame); top-20 is TakeOrderedAndProject with the "
        "orderkey tie-break.",
)
def sql_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    big = (li.groupBy("l_orderkey")
           .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
           .filter(F.col("sum_qty") > 200))
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey", "o_totalprice",
                    "sum_qty")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(20))


@register(
    "sql_q19_bracketed_revenue",
    oracle=f"""
    SELECT {dsum_sql(_REV_SQL, 4)} AS revenue, COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 (discounted revenue): revenue under a disjunction of "
        "three (brand, size-range, quantity-range) brackets — the "
        "classic OR-of-conjuncts predicate. Catalyst extracts the "
        "common p_partkey equi-join and pushes the brand/size disjuncts "
        "into the part scan; the quantity legs ride the join filter.",
)
def sql_q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (((b == "Brand#1") & sz.between(1, 10) & q.between(1, 15))
            | ((b == "Brand#2") & sz.between(5, 20) & q.between(10, 30))
            | ((b == "Brand#3") & sz.between(10, 40) & q.between(20, 50)))
    return j.filter(cond).agg(dsum(_rev(), 4).alias("revenue"),
                              F.count("*").alias("n_lineitems"))


@register(
    "sql_q22_dormant_customers",
    oracle=f"""
    WITH rich AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT {davg_sql("c_acctbal", 2)}
                         FROM customer WHERE c_acctbal > 0.0)
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           {dsum_sql("c_acctbal", 2)} AS totacctbal
    FROM rich
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape (global sales opportunity): customers with "
        "above-average positive balances and no orders since 2000 — "
        "dormant, not never-ordered; in this dense testdata every "
        "customer has historic orders — counted per market segment (the "
        "testdata has no phone column, so the country-code grouping "
        "becomes the segment). The scalar-average subquery is one "
        "broadcast double; NOT EXISTS plans as LEFT ANTI on custkey with "
        "the date filter pushed into the orders scan; exact decimal "
        "balance sums.",
)
def sql_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_processing_spark.functions.exact import davg
    cust = load_table(spark, "customer", sf_dir)
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(davg("c_acctbal", 2).alias("a")))
    orders = (load_table(spark, "orders", sf_dir)
              .filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    return (cust.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("numcust"),
                 dsum(F.col("c_acctbal"), 2).alias("totacctbal")))


@register(
    "sql_q5_local_supplier",
    oracle=f"""
    SELECT n_name, {dsum_sql(_REV_SQL, 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): revenue from orders where "
        "the customer and the lineitem's supplier share a nation, one order "
        "year, one region, grouped by nation. Six-way join: region filters "
        "nation (both broadcast — the region predicate prunes the "
        "dimension BEFORE it reaches any fact row), the customer-supplier "
        "same-nation equi-conjunct rides the supplier join, and the date "
        "filter pushes into the orders scan. The 5-row aggregate is "
        "map-side-combined; revenue is the exact scaled-int sum.",
    bench=True,
)
def sql_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir) \
        .select("c_custkey", "c_nationkey")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")) \
        .select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir) \
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    sup = load_table(spark, "supplier", sf_dir) \
        .select("s_suppkey", "s_nationkey")
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    # region prunes nation driver-free: broadcast both dimension legs
    local_nat = F.broadcast(
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
           .select("n_nationkey", "n_name"))
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(sup, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(local_nat, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(dsum(_rev(), 4).alias("revenue")))


@register(
    "sql_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount", 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): the pure "
        "scan-filter-aggregate — revenue delta if mid-range discounts on "
        "small orders were eliminated. The whole point at 100 TB is that "
        "EVERY predicate (ship year, discount band, quantity cap) reaches "
        "the parquet scan as PushedFilters over row-group min/max stats "
        "and only two columns are read; no join, no shuffle beyond the "
        "single-row final combine, fully inside whole-stage codegen.",
    bench=True,
)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0))
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4)
        .alias("revenue"),
        F.count("*").alias("n_lineitems"))


@register(
    "sql_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 105 DAY)
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name, n_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): late "
        "lineitems of finalized multi-supplier orders where the supplier "
        "was the ONLY late one, counted per supplier, top-100. Adapted "
        "like Q4/Q12 ('late' = shipped >105 days after o_orderdate; no "
        "commit/receipt dates in the schema) and reported across all "
        "nations (the 4-suppliers-per-nation testdata makes the classic "
        "single-nation filter degenerate). Mis-binned as "
        "partsupp-dependent through r6 — it needs no partsupp. The "
        "oracle keeps the spec's EXISTS/NOT-EXISTS self-join form; the "
        "engine runs the scale formulation instead: the two correlated "
        "subqueries collapse into per-order aggregates (distinct "
        "suppliers >= 2; distinct LATE suppliers == 1) joined back by "
        "orderkey — two map-side-combinable aggs and two semi joins that "
        "reuse the late set's orderkey partitioning, versus two "
        "lineitem-vs-lineitem shuffle self-joins in the naive plan. "
        "Deterministic at any SF: (numwait DESC, s_name) is a total "
        "order, top-100 is TakeOrderedAndProject.",
)
def sql_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = (load_table(spark, "orders", sf_dir)
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    late = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 105 DAYS"))
            .select("l_orderkey", "l_suppkey"))
    # EXISTS other-supplier lineitem == order touches >= 2 distinct
    # suppliers; NOT EXISTS other-late-supplier == exactly 1 distinct
    # late supplier (l1 itself). Both are order-keyed aggregates, not
    # self-joins — the semi joins below reuse late's hash partitioning.
    multi_supp = (load_table(spark, "lineitem", sf_dir)
                  .groupBy("l_orderkey")
                  .agg(F.countDistinct("l_suppkey").alias("n_supp"))
                  .filter(F.col("n_supp") >= 2)
                  .select("l_orderkey"))
    solo_late = (late.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_late_supp"))
                 .filter(F.col("n_late_supp") == 1)
                 .select("l_orderkey"))
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name",
                                                       "s_nationkey")
    nat = F.broadcast(load_table(spark, "nation", sf_dir)
                      .select("n_nationkey", "n_name"))
    return (late
            .join(solo_late, "l_orderkey", "left_semi")
            .join(multi_supp, "l_orderkey", "left_semi")
            .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("s_name", "n_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(100))


# --------------------------------------------------------------------------
# partsupp-dependent battery (Q2/Q9/Q11/Q16/Q20), unlocked r9.
#
# The driver testdata ships no partsupp table, which kept these five shapes
# out of reach through r8 (a DATA gap, not an implementation gap — r8
# verdict "What's missing #2" asked for exactly this decision). Resolution:
# DERIVE partsupp deterministically, identically in both engines, from the
# supply relationships the fact table already witnesses —
#
#   partsupp := SELECT DISTINCT (l_partkey, l_suppkey) FROM lineitem
#             + availqty/supplycost as pure integer-arithmetic functions of
#               the key pair (exact in int64, bit-identical across engines)
#
# This keeps full referential integrity with lineitem (every Q9/Q20 join
# hits, unlike a dbgen-formula synthesis whose 4 suppliers/part would miss
# the fact table's random supplier draws), and the derivation is one
# column-pruned scan + a 2-column map-side-partial distinct — at 100 TB
# you would materialize it once with write_zordered and read it back, but
# the query shapes and plans downstream are identical either way.
# ps_supplycost is 2dp fixed-point ((k % 99901 + 100) / 100 in [1.00,
# 1000.00], the TPC-H domain), so every money aggregate below goes through
# dsum/dsum_sql exactly like the rest of the battery.
# --------------------------------------------------------------------------

_PARTSUPP_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST((l_partkey * 37 + l_suppkey * 71) % 9999 + 1 AS BIGINT)
               AS ps_availqty,
             CAST((l_partkey * 7621 + l_suppkey * 1299) % 99901 + 100
                  AS DOUBLE) / 100.0 AS ps_supplycost
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"""


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark rendering of _PARTSUPP_SQL (same derivation, same
    arithmetic; % on non-negative longs agrees across engines)."""
    li = (load_table(spark, "lineitem", sf_dir)
          .select("l_partkey", "l_suppkey").distinct())
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")
    return li.select(
        pk.alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        ((pk * 37 + sk * 71) % 9999 + 1).cast("long").alias("ps_availqty"),
        (((pk * 7621 + sk * 1299) % 99901 + 100).cast("double") / 100.0)
        .alias("ps_supplycost"))


@register(
    "sql_q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    j AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN part     ON p_partkey = ps_partkey
      WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
    FROM (SELECT *, MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS m
          FROM j)
    WHERE ps_supplycost = m
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (minimum-cost supplier): for EUROPE suppliers of "
        "small (size<=15) LARGE-class parts, keep each part's cheapest supply "
        "relationship (the spec's correlated MIN subquery, planned as a "
        "per-part window min over the filtered join — one pass, no "
        "re-join), top 100 by account balance. The (acctbal, n_name, "
        "s_name, p_partkey) sort is total, so LIMIT is deterministic; "
        "nation/region broadcast; the part filter prunes before the "
        "join. partsupp derived per module note.",
)
def sql_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = F.broadcast(load_table(spark, "nation", sf_dir))
    reg = F.broadcast(load_table(spark, "region", sf_dir)
                      .filter(F.col("r_name") == "EUROPE"))
    part = (load_table(spark, "part", sf_dir)
            .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
            .select("p_partkey", "p_brand"))
    j = (ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
         .join(nat, sup.s_nationkey == nat.n_nationkey)
         .join(reg, nat.n_regionkey == reg.r_regionkey)
         .join(part, ps.ps_partkey == part.p_partkey)
         .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                 "ps_supplycost"))
    w = Window.partitionBy("p_partkey")
    return (j.withColumn("m", F.min("ps_supplycost").over(w))
            .filter(F.col("ps_supplycost") == F.col("m"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_brand", "ps_supplycost")
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


@register(
    "sql_q9_product_type_profit",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT nation, o_year, {dsum_sql("amount", 4)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - ps_supplycost * l_quantity AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 (product-type profit): revenue minus supply cost for "
        "'bolt' parts, by supplier nation and order year. The partsupp "
        "derivation guarantees the (l_partkey, l_suppkey) join hits "
        "every lineitem row, as in genuine TPC-H; amount is 4dp "
        "fixed-point (2dp price x 2dp discount, 2dp cost x integer "
        "qty) so dsum(4) is exact. The p_name filter prunes part before "
        "the fact join; nation broadcasts; one ~25x7-group aggregate.",
)
def sql_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = (load_table(spark, "part", sf_dir)
            .filter(F.col("p_name").like("%bolt%")).select("p_partkey"))
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey",
                                                       "s_nationkey")
    ps = load_partsupp(spark, sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey",
                                                        "o_orderdate")
    nat = F.broadcast(load_table(spark, "nation", sf_dir)
                      .select("n_nationkey", "n_name"))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("ps_supplycost") * F.col("l_quantity"))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(ps, (li.l_partkey == ps.ps_partkey)
                      & (li.l_suppkey == ps.ps_suppkey))
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(nat, sup.s_nationkey == nat.n_nationkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").cast("long").alias("o_year"),
                    amount.alias("amount"))
            .groupBy("nation", "o_year")
            .agg(dsum(F.col("amount"), 4).alias("sum_profit")))


@register(
    "sql_q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    nps AS (
      SELECT ps_partkey, ps_supplycost, ps_availqty
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ),
    tot AS (SELECT {dsum_sql("ps_supplycost * ps_availqty", 2)} * 1.5
                     / COUNT(DISTINCT ps_partkey) AS thresh
            FROM nps)
    SELECT ps_partkey,
           {dsum_sql("ps_supplycost * ps_availqty", 2)} AS value
    FROM nps
    GROUP BY ps_partkey
    HAVING {dsum_sql("ps_supplycost * ps_availqty", 2)}
           > (SELECT thresh FROM tot)
    """,
    doc="TPC-H Q11 (important stock): per-part inventory value held by "
        "NATION_7 suppliers, kept where the part's value exceeds 1.5x "
        "the nation's average per-part value (scale-invariant: the "
        "spec's fixed fraction is divided by SF for the same reason — "
        "a constant share returns nothing once part count grows). "
        "Both the per-part and the global sums "
        "are exact scaled-int (dsum 2dp x integer qty), so the HAVING "
        "threshold compares identical doubles in both engines. Plans as "
        "one grouped aggregate plus one broadcast scalar — the "
        "partsupp scan happens once per side, never per group.",
)
def sql_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir)
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey",
                                                       "s_nationkey")
    nat = F.broadcast(load_table(spark, "nation", sf_dir)
                      .filter(F.col("n_name") == "NATION_7")
                      .select("n_nationkey"))
    nps = (ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
           .join(nat, sup.s_nationkey == nat.n_nationkey)
           .select("ps_partkey",
                   (F.col("ps_supplycost") * F.col("ps_availqty"))
                   .alias("v")))
    tot = nps.agg((dsum(F.col("v"), 2) * 1.5
                   / F.countDistinct("ps_partkey")).alias("thresh"))
    return (nps.groupBy("ps_partkey")
            .agg(dsum(F.col("v"), 2).alias("value"))
            .join(F.broadcast(tot))
            .filter(F.col("value") > F.col("thresh"))
            .select("ps_partkey", "value"))


@register(
    "sql_q16_supplier_part_counts",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship): distinct supplier "
        "counts per (brand, type, size) over eight sizes, excluding one "
        "brand, one type, and suppliers flagged by negative balance "
        "(the schema has no s_comment, so the 'Customer Complaints' "
        "exclusion becomes the acctbal flag). NOT IN plans as a "
        "broadcast LEFT ANTI (the flagged-supplier set is tiny and "
        "provably non-null); the count-distinct expands inside one "
        "shuffle.",
)
def sql_q16_supplier_part_counts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir)
    part = (load_table(spark, "part", sf_dir)
            .filter((F.col("p_brand") != "Brand#5")
                    & (F.col("p_type") != "MEDIUM")
                    & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    flagged = (load_table(spark, "supplier", sf_dir)
               .filter(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    return (ps.join(F.broadcast(flagged),
                    ps.ps_suppkey == flagged.s_suppkey, "left_anti")
            .join(part, ps.ps_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt")))


@register(
    "sql_q20_promotion_suppliers",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             {dsum_sql("l_quantity", 2)} AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    surplus AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN red ON p_partkey = ps_partkey
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty > 0.5 * qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN surplus ON ps_suppkey = s_suppkey
    JOIN nation  ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    """,
    doc="TPC-H Q20 (potential part promotion): NATION_3 suppliers whose "
        "available quantity of some 'red' part exceeds half of what "
        "they shipped of it in 1998. The spec's correlated scalar "
        "subquery decorrelates into one grouped aggregate over the "
        "date-pruned lineitem + an equi-join (pairs with no 1998 "
        "shipments drop, matching the spec's NULL-comparison "
        "semantics); the shipped qty is an exact 2dp sum; the red-part "
        "set broadcasts.",
)
def sql_q20_promotion_suppliers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir)
    red = F.broadcast(load_table(spark, "part", sf_dir)
                      .filter(F.col("p_name").like("red %"))
                      .select("p_partkey"))
    shipped = (load_table(spark, "lineitem", sf_dir)
               .filter((F.col("l_shipdate") >= "1998-01-01")
                       & (F.col("l_shipdate") < "1999-01-01"))
               .groupBy("l_partkey", "l_suppkey")
               .agg(dsum(F.col("l_quantity"), 2).alias("qty")))
    surplus = (ps.join(red, ps.ps_partkey == red.p_partkey)
               .join(shipped, (ps.ps_partkey == shipped.l_partkey)
                              & (ps.ps_suppkey == shipped.l_suppkey))
               .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
               .select("ps_suppkey").distinct())
    sup = load_table(spark, "supplier", sf_dir)
    nat = F.broadcast(load_table(spark, "nation", sf_dir)
                      .filter(F.col("n_name") == "NATION_3")
                      .select("n_nationkey", "n_name"))
    return (sup.join(surplus, sup.s_suppkey == surplus.ps_suppkey)
            .join(nat, sup.s_nationkey == nat.n_nationkey)
            .select("s_name", "n_name"))
