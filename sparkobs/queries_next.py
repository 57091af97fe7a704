"""Round-7 registry queue — implemented, unit-tested, oracle-ready.

Same staging discipline as the round-6 queue (promoted in full):
these queries are NOT in ``sparkobs.queries.SPARK_QUERIES`` yet
because the driver certifies only the first ``GATE_SIZE`` (50)
registry entries per round and the round-6 gate is exactly full —
registering them now would create certification debt that
``tests/test_gate_hygiene.py`` rejects. They are held here with their
DuckDB oracles and exercised by ``tests/test_r7_queue.py`` with the
checker's own comparison; promoting one = move its entry into
``queries.py`` with the ``@query`` decorator and a ``_PRIORITY``
slot.

This wave: the remaining expressible TPC-H shapes (Q2/Q9/Q11/Q12/
Q16/Q19/Q20 adapted to the trimmed star schema — no partsupp table,
so lineitem's (partkey, suppkey) pairs stand in for it, exactly the
substitution a warehouse without an inventory table would make) plus
a statistics/ops wave: Spearman rank correlation, Cramér's V,
Benford's-law screening, per-key trend slopes, lag-1 autocorrelation,
CUSUM changepoint scores, RFM customer scoring, gaps-and-islands
streaks, association rules, SCD Type-2 history, and a two-proportion
A/B z-test on a deterministic hash split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkobs.io import load_table

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco


@_queue(
    "product_profit_q9",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           round(sum(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%a%'
    GROUP BY 1, 2
    """,
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier
    nation per order year over a 5-table join; the schema has no
    partsupp, so retail price × quantity stands in for supply cost.
    part (filtered) and nation broadcast; the orders leg is the only
    fact-fact shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@_queue(
    "shipmode_delay_q12",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS ontime_lines,
           round(avg(CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE)), 4)
             AS mean_delay_days
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def shipmode_delay_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-delay priority screen): conditional
    late/on-time counts per order priority from the order→ship lag
    (the schema has no ship mode or commit/receipt dates; the
    orderdate→shipdate lag is the available delay signal). Integer
    day-diffs make the mean exact-summable, so round(avg) is stable
    (integer sum / integer count)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum((delay > 90).cast("long")).alias("late_lines"),
            F.sum((delay <= 90).cast("long")).alias("ontime_lines"),
            F.round(F.avg(delay.cast("double")), 4).alias("mean_delay_days"),
        )
    )


@_queue(
    "disjunctive_revenue_q19",
    oracle="""
    SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0), 2)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): three OR'd
    brand/size/quantity envelopes across the part join — the classic
    test that OR predicates still prune (part-side conjuncts are
    pushable per-branch; the cross-side residual evaluates post-join
    without row explosion)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, z = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & z.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#3") & z.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#5") & z.between(20, 50) & q.between(20, 50))
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_queue(
    "min_price_supplier_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             round(sum(l_extendedprice), 4) / sum(l_quantity) AS unit_price
      FROM lineitem GROUP BY 1, 2),
    mn AS (SELECT pk, min(unit_price) AS min_price FROM ps GROUP BY 1)
    SELECT ps.pk AS p_partkey, s_name, unit_price,
           CAST(n_suppliers AS BIGINT) AS n_suppliers
    FROM ps
    JOIN mn ON mn.pk = ps.pk AND ps.unit_price = mn.min_price
    JOIN (SELECT pk, count(*) AS n_suppliers FROM ps GROUP BY 1) c
      ON c.pk = ps.pk
    JOIN supplier ON s_suppkey = ps.sk
    WHERE n_suppliers >= 3
    """,
)
def min_price_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each part sold by
    ≥3 suppliers, the supplier(s) offering the lowest average unit
    price — the correlated-min subquery decorrelated into one
    (part, supplier) aggregate reused for BOTH the min and the
    membership legs (lineitem's pairs stand in for partsupp). The
    unit price is the WEIGHTED form round(sum(price),4)/sum(qty) left
    UNROUNDED: the rounded money sum is boundary-stable, the quantity
    sum is an exact integer, and the single IEEE division of identical
    doubles is bit-identical across engines — while round(avg(p/q),4)
    lands exactly on .00005 boundaries for small groups and flips with
    summation order."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ps = l.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        (
            F.round(F.sum("l_extendedprice"), 4) / F.sum("l_quantity")
        ).alias("unit_price")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("pk")
    ranked = ps.select(
        "pk",
        "sk",
        "unit_price",
        F.min("unit_price").over(w).alias("min_price"),
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
    )
    return (
        ranked.where(
            (F.col("n_suppliers") >= 3)
            & (F.col("unit_price") == F.col("min_price"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("sk"))
        .select(
            F.col("pk").alias("p_partkey"),
            "s_name",
            "unit_price",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
        )
    )


@_queue(
    "important_parts_q11",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS pk,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
      FROM lineitem GROUP BY 1),
    tot AS (SELECT sum(part_value) AS tv FROM pv)
    SELECT pk AS p_partkey, part_value,
           round(part_value / tv, 6) AS value_share
    FROM pv CROSS JOIN tot
    WHERE part_value > tv * 0.0005
    """,
)
def important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose traded value
    exceeds a fraction of the GLOBAL total — group agg + 1-row
    broadcast scalar threshold, no rescan of lineitem for the total
    (the per-part aggregate is reused). The share divides identical
    rounded doubles, so round(·, 6) is stable."""
    l = load_table(spark, sf_dir, "lineitem")
    pv = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("part_value")
    )
    tot = pv.agg(F.sum("part_value").alias("tv"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(F.col("part_value") > F.col("tv") * 0.0005)
        .select(
            F.col("pk").alias("p_partkey"),
            "part_value",
            F.round(F.col("part_value") / F.col("tv"), 6).alias("value_share"),
        )
    )


@_queue(
    "supplier_variety_q16",
    oracle="""
    SELECT p_brand, p_type,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
)
def supplier_variety_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier variety): distinct suppliers per
    (brand, type) excluding one brand and an anti-joined supplier
    denylist (negative balance stands in for the complaints filter —
    the schema has no comments). NOT IN compiles to a broadcast anti
    join; the distinct count is the one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#4")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@_queue(
    "dominant_suppliers_q20",
    oracle="""
    WITH vol AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS sq
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT pk, sum(sq) AS tq FROM vol GROUP BY 1)
    SELECT DISTINCT s_suppkey, s_name
    FROM vol JOIN tot USING (pk)
    JOIN supplier ON s_suppkey = sk
    WHERE sq > 0.5 * tq AND tq > 100
    ORDER BY s_suppkey
    """,
)
def dominant_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess share): suppliers who
    moved more than half of some part's total volume (parts above a
    volume floor) — the nested-aggregate semi-join chain, decorrelated
    into one (part, supplier) agg + a per-part total, DISTINCT
    projected at the end. Quantities are integer-valued doubles, so
    the 0.5·total comparison is exact on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    vol = l.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum("l_quantity").alias("sq"))
    tot = vol.groupBy("pk").agg(F.sum("sq").alias("tq"))
    return (
        vol.join(tot, "pk")
        .where((F.col("sq") > 0.5 * F.col("tq")) & (F.col("tq") > 100))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("sk"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )
