"""Named query registry: the driver-facing checklist of SURVEY.md §2.

Each ``@query(name, oracle=...)`` registers a Spark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent DuckDB oracle SQL. Column aliases match exactly on both
sides; floating-point aggregates are rounded in-query on both sides.

Queries without an oracle (sampling, FS listing, LSH internals,
streaming execution) get the driver's weaker rows-only check and are
covered by unit tests instead (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkobs.io import load_table

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

LINEITEM_NUMERIC = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Phase 1 — core profiling (OP-01/02/22/24-31/35/36/48/49)
# ---------------------------------------------------------------------------

def _profile_oracle_one(col: str, table: str) -> str:
    d = f"CAST({col} AS DOUBLE)"
    return f"""
    SELECT '{col}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
           min({d}) AS min_val,
           max({d}) AS max_val,
           round(avg({d}), 4) AS mean_val,
           round(stddev_samp({d}), 4) AS std_val,
           round(quantile_cont({d}, 0.25), 4) AS p25,
           round(quantile_cont({d}, 0.50), 4) AS median_val,
           round(quantile_cont({d}, 0.75), 4) AS p75
    FROM {table}"""


@query(
    "profile_lineitem_stats",
    oracle="SELECT 'lineitem' AS table_name, * FROM ("
    + " UNION ALL ".join(_profile_oracle_one(c, "lineitem") for c in LINEITEM_NUMERIC)
    + ")",
)
def profile_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship one-pass profile (OP-13/36); ref redshift_table_monitor.py:53-73."""
    from sparkobs.operators.profile import table_profile

    return table_profile(load_table(spark, sf_dir, "lineitem"), "lineitem")


@query(
    "record_count_lineitem",
    oracle="SELECT CAST(count(*) AS BIGINT) AS record_count FROM lineitem",
)
def record_count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count (OP-22); parquet footer count-star pushdown; ref redshift_table_monitor.py:61."""
    from sparkobs.operators.profile import record_count

    return record_count(load_table(spark, sf_dir, "lineitem"))


@query(
    "null_counts_orders",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),0) AS BIGINT) AS n_nulls FROM orders"
        for c in [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ]
    ),
)
def null_counts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts (OP-29); ref redshift_table_monitor.py:63-66."""
    from sparkobs.operators.profile import null_counts

    return null_counts(load_table(spark, sf_dir, "orders"))


@query(
    "distinct_counts_lineitem",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM lineitem"
        for c in [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ]
    ),
)
def distinct_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column distinct counts (OP-30); HLL variant is the 100 TB mode."""
    from sparkobs.operators.profile import distinct_counts

    return distinct_counts(
        load_table(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus", "l_shipdate"],
    )


@query(
    "duplicate_count_lineitem",
    oracle="""
    SELECT CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) AS dup_rows,
           CAST(count(*) AS BIGINT) AS distinct_rows
    FROM (SELECT count(*) AS cnt FROM lineitem
          GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate)
    """,
)
def duplicate_count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-row count (OP-31); ref redshift_table_monitor.py:62."""
    from sparkobs.operators.profile import duplicate_count

    return duplicate_count(load_table(spark, sf_dir, "lineitem"))


@query(
    "histogram_quantity",
    oracle="""
    SELECT bin, CAST(bin * 5.0 AS DOUBLE) AS bin_lo, CAST((bin + 1) * 5.0 AS DOUBLE) AS bin_hi,
           CAST(count(*) AS BIGINT) AS bin_count
    FROM (SELECT CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT) AS bin
          FROM lineitem WHERE l_quantity IS NOT NULL)
    GROUP BY bin
    """,
)
def histogram_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (OP-33); deterministic data-independent edges."""
    from sparkobs.operators.profile import numeric_histogram

    return numeric_histogram(load_table(spark, sf_dir, "lineitem"), "l_quantity", 5.0)


@query(
    "histogram_returnflag",
    oracle="SELECT l_returnflag AS value, CAST(count(*) AS BIGINT) AS value_count FROM lineitem GROUP BY 1",
)
def histogram_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical histogram (OP-33)."""
    from sparkobs.operators.profile import categorical_histogram

    return categorical_histogram(load_table(spark, sf_dir, "lineitem"), "l_returnflag")


@query(
    "limited_scan_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
)
def limited_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic limited scan (OP-02 + §2.6 top-k): TakeOrderedAndProject,
    no full sort; ref redshift_table_monitor.py:21-24."""
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query("sample_scan")
def sample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic sample scan (OP-03); seed-dependent → rows-only check;
    ref snowflake_table_monitor.py:50-54 (SAMPLE BLOCK)."""
    return load_table(spark, sf_dir, "lineitem").sample(fraction=0.01, seed=42)


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the engine's headline grouped-agg
    (OP-16/24/26/35/48) — filter pushed to parquet scan, single partial+final
    hash aggregation, whole-stage codegen."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Phase 2 — grouped/shape metrics (OP-05/06/15/16/18/19/23/32/34/36/37)
# ---------------------------------------------------------------------------


@query(
    "group_agg_orders",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS order_count,
           round(sum(o_totalprice), 2) AS sum_totalprice,
           round(avg(o_totalprice), 4) AS avg_totalprice
    FROM orders GROUP BY o_orderstatus
    """,
)
def group_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation (OP-16/24/26); ref snowflake_database_monitor.py:62-65."""
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_totalprice"),
        )
    )


@query(
    "revenue_per_nation",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS order_count,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi join + agg (OP-19). Scale plan: orders⋈customer
    shuffles on the key; customer⋈nation is broadcast (25-row dim) —
    explicitly hinted so 100 TB of orders never shuffles for the dim."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "lookup_join_fill_nation",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           CAST(coalesce(c.customer_count, 0) AS BIGINT) AS customer_count
    FROM nation n
    LEFT JOIN (SELECT c_nationkey, count(*) AS customer_count
               FROM customer GROUP BY c_nationkey) c
      ON n.n_nationkey = c.c_nationkey
    """,
)
def lookup_join_fill_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast lookup join with missing→0 fill (OP-18);
    ref redshift_database_monitor.py:89-91 (dict map + fillna)."""
    from pyspark.sql import functions as F

    from sparkobs.operators.shape import lookup_join_fill

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    counts = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("n_nationkey"))
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )
    return lookup_join_fill(n, counts, on="n_nationkey", value_col="customer_count")


@query(
    "grouped_distinct_parts",
    oracle="""
    SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_l_partkey
    FROM lineitem GROUP BY l_suppkey
    """,
)
def grouped_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distinct count (OP-32); ref redshift_database_monitor.py:87-88."""
    from sparkobs.operators.shape import grouped_distinct

    return grouped_distinct(load_table(spark, sf_dir, "lineitem"), "l_suppkey", "l_partkey")


@query(
    "argmax_order",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 1
    """,
)
def argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global argmax (OP-34): single hash-agg max_by, no sort;
    ref s3_bucket_monitor.py:79-81 running max loop."""
    from sparkobs.operators.shape import argmax

    return argmax(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        label_col="o_orderkey",
        measure_col="o_totalprice",
    )


@query(
    "argmax_order_per_status",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def argmax_order_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax (OP-34 grouped): max_by beats a window sort —
    one shuffle on the group key, no per-partition ordering."""
    from sparkobs.operators.shape import argmax_per_group

    return argmax_per_group(
        load_table(spark, sf_dir, "orders"),
        group_col="o_orderstatus",
        label_col="o_orderkey",
        measure_col="o_totalprice",
    )


@query(
    "shape_summary_all",
    oracle="""
    WITH shapes AS (
        SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS row_count,
               (SELECT CAST(count(*) AS BIGINT) FROM pragma_table_info('region')) AS col_count FROM region UNION ALL
        SELECT 'nation', count(*), (SELECT count(*) FROM pragma_table_info('nation')) FROM nation UNION ALL
        SELECT 'customer', count(*), (SELECT count(*) FROM pragma_table_info('customer')) FROM customer UNION ALL
        SELECT 'supplier', count(*), (SELECT count(*) FROM pragma_table_info('supplier')) FROM supplier UNION ALL
        SELECT 'part', count(*), (SELECT count(*) FROM pragma_table_info('part')) FROM part UNION ALL
        SELECT 'orders', count(*), (SELECT count(*) FROM pragma_table_info('orders')) FROM orders UNION ALL
        SELECT 'lineitem', count(*), (SELECT count(*) FROM pragma_table_info('lineitem')) FROM lineitem UNION ALL
        SELECT 'events', count(*), (SELECT count(*) FROM pragma_table_info('events')) FROM events UNION ALL
        SELECT 'documents', count(*), (SELECT count(*) FROM pragma_table_info('documents')) FROM documents UNION ALL
        SELECT 'embeddings', count(*), (SELECT count(*) FROM pragma_table_info('embeddings')) FROM embeddings)
    SELECT CAST(count(*) AS BIGINT) AS table_count,
           CAST(sum(row_count) AS BIGINT) AS total_rows,
           CAST(max(row_count) AS BIGINT) AS max_rows,
           round(avg(row_count), 4) AS mean_rows,
           round(quantile_cont(CAST(row_count AS DOUBLE), 0.5), 4) AS median_rows,
           CAST(max(col_count) AS BIGINT) AS max_cols,
           CAST(min(col_count) AS BIGINT) AS min_cols
    FROM shapes
    """,
)
def shape_summary_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema shape summary (OP-06/23/25/26/27/37) over all tables;
    ref redshift_database_monitor.py:71-103 (including the intended-min
    fix for the reference's min/max copy-paste bug, SURVEY.md §8.2)."""
    from sparkobs.io import load_tables
    from sparkobs.operators.shape import shape_summary, table_shapes

    return shape_summary(table_shapes(load_tables(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Phase 3 — metric fan-out/fan-in (OP-12/14/20/21/37)
# ---------------------------------------------------------------------------

_SUPPLIER_METRICS_CTE = """
    WITH per AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS entity,
             CAST(sum(l_quantity) AS DOUBLE) AS total_qty,
             CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS total_revenue
      FROM lineitem GROUP BY 1),
    long AS (
      SELECT entity, 'total_qty' AS metric, total_qty AS value FROM per
      UNION ALL
      SELECT entity, 'total_revenue' AS metric, total_revenue AS value FROM per)
"""


def _supplier_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from sparkobs.operators.metrics import to_metrics_long

    per = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            ),
        )
    )
    return to_metrics_long(per, "l_suppkey", ["total_qty", "total_revenue"])


@query(
    "metrics_fanin_supplier",
    oracle=_SUPPLIER_METRICS_CTE
    + """
    SELECT metric, CAST(count(*) AS BIGINT) AS n_entities,
           round(min(value), 4) AS min_value, round(max(value), 4) AS max_value,
           round(avg(value), 4) AS mean_value, round(sum(value), 4) AS sum_value
    FROM long GROUP BY metric
    """,
)
def metrics_fanin_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out per-entity metrics → fan-in summary (OP-21/37);
    ref s3_key_monitor.py:141-220 XCom dict merge."""
    from sparkobs.operators.metrics import fanin_stats

    return fanin_stats(_supplier_metrics_long(spark, sf_dir))


@query(
    "argmax_entity_supplier",
    oracle=_SUPPLIER_METRICS_CTE
    + """
    SELECT metric, max_entity, max_value FROM (
      SELECT metric, entity AS max_entity, round(value, 4) AS max_value,
             row_number() OVER (PARTITION BY metric ORDER BY value DESC, entity DESC) AS rn
      FROM long) WHERE rn = 1
    """,
)
def argmax_entity_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric argmax entity (OP-34 over the metric stream);
    ref s3_key_monitor.py:179-184,209-220."""
    from sparkobs.operators.metrics import argmax_entity

    return argmax_entity(_supplier_metrics_long(spark, sf_dir))
