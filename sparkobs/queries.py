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
