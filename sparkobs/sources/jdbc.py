"""External JDBC source tier (OP-01/OP-11 over real warehouses).

Rebuild of the reference's warehouse pulls — its primary data source:
``redshift_table_monitor.py:22-24`` (``SELECT * FROM {table}``, psycopg2
hook at ``:51``), ``snowflake_table_monitor.py:50-54`` (snowflake
connector cursor), and the generic SQLAlchemy engine at
``databand_tracking_template.py:9-19``. The reference fetches the whole
table through a driver-side DB cursor into pandas; here the table is a
LAZY Spark JDBC scan, so:

- **predicate pushdown** — downstream ``.filter`` compiles into the
  generated ``WHERE`` clause (``PushedFilters`` in the scan plan);
- **column pruning** — only referenced columns reach the remote
  ``SELECT`` list;
- **limit pushdown** — ``pushDownLimit`` forwards ``LIMIT k``;
- **partitioned parallel reads** — ``partition_column`` + bounds +
  ``num_partitions`` issue one stride query per executor-side
  partition, or an explicit ``predicates`` list issues one query each.

At 100 TB the warehouse's egress is the bottleneck; partitioned reads
are the only way to fan the pull across a 1000-executor cluster, and
pushdown keeps the transferred bytes proportional to the query, not the
table. Everything here is plain ``spark.read.format("jdbc")`` options —
no driver-side cursor ever materializes rows.

Tested against Apache Derby embedded (the JDBC driver that ships inside
Spark's own jars), so the roundtrip is a REAL external-DB pull, not a
mock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Derby embedded driver (lives in Spark's bundled derbytools.jar) —
#: lets tests and local runs exercise a genuine JDBC roundtrip with no
#: external service.
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = False) -> str:
    """JDBC URL for an embedded Derby database directory."""
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    *,
    query: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    fetchsize: int = 10_000,
    push_down_limit: bool = True,
    session_init: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Lazy external-table scan over JDBC (OP-01's source contract for
    warehouses; ref redshift_table_monitor.py:22-24).

    Exactly one of ``table`` / ``query`` must be given. Three read
    shapes, least to most parallel:

    1. single stream (default) — one remote cursor, streamed at
       ``fetchsize`` rows per round trip;
    2. stride-partitioned — ``partition_column`` (numeric/date/
       timestamp) + ``lower_bound``/``upper_bound``/``num_partitions``:
       Spark generates one ``WHERE col >= lo AND col < hi`` query per
       partition, all executors pull concurrently;
    3. explicit ``predicates`` — one arbitrary WHERE clause per
       partition (the escape hatch for string/skewed keys).

    Filters and projections applied to the returned DataFrame push into
    the remote SQL (PushedFilters / pruned SELECT list) — verified by
    plan tests in tests/test_jdbc.py.

    Identifier case: ``predicates`` and ``query`` strings are sent to
    the remote engine VERBATIM — quote identifiers to match how the
    table was created (Spark's JDBC writer creates quoted, case-exact
    column names, so against a Spark-written Derby/Postgres table write
    ``'"n_nationkey" < 12'``, not ``'n_nationkey < 12'``).
    ``partition_column`` is quoted by Spark's dialect automatically.
    """
    if (table is None) == (query is None):
        raise ValueError("read_jdbc: pass exactly one of table= or query=")
    if predicates is not None:
        if table is None:
            raise ValueError("read_jdbc: predicates= requires table=")
        props = {"fetchsize": str(fetchsize)}
        if driver:
            props["driver"] = driver
        for k, v in (options or {}).items():
            props[k] = str(v)
        return spark.read.jdbc(url, table, predicates=list(predicates), properties=props)

    r = spark.read.format("jdbc").option("url", url).option("fetchsize", fetchsize)
    if table is not None:
        r = r.option("dbtable", table)
    else:
        r = r.option("query", query)
    if driver:
        r = r.option("driver", driver)
    if push_down_limit:
        r = r.option("pushDownLimit", "true")
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound, upper_bound "
                "and num_partitions"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if session_init:
        r = r.option("sessionInitStatement", session_init)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    *,
    driver: str | None = None,
    column_types: str | None = None,
    batchsize: int = 10_000,
    options: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to an external JDBC table (the staging half of
    the roundtrip; executors write concurrently at ``batchsize`` rows
    per statement).

    ``column_types`` maps to ``createTableColumnTypes`` — needed for
    Derby, whose dialect maps StringType to CLOB (not comparable in
    WHERE clauses); pass e.g. ``"n_name VARCHAR(128)"`` to keep string
    keys filterable remotely.
    """
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode(mode)
    )
    if driver:
        w = w.option("driver", driver)
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save()


def jdbc_table_monitor(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    query: str | None = None,
    exact: bool = True,
    **read_kw,
) -> DataFrame:
    """Table monitor over a REAL external JDBC source — the reference's
    core composition (redshift_table_monitor.py:39-80: pull table, then
    profile every column + duplicate count) as one lazy plan whose scan
    is the remote warehouse, not a cursor fetch.

    ``table`` names the metric entity; pass ``query=`` to profile a
    projection/subquery instead of the whole table (the remote engine
    then only ships the projected columns).

    The pulled projection is pinned (recoverable ``DISK_ONLY``
    persist) before the monitor runs: the exact monitor is three
    aggregation passes (stats, distinct, duplicate count), and
    without the pin each pass re-issues the remote query — three
    full warehouse pulls for one profile (r14; guide §2.3 "shuffle
    fewer bytes" applied to egress). One pull + three local cached
    reads is strictly less remote I/O at any scale — the module
    docstring's own bottleneck argument — and lost partitions still
    recompute from the source because the persist keeps lineage."""
    from sparkobs.io import pin_corpus_frame
    from sparkobs.monitors import table_monitor

    if query is not None:
        src = read_jdbc(spark, url, query=query, **read_kw)
    else:
        src = read_jdbc(spark, url, table=table, **read_kw)
    return table_monitor(pin_corpus_frame(src), table, exact=exact)
