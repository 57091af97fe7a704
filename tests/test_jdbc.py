"""External JDBC source tier: real Derby-embedded roundtrip, partitioned
reads, predicate/column pushdown (plan-level), monitor composition.

Derby's embedded driver ships inside Spark's own jars, so these tests
exercise a genuine external-DB pull — remote table creation, stride
queries, WHERE-clause pushdown — with no mock and no network service.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from sparkobs.sources.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    derby_url,
    jdbc_table_monitor,
    read_jdbc,
    write_jdbc,
)


@pytest.fixture(scope="module")
def derby(spark, sf_dir, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "testdb")
    shutil.rmtree(db, ignore_errors=True)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    strcols = [c for c, t in nation.dtypes if t == "string"]
    write_jdbc(
        nation,
        derby_url(db, create=True),
        "nation",
        driver=DERBY_EMBEDDED_DRIVER,
        column_types=", ".join(f"{c} VARCHAR(1024)" for c in strcols) or None,
    )
    return db


def test_roundtrip_losless(spark, sf_dir, derby):
    src = {
        r.n_nationkey: (r.n_name, r.n_regionkey)
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    back = read_jdbc(
        spark, derby_url(derby), table="nation", driver=DERBY_EMBEDDED_DRIVER
    )
    got = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in back.collect()}
    assert got == src


def test_partitioned_read_parallel(spark, derby):
    back = read_jdbc(
        spark,
        derby_url(derby),
        table="nation",
        driver=DERBY_EMBEDDED_DRIVER,
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 25
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "numPartitions=4" in plan


def test_filter_and_projection_push_down(spark, derby):
    back = read_jdbc(
        spark, derby_url(derby), table="nation", driver=DERBY_EMBEDDED_DRIVER
    )
    q = back.where(F.col("n_regionkey") == 1).select("n_name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(n_regionkey,1)" in plan, plan
    assert "ReadSchema: struct<n_name:string>" in plan, plan
    names = sorted(r.n_name for r in q.collect())
    assert len(names) == 5 and all(n for n in names)


def test_explicit_predicates_partitions(spark, derby):
    # predicates/query strings go to the remote engine verbatim →
    # identifiers must be quoted to match Spark's quoted-create
    back = read_jdbc(
        spark,
        derby_url(derby),
        table="nation",
        driver=DERBY_EMBEDDED_DRIVER,
        predicates=['"n_nationkey" < 12', '"n_nationkey" >= 12'],
    )
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == 25


def test_query_source_and_limit(spark, derby):
    q = read_jdbc(
        spark,
        derby_url(derby),
        query='SELECT "n_nationkey", "n_name" FROM nation',
        driver=DERBY_EMBEDDED_DRIVER,
    )
    assert q.columns == ["n_nationkey", "n_name"]
    assert len(q.limit(5).collect()) == 5


def test_arg_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:derby:x")
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:derby:x", table="t", query="SELECT 1")
    with pytest.raises(ValueError, match="requires lower_bound"):
        read_jdbc(spark, "jdbc:derby:x", table="t", partition_column="c")


def test_jdbc_table_monitor_metrics(spark, derby):
    m = jdbc_table_monitor(
        spark,
        derby_url(derby),
        "nation",
        query='SELECT "n_nationkey", "n_regionkey" FROM nation',
        driver=DERBY_EMBEDDED_DRIVER,
    )
    rows = m.collect()
    # 2 columns × 8 profile metrics + 1 duplicate_rows row
    assert len(rows) == 17
    by_key = {(r.entity, r.metric): r.value for r in rows}
    assert by_key[("nation.n_nationkey", "n_rows")] == 25.0
    assert by_key[("nation.n_nationkey", "n_distinct")] == 25.0
    assert by_key[("nation", "duplicate_rows")] == 0.0
