"""As-of join semantics, zip join, salted aggregation equivalence."""

from datetime import datetime

from pyspark.sql import functions as F

from sparkobs.operators.joins import asof_join, salted_group_count, zip_join


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 10), "e1"),
            (1, datetime(2024, 1, 20), "e2"),
            (2, datetime(2024, 1, 10), "e3"),
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5), 100.0),
            (1, datetime(2024, 1, 15), 200.0),
            (2, datetime(2024, 2, 1), 300.0),  # after every left ts for k=2
        ],
        "k bigint, ts timestamp, price double",
    )
    out = {r.tag: r.price_asof for r in asof_join(left, right, "k", "ts").collect()}
    assert out["e1"] == 100.0  # latest right ≤ Jan 10
    assert out["e2"] == 200.0
    assert out["e3"] is None  # no right row before → NULL (left join)


def test_asof_exact_tie_matches(spark):
    left = spark.createDataFrame([(1, datetime(2024, 1, 10), "e")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame([(1, datetime(2024, 1, 10), 7.0)], "k bigint, ts timestamp, v double")
    r = asof_join(left, right, "k", "ts").collect()[0]
    assert r.v_asof == 7.0  # right at exactly left.ts matches


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, datetime(2024, 1, 10), "e")], "k bigint, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 8), 1.0), (1, datetime(2024, 1, 12), 2.0)],
        "k bigint, ts timestamp, v double",
    )
    r = asof_join(left, right, "k", "ts", direction="forward").collect()[0]
    assert r.v_asof == 2.0  # earliest right ≥ left.ts


def test_zip_join_pairs_by_rank(spark):
    l = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "id int, lv string")
    r = spark.createDataFrame([(30, "z"), (10, "x"), (20, "y")], "id2 int, rv string")
    out = {row.lv: row.rv for row in zip_join(l, r, ["id"], ["id2"]).collect()}
    assert out == {"a": "x", "b": "y", "c": "z"}


def test_salted_count_equals_plain(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {r.l_suppkey: r["cnt"] for r in df.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.l_suppkey: r.cnt for r in salted_group_count(df, "l_suppkey", 8).collect()}
    assert plain == salted
