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


def test_asof_whole_row_fill_keeps_interior_nulls(spark):
    # merge_asof semantics: the LATEST right row wins as a whole — its
    # own null fields are carried, not back-filled from an older right
    # row (per-column fills would mix rows)
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 20), "e")], "k bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5), 100.0, "full"),
            (1, datetime(2024, 1, 15), None, "holey"),
        ],
        "k bigint, ts timestamp, price double, label string",
    )
    r = asof_join(left, right, "k", "ts").collect()[0]
    assert r.label_asof == "holey"
    assert r.price_asof is None  # NOT 100.0 from the older row


def test_asof_single_exchange_plan(spark):
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 10), "e")], "k bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 8), 1.0)], "k bigint, ts timestamp, v double"
    )
    plan = (
        asof_join(left, right, "k", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle on the key, total


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


def test_zip_join_multi_partition_no_global_window(spark):
    # 10k rows across 16 partitions: indices must be globally consistent
    # and the plan free of empty-partitionBy windows (r01 scale-killer)
    a = spark.range(0, 10000).select(F.col("id").alias("x")).repartition(16)
    b = spark.range(0, 10000).select((F.col("id") * 2).alias("y")).repartition(16)
    z = zip_join(a, b, ["x"], ["y"])
    plan = z._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, f"unpartitioned window in zip_join plan: {line}"
    rows = z.collect()
    assert len(rows) == 10000
    assert all(r.y == r.x * 2 for r in rows)


def test_global_row_index_dense_and_ordered(spark):
    from sparkobs.operators.joins import global_row_index

    df = spark.range(0, 5000).select((4999 - F.col("id")).alias("v")).repartition(8)
    idx = global_row_index(df, ["v"])
    rows = idx.collect()
    assert sorted(r["__idx"] for r in rows) == list(range(1, 5001))
    assert all(r["__idx"] == r["v"] + 1 for r in rows)


def test_global_running_sum_partition_invariant(spark):
    from sparkobs.operators.joins import global_running_sum

    rows = [(i, (i * 7) % 5 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    expect, acc = {}, 0
    for i, v in rows:  # rows are already in k order
        acc += v
        expect[i] = acc
    for parts in (1, 7):
        got = {
            r.k: r.c
            for r in global_running_sum(
                df.repartition(parts), ["k"], "v", out_col="c"
            ).collect()
        }
        assert got == expect


def test_key_skew_stats_planted_hot_key(spark):
    from sparkobs.operators.joins import key_skew_stats

    rows = [(7,)] * 90 + [(1,), (2,), (3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k bigint")
    r = key_skew_stats(df, "k", top_n=2).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_freq) == (95, 6, 90)
    assert abs(r.skew_ratio - round(90 / (95 / 6), 4)) < 1e-9
    assert r.top_keys.startswith("7:90,")


def test_referential_orphans_planted(spark):
    from sparkobs.operators.shape import referential_orphans

    child = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k bigint")
    parent = spark.createDataFrame([(1,), (3,)], "p bigint")
    r = referential_orphans(child, parent, "k", "p").collect()[0]
    assert (r.n_child, r.n_orphans, r.n_orphan_keys) == (4, 1, 1)
    assert r.orphan_rate == 0.25


def test_range_join_exact_and_no_nested_loop(spark):
    """Bucketed range join equals the naive theta join and plans as an
    equi hash join on the bucket id, not BroadcastNestedLoopJoin."""
    from sparkobs.operators.joins import range_join

    pts = spark.createDataFrame(
        [(i, float(i % 37)) for i in range(200)], "pid bigint, v double"
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 3 % 30), float(j * 3 % 30 + j % 7)) for j in range(40)],
        "iid bigint, lo double, hi double",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "v", "lo", "hi", bucket_width=5.0).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.join(
            ivs, (pts.v >= ivs.lo) & (pts.v <= ivs.hi)
        ).collect()
    }
    assert got == naive and got
    plan = (
        range_join(pts, ivs, "v", "lo", "hi", bucket_width=5.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cooccurrence_jaccard_hand_sets(spark):
    from sparkobs.operators.joins import cooccurrence_jaccard

    # baskets: A={1,2,3}, B={2,3,4}, C={9} -> J(A,B)=2/4=0.5, C isolated
    rows = (
        [(10, x) for x in (1, 2, 3)]
        + [(20, x) for x in (2, 3, 4)]
        + [(30, 9)]
        + [(10, 2)]  # duplicate observation must not inflate overlap
    )
    df = spark.createDataFrame(rows, "k long, b long")
    got = cooccurrence_jaccard(df, "k", "b", top_k=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["key_a"], r["key_b"], r["n_shared"], r["jaccard"]) == (
        10, 20, 2, 0.5,
    )


def test_cooccurrence_jaccard_string_keys_survive(spark):
    """r6 advice: the output used to hard-cast keys to long, silently
    NULLing string ids (documents by shared shingles) and collapsing
    distinct pairs — keys must keep their input type."""
    from sparkobs.operators.joins import cooccurrence_jaccard

    rows = (
        [("docA", s) for s in ("x", "y", "z")]
        + [("docB", s) for s in ("y", "z", "w")]
        + [("docC", s) for s in ("q",)]
    )
    df = spark.createDataFrame(rows, "k string, b string")
    got = cooccurrence_jaccard(df, "k", "b", top_k=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["key_a"], r["key_b"], r["n_shared"], r["jaccard"]) == (
        "docA", "docB", 2, 0.5,
    )


def test_global_running_max_strict_prefix(spark):
    from pyspark.sql import functions as F

    from sparkobs.operators.joins import global_running_max

    # arrival order 1..8 with values dipping after peaks; force many
    # partitions so the offset fold actually exercises cross-partition
    # combination
    rows = [(1, 5), (2, 3), (3, 9), (4, 2), (5, 9), (6, 11), (7, 1), (8, None)]
    df = spark.createDataFrame(rows, "a int, v int").repartition(6)
    got = {
        r["a"]: r["pm"]
        for r in global_running_max(df, ["a"], "v", out_col="pm").collect()
    }
    assert got == {1: None, 2: 5, 3: 5, 4: 9, 5: 9, 6: 9, 7: 11, 8: 11}


def test_event_disorder_hand_sequence(spark):
    from sparkobs.operators.state import event_disorder_stats

    # arrivals 1..5 with event times (seconds): 10, 8, 12, 12, 11 —
    # arrivals 2 and 5 are late by 2s and 1s
    rows = [
        (1, "2024-01-01 00:00:10"),
        (2, "2024-01-01 00:00:08"),
        (3, "2024-01-01 00:00:12"),
        (4, "2024-01-01 00:00:12"),
        (5, "2024-01-01 00:00:11"),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts_s string").selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    r = event_disorder_stats(df).collect()[0]
    assert (r["n_events"], r["n_late"]) == (5, 2)
    assert r["late_rate"] == 2 / 5
    assert r["max_late_us"] == 2_000_000
    assert r["mean_late_us"] == 1_500_000.0
