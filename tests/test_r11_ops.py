"""Round-11 regression + operator tests.

Covers the r10 ADVICE items (negative-weight pagerank loud failure,
duplicate-seed BFS tier agreement, format-stage convention versioning)
and the round's new operator work.
"""

from __future__ import annotations

import pytest


def test_pagerank_negative_weight_fails_loudly(spark):
    """Review finding (r10): the dense tier's numpy floor division and
    the distributed tier's SQL truncate-toward-zero div DIVERGE on
    negative operands — the non-negativity contract was documented but
    unvalidated. Negative weights must now raise at materialization in
    BOTH tiers, never silently tier-diverge."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from sparkobs.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 1, -1), (2, 3, 2)], "src long, dst long, w long"
    )
    for kw in ({}, {"dense_max_edges": 0}):
        with pytest.raises((PySparkException, Py4JJavaError)) as exc:
            pagerank_fixed(edges, iters=2, weight_col="w", **kw).collect()
        assert "negative weight" in str(exc.value)


def test_pagerank_null_weight_still_passes_validation(spark):
    """NULL weights are IN contract (SQL NULL propagation, tier parity
    property-tested in r10) — the new negative-weight guard must not
    reject them (NULL < 0 is NULL, not true)."""
    from sparkobs.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 1, None), (2, 3, 2)], "src long, dst long, w long"
    )
    out = pagerank_fixed(edges, iters=2, weight_col="w").collect()
    assert {r["node"] for r in out} == {1, 2}


def test_reachable_set_tiers_agree_on_duplicate_seeds(spark):
    """Review finding (r10): the dense tier deduped seeds while the
    distributed tier emitted duplicate hop-0 rows, so contract-
    violating duplicate-seed input silently changed output across the
    dispatch boundary. Both tiers now dedupe."""
    from sparkobs.operators.graph import reachable_set

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (1,), (2,)], "node long")
    dense = reachable_set(edges, seeds, max_hops=2).collect()
    dist = reachable_set(edges, seeds, max_hops=2, dense_max_edges=0).collect()
    assert sorted(map(tuple, dense)) == sorted(map(tuple, dist))
    # hop-0 rows are exactly the DISTINCT seeds
    assert sorted(r["node"] for r in dense if r["hop"] == 0) == [1, 2]


def test_stage_format_tag_versions_the_resolved_conventions():
    """Review finding (r10): read_csv/write_format default changes
    (lossless NULL/empty/trimming) were invisible to _stage_format's
    cache tag, so a stage cached under the OLD conventions would be
    read back under the new reader defaults — nulls written as ''
    reading back as empty string. The resolved-convention version now
    participates in the stage key."""
    from sparkobs import queries as Q

    assert Q._FMT_CONVENTION_V >= 2
    tag_now = f"csv:2:v{Q._FMT_CONVENTION_V}:[]"
    key_now = Q._stage_key("/x", "orders", tag_now)
    key_v1 = Q._stage_key("/x", "orders", "csv:2:v1:[]")
    key_untagged = Q._stage_key("/x", "orders", "csv:2:[]")
    assert len({key_now, key_v1, key_untagged}) == 3
