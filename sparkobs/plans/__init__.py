"""Physical-plan auditing utilities.

The engine has no custom planner (SURVEY.md §4: Catalyst subsumes every
manual optimization the reference hard-codes); what it has instead is
*plan discipline* — helpers to assert that the plans Catalyst produces
are the plans we want at 100 TB: filters pushed to the scan, columns
pruned, dimensions broadcast, aggregates partial+final. Used by
tests/test_plans.py and available for interactive tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scans(df: DataFrame) -> list[dict]:
    """Parse parquet scan nodes: pushed filters + read schema."""
    import re

    plan = physical_plan(df)
    out: list[dict] = []
    cur: dict | None = None
    for line in plan.splitlines():
        s = line.strip()
        # only detail-section nodes ("(1) Scan parquet …") carry
        # PushedFilters/ReadSchema; tree-summary lines don't
        if re.match(r"^\(\d+\) Scan parquet", s):
            cur = {"pushed": "", "schema": ""}
            out.append(cur)
        elif cur is not None and s.startswith("PushedFilters:"):
            cur["pushed"] = s.split(":", 1)[1].strip()
        elif cur is not None and s.startswith("ReadSchema:"):
            cur["schema"] = s.split(":", 1)[1].strip()
    return out


def assert_pushdown(df: DataFrame, fragment: str) -> None:
    """Assert some scan pushes a filter mentioning ``fragment``."""
    got = [s["pushed"] for s in scans(df)]
    assert any(fragment in p for p in got), f"no pushed filter contains {fragment!r}: {got}"


def assert_pruned(df: DataFrame, max_cols: int, scan_idx: int = 0) -> None:
    """Assert the scan reads at most ``max_cols`` columns (column pruning
    reached the source)."""
    schema = scans(df)[scan_idx]["schema"]
    ncols = schema.count(":") if schema else 0
    assert 0 < ncols <= max_cols, f"scan reads {ncols} cols (> {max_cols}): {schema}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, "expected a broadcast hash join"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, "unexpected cartesian product"


def assert_partial_final_agg(df: DataFrame) -> None:
    """Partial+final hash aggregation (map-side combine before shuffle)."""
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, "expected partial+final HashAggregate"


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes, counted from the formatted
    plan's detail section so tree-summary lines don't double-count."""
    import re

    return len(
        re.findall(r"^\(\d+\) Exchange", physical_plan(df), flags=re.MULTILINE)
    )
