"""Declarative data-quality check suites — the dbt-tests /
Great-Expectations shape on top of the profiling operators: a table's
CONTRACT (nullability, uniqueness, accepted values, ranges, row-count
bounds) declared as data, evaluated in as few passes as the check mix
allows, reported long-form so every table's results union into one
quality stream (the same sink discipline as the metric operators).

Check grammar (type, column, params):

- ``("not_null", col)`` — no NULLs in col
- ``("unique", col)`` — col values are distinct (NULLs ignored)
- ``("accepted_values", col, (v1, v2, ...))`` — col ⊆ the value set
- ``("range", col, lo, hi)`` — lo <= col <= hi (NULLs don't violate;
  pair with not_null to forbid them)
- ``("row_count_between", lo, hi)`` — table size bounds

Scale shape: every check except ``unique`` is a conditional SUM in
ONE shared aggregation pass over the table; ``unique`` checks need a
per-column distinct (grouped by the checked column, counted over the
groups) and run as one extra aggregate per unique-checked column.
Violation COUNTS (not just pass/fail booleans) come back so a failing
contract quantifies its own blast radius.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def run_checks(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """Evaluate a check suite; returns (check_idx, check_type,
    column, violations, passed) — one row per declared check, in
    declaration order via check_idx."""
    if not checks:
        raise ValueError("check suite must not be empty")
    agg_exprs = []
    unique_cols = []
    specs = []
    for idx, chk in enumerate(checks):
        typ = chk[0]
        if typ == "not_null":
            col = chk[1]
            agg_exprs.append(
                F.sum(F.col(col).isNull().cast("long")).alias(f"__v{idx}")
            )
            specs.append((idx, typ, col, "agg"))
        elif typ == "accepted_values":
            col, vals = chk[1], chk[2]
            agg_exprs.append(
                F.sum(
                    (~F.col(col).isin(list(vals)) & F.col(col).isNotNull()).cast("long")
                ).alias(f"__v{idx}")
            )
            specs.append((idx, typ, col, "agg"))
        elif typ == "range":
            col, lo, hi = chk[1], chk[2], chk[3]
            agg_exprs.append(
                F.sum(
                    ((F.col(col) < lo) | (F.col(col) > hi)).cast("long")
                ).alias(f"__v{idx}")
            )
            specs.append((idx, typ, col, "agg"))
        elif typ == "row_count_between":
            lo, hi = chk[1], chk[2]
            agg_exprs.append(F.count(F.lit(1)).alias(f"__n{idx}"))
            specs.append((idx, typ, None, ("count", lo, hi)))
        elif typ == "unique":
            col = chk[1]
            unique_cols.append((idx, col))
            specs.append((idx, typ, col, "unique"))
        else:
            raise ValueError(f"unknown check type {typ!r}")

    wide = df.agg(*agg_exprs) if agg_exprs else None
    uniq = {}
    for idx, col in unique_cols:
        # duplicate-VALUE count: rows beyond the first per value
        uniq[idx] = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias(f"__v{idx}")
            )
        )
    for u in uniq.values():
        wide = u if wide is None else wide.crossJoin(u)

    rows = []
    for idx, typ, col, mode in specs:
        if mode == "agg" or mode == "unique":
            viol = F.coalesce(F.col(f"__v{idx}"), F.lit(0))
        else:
            _, lo, hi = mode
            n = F.col(f"__n{idx}")
            viol = F.when((n >= lo) & (n <= hi), F.lit(0)).otherwise(
                F.abs(n - F.when(n < lo, F.lit(lo)).otherwise(F.lit(hi)))
            )
        rows.append(
            F.struct(
                F.lit(idx).alias("check_idx"),
                F.lit(typ).alias("check_type"),
                F.lit(col if col is not None else "").alias("column"),
                viol.cast("long").alias("violations"),
                (viol == 0).alias("passed"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def retention_purge(
    df: DataFrame,
    key_col: str,
    tombstones: DataFrame | None = None,
    ts_col: str | None = None,
    cutoff: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Governance purge — the deletion half of the compliance story
    whose redaction half is PII scrubbing: drop every row whose key
    appears in ``tombstones`` (right-to-be-forgotten erasure) and/or
    whose ``ts_col`` is strictly before ``cutoff`` (retention window),
    and return ``(kept, audit)`` where the audit frame is one row of
    counts — n_input, n_erased_key, n_expired, n_kept — the record a
    deletion obligation requires. A row matching both causes counts as
    erased (key obligations outrank retention bookkeeping).

    The tombstone side is broadcast (erasure lists are small by
    nature); both predicates evaluate in ONE pass over the corpus —
    the kept frame is a filter, the audit a conditional aggregate, no
    anti-join + recount double scan. At 100 TB pair this with a
    partitioned layout on date so the retention predicate prunes whole
    partitions before the scan.
    """
    erased = F.lit(False)
    if tombstones is not None:
        keys = tombstones.select(
            F.col(tombstones.columns[0]).alias("__tomb")
        ).distinct()
        df = df.join(
            F.broadcast(keys.withColumn("__hit", F.lit(True))),
            df[key_col] == keys["__tomb"],
            "left",
        ).drop("__tomb")
        erased = F.coalesce(F.col("__hit"), F.lit(False))
    # NULL-safe: a NULL timestamp must read as "not expired", not as
    # SQL NULL — otherwise the row fails BOTH the kept filter and the
    # audit's conditional sums and silently vanishes from a governance
    # operator (n_erased_key + n_expired + n_kept < n_input).
    expired = (
        F.coalesce(
            F.col(ts_col) < F.lit(cutoff).cast("timestamp"), F.lit(False)
        )
        if ts_col is not None and cutoff is not None
        else F.lit(False)
    )
    flagged = df.withColumn("__erased", erased).withColumn(
        "__expired", ~erased & expired
    )
    kept = (
        flagged.where(~F.col("__erased") & ~F.col("__expired"))
        .drop("__erased", "__expired", "__hit")
    )
    audit = flagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("__erased").cast("long")).alias("n_erased_key"),
        F.sum(F.col("__expired").cast("long")).alias("n_expired"),
        F.sum(
            (~F.col("__erased") & ~F.col("__expired")).cast("long")
        ).alias("n_kept"),
    )
    return kept, audit


def freshness_check(
    tables: list[tuple],
    as_of: str,
    sla_seconds: dict,
) -> DataFrame:
    """Data-freshness SLA monitor — the first question observability
    asks of every table: when did data last arrive, and is that
    within the expected cadence? ``tables`` is [(name, df, ts_col)],
    ``as_of`` a replayable reference instant (never wall clock — runs
    must be reproducible), ``sla_seconds`` the per-table allowance.

    One max() aggregate per table (answerable from parquet footer
    stats when the reader supports max pushdown) unioned into a tiny
    verdict frame; staleness is exact integer seconds (TIMESTAMP_NTZ
    ``timestampdiff``, floor-divided — naive-as-UTC, never the
    session-tz-dependent unix_micros cast), so the SLA verdict
    is engine-reproducible. NULL max_ts (empty table) reads as
    infinitely stale: is_fresh = false, staleness NULL.
    """
    parts = []
    as_of_ntz = F.lit(as_of).cast("timestamp_ntz")
    for name, df, ts_col in tables:
        # ONE aggregate per table; staleness derives from max_ts in a
        # follow-up select over FIXED internal column names (no
        # re-aggregation, no user strings spliced into SQL — a ts_col
        # needing quoting or a quoted as_of cannot break parsing;
        # as_of enters as a bound literal). All arithmetic stays in
        # TIMESTAMP_NTZ (naive-as-UTC convention): unix_micros on a
        # session-tz TIMESTAMP would shift by the DST offset gap
        # between the two instants on a non-UTC driver. Integer `div`
        # keeps the original floor-toward-zero truncation bit for bit.
        staleness = F.expr(
            "timestampdiff(MICROSECOND, max_ts, __asof) div 1000000"
        )
        parts.append(
            df.agg(
                F.max(F.col(ts_col).cast("timestamp_ntz")).alias("max_ts")
            )
            .withColumn("__asof", as_of_ntz)
            .select(
                F.lit(name).alias("table_name"),
                "max_ts",
                staleness.cast("long").alias("staleness_s"),
                F.coalesce(
                    staleness <= F.lit(int(sla_seconds[name])), F.lit(False)
                ).alias("is_fresh"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def partition_gaps(
    df: DataFrame, ts_col: str = "ts", granularity: str = "minute"
) -> DataFrame:
    """Partition-completeness monitor — freshness' sibling question:
    between the table's first and last event, which time partitions
    are MISSING entirely? (An hourly load that silently skipped a
    window passes every freshness check; this catches it.)

    The present-bucket table reduces once (distinct + checkpoint —
    it is bounded by the time span, not the row count, and three plan
    legs read it), the expected spine is ``explode(sequence(lo, hi))``
    off the 1-row bounds, and the gap set is one anti join. Expected
    count comes from integer microsecond arithmetic, not a second
    spine scan. Output 1 row: (n_expected, n_present, n_missing,
    first_missing, last_missing) — timestamps NULL when nothing is
    missing.
    """
    step_us = {"minute": 60_000_000, "hour": 3_600_000_000}[granularity]
    present = (
        df.select(
            F.date_trunc(granularity, F.col(ts_col).cast("timestamp")).alias("b")
        )
        .where(F.col("b").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    bounds = present.agg(
        F.min("b").alias("__lo"),
        F.max("b").alias("__hi"),
        F.count(F.lit(1)).cast("long").alias("n_present"),
    ).localCheckpoint()  # 1 row
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL 1 {granularity}")
            )
        ).alias("b")
    )
    missing = spine.join(present, "b", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_missing"),
        F.min("b").alias("first_missing"),
        F.max("b").alias("last_missing"),
    )
    return bounds.crossJoin(F.broadcast(missing)).select(
        F.expr(
            "timestampdiff(MICROSECOND, CAST(__lo AS TIMESTAMP_NTZ), "
            f"CAST(__hi AS TIMESTAMP_NTZ)) div {step_us} + 1"
        )
        .cast("long")
        .alias("n_expected"),
        "n_present",
        "n_missing",
        "first_missing",
        "last_missing",
    )


def slo_burn_rate(
    df: DataFrame,
    ts_col: str,
    is_error: Column,
    error_budget: float = 0.01,
    bucket: str = "hour",
) -> DataFrame:
    """SLO error-budget burn — the SRE reading of an error-rate
    series: per bucket, the error rate against the budget the SLO
    allows (burn rate 1.0 = consuming budget exactly as fast as the
    SLO grants it; 14.4 = the classic "page now" multiplier), plus
    the RUNNING fraction of the period's budget consumed so far
    (cumulative errors over cumulative allowance).

    One hash agg buckets the stream (predicate stays in codegen),
    then a single ordered cumulative window over the bucket SERIES
    (time-span-bounded — the repo's accepted global-window-over-a-
    key-table pattern, never over raw rows) —
    every count is an exact integer and every emitted float is one
    arithmetic expression over those identical integers, so the
    whole frame is bit-identical cross-engine, unrounded (the repo's
    single-expression convention). Output: (bucket_ts, n, n_err,
    err_rate, burn_rate, budget_used_frac).
    """
    hourly = df.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(is_error, 1).otherwise(0)).cast("long").alias("n_err"),
    )
    return slo_burn_derive(hourly, error_budget)


def slo_burn_derive(
    hourly: DataFrame, error_budget: float = 0.01
) -> DataFrame:
    """Derivation half of :func:`slo_burn_rate`, shared with its
    streaming twin (which collects the same (bucket_ts, n, n_err)
    integers in watermarked window state and derives after the
    drain): rates, the burn multiple, and the cumulative budget
    fraction as single float expressions over exact integers — ONE
    definition so the batch and streaming verdicts cannot drift."""
    w = W.orderBy("bucket_ts").rowsBetween(W.unboundedPreceding, 0)
    budget = error_budget
    return hourly.select(
        "bucket_ts",
        "n",
        "n_err",
        (F.col("n_err") / F.col("n")).alias("err_rate"),
        (F.col("n_err") / F.col("n") / F.lit(budget)).alias("burn_rate"),
        (
            F.sum("n_err").over(w)
            / (F.lit(budget) * F.sum("n").over(w))
        ).alias("budget_used_frac"),
    )


def percentile_contract(
    tables: list[tuple],
    k: int = 2048,
    salt: str = "kmv",
) -> DataFrame:
    """Percentile SLO contracts over KMV quantile sketches — the
    check type the sketch family exists for at 100 TB: "p95 of this
    column must stay under X" answered in ONE pass per table with
    bounded state, no prior value bounds, and per-partition
    sub-sketches that merge exactly (a percentile threshold over the
    builtin exact ``percentile`` would buffer whole columns; over
    ``percentile_approx`` it would be uncertifiable cross-engine).

    ``tables`` is [(name, df, id_col, col, q, ceiling)]; per entry the
    verdict row carries the sketch estimate, the configured ceiling,
    and ok = est ≤ ceiling — a deterministic double compare over the
    identical sample value both engines pick, so the whole contract
    battery is value-certifiable. Output: (table_name, col_name, q,
    est_value, ceiling, ok) in configuration order, one lazily-unioned
    frame (the monitor_suite composition shape)."""
    from sparkobs.operators.profile import kmv_quantile_sketch

    parts = []
    for name, df, id_col, col, q, ceiling in tables:
        sk = kmv_quantile_sketch(df, id_col, col, k=k, salt=salt)
        # aggregate directly (not kmv_quantile_estimate): an EMPTY or
        # all-NULL contracted column must still emit its verdict row —
        # est_value NULL, ok coalesced to False (the freshness_check
        # convention; an SLO over a table that went empty is exactly
        # when a failing verdict is wanted, and the oracle always
        # emits one row per contract)
        est = sk.agg(
            F.percentile("value", F.lit(float(q))).alias("est_value")
        ).select(
            F.lit(name).alias("table_name"),
            F.lit(col).alias("col_name"),
            F.lit(float(q)).alias("q"),
            "est_value",
            F.lit(float(ceiling)).alias("ceiling"),
            F.coalesce(
                F.col("est_value") <= F.lit(float(ceiling)), F.lit(False)
            ).alias("ok"),
        )
        parts.append(est)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
