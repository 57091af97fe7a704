"""Behavioral analytics over event streams: funnels, cohort
retention, and time-series resampling — the product-analytics queries
that sit on top of the same events table the monitors watch. All pure
DataFrame composition; companions to the journey Markov chain in
:mod:`sparkobs.operators.state`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: how many keys performed ``steps[0]``, then
    ``steps[1]`` STRICTLY AFTER their first ``steps[0]``, and so on —
    each stage anchored at the earliest qualifying time (the standard
    first-touch funnel, immune to out-of-order repeat events).

    Stage i is one filtered aggregation joined to the stage-(i−1)
    frontier on the key — len(steps) hash aggs + joins, each shrinking
    (the frontier only loses keys). Output per step: entering key
    count and conversion from the previous step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # each frontier is materialized (eager localCheckpoint) before the
    # next stage builds on it: the per-stage .count() would otherwise
    # re-execute every earlier stage's scan+agg from scratch — O(n²)
    # full-corpus work for an n-step funnel
    frontier = (
        df.where(F.col(state_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("__t"))
        .localCheckpoint(eager=True)
    )
    counts = [frontier.count()]
    for s in steps[1:]:
        frontier = (
            df.where(F.col(state_col) == s)
            .select(key_col, F.col(ts_col).alias("__ts2"))
            .join(frontier, key_col)
            .where(F.col("__ts2") > F.col("__t"))
            .groupBy(key_col)
            .agg(F.min("__ts2").alias("__t"))
            .localCheckpoint(eager=True)
        )
        counts.append(frontier.count())
    spark = df.sparkSession
    rows = []
    for i, (s, n) in enumerate(zip(steps, counts)):
        conv = round(n / counts[i - 1], 4) if i > 0 and counts[i - 1] else None
        rows.append((i + 1, s, n, conv))
    return spark.createDataFrame(
        rows, "step int, event_type string, n_keys bigint, conversion double"
    )


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the period of
    their FIRST event; each (cohort, offset) cell counts keys active
    ``offset`` periods later, with retention relative to cohort size.

    Two hash aggs (first-event per key; distinct key per cohort×
    period) and one broadcast-friendly join on the cohort key — the
    matrix is |cohorts| × |offsets| rows no matter the event volume.
    """
    first = df.groupBy(key_col).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("__cohort")
    )
    active = (
        df.select(key_col, F.date_trunc(granularity, F.col(ts_col)).alias("__period"))
        .distinct()
        .join(first, key_col)
    )
    per_gran_days = {"week": 7, "day": 1}
    if granularity not in per_gran_days:
        raise ValueError(f"granularity must be one of {sorted(per_gran_days)}")
    offset = (
        F.datediff(F.col("__period"), F.col("__cohort"))
        / per_gran_days[granularity]
    ).cast("long")
    cells = (
        active.select("__cohort", offset.alias("offset"), key_col)
        .groupBy("__cohort", "offset")
        .agg(F.count_distinct(key_col).alias("n_active"))
    )
    sizes = first.groupBy("__cohort").agg(
        F.count(F.lit(1)).alias("__cohort_size")
    )
    return cells.join(sizes, "__cohort").select(
        F.col("__cohort").alias("cohort_start"),
        "offset",
        F.col("n_active").cast("long").alias("n_active"),
        F.round(F.col("n_active") / F.col("__cohort_size"), 4).alias("retention"),
    )


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-key regular time grid with gap filling: bucket events to
    ``step``, build each key's full bucket spine between its first and
    last event, and carry the last observation forward (LOCF) into
    empty buckets — the resampling that turns an irregular event
    stream into a regular series for drift/forecast consumers.

    The spine is ``explode(sequence(min, max, interval))`` per key —
    spine size is time-range/step per key, independent of event
    volume; the fill is one ``last_value(ignoreNulls)`` window per
    key (a single shuffle, already keyed). ``is_gap`` marks filled
    rows so downstream stats can weigh observed vs imputed.
    """
    qty, _, unit_raw = step.partition(" ")
    unit = unit_raw.rstrip("s")
    if qty != "1" or unit not in ("minute", "hour", "day", "week"):
        # a multi-unit step ("2 days") would date_trunc to the base
        # unit but stride the spine by 2 — actual buckets on odd days
        # would never join and read as gaps; only single calendar
        # units keep bucketing and spine aligned
        raise ValueError(
            f"step must be '1 minute|hour|day|week', got {step!r}"
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    actual = (
        df.select(F.col(key_col).alias("k"), bucket.alias("b"), F.col(value_col).cast("double").alias("v"))
        .groupBy("k", "b")
        .agg(F.round(F.avg("v"), 4).alias("v"))
    )
    spans = actual.groupBy("k").agg(F.min("b").alias("__lo"), F.max("b").alias("__hi"))
    spine = spans.select(
        "k",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("b"),
    )
    joined = spine.join(actual, ["k", "b"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("k").alias(key_col),
        F.col("b").alias("bucket_ts"),
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("is_gap"),
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-rule session assignment: within each key's (ts, tiebreak)
    order, a new session starts whenever the gap to the previous event
    exceeds ``gap_seconds`` — the event-level companion to the
    session-WINDOW aggregates in :mod:`sparkobs.operators.windows`
    (those give per-window rollups; this labels every event with its
    session ordinal so arbitrary per-session analysis can follow).

    One window shuffle on the key; the session ordinal is a running
    sum of session-start flags (lag + cumulative sum — both ride the
    same window). Timestamps compare as exact integer microseconds
    (``unix_micros``) so the gap predicate is engine-reproducible.
    Every input column rides along unchanged — the point is labeling
    events, not projecting them away.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        "*",
        F.sum(is_new).over(running).alias("session_idx"),
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: event count and
    exact duration in microseconds (integer arithmetic end to end)."""
    s = sessionize(df, key_col, ts_col, tiebreak_col, gap_seconds)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(us) - F.min(us)).cast("long").alias("duration_us"),
    ).select(
        key_col,
        F.col("session_idx").cast("long").alias("session_idx"),
        "n_events",
        "duration_us",
    )


def debounce_first_of_burst(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Debounce: collapse each burst of same-key events to its FIRST
    row — a row survives iff it starts a new session under the gap
    rule (previous same-key event is ≥ ``gap_seconds`` older, or none
    exists). Session-START semantics, not "gap to previous kept row":
    the gap rule is a pure lag window, so it is one shuffle, identical
    in any engine, and exactly the burst definition sessionization
    already uses — debounce(gap) keeps precisely one row per session
    window. ``order_col`` breaks equal-timestamp ties
    deterministically.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, order_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer-microsecond gap (unix_micros), the same exactness
    # convention as sessionize — never float seconds
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    keep = prev.isNull() | (gap_us >= F.lit(gap_seconds) * 1_000_000)
    return (
        df.withColumn("__keep", keep)
        .where(F.col("__keep"))
        .drop("__keep")
    )


def top_event_ngrams(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Most common length-``n`` event sequences (journey n-grams): per
    key, events order into a sequence; every window of ``n``
    consecutive states becomes one n-gram; top-k by count. The
    sequence windows come from ``lead`` over the per-key ordering —
    one shuffle on the key, no per-user collect, no explode of whole
    journeys. Deterministic (count desc, then the n-gram lexically).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    steps = [F.col(state_col)] + [
        F.lead(state_col, i).over(w) for i in range(1, n)
    ]
    gram = F.concat_ws(">", *steps)
    complete = steps[-1].isNotNull()
    return (
        df.select(gram.alias("ngram"), complete.alias("__c"))
        .where(F.col("__c"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
        .select("ngram", F.col("n_occurrences").cast("long").alias("n_occurrences"))
    )
