"""Feature conditioning: group-wise normalization and outlier
clipping — the last-mile transforms between profiled raw columns and
model-ready features, kept relational so they compose with the
profiling/drift operators upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    keep_cols: list[str] = (),
) -> DataFrame:
    """Per-group z-score normalization: ``(x − mean_g) / std_g`` with
    the group's own moments — the standardization that makes
    heterogeneous segments comparable (and the residual that feeds
    anomaly scoring, cf. :func:`sparkobs.operators.state.
    metric_anomalies`).

    One window shuffle on the group key; moments are computed by the
    same partial+final aggregation as a groupBy (Catalyst window
    aggregates combine map-side). Constant groups (std 0) emit z = 0
    rather than NULL/inf so downstream math never poisons."""
    w = Window.partitionBy(*group_cols)
    v = F.col(value_col).cast("double")
    mean_g = F.avg(v).over(w)
    std_g = F.stddev(v).over(w)
    z = F.when(
        (std_g.isNull()) | (std_g == 0), F.lit(0.0)
    ).otherwise((v - mean_g) / std_g)
    return df.select(
        *group_cols,
        *keep_cols,
        F.round(z, 4).alias("zscore"),
    )


def winsorize_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization report: clip ``value_col`` to the
    group's [lo, hi] percentiles and report how many rows each tail
    clipped and the mean before/after — the heavy-tail taming step
    with its own audit trail.

    Percentile edges come from ONE grouped exact-percentile agg
    (per-group sketch state, not a per-group scan), rounded to 4
    decimals in-query so the clip predicate is engine-reproducible;
    the edges join back on the group key (broadcast when the group
    count is small, shuffle otherwise — Catalyst/AQE decides). At
    100 TB use ``percentile_approx`` for the edges, same shape."""
    v = F.col(value_col).cast("double")
    edges = df.groupBy(*group_cols).agg(
        F.round(F.percentile(v, F.lit(lo)), 4).alias("__lo"),
        F.round(F.percentile(v, F.lit(hi)), 4).alias("__hi"),
    )
    j = df.join(edges, list(group_cols))
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return (
        j.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((v < F.col("__lo")).cast("long")).alias("n_clipped_lo"),
            F.sum((v > F.col("__hi")).cast("long")).alias("n_clipped_hi"),
            F.round(F.avg(v), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
            F.max(F.col("__lo")).alias("p_lo"),
            F.max(F.col("__hi")).alias("p_hi"),
        )
    )


def group_minmax_norm(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group min-max normalization to [0, 1] (the bounded-range
    companion to :func:`group_zscore`): one window pass computes the
    group extrema, the scaled value is pure row-local arithmetic.
    Constant groups (max == min) yield 0.0, not NULL/inf — the same
    degenerate-group convention as the z-score operator.

    Cross-engine note: (v − min)/(max − min) is a single IEEE
    expression over order-independent aggregates, so it is
    bit-identical across engines before the in-query round — no
    summation-order hazard at all.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols)
    lo = F.min(value_col).over(w)
    hi = F.max(value_col).over(w)
    scaled = F.when(hi > lo, (F.col(value_col) - lo) / (hi - lo)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        *group_cols,
        *(keep_cols or []),
        F.col(value_col),
        F.round(scaled, 4).alias("v_norm"),
        F.round(lo, 4).alias("g_min"),
        F.round(hi, 4).alias("g_max"),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Leave-one-out target encoding: each row's categorical feature
    becomes the mean target of its category EXCLUDING the row itself —
    the standard leakage-safe encoding for high-cardinality
    categoricals. One category aggregation (broadcastable — category-
    sized, not row-sized) joined back; the LOO arithmetic is row-local.
    Singleton categories yield NULL (no peers to average), never a
    self-leak.

    Parity: the category sum is rounded (4) before the row-local
    subtraction/division, so both engines divide identical doubles —
    the raw sum differs across engines by summation order. The LOO
    output is deliberately NOT rounded: the division's result is
    bit-identical by construction, while rounding it would diverge on
    exact .00005 boundaries (cents/(n−1) hits them), because Spark
    rounds the double's exact binary expansion and DuckDB multiplies
    by 10⁴ first — two different answers for a boundary value.
    """
    agg = df.groupBy(cat_col).agg(
        F.round(F.sum(target_col), 4).alias("__s"),
        F.count(target_col).alias("__n"),
    )
    j = df.join(F.broadcast(agg), cat_col)
    loo = F.when(
        F.col("__n") > 1,
        (F.col("__s") - F.col(target_col)) / (F.col("__n") - 1),
    )
    return j.select(
        F.col(cat_col),
        *(keep_cols or []),
        F.col(target_col),
        loo.alias("te_loo"),
        F.col("__n").cast("long").alias("cat_n"),
    )


# Closed-form 2-feature OLS: the 3x3 normal equations solved by
# Cramer's rule. Determinant formulas are shared expression TEXT so
# callers (and cross-engine oracles) evaluate the identical arithmetic
# over identical doubles — the sufficient statistics must come from
# exact integer sums, which is why the inputs are integer-valued
# BIGINT columns (quantize money to cents etc. before calling).
OLS_DET = (
    "(n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd))"
)
OLS_DET0 = (
    "(sy*(sqq*sdd - sqd*sqd) - sq*(sqy*sdd - sqd*sdy) + sd*(sqy*sqd - sqq*sdy))"
)
OLS_DET1 = (
    "(n*(sqy*sdd - sqd*sdy) - sy*(sq*sdd - sqd*sd) + sd*(sq*sdy - sqy*sd))"
)
OLS_DET2 = (
    "(n*(sqq*sdy - sqy*sqd) - sq*(sq*sdy - sqy*sd) + sy*(sq*sqd - sqq*sd))"
)


def ols_two_features(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str
) -> DataFrame:
    """OLS fit y ~ b0 + b1·x1 + b2·x2 over integer-valued BIGINT
    columns: ONE sufficient-statistics aggregation over the data, then
    scalar-only Cramer arithmetic on the 1-row frame. The y² sum
    accumulates as DECIMAL(38,0) (it overflows BIGINT first); every
    sum is exact, the one cast to double is deterministic, and the
    coefficient expressions are fixed scalar formulas — bit-identical
    on any engine, no rounding anywhere. Output: (intercept, beta_x1,
    beta_x2, r2, n_rows); degenerate designs (collinear features →
    zero determinant) surface as NULL coefficients.
    """
    s = df.select(
        F.col(x1_col).alias("__q"),
        F.col(x2_col).alias("__d"),
        F.col(y_col).alias("__y"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__q").cast("double").alias("sq"),
        F.sum("__d").cast("double").alias("sd"),
        F.sum("__y").cast("double").alias("sy"),
        F.sum(F.expr("__q * __q")).cast("double").alias("sqq"),
        F.sum(F.expr("__d * __d")).cast("double").alias("sdd"),
        F.sum(F.expr("__q * __d")).cast("double").alias("sqd"),
        F.sum(F.expr("__q * __y")).cast("double").alias("sqy"),
        F.sum(F.expr("__d * __y")).cast("double").alias("sdy"),
        F.sum(F.expr("CAST(__y * __y AS DECIMAL(38, 0))"))
        .cast("double")
        .alias("syy"),
    )
    b = s.select(
        "n",
        "sy",
        "sqy",
        "sdy",
        "syy",
        F.expr(
            f"CASE WHEN {OLS_DET} != 0 THEN {OLS_DET0} / {OLS_DET} END"
        ).alias("b0"),
        F.expr(
            f"CASE WHEN {OLS_DET} != 0 THEN {OLS_DET1} / {OLS_DET} END"
        ).alias("b1"),
        F.expr(
            f"CASE WHEN {OLS_DET} != 0 THEN {OLS_DET2} / {OLS_DET} END"
        ).alias("b2"),
    )
    return b.select(
        F.col("b0").alias("intercept"),
        F.col("b1").alias("beta_x1"),
        F.col("b2").alias("beta_x2"),
        F.expr("1 - (syy - b0*sy - b1*sqy - b2*sdy) / (syy - sy*sy/n)").alias(
            "r2"
        ),
        F.col("n").cast("long").alias("n_rows"),
    )


# CUPED (controlled-experiment using pre-experiment data): shared
# expression text, same contract as the OLS block above — exact
# integer sufficient statistics in, identical doubles out.
CUPED_THETA = (
    "CASE WHEN (n*sxx - sx*sx) != 0 "
    "THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END"
)
CUPED_VAR_RED = (
    "CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) != 0 "
    "THEN ((n*sxy - sx*sy) * (n*sxy - sx*sy)) "
    "/ ((n*sxx - sx*sx) * (n*syy - sy*sy)) END"
)
CUPED_LIFT = "(sy1 / n1 - sy0 / n0)"
CUPED_LIFT_ADJ = (
    "CASE WHEN theta IS NOT NULL "
    "THEN (sy1 / n1 - sy0 / n0) - theta * (sx1 / n1 - sx0 / n0) "
    "ELSE (sy1 / n1 - sy0 / n0) END"
)


def cuped_lift(
    units: DataFrame,
    variant_col: str = "v",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Variance-reduced A/B lift via CUPED: the post-period metric Y is
    adjusted by the pooled regression of Y on the PRE-period covariate
    X (theta = cov(X,Y)/var(X)), which cancels between-user variance
    the randomization already balances. One aggregation pass over the
    per-unit table (exact integer sums; the second-moment terms
    accumulate as DECIMAL(38,0)), then scalar shared-text formulas —
    bit-identical cross-engine. Degenerate covariate (var X = 0) →
    theta NULL and the adjusted lift falls back to the raw lift.
    Output 1 row: (n_0, n_1, lift, lift_cuped, theta, var_reduction)
    in the metric's input units.
    """
    v, x, y = F.col(variant_col), F.col(x_col), F.col(y_col)
    s = units.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(F.expr(f"CAST({x_col} * {x_col} AS DECIMAL(38, 0))"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.expr(f"CAST({x_col} * {y_col} AS DECIMAL(38, 0))"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.expr(f"CAST({y_col} * {y_col} AS DECIMAL(38, 0))"))
        .cast("double")
        .alias("syy"),
        F.sum(F.when(v == 0, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(v == 1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(v == 0, x).otherwise(F.lit(0))).cast("double").alias("sx0"),
        F.sum(F.when(v == 1, x).otherwise(F.lit(0))).cast("double").alias("sx1"),
        F.sum(F.when(v == 0, y).otherwise(F.lit(0))).cast("double").alias("sy0"),
        F.sum(F.when(v == 1, y).otherwise(F.lit(0))).cast("double").alias("sy1"),
    )
    with_theta = s.select(
        "*",
        F.expr(CUPED_THETA).alias("theta"),
        F.expr(CUPED_VAR_RED).alias("var_reduction"),
    )
    return with_theta.select(
        F.col("n0").cast("long").alias("n_0"),
        F.col("n1").cast("long").alias("n_1"),
        F.expr(CUPED_LIFT).alias("lift"),
        F.expr(CUPED_LIFT_ADJ).alias("lift_cuped"),
        "theta",
        "var_reduction",
    )
