"""Deterministic sampling for reproducible pipelines (extension).

The reference samples tables probabilistically (SAMPLE BLOCK,
snowflake_table_monitor.py:50-54) — fine for ad-hoc profiling, but a
training-data pipeline needs samples that are REPRODUCIBLE across
runs, engines, and partitionings: hash-mod selection on a stable key.
``Dataset.sample`` is seed-dependent per partition split; a hash-mod
predicate is a pure row-local filter — trivially parallel, pushdown-
friendly, and identical on any engine with md5() (the DuckDB oracle
mirrors it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame, key_col: str, one_in: int, salt: str = ""
) -> DataFrame:
    """Keep rows where ``md5(salt + key) mod one_in == 0`` — a ~1/one_in
    deterministic sample keyed by ``key_col``.

    The hash value is the first 15 hex chars of the digest parsed
    base-16 (fits a signed 64-bit int in every engine). ``salt`` picks
    an independent sample from the same keys. All rows with the same
    key land in or out TOGETHER — exactly what makes the sample safe to
    join against other tables sampled on the same key.
    """
    if one_in < 1:
        raise ValueError(f"one_in must be >= 1, got {one_in}")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return df.where(h % one_in == 0)
