"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship profile query at sf0.001 (smoke).
``queries()`` — one named entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each SQL-expressible
query; names and output column aliases match exactly.

Convention for oracle parity: every floating-point aggregate is rounded
in-query (ROUND_DIGITS=4 for means/stds/percentiles, 2 for money sums)
on BOTH sides so raw doubles are identical; counts are BIGINT on both
sides (DuckDB integer SUM/COUNT results are cast explicitly).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# self-contained import: works however the driver loads this file
# (module import, importlib-by-path, different cwd)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession

from sparkobs.io import load_table
from sparkobs import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one-pass numeric profile of lineitem at sf0.001."""
    from sparkobs.operators.profile import table_profile

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return table_profile(df, "lineitem")


# The driver's correctness gate checks the FIRST 50 registry entries
# only — order the newest / least-driver-proven queries first so each
# round's CORRECTNESS_r{N} certifies the latest work. Names listed here
# lead the registry (in this order); everything else follows in
# definition order. A name that disappears from the registry is
# silently skipped. KEEP len(_PRIORITY) <= GATE_SIZE: entries past
# position 50 are NOT driver-certified this round (queries() warns if
# the list overflows, so evictions are explicit, never silent).
GATE_SIZE = 50

_PRIORITY: list[str] = [
    # round-3 additions
    "minhash_lsh_pairs",
    "simhash_documents",
    "near_dup_groups_lsh",
    "repetition_stats_documents",
    "hash_sample_orders",
    "decode_synth_media",
    "pii_scrub_documents",
    "stratified_sample_orders",
    "streaming_dedup_documents",
    "collect_metric_lists_supplier",
    "quality_topk_per_source",
    "anomaly_hourly_events",
    "psi_drift_hourly_events",
    "resize_synth_media",
    "winnowing_fingerprints_documents",
    "streaming_near_dup_candidates",
    # round-2 additions never yet inside the driver window
    "near_dup_groups_documents",
    "jdbc_roundtrip_nation",
    "jdbc_monitor_nation",
    "cosine_topk_ivf",
    "embedding_near_dup_pairs_lsh",
    "embedding_near_dup_pairs",
    "chunk_documents",
    "contamination_check",
    "source_quota_cap",
    "ngram_jaccard_pairs_hi",
    "streaming_session_events",
    "streaming_sliding_events",
    "asof_join_events_orders",
    "asof_join_forward",
    "zip_join_nation_supplier",
    "flatten_struct_events",
    "set_except_users",
    "set_intersect_users",
    "rollup_lineitem",
    "cube_lineitem",
    "pivot_returnflag_linestatus",
    "salted_group_count_suppkey",
    "topk_orders_per_status",
    "top_shingles",
    "grouped_percentiles_orders",
    "mode_columns_lineitem",
    "corr_lineitem",
    "pipeline_filtered_corpus",
    "profile_preview_orders",
    "profile_lineitem_approx",
    "bucket_monitor_metrics",
    "decode_real_media",
    # simple aggregations — acceptable overflow past the 50-entry gate
    # (locally oracle-verified; tools/check_oracle.py covers the rest)
    "entropy_lineitem_columns",
    "fd_check_orders",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = Q.SPARK_QUERIES
    if len(_PRIORITY) > GATE_SIZE:
        import warnings

        warnings.warn(
            f"_PRIORITY has {len(_PRIORITY)} names but the driver gate "
            f"checks only the first {GATE_SIZE} registry entries — "
            f"these will NOT be certified this round: "
            f"{_PRIORITY[GATE_SIZE:]}",
            stacklevel=2,
        )
    ordered = {n: qs[n] for n in _PRIORITY if n in qs}
    ordered.update({n: f for n, f in qs.items() if n not in ordered})
    return ordered


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracle SQL per query. A few oracles (the FS-listing family) stat
    the data directory itself via DuckDB read_blob and carry an
    ``{SF_DIR}`` placeholder; the driver runs correctness at sf0.01, so
    the no-arg call (the driver contract) substitutes that path.
    tools/check_oracle.py passes its actual sf dir."""
    return {n: sql.replace("{SF_DIR}", sf_dir) for n, sql in Q.ORACLE_SQL.items()}
