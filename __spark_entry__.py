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
    # --- r12 gate (50 slots, exactly full — tools/plan_rotation.py
    # output verbatim, the same derivation
    # tests/test_gate_hygiene.py enforces): (1) the 1 promoted
    # r11-queue entry (join-side AQP — a swap into the slot the r11
    # sparse-cosine retirement freed; registry back at the 300
    # ceiling, queue EMPTY). (2) The 1 forced re-cert
    # (zscore_events_by_type, the last r5 stamp — it crosses the
    # 6-round age ceiling this round). (3) The 48 stalest r6
    # re-certs (alphabetical within the cohort). Future gate windows
    # are whatever tools/plan_rotation.py prints — SURVEY.md's gate
    # paragraphs are generated from it (make survey-gates), never
    # hand-typed.
    # --- promoted r11 queue ---
    "sampled_join_agg_ci_lineitem",
    # --- forced: stamp past the age ceiling ---
    "zscore_events_by_type",
    # --- stalest fill (r6 stamps) ---
    "bigram_pmi_documents",
    "bpe_batched_parity_documents",
    "chi_square_events_type_hour",
    "compaction_execute_documents",
    "compaction_plan_sf_dir",
    "cosine_topk",
    "database_monitor_metrics",
    "debounce_events_user_type",
    "exact_dedup_documents",
    "fingerprint_documents",
    "gini_user_activity_events",
    "hist2d_hour_value_events",
    "ks_drift_events_halves",
    "language_id_documents",
    "lookup_join_fill_nation",
    "mad_events_by_type",
    "merkle_diff_orders",
    "metrics_fanin_supplier",
    "minhash_xx64_parity_documents",
    "minmax_norm_events_by_type",
    "mutual_info_events_type_hour",
    "ngram_jaccard_pairs",
    "pca_variance_embeddings",
    "percent_rank_orders_by_status",
    "pricing_summary",
    "profile_lineitem_stats",
    "quality_score_documents",
    "record_count_lineitem",
    "revenue_per_nation",
    "robust_outliers_events",
    "schema_drift_hourly",
    "shape_summary_all",
    "small_qty_revenue_q17",
    "snapshot_count_delta",
    "sql_monitor_lineitem",
    "streaming_count_drift",
    "streaming_tumbling_events",
    "target_encode_events_type",
    "text_stats_documents",
    "token_count_regex_documents",
    "top_event_trigrams",
    "top_supplier_q15",
    "unpivot_order_measures",
    "vocab_segments_documents",
    "weighted_sample_documents",
    "window_session_per_user",
    "window_sliding",
    "window_tumbling_hourly",
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
    """Oracle SQL per query. A few oracles (the FS-listing family and
    the staged-layout queries) reference the data/staged directories
    through placeholders ({SF_DIR}, {ZM16_DIR} — resolved by
    sparkobs.io.oracle_substitute); the driver runs correctness at
    sf0.01, so the no-arg call (the driver contract) substitutes that
    path. tools/check_oracle.py passes its actual sf dir."""
    from sparkobs.io import oracle_substitute

    return {n: oracle_substitute(sql, sf_dir) for n, sql in Q.ORACLE_SQL.items()}
