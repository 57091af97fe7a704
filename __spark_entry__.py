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
    # --- r8 gate (50 slots, exactly full): (1) market_share_q8 —
    # its query text changed in r7 (ASIA semi-reduction join reorder)
    # after its last certification, so the changed-text re-cert
    # convention puts it at the head (r7 ADVICE). (2) The 24
    # promoted r7-queue entries, staging order — all green in the
    # judge's own sf0.01 sweep, now driver-witnessed for the first
    # time. (3) The 25 stalest registry entries: all 20 last
    # certified in r2 plus the 5 oldest r3 ones — the rotation debt
    # repayment the r7 verdict scheduled; the remaining r3/r4 stamps
    # rotate through the r9 gate (tests/test_gate_hygiene.py now
    # enforces a maximum certification age, so the debt is a test
    # failure, not a memory).
    "market_share_q8",                # TPC-H Q8 (changed-text re-cert)
    # --- promoted r7 queue, staging order ---
    "dim_ablation_recall_embeddings", # half-dim neighbor preservation
    "conversion_paths_events",        # top conversion journeys
    "time_weighted_value_events",     # duration-weighted time-in-state
    "budget_select_documents",        # token-budget greedy selection
    "components_supplier_mutual_knn", # mutual-kNN min-label components
    "event_disorder_events",          # event-time disorder diagnostic
    "inclusion_deps_star_schema",     # inclusion-dependency FK discovery
    "streaming_disorder_events",      # disorder streaming twin
    "streaming_salted_distinct_events", # salted-distinct streaming twin
    "impact_reach_supply_chain",      # hop-labeled BFS blast radius
    "seasonal_profile_events",        # hour-of-week seasonal expectation
    "lead_lag_corr_events",           # lead-lag cross-correlation
    "slo_burn_rate_events",           # SLO error-budget burn (batch)
    "streaming_slo_burn_events",      # SLO burn streaming twin
    "incident_groups_events",         # alert-to-incident grouping
    "diff_columns_orders",            # column-level diff drill-down
    "monitor_suite_lake",             # declarative monitor battery
    "zone_map_prune_orders",          # zone-map prune estimation
    "cube_revenue_status_priority",   # CUBE grouping-sets
    "hll_sliding_users_events",       # sliding-window HLL distinct
    "image_ahash_dedup_media",        # image exact-pixel dedup (aHash)
    "image_near_dup_media",           # banded aHash near-dup tier
    "audio_fingerprint_dedup_media",  # gain-robust audio RMS dedup
    "video_framehash_dedup_media",    # sampled video frame-hash dedup
    # --- stalest re-certs: every r2 stamp (20) ---
    "argmax_entity_supplier",
    "argmax_order",
    "argmax_order_per_status",
    "binary_stats_media",
    "cosine_topk_lsh",
    "decode_stub_media",
    "distinct_counts_lineitem",
    "duplicate_count_lineitem",
    "embedding_norms",
    "frame_sample_media",
    "group_agg_orders",
    "grouped_distinct_parts",
    "histogram_quantity",
    "histogram_returnflag",
    "json_extract_events",
    "label_centroid_stats",
    "limited_scan_topk",
    "null_counts_orders",
    "scalar_string_funcs",
    "timestamp_format_orders",
    # --- oldest r3 stamps (5 of 43; the rest rotate in r9) ---
    "asof_join_events_orders",
    "asof_join_forward",
    "chunk_documents",
    "contamination_check",
    "corr_lineitem",
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
