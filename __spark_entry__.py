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
    # --- r14 gate (50 slots, exactly full — tools/plan_rotation.py
    # output verbatim at the r13→r14 round boundary, the same
    # derivation tests/test_gate_hygiene.py enforces): (1) the 1
    # promoted r13-queue entry (the funnel↔pipeline certification
    # twin — a swap into the slot the r13
    # minhash_xx64_parity_documents retirement freed; this round's
    # ann_recall_embeddings retirement in turn staged
    # km_survival_quantized_events into the queue, keeping
    # registry+queue at the 300 ceiling). (2) The 2 forced re-certs
    # whose r7 stamps cross the 6-round age ceiling this round.
    # (3) The 47 stalest r8 re-certs (alphabetical within the
    # cohort). Future gate windows are whatever
    # tools/plan_rotation.py prints — SURVEY.md's gate paragraphs are
    # generated from it (make survey-gates), never hand-typed.
    # --- promoted r13 queue ---
    "funnel_pipeline_parity_documents",
    # --- forced: stamp past the age ceiling ---
    "triangle_census_suppliers",
    "waiting_suppliers_q21",
    # --- stalest fill (r8 stamps) ---
    "argmax_entity_supplier",
    "argmax_order",
    "argmax_order_per_status",
    "asof_join_events_orders",
    "asof_join_forward",
    "audio_fingerprint_dedup_media",
    "binary_stats_media",
    "budget_select_documents",
    "chunk_documents",
    "components_supplier_mutual_knn",
    "contamination_check",
    "conversion_paths_events",
    "corr_lineitem",
    "cosine_topk_lsh",
    "cube_revenue_status_priority",
    "decode_stub_media",
    "diff_columns_orders",
    "dim_ablation_recall_embeddings",
    "distinct_counts_lineitem",
    "duplicate_count_lineitem",
    "embedding_norms",
    "event_disorder_events",
    "frame_sample_media",
    "group_agg_orders",
    "grouped_distinct_parts",
    "histogram_quantity",
    "histogram_returnflag",
    "hll_sliding_users_events",
    "image_ahash_dedup_media",
    "image_near_dup_media",
    "impact_reach_supply_chain",
    "incident_groups_events",
    "inclusion_deps_star_schema",
    "json_extract_events",
    "label_centroid_stats",
    "lead_lag_corr_events",
    "limited_scan_topk",
    "market_share_q8",
    "monitor_suite_lake",
    "null_counts_orders",
    "scalar_string_funcs",
    "seasonal_profile_events",
    "slo_burn_rate_events",
    "streaming_disorder_events",
    "streaming_salted_distinct_events",
    "streaming_slo_burn_events",
    "time_weighted_value_events",
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
