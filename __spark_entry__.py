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
    # --- r13 gate (50 slots, exactly full — tools/plan_rotation.py
    # output verbatim, the same derivation
    # tests/test_gate_hygiene.py enforces): (1) the 1 promoted
    # r12-queue entry (EXT-152 filter-funnel curation audit — a swap
    # into the slot the r12 near_dup_groups_documents retirement
    # freed; registry back at the 300 ceiling, queue EMPTY after
    # promotion). (2) The 1 forced re-cert (zipf_fit_documents, the
    # last r6 stamp — it crosses the 6-round age ceiling this round).
    # (3) The 48 stalest r7 re-certs (alphabetical within the
    # cohort). Future gate windows are whatever
    # tools/plan_rotation.py prints — SURVEY.md's gate paragraphs are
    # generated from it (make survey-gates), never hand-typed.
    # --- promoted r12 queue ---
    "filter_funnel_marginals_documents",
    # --- forced: stamp past the age ceiling ---
    "zipf_fit_documents",
    # --- stalest fill (r7 stamps) ---
    "ab_ztest_purchase_events",
    "acf1_hourly_events",
    "activity_islands_events",
    "ann_recall_embeddings",
    "assoc_rules_event_types",
    "attribution_linear_events",
    "benford_totalprice_orders",
    "bm25_search_documents",
    "conversion_latency_events",
    "cramers_v_events_type_hour",
    "cuped_lift_events",
    "cusum_changepoint_events",
    "disjunctive_revenue_q19",
    "dominant_suppliers_q20",
    "emd_drift_events_halves",
    "epoch_shuffle_documents",
    "exact_quantiles_grouped_lineitem",
    "exact_quantiles_lineitem",
    "freshness_sla_tables",
    "hll_intersection_users_events",
    "hll_union_users_events",
    "important_parts_q11",
    "interarrival_stats_events",
    "km_survival_events",
    "kmeans_ari_embeddings",
    "kmeans_embeddings",
    "merge_upsert_orders",
    "min_price_supplier_q2",
    "ols_pricing_lineitem",
    "pagerank_copurchase",
    "pagerank_personalized_copurchase",
    "pagerank_weighted_copurchase",
    "partition_gaps_events",
    "patchify_synth_media",
    "product_profit_q9",
    "related_suppliers_jaccard",
    "revenue_delta_drilldown_orders",
    "rfm_scores_orders",
    "salted_distinct_customers_orders",
    "scd2_user_state_events",
    "shipmode_delay_q12",
    "spearman_quantity_price_lineitem",
    "streaming_debounce_events",
    "streaming_freshness_events",
    "streaming_kmeans_assign_embeddings",
    "streaming_ks_drift_events",
    "supplier_variety_q16",
    "trend_slope_hourly_events",
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
