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
    # --- r7 gate: the 50 oldest-staged entries of the r7 queue,
    # promoted from sparkobs/queries_next.py (r6 gate was 49/50 green
    # + 1 rows-only by design — no failures to re-certify). Leads
    # with the TPC-H completion (all 22 shapes now registered) and
    # the iterative wave (k-means/ARI/PageRank — fixed-point +
    # unrolled-CTE oracles). The newest-staged entries remain in
    # queries_next.py (len(R7_QUEUE) is authoritative — the 17 held
    # back by the gate plus everything staged during round 7) and
    # fill the r8 gate first, same discipline; the r8 gate's
    # remaining slots re-certify the stalest registry entries
    # (oldest CORRECTNESS round first).
    "product_profit_q9",              # TPC-H Q9 product profit (5-table)
    "shipmode_delay_q12",             # TPC-H Q12 shipmode priority
    "disjunctive_revenue_q19",        # TPC-H Q19 disjunctive predicates
    "min_price_supplier_q2",          # TPC-H Q2 min-cost supplier
    "important_parts_q11",            # TPC-H Q11 decorrelated HAVING
    "supplier_variety_q16",           # TPC-H Q16 NOT-IN + distinct agg
    "dominant_suppliers_q20",         # TPC-H Q20 nested semi-join
    "spearman_quantity_price_lineitem", # rank correlation
    "cramers_v_events_type_hour",     # Cramer's V association
    "benford_totalprice_orders",      # Benford first-digit screen
    "trend_slope_hourly_events",      # per-key OLS trend slopes
    "acf1_hourly_events",             # lag-1 autocorrelation
    "cusum_changepoint_events",       # CUSUM changepoint score
    "rfm_scores_orders",              # RFM ntile scoring
    "activity_islands_events",        # gaps-and-islands streaks
    "assoc_rules_event_types",        # association rules lift
    "scd2_user_state_events",         # SCD Type-2 history
    "ab_ztest_purchase_events",       # two-proportion A/B z-test
    "emd_drift_events_halves",        # binned earth-mover drift
    "interarrival_stats_events",      # inter-arrival cadence
    "hll_union_users_events",         # HLL register-union certification
    "ols_pricing_lineitem",           # closed-form OLS regression
    "cuped_lift_events",              # CUPED variance reduction
    "related_suppliers_jaccard",      # co-occurrence Jaccard pairs
    "ann_recall_embeddings",          # ANN recall@5 certification
    "km_survival_events",             # Kaplan-Meier survival
    "hll_intersection_users_events",  # HLL inclusion-exclusion
    "waiting_suppliers_q21",          # TPC-H Q21 exists/not-exists
    "patchify_synth_media",           # ViT-style image patchify
    "conversion_latency_events",      # first-touch conversion latency
    "pagerank_copurchase",            # fixed-point PageRank
    "pagerank_weighted_copurchase",   # weighted PageRank
    "pagerank_personalized_copurchase", # personalized PageRank
    "kmeans_embeddings",              # fixed-point Lloyd k-means
    "streaming_kmeans_assign_embeddings", # streaming k-means assign
    "kmeans_ari_embeddings",          # Adjusted Rand Index eval
    "streaming_debounce_events",      # continuous burst debounce
    "streaming_ks_drift_events",      # continuous two-sample KS
    "exact_quantiles_lineitem",       # exact two-pass quantiles
    "exact_quantiles_grouped_lineitem", # grouped exact quantiles
    "triangle_census_suppliers",      # oriented triangle census
    "salted_distinct_customers_orders", # salted exact distinct
    "attribution_linear_events",      # linear multi-touch attribution
    "bm25_search_documents",          # Okapi BM25 retrieval
    "epoch_shuffle_documents",        # replayable epoch shuffle
    "revenue_delta_drilldown_orders", # metric delta drill-down
    "streaming_freshness_events",     # streaming freshness twin
    "partition_gaps_events",          # partition-completeness gaps
    "freshness_sla_tables",           # data-freshness SLA monitor
    "merge_upsert_orders",            # MERGE-INTO upsert semantics
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
