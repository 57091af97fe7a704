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
    # --- r11 gate (50 slots, exactly full — tools/plan_rotation.py
    # output, the same derivation tests/test_gate_hygiene.py
    # enforces): (1) the 3 promoted r10-queue entries, staging order
    # (grouped theta batch + streaming twin sharing one oracle, and
    # the sampled-CI AQP entry — the registry's 300th and last
    # net-new slot). (2) The 47 stalest r5-stamped re-certs
    # (alphabetical within the cohort). The r12 gate then carries
    # the 1 remaining r5 stamp (forced) + 49 r6 re-certs; the queue
    # is EMPTY — future additions are retire-then-stage swaps.
    # --- promoted r10 queue, staging order ---
    "theta_intersection_grouped_events",
    "streaming_theta_intersection_grouped_events",
    "sampled_agg_ci_orders",
    "bpe_merges_batched_documents",
    "bucket_monitor_metrics",
    "cdc_agg_maintain_events",
    "cdc_compact_events",
    "collect_metric_lists_supplier",
    "corr_matrix_lineitem",
    "csv_roundtrip_orders",
    "customer_distribution_q13",
    "dup_span_coverage_documents",
    "forecast_revenue_q6",
    "global_sales_opportunity_q22",
    "gopher_quality_documents",
    "gram_matrix_embeddings",
    "group_sample_orders_by_status",
    "join_size_lineitem_orders",
    "jsonl_roundtrip_events",
    "key_skew_stats_lineitem",
    "large_orders_q18",
    "late_shipment_priority_q4",
    "listing_key_metrics",
    "listing_prefix_stats",
    "listing_storage_stats",
    "local_supplier_volume_q5",
    "minhash_lsh_pairs_xx64",
    "monitor_health_events",
    "normalize_text_documents",
    "orc_roundtrip_part",
    "pack_manifest_documents",
    "pca_project_embeddings",
    "pivot_priority_by_status",
    "promo_revenue_q14",
    "range_join_value_bands",
    "returned_items_q10",
    "rollup_revenue_region_nation",
    "sample_scan",
    "semantic_dedup_embeddings",
    "semantic_dedup_ivf_embeddings",
    "shipping_priority_q3",
    "split_assign_documents",
    "storage_capacity_stats",
    "streaming_jsonl_tumbling_events",
    "streaming_monitor_health_events",
    "token_entropy_documents",
    "top_customers_per_nation",
    "vocab_topk_documents",
    "volume_shipping_q7",
    "winnowing_fingerprints_documents",
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
