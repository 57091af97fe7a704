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
    # --- r10 gate (50 slots, exactly full — the rotation the r9
    # verdict prescribed verbatim): (1) the 3 promoted r9-queue
    # entries, staging order — all green in the judge's own sf0.01
    # queue sweep, now driver-witnessed for the first time. (2) All
    # 47 remaining r4-stamped re-certs (alphabetical = stalest
    # cohort; the perf-weak `sparse_cosine_pairs_documents` was
    # RETIRED this round per the r9 verdict, shrinking the r4 cohort
    # from 48 to 47 so the gate closes exactly). The r11 gate then
    # carries the 48 r5 stamps + the staged queue (≤2 open slots).
    # --- promoted r9 queue, staging order ---
    "sparse_cosine_powerlaw_exact",    # quadratic-head comparison leg
    "sparse_cosine_powerlaw_pruned",   # absolute-df-cap production tier
    "monitor_suite_slo_lake",          # percentile-SLO capstone suite
    # --- stalest re-certs: every remaining r4 stamp (47) ---
    "audio_frame_rms_media",
    "bigram_ppl_documents",
    "bloom_probe_documents",
    "bloom_semi_join_lineitem_orders",
    "bpe_merges_documents",
    "bpe_tokenize_documents",
    "bucketed_join_orders_lineitem",
    "canonical_dedup_documents",
    "cms_vocab_estimates",
    "cohort_retention_events",
    "contract_checks_orders",
    "curation_funnel_documents",
    "ewma_hourly_events",
    "fk_orphans_lineitem",
    "funnel_events",
    "fuzzy_match_supplier_customer",
    "hashed_vectors_documents",
    "heavy_hitters_tokens_documents",
    "hist_quantiles_lineitem",
    "hll_distinct_lineitem",
    "hll_grouped_users_by_type",
    "inverted_index_documents",
    "line_dedup_documents",
    "markov_stationary_events",
    "markov_transitions_events",
    "near_dup_groups_documents",
    "near_dup_groups_lsh",
    "pack_sequences_documents",
    "partitioned_prune_documents",
    "profile_lineitem_approx",
    "quantile_bins_lineitem",
    "quantize_embeddings_vectors",
    "resample_locf_events",
    "retention_purge_events",
    "schema_merge_parquet_documents",
    "search_and_documents",
    "session_stats_events",
    "streaming_cdc_latest_events",
    "streaming_cms_events",
    "streaming_incremental_band_index",
    "streaming_join_click_purchase",
    "table_diff_orders",
    "tfidf_topk_documents",
    "upsample_mixture_documents",
    "vocab_jsd_documents",
    "winsorize_events_by_type",
    "zorder_tiles_events",
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
