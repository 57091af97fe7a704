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
    # --- r9 gate (50 slots, exactly full — the rotation the r8
    # verdict prescribed verbatim): (1) the 11 promoted r8-queue
    # entries, staging order — all green in the judge's own sf0.01
    # queue sweep, now driver-witnessed for the first time. (2) The
    # 38 remaining r3-stamped re-certs (alphabetical = stalest
    # cohort; the age ceiling in tests/test_gate_hygiene.py would
    # fail the build if any r3 stamp survived outside this gate).
    # (3) The single oldest r4 stamp to fill slot 50. The r10 gate
    # then carries the 49 remaining r4 stamps (+1 open slot); r11
    # rides next to the 48 r5 stamps (~2 open slots).
    # --- promoted r8 queue, staging order ---
    "kmv_quantiles_lineitem",          # KMV quantile sketch + rank cert
    "kmv_quantiles_merged_orders",     # KMV merge ≡ direct (bit-exact)
    "kmv_quantiles_grouped_lineitem",  # per-group bounded percentiles
    "streaming_kmv_quantiles_events",  # KMV streaming twin
    "video_avi_container_media",       # RIFF/AVI container invariance
    "streaming_hll_sliding_users_events", # sliding-HLL streaming twin
    "kmv_sliding_quantiles_events",    # trailing-7d percentiles, daily
    "theta_intersection_cells_events", # theta set algebra (batch)
    "streaming_theta_intersection_events", # theta streaming twin
    "span_scrub_documents",            # exact-substring span REMOVAL
    "percentile_contract_lake",        # p95/p99 SLO contract battery
    # --- stalest re-certs: every remaining r3 stamp (38) ---
    "cosine_topk_ivf",
    "cube_lineitem",
    "decode_real_media",
    "decode_synth_media",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
    "entropy_lineitem_columns",
    "fd_check_orders",
    "flatten_struct_events",
    "grouped_percentiles_orders",
    "hash_sample_orders",
    "jdbc_monitor_nation",
    "jdbc_roundtrip_nation",
    "minhash_lsh_pairs",
    "mode_columns_lineitem",
    "ngram_jaccard_pairs_hi",
    "pii_scrub_documents",
    "pipeline_filtered_corpus",
    "pivot_returnflag_linestatus",
    "profile_preview_orders",
    "psi_drift_hourly_events",
    "quality_topk_per_source",
    "repetition_stats_documents",
    "resize_synth_media",
    "rollup_lineitem",
    "salted_group_count_suppkey",
    "set_except_users",
    "set_intersect_users",
    "simhash_documents",
    "source_quota_cap",
    "stratified_sample_orders",
    "streaming_dedup_documents",
    "streaming_near_dup_candidates",
    "streaming_session_events",
    "streaming_sliding_events",
    "top_shingles",
    "topk_orders_per_status",
    "zip_join_nation_supplier",
    # --- oldest r4 stamp (1 of 50; the rest rotate in r10) ---
    "anomaly_hourly_events",
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
