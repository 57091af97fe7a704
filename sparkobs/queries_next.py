"""Round-13 registry queue — ONE swap entry (curation filter funnel).

The r11-staged join-side AQP entry promoted into ``queries.py`` for
the r12 gate; this round then executed the SURVEY §2.11 swap ledger's
entry #1 — ``near_dup_groups_documents`` retired with a tombstone
(its exact-tier pipeline keeps a driver witness through
``canonical_dedup_documents``, which composes the identical
``near_dup_groups(n=3, threshold=0.2)`` call, plus the
groups≡pairs-closure unit tests) — and staged ``filter_funnel``
below into the freed slot.

Same staging discipline as the round-6..12 queues (each promoted in
full, oldest-staged first): entries here are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round —
registering more than the rotation can absorb would create
certification debt that ``tests/test_gate_hygiene.py`` rejects.
Staged entries are held here with their DuckDB oracles and exercised
by ``tests/test_r7_queue.py`` with the checker's own comparison;
promoting one = move its entry into ``queries.py`` with the
``@query`` decorator and a ``_PRIORITY`` slot.

REGISTRY CEILING: GATE_SIZE (50) × MAX_CERT_AGE_ROUNDS (6) = 300 —
more registry entries than that and greedy rotation mathematically
cannot keep every entry's stamp within the age ceiling
(ceil(301/50) = 7 > 6). The r12 promotion of
``sampled_join_agg_ci_lineitem`` took the registry to exactly 300,
so EVERY future staging is a swap: retire a registry entry with a
tombstone FIRST (the discipline the r9 sparse-cosine retirement
established — candidates are pre-ranked in SURVEY.md §2.11's swap
ledger), then stage the replacement here. The rotation-feasibility
tests (including the promotion-aware boundary fixtures and
``make boundary-check``) enforce this mechanically — run them with
the newest driver CORRECTNESS file present before committing a
staged entry.

``len(R7_QUEUE)`` is authoritative for the queue count (the r6
verdict caught prose drifting; the name stays ``R7_QUEUE`` because
every consumer — tests, checker ``--queue`` mode, the ``_q()``
fallback helpers — resolves the queue through it regardless of which
round staged the entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco


# --- curation filter-funnel audit (r12 swap: the slot freed by the
# near_dup_groups_documents retirement, tombstone in queries.py) ------
# Operator: text.filter_funnel — ordered filter-chain removal audit
# in ONE corpus scan (per rule: corpus-wide failures, marginal
# failures at chain position, running survivors; 3·k map-side
# conditional sums, 1-row agg exploded to k rows). The rules below are
# portable SQL (comparisons / LIKE / length-replace word count), so
# the DuckDB oracle replays the funnel verbatim, including the
# row-by-row invariant n_survivors[k-1] − n_failing_marginal[k] =
# n_survivors[k]. NULL conditions count as FAIL on both engines
# (coalesce(cond, false) — the curation-safe default, unit-pinned).

_FUNNEL_RULES = [
    ("min_chars", "n_chars >= 150"),
    ("english", "lang = 'en'"),
    (
        "min_words",
        "length(text) - length(replace(text, ' ', '')) + 1 >= 40",
    ),
    ("mentions_query", "text LIKE '%query%'"),
]


@_queue(
    "filter_funnel_marginals_documents",
    oracle="""
    WITH p AS (SELECT
        coalesce(n_chars >= 150, false) AS p1,
        coalesce(lang = 'en', false) AS p2,
        coalesce(length(text) - length(replace(text, ' ', '')) + 1 >= 40,
                 false) AS p3,
        coalesce(text LIKE '%query%', false) AS p4
      FROM documents),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN NOT p2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        CAST(sum(CASE WHEN p1 AND NOT p2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
        CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        CAST(sum(CASE WHEN NOT p3 THEN 1 ELSE 0 END) AS BIGINT) AS f3,
        CAST(sum(CASE WHEN p1 AND p2 AND NOT p3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
        CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        CAST(sum(CASE WHEN NOT p4 THEN 1 ELSE 0 END) AS BIGINT) AS f4,
        CAST(sum(CASE WHEN p1 AND p2 AND p3 AND NOT p4 THEN 1 ELSE 0 END) AS BIGINT) AS m4,
        CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
      FROM p)
    SELECT 1 AS step, 'min_chars' AS rule, n AS n_input, f1 AS n_failing,
           m1 AS n_failing_marginal, s1 AS n_survivors FROM a
    UNION ALL SELECT 2, 'english', n, f2, m2, s2 FROM a
    UNION ALL SELECT 3, 'min_words', n, f3, m3, s3 FROM a
    UNION ALL SELECT 4, 'mentions_query', n, f4, m4, s4 FROM a
    """,
)
def filter_funnel_marginals_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered filter-funnel audit over the documents corpus
    (extension EXT-152: which curation rule removes what, marginally
    at its chain position, and what survives — the audit every 100 TB
    filter chain needs before committing; one scan, 3·k conditional
    aggregates). Oracle replays the identical predicate chain and
    funnel arithmetic in DuckDB."""
    from sparkobs.io import load_table
    from sparkobs.operators.text import filter_funnel

    return filter_funnel(
        load_table(spark, sf_dir, "documents"), _FUNNEL_RULES
    )
