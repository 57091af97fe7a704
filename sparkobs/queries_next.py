"""Round-15 registry queue — 1 entry, staged by r14 swap-ledger #4.

The r13-staged funnel↔pipeline certification twin
(``funnel_pipeline_parity_documents``) promoted into ``queries.py``
for the r14 gate, draining the queue; the r14 retirement of
``ann_recall_embeddings`` (tombstone in ``queries.py``, pinned
sf0.01 witness test carries its claim) freed the slot now staged to
``km_survival_quantized_events`` — the bounded-state form of the
Kaplan–Meier operator over CONTINUOUS (raw integer-microsecond)
durations, certifying the r14 ``duration_grid`` parameter
end-to-end against an independent DuckDB replay. New stagings
follow the swap discipline below: the registry sits at the rotation
ceiling, so a slot must be freed by a tombstoned retirement (the
pre-ranked candidates live in SURVEY.md §2.11's swap ledger) before
an entry lands here.

Same staging discipline as the round-6..14 queues (each promoted in
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
(ceil(301/50) = 7 > 6). The registry holds exactly 300, so EVERY
staging is a swap: retire a registry entry with a tombstone FIRST
(the discipline the r11 sparse-cosine, r12 near-dup-groups, r13
minhash-parity, and r14 ann-recall retirements established), then
stage the replacement here. The rotation-feasibility tests
(including the promotion-aware boundary fixtures and ``make
boundary-check``) enforce this mechanically — run them with the
newest driver CORRECTNESS file present before committing a staged
entry.

``len(R7_QUEUE)`` is authoritative for the queue count (the r6
verdict caught prose drifting; the name stays ``R7_QUEUE`` because
every consumer — tests, checker ``--queue`` mode, the ``_q()``
fallback helpers — resolves the queue through it regardless of which
round staged the entries).
"""

from __future__ import annotations

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco


_KM_QUANT_ORACLE = """
    WITH spans AS (
      SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
      FROM events GROUP BY 1),
    e AS (SELECT max(epoch_us(ts)) AS obs_end FROM events),
    durs AS (
      SELECT ((t1 - t0) // 86400000000) * 86400000000 AS t,
             CASE WHEN t1 < obs_end - 1 * 86400000000 THEN 1 ELSE 0 END AS obs
      FROM spans CROSS JOIN e),
    hist AS (SELECT t, count(*) AS n_t, sum(obs) AS d_t FROM durs GROUP BY 1),
    tot AS (SELECT count(*) AS n_total FROM durs),
    steps AS (
      SELECT t, n_t, d_t,
             n_total - coalesce(sum(n_t) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS n_at_risk
      FROM hist CROSS JOIN tot),
    logged AS (
      SELECT t, d_t, n_at_risk,
             CASE WHEN n_at_risk > d_t
                  THEN CAST(floor(ln((n_at_risk - d_t)
                                     / CAST(n_at_risk AS DOUBLE)) * 1e8)
                            AS BIGINT)
             END AS lu
      FROM steps),
    cum AS (
      SELECT t, d_t, n_at_risk,
             sum(lu) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cu
      FROM logged)
    SELECT CAST(t AS BIGINT) AS duration_us,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d_t AS BIGINT) AS n_deaths,
           CASE WHEN n_at_risk > d_t THEN round(exp(cu / 1e8), 4)
                ELSE 0.0 END AS survival
    FROM cum WHERE d_t > 0
    """


@_queue("km_survival_quantized_events", oracle=_KM_QUANT_ORACLE)
def km_survival_quantized_events(spark, sf_dir: str):
    """Bounded-state Kaplan–Meier over CONTINUOUS durations (r14
    swap-ledger #4 successor; certifies the r14 ``duration_grid``
    parameter end-to-end): per-user lifetimes enter as RAW
    integer-microsecond spans — the input whose distinct-count
    approaches subject count, the degenerate regime the r13 verdict's
    watch item 3 flagged for the step-table window — and
    ``km_survival(duration_grid=day_us)`` floor-snaps them to
    whole-day bucket edges INSIDE the operator, capping the step
    table (and the single global window over it) at range/grid rows
    regardless of corpus size. Censoring matches the certified
    ``km_survival_events`` entry (1-day horizon); durations stay in
    microseconds (bucket lower edges, day multiples), so the curve is
    that entry's with the time axis in µs — but computed from the
    UNQUANTIZED durations frame through the new parameter, which is
    exactly the claim needing certification. Oracle: full independent
    DuckDB replay (grid snap in SQL + the integer-quantized log-space
    cumulative product the km family uses for cross-engine
    exactness). Reference analogue: the reference ships retention-
    style aggregations only (sql_table_monitor.py:61-75 row-count
    trends); the censoring-aware lifetime view is an extension."""
    from sparkobs.io import load_table
    from sparkobs.operators.behavior import churn_durations, km_survival

    durs = churn_durations(
        load_table(spark, sf_dir, "events"),
        "user_id",
        "ts",
        1,
        day_quantize=False,
    )
    return km_survival(
        durs, duration_grid=86_400_000_000
    ).withColumnRenamed("duration", "duration_us")
