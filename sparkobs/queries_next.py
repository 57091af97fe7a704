"""Round-14 registry queue — 1 entry, staged by r13 swap-ledger #2.

The r12-staged curation filter funnel
(``filter_funnel_marginals_documents``, EXT-152) promoted into
``queries.py`` for the r13 gate, draining the queue; the r13
retirement of ``minhash_xx64_parity_documents`` (tombstone in
``queries.py``, three test witnesses carry its claim) freed the slot
now staged to ``funnel_pipeline_parity_documents`` — the
funnel↔pipeline certification twin the r12 verdict suggested
(stretch item 8): two independent implementations of one contract,
``filter_funnel``'s one-scan running-survivor arithmetic vs the
curation capstone's per-stage checkpointed counts. New stagings
follow the swap discipline below: the registry sits at the rotation
ceiling, so a slot must be freed by a tombstoned retirement (the
pre-ranked candidates live in SURVEY.md §2.11's swap ledger) before
an entry lands here.

Same staging discipline as the round-6..13 queues (each promoted in
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
(the discipline the r11 sparse-cosine and r12 near-dup-groups
retirements established), then stage the replacement here. The
rotation-feasibility tests (including the promotion-aware boundary
fixtures and ``make boundary-check``) enforce this mechanically —
run them with the newest driver CORRECTNESS file present before
committing a staged entry.

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


def _funnel_parity_oracle() -> str:
    """The oracle replays the ENTIRE contract independently: the
    curation pipeline's survivor sets via the same CTE text the
    certified ``curation_funnel_documents`` oracle uses (shared
    constant — the two certifications cannot drift apart), then the
    funnel arithmetic over the nested membership flags. Membership
    sets are nested (surv ⊆ ex_kept ⊆ kept ⊆ raw), so corpus-wide
    failing = n - c_k, marginal failing = c_{k-1} - c_k, and running
    survivors = c_k = the pipeline's own stage count."""
    from sparkobs.queries import _CURATION_CTES

    return (
        "WITH RECURSIVE "
        + _CURATION_CTES
        + """,
    c AS (SELECT CAST((SELECT count(*) FROM raw) AS BIGINT) AS n,
                 CAST((SELECT count(*) FROM kept) AS BIGINT) AS c1,
                 CAST((SELECT count(*) FROM ex_kept) AS BIGINT) AS c2,
                 CAST((SELECT count(*) FROM surv) AS BIGINT) AS c3)
    SELECT 1 AS step, 'quality_kept' AS rule, n AS n_input,
           n - c1 AS n_failing, n - c1 AS n_failing_marginal,
           c1 AS n_survivors, c1 AS n_docs_pipeline FROM c
    UNION ALL SELECT 2, 'exact_survivor', n, n - c2, c1 - c2, c2, c2 FROM c
    UNION ALL SELECT 3, 'near_dup_survivor', n, n - c3, c2 - c3, c3, c3 FROM c
    """
    )


@_queue("funnel_pipeline_parity_documents", oracle=_funnel_parity_oracle())
def funnel_pipeline_parity_documents(spark, sf_dir: str):
    """Certification twin (r13 swap-ledger #2 successor, r12 verdict
    stretch 8): run the EXT-152 ``filter_funnel`` audit over the SAME
    pipeline ``curation_funnel_documents`` executes — per-doc
    membership flags in each stage's survivor set (quality-kept →
    exact-deduped → near-dup-kept, derived from the identical
    checkpointed stage frames the capstone builds) — and certify that
    the funnel's one-scan running-survivor arithmetic reproduces the
    capstone's per-stage audit counts exactly
    (``n_survivors == n_docs_pipeline`` row by row). Two independent
    counting implementations of one contract: 3·k conditional sums
    over one flag scan vs per-stage direct aggregation over
    checkpointed frames. The flags are nested memberships, so the
    funnel's corpus-wide/marginal split is also pinned: corpus-wide
    failing ≡ marginal-at-position + earlier-stage losses. The stage
    frames come from the SAME ``_curation_stage_frames`` helper the
    capstone calls (and the oracle from the same ``_CURATION_CTES``
    text), so retuning the pipeline cannot drift the twin and the
    capstone apart on either engine side.

    Scale shape: the pipeline cost is the capstone's own (the exact
    n-gram tier is the certified-composition point; the LSH tier is
    the documented 100 TB swap); the funnel adds ONE scan over a
    3-boolean frame and the stage counts re-read eagerly checkpointed
    frames — no recomputation, no extra shuffle beyond three 1-row
    aggregates. Reference analogue: the reference ships per-monitor
    check counts (s3_key_monitor.py:141-220) but never cross-checks
    two audit paths; this entry makes the cross-check itself the
    certified value."""
    from pyspark.sql import functions as F

    from sparkobs.operators.text import filter_funnel
    from sparkobs.queries import _curation_stage_frames

    raw, kept, ex_kept, surv = _curation_stage_frames(spark, sf_dir)

    flags = (
        raw.select("doc_id")
        .join(
            kept.select("doc_id", F.lit(True).alias("q_kept")),
            "doc_id",
            "left",
        )
        .join(
            ex_kept.select("doc_id", F.lit(True).alias("x_kept")),
            "doc_id",
            "left",
        )
        .join(
            surv.select("doc_id", F.lit(True).alias("n_kept")),
            "doc_id",
            "left",
        )
    )
    funnel = filter_funnel(
        flags,
        [
            ("quality_kept", "q_kept"),
            ("exact_survivor", "x_kept"),
            ("near_dup_survivor", "n_kept"),
        ],
    )

    def stage_count(idx: int, d) -> "object":
        return d.agg(
            F.lit(idx).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_docs_pipeline"),
        )

    stages = (
        stage_count(1, kept)
        .unionAll(stage_count(2, ex_kept))
        .unionAll(stage_count(3, surv))
    )
    return funnel.join(stages, "step").select(
        "step",
        "rule",
        "n_input",
        "n_failing",
        "n_failing_marginal",
        "n_survivors",
        "n_docs_pipeline",
    )
