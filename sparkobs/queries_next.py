"""Round-14 registry queue — EMPTY after the r13 promotion.

The r12-staged curation filter funnel
(``filter_funnel_marginals_documents``, EXT-152) promoted into
``queries.py`` for the r13 gate, draining the queue. New stagings
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
