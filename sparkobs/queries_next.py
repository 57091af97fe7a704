"""Round-10 registry queue — implemented, unit-tested, oracle-ready.

Same staging discipline as the round-6/7/8/9 queues (each promoted in
full, oldest-staged first): entries here are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round and the
round-9 gate is exactly full (the 11 promoted r8-queue entries + the
38 remaining r3-stamped re-certs + the oldest r4 stamp) — registering
more now would create certification debt that
``tests/test_gate_hygiene.py`` rejects. They are held here with their
DuckDB oracles and exercised by ``tests/test_r7_queue.py`` with the
checker's own comparison; promoting one = move its entry into
``queries.py`` with the ``@query`` decorator and a ``_PRIORITY``
slot.

CAPACITY NOTE (r8 verdict item 3): the r10 gate must carry the 49
remaining r4 re-certs, so only ~1 slot is open in r10 and the r11
gate rides next to 48 r5 stamps (~2 slots). Stage accordingly — this
queue should hold at most the sparse-cosine production-tier win entry
(r8 verdict item 2) until the squeeze passes.

``len(R7_QUEUE)`` is authoritative for the queue count (the r6
verdict caught prose drifting; the name stays ``R7_QUEUE`` because
every consumer — tests, checker ``--queue`` mode, the ``_q()``
fallback helpers — resolves the queue through it regardless of which
round staged the entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkobs.io import load_table

R7_QUEUE: dict[str, tuple] = {}


def _queue(name: str, oracle: str | None = None):
    def deco(fn):
        R7_QUEUE[name] = (fn, oracle)
        return fn

    return deco
