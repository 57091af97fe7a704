"""Round-9 registry queue — implemented, unit-tested, oracle-ready.

Same staging discipline as the round-6/7/8 queues (each promoted in
full, oldest-staged first): entries here are NOT in
``sparkobs.queries.SPARK_QUERIES`` yet because the driver certifies
only the first ``GATE_SIZE`` (50) registry entries per round and the
round-8 gate is exactly full (the 24 promoted r7-queue entries +
market_share_q8's changed-text re-cert + the 25 stalest registry
entries) — registering more now would create certification debt that
``tests/test_gate_hygiene.py`` rejects. They are held here with their
DuckDB oracles and exercised by ``tests/test_r7_queue.py`` with the
checker's own comparison; promoting one = move its entry into
``queries.py`` with the ``@query`` decorator and a ``_PRIORITY``
slot.

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
