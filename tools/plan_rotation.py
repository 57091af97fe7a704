"""Print the next gate rotation — the exact `_PRIORITY` list to paste.

Mechanizes the planning step the round-start builder does by hand:
promote the staged queue in full (staging order first), then everything
past the certification-age ceiling or never certified, then fill the
remaining slots with the stalest stamps. The state derivation is
imported from tests/test_gate_hygiene.py — including its round-boundary
detection — so this tool can never drift from what the tests enforce.

Run it at ROUND START (right after the driver drops a new
CORRECTNESS_r*.json): it detects the boundary state and plans the
pending promotion. Run mid-round (gate already rebuilt) it plans the
FOLLOWING round instead and says so. Validation of the CURRENT gate is
the hygiene tests' job (`pytest tests/test_gate_hygiene.py`), not this
tool's.

Usage:
    python tools/plan_rotation.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import test_gate_hygiene as G  # noqa: E402


def main() -> int:
    entrymod, Q = G._registry()
    last, current = G._last_certified_round()
    newest = G._newest_round_names()
    stamps, queue, start = G._rotation_state(last, current, newest)
    state = "ROUND BOUNDARY" if start == current else "MID-ROUND"
    threshold = start - G.MAX_CERT_AGE_ROUNDS
    forced = sorted(
        n for n, s in stamps.items() if s < threshold and n not in set(queue)
    )
    try:
        members = G._planned_gate(stamps, queue, start, entrymod.GATE_SIZE)
    except AssertionError as exc:
        print(f"INFEASIBLE: {exc}; retire entries first", file=sys.stderr)
        return 1
    filler = members[len(queue) + len(forced):]
    print(
        f"# {state}: planning the r{start} gate — {len(queue)} promoted "
        f"queue + {len(forced)} forced (stamp < r{threshold} or never "
        f"certified) + {len(filler)} stalest fill = {len(members)} / "
        f"{entrymod.GATE_SIZE}",
        file=sys.stderr,
    )
    if state == "MID-ROUND":
        print(
            "# NOTE: the current _PRIORITY already holds this round's "
            "gate; the list below is the FOLLOWING round's rotation "
            "(queue entries must first move into queries.py).",
            file=sys.stderr,
        )
    from collections import Counter

    hist = Counter(stamps.get(n, 0) for n in members)
    print(f"# member stamp histogram: {sorted(hist.items())}", file=sys.stderr)
    # Rotation-headroom math, explicit (r12 verdict item 5): the
    # rotation can keep every entry within the age ceiling iff
    # registry + pending queue <= GATE_SIZE * MAX_CERT_AGE_ROUNDS.
    # At 299+1 that is 49.83 slots/round of the 50 — every promotion
    # consumes the horizon's slack, so an over-staging mistake must
    # be caught HERE (at staging/planning time), not at gate time.
    ceiling = entrymod.GATE_SIZE * G.MAX_CERT_AGE_ROUNDS
    population = len(Q.SPARK_QUERIES) + len(
        [n for n in G._queue_names() if n not in Q.SPARK_QUERIES]
    )
    headroom = ceiling - population
    print(
        f"# rotation headroom: {headroom} slot(s) spare over the "
        f"{G.MAX_CERT_AGE_ROUNDS}-round horizon ({population} registry"
        f"+queue entries vs the {ceiling}-entry ceiling = "
        f"{population / G.MAX_CERT_AGE_ROUNDS:.2f} forced slots/round "
        f"of {entrymod.GATE_SIZE})",
        file=sys.stderr,
    )
    if headroom < 0:
        print(
            f"OVER-STAGED: registry+queue ({population}) exceeds the "
            f"rotation ceiling ({ceiling}) — greedy rotation cannot "
            "keep every entry within the age ceiling; retire "
            f"{-headroom} entr{'y' if headroom == -1 else 'ies'} first",
            file=sys.stderr,
        )
        return 1
    print("_PRIORITY = [")
    for n in members:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
