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
    print("_PRIORITY = [")
    for n in members:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
