"""SURVEY.md gate claims are derived, never typed.

The r10 and r11 verdicts each caught a hand-written gate-arithmetic
sentence in SURVEY.md that was true when typed and false at commit
(r10: a wrong r11-window count; r11: "queue EMPTY" while
``len(R7_QUEUE) == 1``). The gate paragraph is now a generated block
(``tools/survey_gates.py``, ``make survey-gates``) and this test fails
the build whenever the committed block differs from a fresh render of
the live tree state — including whenever a driver CORRECTNESS file
lands and advances the round (``make boundary-check`` replays that
state too, so the staleness surfaces before the round ends).

No SparkSession needed: pure registry + file bookkeeping.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def _survey_text() -> str:
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        return fh.read()


def test_survey_has_exactly_one_gate_window_block():
    import survey_gates as SG

    text = _survey_text()
    assert text.count(SG.BEGIN) == 1, "exactly one gate-window begin marker"
    assert text.count(SG.END) == 1, "exactly one gate-window end marker"
    assert text.find(SG.BEGIN) < text.find(SG.END)


def test_survey_gate_window_block_is_current():
    """The committed block must equal a fresh generation from the live
    tree — run ``make survey-gates`` after any rotation, promotion,
    retirement, or driver-artifact landing."""
    import survey_gates as SG

    text = _survey_text()
    b = text.find(SG.BEGIN)
    e = text.find(SG.END) + len(SG.END)
    committed = text[b:e]
    fresh = SG.render_block()
    assert committed == fresh, (
        "SURVEY.md's gate-window block is stale — regenerate it with "
        "`make survey-gates` (tools/survey_gates.py)"
    )


def test_survey_never_hand_types_queue_empty_claims():
    """The drift class itself is banned: outside the generated block,
    SURVEY.md may not make forward 'queue EMPTY / queue is empty'
    arithmetic claims about FUTURE gate windows (past-tense history
    paragraphs name what was executed, which is fine — this guards the
    specific 'the rN window is …, queue EMPTY' form that drifted
    twice)."""
    import re

    import survey_gates as SG

    text = _survey_text()
    b = text.find(SG.BEGIN)
    e = text.find(SG.END) + len(SG.END)
    outside = text[:b] + text[e:]
    bad = re.findall(r"the r\d+ window is[^.]*", outside)
    assert not bad, (
        f"hand-typed forward gate arithmetic in SURVEY.md: {bad} — "
        "this claim class must live in the generated gate-window block"
    )
