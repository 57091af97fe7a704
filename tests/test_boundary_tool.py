"""tools/boundary_check.py must be green in BOTH canonical tree
states (the r12 verdict's rung four of the gate-hygiene ladder: the
boundary tool itself failed noisy AT a boundary, because it
synthesized next round's artifact for the planned gate while the
copy's ``_PRIORITY`` was still un-rotated — a tree state no driver
can produce).

The two states every round passes through:

- MID-ROUND: the builder has rotated ``_PRIORITY`` past what the
  newest CORRECTNESS file certified. The tool synthesizes the
  artifact the driver will land for the live gate and replays.
- AT A BOUNDARY: the newest CORRECTNESS file certifies exactly the
  live gate (the driver just landed it; the rotation is not executed
  yet). The landed artifact already realizes the boundary state, so
  the tool replays a PLAIN copy — no synthesis.

The real repo sits in exactly one of these at any time, so each test
CONSTRUCTS its state in a temp copy and invokes the copy's own
tool: to force a boundary, land the synthesized artifact for the
copy's live gate; to force mid-round, remove the newest artifact
(restoring the pre-landing tree the builder committed). Hygiene-only
mode keeps each invocation to seconds (no SparkSession).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from boundary_check import _copy_tree  # noqa: E402

_SYNTH = """
import json, os, sys
repo = sys.argv[1]
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))
import test_gate_hygiene as G
entrymod, _ = G._registry()
_, current = G._last_certified_round()
gate = list(entrymod.queries())[: entrymod.GATE_SIZE]
rows = {n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None} for n in gate}
with open(os.path.join(repo, f"CORRECTNESS_r{current}.json"), "w") as fh:
    json.dump(rows, fh, indent=1)
print(current)
"""


@pytest.fixture(scope="module")
def repo_copy():
    tmp = tempfile.mkdtemp(prefix="boundary_tool_test_")
    _copy_tree(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_tool(copy: str) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYTHONSTARTUP")
    }
    return subprocess.run(
        [sys.executable, os.path.join(copy, "tools", "boundary_check.py"),
         "--hygiene-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=copy,
    )


def _newest_artifact(copy: str) -> str:
    """Newest CORRECTNESS file by the NUMERIC round in its name —
    lexicographic sorted()[-1] breaks the moment round numbers gain a
    digit (r99 sorts after r100), and the synthesized artifact this
    suite lands is written unpadded."""
    import re

    return max(
        glob.glob(os.path.join(copy, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"r(\d+)", os.path.basename(f)).group(1)),
    )


def _is_boundary(copy: str) -> bool:
    """Same detection the tool uses, computed from the copy's files
    alone: the newest CORRECTNESS artifact names ⊇ the live gate."""
    with open(_newest_artifact(copy)) as fh:
        newest = set(json.load(fh))
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; repo = sys.argv[1]; sys.path.insert(0, repo); "
         "import __spark_entry__ as e; "
         "print('\\n'.join(list(e.queries())[: e.GATE_SIZE]))",
         copy],
        capture_output=True,
        text=True,
        check=True,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    gate = set(out.stdout.split())
    return gate <= newest


def test_boundary_state_is_green_and_synthesizes_nothing(repo_copy):
    """An artifact-landed boundary tree (what every judge and
    next-round builder inherits) must pass boundary-check PLAIN —
    the exact invocation that failed 6 tests in the r12 tree."""
    copy = os.path.join(repo_copy, "at_boundary")
    shutil.copytree(repo_copy, copy, ignore=shutil.ignore_patterns("at_boundary", "mid_round"))
    if not _is_boundary(copy):
        subprocess.run(
            [sys.executable, "-c", _SYNTH, copy],
            check=True,
            capture_output=True,
            env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        )
    assert _is_boundary(copy)
    proc = _run_tool(copy)
    assert "AT the round boundary" in proc.stderr, proc.stderr
    assert "synthesized" not in proc.stderr
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_mid_round_state_is_green_and_synthesizes(repo_copy):
    """A rotated mid-round tree must pass boundary-check WITH the
    synthesized next-artifact landed (the r9-r11 failure class)."""
    copy = os.path.join(repo_copy, "mid_round")
    shutil.copytree(repo_copy, copy, ignore=shutil.ignore_patterns("at_boundary", "mid_round"))
    if _is_boundary(copy):
        os.remove(_newest_artifact(copy))
    assert not _is_boundary(copy)
    proc = _run_tool(copy)
    assert "synthesized CORRECTNESS_r" in proc.stderr, proc.stderr
    assert proc.returncode == 0, proc.stdout + proc.stderr
