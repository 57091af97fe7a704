"""Replay the round boundary BEFORE the round ends: synthesize the
driver artifact this round will produce and run the test suite against
that tree state.

The failure mode this kills (r9, r10, r11 — three consecutive rounds):
the suite is green when the builder commits, then goes red the moment
the driver lands ``CORRECTNESS_r{N}.json``, because some hygiene test
compared against the live ``_PRIORITY`` gate while the artifact's
presence advances the build round by one. The builder never sees that
tree state; every judge and next-round builder does. This tool
manufactures it:

1. Copy the repo to a temp dir (sources, tests, tools, driver
   artifacts; no .git / warehouse / caches).
2. Determine the current build round N (one past the newest
   CORRECTNESS file) and the tree state. MID-ROUND (the live
   ``_PRIORITY`` differs from what the newest CORRECTNESS file
   certified — the builder has rotated): the driver will certify the
   live gate, so synthesize ``CORRECTNESS_r{N}.json`` for it. AT A
   BOUNDARY (the newest artifact certifies exactly the live gate —
   the rotation for round N has not been executed yet): the landed
   artifact already REALIZES the boundary tree state, and the r12
   blind spot was synthesizing anyway — an r{N} artifact naming the
   planned gate next to an un-rotated ``_PRIORITY`` is a tree no
   driver can produce (the driver only certifies the live gate), and
   the hygiene tests rightly reject it. There the copy replays PLAIN,
   no synthesis: green means the inherited boundary state is green;
   rerun after rotating to pre-check the NEXT boundary.
3. Mid-round only: write the synthesized ``CORRECTNESS_r{N}.json``
   certifying the live gate (green hash rows — the optimistic case; a
   real red row is a different failure the oracle sweep owns).
4. Run pytest in the copy. Default: the full suite (what the judge
   runs). ``--hygiene-only``: just the registry/gate bookkeeping tests
   (seconds, no SparkSession) for a fast pre-commit signal.

``tests/test_boundary_tool.py`` pins BOTH tree states (the r12
verdict's rung four: the tool itself failed noisy at the boundary).

Exit code is pytest's. Green here + green in the real tree = the
boundary cannot go red when the driver's artifact lands.

Usage:
    python tools/boundary_check.py [--hygiene-only] [pytest args...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# the hygiene-only subset: pure bookkeeping tests, no SparkSession
HYGIENE_TESTS = [
    "tests/test_gate_hygiene.py",
    "tests/test_survey_claims.py",
]

COPY_SKIP = {
    ".git",
    "spark-warehouse",
    "derby.log",
    "metastore_db",
    ".pytest_cache",
    "__pycache__",
    ".hypothesis",
}


def _copy_tree(dst: str) -> None:
    for name in os.listdir(REPO):
        if name in COPY_SKIP:
            continue
        src = os.path.join(REPO, name)
        out = os.path.join(dst, name)
        if os.path.isdir(src):
            shutil.copytree(
                src,
                out,
                ignore=shutil.ignore_patterns(*COPY_SKIP),
            )
        else:
            shutil.copy2(src, out)


def _this_rounds_gate() -> tuple[int, list[str], bool]:
    """(current build round N, the live gate, at_boundary) — the same
    boundary detection the hygiene tests use. ``at_boundary`` is True
    when the newest CORRECTNESS file certifies exactly the live gate,
    i.e. the round-N rotation has not been executed in this tree yet."""
    import test_gate_hygiene as G

    entrymod, _ = G._registry()
    _, current = G._last_certified_round()
    gate = list(entrymod.queries())[: entrymod.GATE_SIZE]
    return current, gate, set(gate) <= G._newest_round_names()


def main(argv: list[str]) -> int:
    hygiene_only = "--hygiene-only" in argv
    extra = [a for a in argv if a != "--hygiene-only"]

    current, gate, at_boundary = _this_rounds_gate()

    tmp = tempfile.mkdtemp(prefix="boundary_check_")
    try:
        _copy_tree(tmp)
        if at_boundary:
            # The r12 blind spot: synthesizing CORRECTNESS_r{N} for the
            # PLANNED gate while the copy keeps the un-rotated
            # _PRIORITY builds a tree no driver can produce, and the
            # hygiene tests rightly reject it. The landed artifact
            # already realizes the boundary state — replay it plain.
            print(
                f"# boundary-check: tree is AT the round boundary "
                f"(CORRECTNESS_r{current - 1}.json certifies the live "
                f"gate; the r{current} rotation is not executed yet). "
                f"The landed artifact already realizes the boundary "
                f"tree state — replaying the suite on a PLAIN copy, no "
                f"synthesis. Rerun after rotating _PRIORITY to "
                f"pre-check the r{current} boundary.",
                file=sys.stderr,
            )
        else:
            artifact = {
                name: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 1,
                    "oracle_rows": 1,
                    "err": None,
                }
                for name in gate
            }
            path = os.path.join(tmp, f"CORRECTNESS_r{current}.json")
            with open(path, "w") as fh:
                json.dump(artifact, fh, indent=1)
            print(
                f"# boundary-check: synthesized CORRECTNESS_r{current}.json "
                f"({len(gate)} green rows) in {tmp}",
                file=sys.stderr,
            )
        targets = (
            [t for t in HYGIENE_TESTS if os.path.exists(os.path.join(tmp, t))]
            if hygiene_only
            else [
                "tests/",
                # inside the copy, skip the tool's own tests: they
                # copy the copied tree two more times and re-invoke
                # the tool (bounded — the nested runs are
                # --hygiene-only — but each full run then pays three
                # full-tree copies and two nested pytest sessions of
                # pure overhead inside an already-synthesized state;
                # the live suite still runs them)
                "--ignore=tests/test_boundary_tool.py",
            ]
        )
        env = dict(os.environ)
        # the copy must import ITS OWN tree, not the live repo
        env["PYTHONPATH"] = tmp
        env.pop("PYTHONSTARTUP", None)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *targets, "-q", *extra],
            cwd=tmp,
            env=env,
        )
        return proc.returncode
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
