# sparkobs developer targets. The driver gate certifies only the first
# 50 registry entries per round; `make sweep` runs the FULL registry
# through the DuckDB oracle so entries outside the gate window cannot
# silently rot.

.PHONY: test sweep gate bench bench-baseline smoke verify \
        boundary-check boundary-check-fast survey-gates

test:
	python -m pytest tests/ -x -q

sweep:
	python tools/check_oracle.py

gate:
	python tools/check_oracle.py /root/testdata/sf0.01 --gate

bench:
	python bench.py

# freeze the current full bench table as the regression baseline
# (tests/test_bench_tripwire.py compares future runs against it).
# REFRESH POLICY (see BASELINE.md "Baseline refresh policy"): refresh
# ONLY after a tools/bench_compare.py-verified plan win >=5% on named
# rows — never on a flat or drift-only round, or the tripwire's
# reference would silently track every slow leak.
bench-baseline:
	cp BENCH_full.json BENCH_baseline.json

# replay the round boundary BEFORE the round ends: mid-round,
# synthesize the CORRECTNESS_r{N}.json the driver will land for the
# live gate, drop it in a temp copy of the tree, and run the FULL
# suite there (the tree state every judge and next-round builder
# evaluates — green here means the boundary cannot go red when the
# artifact lands). At an artifact-landed BOUNDARY (rotation not yet
# executed) the landed artifact already realizes that state, so the
# copy replays PLAIN — synthesizing there built an impossible tree
# and went spuriously red (r12 verdict item 1;
# tests/test_boundary_tool.py pins both states).
# boundary-check-fast runs just the bookkeeping tests (seconds, no
# SparkSession) for a quick pre-commit signal.
boundary-check:
	python tools/boundary_check.py

boundary-check-fast:
	python tools/boundary_check.py --hygiene-only

# regenerate SURVEY.md's gate-window paragraph from the rotation
# planner (kills the hand-typed forward-arithmetic drift class;
# tests/test_survey_claims.py asserts the block is current)
survey-gates:
	python tools/survey_gates.py

smoke:
	python -c "from sparkobs.session import get_spark; import __spark_entry__ as e; print(e.entry(get_spark('smoke')).count())"

# boundary-check-fast is part of verify: the bookkeeping tests are
# seconds, and the r9-r11 streak proved commit-time green is
# meaningless unless the synthesized-artifact tree state is green too
verify: test sweep smoke boundary-check-fast
