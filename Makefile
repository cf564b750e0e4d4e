# Process gates (VERDICT r2: run before every snapshot/commit).
# smoke: seconds — catalog builds, ≤50 entries, oracles PREPARE, entry() runs
# check: the full driver-gate simulation (every query vs DuckDB at sf0.01)
# bench: the BENCH contract at $SPARK_GRAFT_SF_DIR (default sf0.1) — run on
#        an idle machine; concurrent Spark work inflates timings ~2.7x

.PHONY: smoke check bench test

smoke:
	python -m pytest tests/test_smoke.py -q

check:
	python -m pytest tests/ -q

test: check

bench:
	python bench.py
