# Process gates (VERDICT r2: run before every snapshot/commit).
# smoke: seconds — catalog builds (50-gate window + documented overflow),
#        oracles PREPARE, entry() runs
# check: the full driver-gate simulation (every query vs DuckDB at sf0.01)
# bench: the BENCH contract at $SPARK_GRAFT_SF_DIR (default sf0.1) — run on
#        an idle machine; concurrent Spark work inflates timings ~2.7x

.PHONY: smoke check bench test exact scale bpe-vocab

# opt-in scale probe (not a driver contract): 500k synthetic vectors +
# 200k synthetic docs; run on an idle machine
scale:
	python bench_scale.py 500000 64 200000

# opt-in BPE realistic-vocabulary probe (r7): zipfian corpus with
# >=500k distinct words; per-merge cost + apply throughput (BASELINE.md)
bpe-vocab:
	python bench_bpe_vocab.py 250000 10

smoke:
	python -m pytest tests/test_smoke.py -q

# bit-level oracle comparison of every gated query (the strictest form
# of the driver's sha256-of-CSV hash check); also runs inside `check`
# via tests/test_catalog.py
exact:
	python -m tests.exact_compare

check:
	python -m pytest tests/ -q

test: check

# Idle-run discipline (VERDICT r7 #8): the headline is min-of-5 with
# p25/median emitted alongside; run with NOTHING else on the box —
# concurrent Spark work (the suite, a probe) inflates medians 1.3-2.7x
# while minima move less, which reads as a phantom regression.
bench:
	python bench.py
