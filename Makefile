# Convenience targets. `make parity` is the round-start check: it
# detects a populated /root/reference and, when present, re-runs the
# BASELINE.md protocol on the REAL data plus SURVEY-citation and
# copy-check spot checks (PARITY_RUN.{md,json}). On an empty mount it
# prints one status line and exits 0.

.PHONY: parity test bench dryrun

parity:
	python parity_check.py

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8); print('OK')"
