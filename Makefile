# Build/test entry points, mirroring the reference's Makefile targets
# (/root/reference/Makefile:10-27: lint, test, inttest, bench) for the
# TPU-native framework.  Tests force the virtual 8-device CPU mesh
# (tests/conftest.py); the bench talks to the real TPU.

PY ?= python

.PHONY: all test inttest lint bench native clean

all: test

# unit + property tests (fast subset; excludes the big-circuit compiles)
test:
	$(PY) -m pytest tests/ -q -m "not slow"

# full integration tests: end-to-end circuits and the UDS server round trip
# (the reference's `make inttest` = serialized release-mode integration hook,
# Makefile:14-15; real coverage lived in scripts/test-go.sh).  One pytest
# process PER FILE: the XLA CPU compiler has a cumulative-state segfault
# after many huge in-process compiles (modules that compile fine in a fresh
# process crash after the prover modules; probed round 5) — per-file
# processes bound the compile load.
inttest:
	set -e; for f in tests/test_*.py; do $(PY) -m pytest $$f -q; done

lint:
	$(PY) -m compileall -q dusk_blindbidproof_tpu tests benchmarks scripts

# headline benchmark (BASELINE.md config 1/4): prints one JSON line
bench:
	$(PY) bench.py

# native host core (C++ STROBE/Keccak; built lazily by utils/native.py too)
native:
	$(MAKE) -C native

clean:
	rm -f native/libbbnative.so
	find . -name __pycache__ -type d -exec rm -rf {} +
