# Build/CI entry points, mirroring the reference's Makefile targets
# (/root/reference/Makefile:1-22: checks, unit-tests, unit-tests-race) in
# this repo's idiom.  There is no compile step: the "build" is JAX tracing,
# exercised by the test suite and the driver entry points.

PYTEST ?= python -m pytest

.PHONY: checks test test-fast test-all bench dryrun native

checks: test-fast

# default: the fast suite (slow-marked scans/compiles excluded via
# pytest.ini addopts) — target <10 min on a warm compile cache
test: test-fast

test-fast:
	$(PYTEST) tests/ -q -n 4

# everything, including slow-marked interpret-mode Pallas compiles and
# full-width final-exp/MSM scans
test-all:
	$(PYTEST) tests/ -q -m "" -n 4

bench:
	python bench.py

dryrun:
	XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# native C++ host engine (auto-built on first import too)
native:
	g++ -O2 -shared -fPIC -o native/_mlt_native.so native/engine.cpp
