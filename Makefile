# Developer entry points.
#
# The session environment boots an axon TPU tunnel in every python process
# (sitecustomize); for CPU-only test runs we bypass it for fast startup.
TEST_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu

# fast tier: the iteration gate (unit + small integration, target < 3 min)
test:
	$(TEST_ENV) python -m pytest tests/ -x -q -m "not slow"

# full gate: everything incl. long-running integration tests (~20 min)
test-all:
	$(TEST_ENV) python -m pytest tests/ -x -q

bench:
	python bench.py

.PHONY: test test-all bench
