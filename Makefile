# Test/bench entry points.
#
# Unit tests run on a virtual 8-device CPU mesh. PALLAS_AXON_POOL_IPS must be
# cleared BEFORE python starts: the baked sitecustomize registers the TPU
# PJRT plugin (claiming the single TPU chip) in every interpreter when that
# var is set, which serializes/deadlocks CPU-only test runs.
TEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench

test:
	$(TEST_ENV) python -m pytest tests/ -x -q

test-fast:
	$(TEST_ENV) python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py
