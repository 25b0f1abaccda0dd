# Common workflows

.PHONY: test test-sharding test-full bench dryrun native clean

# Fast tier: unit/ops/convert/config/native/synthetic tests (< 1 min)
test:
	python -m pytest tests/ -x -q -m "not slow"

# The 8-virtual-device data-parallel GAN-step test (compile-heavy)
test-sharding:
	python -m pytest tests/test_train.py::test_train_step_data_parallel -x -q

# Everything, including compile-heavy model/training/pipeline tests
test-full:
	python -m pytest tests/ -x -q

# Headline benchmark on the attached TPU (prints one JSON line)
bench:
	python bench.py

# Multi-chip sharding validation on virtual CPU devices
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py 8

# Build the native data-IO library explicitly (also built on first use)
native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread \
		native/promonet_io.cpp -o native/promonet_io.so

clean:
	rm -f native/promonet_io.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
