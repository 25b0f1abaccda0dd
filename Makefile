# Common workflows

.PHONY: test bench dryrun native clean

# Full test suite on an 8-device virtual CPU mesh
test:
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
