# Single build/test entry for pyc2ray-tpu.
#
# The Python package needs no build step (pure Python + JAX). The one
# native component (the C++ oracle / geometry builder, native/) is
# auto-built on first import by pyc2ray_tpu.native_ext; `make native`
# builds it explicitly.

PY ?= python

.PHONY: all native test bench warm clean

all: native

native:
	$(MAKE) -C native

test: native
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# Pre-seed the persistent JAX compile cache for the production configs
# so cold starts (driver bench, sweep rows) become cache hits instead of
# remote-Mosaic-service bills (see docs/TPU_PERFORMANCE_NOTES.md).
warm:
	$(PY) scratch/warm_cache.py

clean:
	$(MAKE) -C native clean 2>/dev/null || rm -f native/*.so native/*.o
