# Developer surface for lbfgspp_tpu (the reference ships CMake + Bazel +
# BCR presubmit, /root/reference/CMakeLists.txt, BUILD.bazel, .bcr/; the
# Python-framework analog is this Makefile + pyproject.toml + CI matrix).

PY ?= /opt/venv/bin/python

.PHONY: test test-par test-fast bench native wheel install-check examples \
	scaling clean

# Full suite: CPU, f64, 8 virtual devices (as CI runs it).
test:
	$(PY) -m pytest tests/ -q

# Full suite on 4 xdist workers (~3x faster; same 525 tests).
test-par:
	$(PY) -m pytest tests/ -q -n 4

# Quick signal: solver cores + acceptance anchors only.
test-fast:
	$(PY) -m pytest tests/test_lbfgs.py tests/test_lbfgsb.py \
	    tests/test_acceptance.py tests/test_readme_anchor.py -q

# One JSON line; runs on the default backend (TPU when available).
bench:
	$(PY) bench.py

# Force a rebuild of the native C++ core (also self-builds on import).
native:
	rm -f lbfgspp_tpu/native/libnative.so
	$(PY) -c "import lbfgspp_tpu.native as n; assert n.available(), n.build_error()"

# Build a wheel (offline; setuptools only).
wheel:
	$(PY) -m pip wheel --no-deps --no-build-isolation -w dist .

# Install the wheel into a clean target dir and drive it from OUTSIDE the
# repo: import, solve, and the self-building native core must all work
# from the installed artifact alone (catches missing package-data such as
# native/*.cpp).
install-check: wheel
	rm -rf build/wheeltest && mkdir -p build/wheeltest
	$(PY) -m pip install --no-deps --no-index -q \
	    --target build/wheeltest dist/*.whl
	cd /tmp && PYTHONPATH=$(CURDIR)/build/wheeltest \
	    $(PY) $(CURDIR)/scripts/install_check.py $(CURDIR)/build/wheeltest

# The examples are the reference's acceptance programs (examples/*.cpp):
# they assume f64, so run them on CPU with an 8-virtual-device mesh
# (sharded_logreg adapts to jax.device_count()).  PYTHONPATH is REPLACED,
# not extended, on purpose: dropping this host's axon site dir is what
# lets JAX_PLATFORMS=cpu stick (its sitecustomize pins the TPU backend).
examples:
	for e in examples/*.py; do echo "== $$e"; \
	    PYTHONPATH=$(CURDIR) JAX_PLATFORMS=cpu \
	    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
	    $(PY) $$e || exit 1; done

scaling:
	$(PY) scripts/bench_scaling.py

clean:
	rm -rf dist build *.egg-info lbfgspp_tpu/__pycache__
