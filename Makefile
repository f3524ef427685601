# Development targets (reference Makefile parity)

# fast CI lane: excludes compile-heavy `slow` tests (interpret-mode Pallas
# kernels, saddle search) so it stays bounded on CPU; `make test-all` is the
# full suite (reference Makefile:15-23 marker-split scheme).
# Measured lane time: ~13 min for 215 tests on a 1-vCPU dev box (2026-08-19).
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

test-slow:
	python -m pytest tests/ -q -m slow

test-fast:
	python -m pytest tests/test_ops.py tests/test_physics.py tests/test_train.py -q

test-parity:
	python -m pytest tests/test_parity_core.py tests/test_binned.py tests/test_pbc.py -q

bench:
	python bench.py

bench-small:
	BENCH_ATOMS=2000 BENCH_STEPS=60 python bench.py

entry-check:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"
