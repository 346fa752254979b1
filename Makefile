# Development targets.

PYTHON ?= python

.PHONY: test test-fast bench bench-quick bench-vaf bench-check \
	bench-solvers bench-fit bench-e2e bench-export bench-all lint doctest \
	check docs-exec entry native dist clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x --ignore=tests/test_parallel.py

lint:  # stdlib-only static checks (see scripts/lint.py)
	$(PYTHON) scripts/lint.py

doctest:  # run every docstring example (the reference's --doctest-modules gate)
	JAX_PLATFORMS=cpu $(PYTHON) -m pytest --doctest-modules \
		muscle_synergies_tpu muscle_synergies -q -p no:cacheprovider

check: lint  # full static gate: lint + bytecode-compile + optional mypy/pylint
	$(PYTHON) -m compileall -q muscle_synergies_tpu muscle_synergies \
		tests scripts benchmarks examples bench.py __graft_entry__.py
	@command -v mypy >/dev/null 2>&1 \
		&& mypy --ignore-missing-imports muscle_synergies_tpu \
		|| echo "mypy not installed; skipped"

docs-exec:  # executable documentation: example script + tutorial notebook
	JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
		$(PYTHON) examples/full_workflow.py --platform cpu
	$(PYTHON) scripts/gen_tutorial_nb.py  # notebook follows tutorial.md
	JAX_PLATFORMS=cpu TUTORIAL_FORCE_PLATFORM=cpu \
		XLA_FLAGS="--xla_force_host_platform_device_count=8" \
		$(PYTHON) scripts/exec_tutorial.py

bench:
	$(PYTHON) bench.py

bench-quick:
	$(PYTHON) bench.py --quick

bench-vaf:  # BASELINE.md's second metric: time-to-90%-VAF
	$(PYTHON) bench.py --metric vaf --rank 2 | tee BENCH_VAF.json

bench-check:  # on-device Pallas kernel numerics vs float64 references
	$(PYTHON) bench.py --check | tee BENCH_CHECK.json

bench-solvers:  # per-solver throughput rows (mu, cd, kl, is, cnmf, nm3f) -> artifact
	$(PYTHON) bench.py --solver mu > BENCH_SOLVERS.json
	$(PYTHON) bench.py --solver cd >> BENCH_SOLVERS.json
	$(PYTHON) bench.py --solver kl >> BENCH_SOLVERS.json
	$(PYTHON) bench.py --solver is >> BENCH_SOLVERS.json
	$(PYTHON) bench.py --solver cnmf >> BENCH_SOLVERS.json
	$(PYTHON) bench.py --solver nm3f >> BENCH_SOLVERS.json
	cat BENCH_SOLVERS.json

bench-fit:  # full convergence-fit wall time per solver -> artifact
	$(PYTHON) bench.py --metric fit --solver mu > BENCH_FIT.json
	$(PYTHON) bench.py --metric fit --solver cd >> BENCH_FIT.json
	$(PYTHON) bench.py --metric fit --solver kl >> BENCH_FIT.json
	$(PYTHON) bench.py --metric fit --solver is >> BENCH_FIT.json
	$(PYTHON) bench.py --metric fit --solver cnmf >> BENCH_FIT.json
	$(PYTHON) bench.py --metric fit --solver nm3f >> BENCH_FIT.json
	cat BENCH_FIT.json

bench-e2e:  # head-to-head full workflow vs the reference impl (same core)
	$(PYTHON) benchmarks/end_to_end.py --platform cpu | tee BENCH_E2E.json
	$(PYTHON) benchmarks/end_to_end.py --platform cpu --dataset 6 \
		| tee -a BENCH_E2E.json
	$(PYTHON) benchmarks/end_to_end.py --dataset 6 --frames 6000 \
		--chunk-files 3 --skip-reference | tee -a BENCH_E2E.json

bench-export:  # chip-validate the StableHLO serving path -> artifact
	$(PYTHON) scripts/validate_export_tpu.py | tee BENCH_EXPORT.json

bench-all: bench-check bench-vaf bench-solvers bench-fit bench-e2e bench-export  # refresh artifacts

entry:
	JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
		$(PYTHON) __graft_entry__.py

native:
	g++ -O3 -shared -fPIC -pthread \
		-o muscle_synergies_tpu/native/libvicon_decode.so \
		muscle_synergies_tpu/native/vicon_decode.cpp

dist:
	./scripts/check_dist.sh

clean:
	rm -rf muscle_synergies_tpu/native/libvicon_decode.so \
		$$(find . -name __pycache__ -type d) .pytest_cache
