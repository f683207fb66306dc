# Developer convenience targets (reference: the per-test Makefile rules).

PY ?= python

.PHONY: test test-v test-q test-slow bench native golden vectors clean

test:
	$(PY) -m pytest tests/ -q

test-v:
	PVAC_DBG=1 $(PY) -m pytest tests/ -v

test-q:
	$(PY) -m pytest tests/ -q -x

test-slow:
	$(PY) -m pytest tests/ -q -m slow

bench:
	$(PY) bench.py

bench-quick:
	PVAC_BENCH_QUICK=1 $(PY) bench.py

native:
	$(PY) -c "from pvac_hfhe_cppbyv_tpu import native; assert native.lib()"

# Regenerate reference-derived fixtures (needs g++ + /root/reference)
vectors:
	mkdir -p build tests/golden
	g++ -std=c++17 -O2 -march=native -I/root/reference/include \
	    -o build/dump_vectors tools/refharness/dump_vectors.cpp
	./build/dump_vectors

golden:
	mkdir -p build tests/golden
	g++ -std=c++17 -O2 -march=native -I/root/reference/include \
	    -o build/gen_golden tools/refharness/gen_golden.cpp
	./build/gen_golden

clean:
	rm -rf build .pytest_cache pvac_metrics.csv
	find . -name __pycache__ -type d -exec rm -rf {} +
