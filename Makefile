# Developer entry points. `make test` runs the CPU suite; the TPU
# targets need the dev box's chip.

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python scripts/bench_train.py

tpu-check:
	python scripts/tpu_check.py

native:
	$(MAKE) -C native

.PHONY: test bench bench-train tpu-check native
