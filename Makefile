# Top-level build/test harness (role of the reference's tests/Makefile).

.PHONY: all native test test-fast bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q --ignore=tests/test_cli.py \
		--ignore=tests/test_optimizer.py

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf rmi_data .pytest_cache
