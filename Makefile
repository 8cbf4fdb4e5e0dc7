# Top-level build/test harness (role of the reference's tests/Makefile).

.PHONY: all native test test-quick test-fast bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

# ~3-min bound-contract core (see tests/conftest.py _QUICK_MODULES)
test-quick: native
	python -m pytest tests/ -q -m quick

test-fast: native
	python -m pytest tests/ -q --ignore=tests/test_cli.py \
		--ignore=tests/test_optimizer.py

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf rmi_data .pytest_cache
