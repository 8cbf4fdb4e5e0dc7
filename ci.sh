#!/usr/bin/env bash
# CI pipeline (role of the reference's .drone.yml): build the native
# library, run the full test suite on the virtual CPU mesh, then a
# small smoke benchmark.
set -euo pipefail
cd "$(dirname "$0")"

make -C native
# fail fast: the ~3-min bound-contract core before the full suite
python -m pytest tests/ -q -m quick
python -m pytest tests/ -q -m "not quick"
RMI_BENCH_N=200000 RMI_BENCH_QUERIES=65536 RMI_BENCH_ITERS=3 \
    JAX_PLATFORMS=cpu python bench.py
echo "CI OK"
