#!/bin/bash
# Suite runner that survives the image's native XLA:CPU instability.
#
# A single long pytest process compiling hundreds of XLA programs can
# segfault nondeterministically INSIDE the native compiler
# (backend_compile_and_load) or the persistent-cache serializer on this
# jaxlib — observed 2026-08-17 (serialize/deserialize) and 2026-08-18
# (compile, test 68 of the full run). tests/conftest.py already disables
# the persistent cache; this script additionally bounds the blast radius
# by running one pytest process PER TEST FILE, retrying a file once if
# the process dies on a signal (exit >= 128) rather than a test failure.
#
# Usage: scripts/run_tests.sh [--quick] [extra pytest args]
#
#   --quick: the pre-commit tier (~7 min on this host): every KERNEL
#   parity file (pallas blend fwd/bwd, sample/integrate, NCC warp, raster
#   oracle) plus the cheap unit files — exactly the tests that catch a
#   kernel-default or layout change. The heavy integration files
#   (test_loop ~8 min, test_sharding ~11 min, test_mesh, test_lpips,
#   test_data, test_eval, test_viewer) run in the full sweep only.
set -u
cd "$(dirname "$0")/.."

QUICK=0
if [ "${1:-}" = "--quick" ]; then
  QUICK=1
  shift
fi

if [ "$QUICK" -eq 1 ]; then
  files="tests/test_pallas.py tests/test_raster_parity.py \
         tests/test_sample_ncc.py tests/test_warp_sample.py \
         tests/test_smoke_render.py tests/test_overflow.py \
         tests/test_config.py tests/test_utils_aux.py tests/test_knn.py"
else
  files="tests/test_*.py"
fi

fails=0
for f in $files; do
  for attempt in 1 2; do
    python -m pytest "$f" -q "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      break
    elif [ "$rc" -ge 128 ] && [ "$attempt" -eq 1 ]; then
      echo "WARN: $f died on signal $((rc - 128)); retrying once" >&2
      continue
    else
      fails=$((fails + 1))
      break
    fi
  done
done
if [ "$fails" -gt 0 ]; then
  echo "FAILED: $fails file(s)" >&2
  exit 1
fi
echo "all test files passed"
