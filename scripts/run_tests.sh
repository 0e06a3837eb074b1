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
# Usage: scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fails=0
for f in tests/test_*.py; do
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
