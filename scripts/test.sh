#!/bin/bash
# Test entry point that survives this environment's host migrations.
#
# Multi-core hosts: the pyproject default (`pytest -n 2 --dist loadfile`)
# is fastest. 1-CPU hosts (post-migration): xdist workers segfault in
# XLA:CPU native code and the run wedges — use the bounded per-file
# runner instead. This wrapper auto-detects.
set -u
cd "$(dirname "$0")/.."
if [ "$(nproc)" -ge 2 ]; then
  exec python -m pytest tests/ -q "$@"
else
  echo "1-CPU host detected: using per-file fallback runner" >&2
  if [ "$#" -gt 0 ]; then
    # The per-file runner takes no pytest selection args; run the
    # requested selection directly (single process, no xdist) instead of
    # silently ignoring it and sweeping the whole suite.
    exec python -m pytest -q -n0 "$@"
  fi
  exec scripts/run_tests_by_file.sh
fi
