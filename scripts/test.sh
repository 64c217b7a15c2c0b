#!/bin/bash
# Test entry point that survives this environment's host migrations.
#
# Multi-core hosts: the pyproject default (`pytest -n 2 --dist loadfile`)
# is fastest. 1-CPU hosts (post-migration): xdist workers segfault in
# XLA:CPU native code and the run wedges — use the bounded per-file
# runner instead. This wrapper auto-detects.
set -u
cd "$(dirname "$0")/.."

# Does the invocation include an explicit test path / node id (a non-flag
# arg)? Flags alone (-x, --lf, ...) still mean "the whole suite". A value
# consumed by a value-taking flag (`-k pattern`, `-m marker`, ...) is part
# of the flag, NOT a selection — otherwise `test.sh -k pattern` on a 1-CPU
# host would sweep the entire suite in one unbounded -n0 process, the
# exact wedge mode the flag-only refusal below exists to prevent.
has_selection=0
expect_value=0
for a in "$@"; do
  if [ "$expect_value" = 1 ]; then
    expect_value=0
    continue
  fi
  case "$a" in
    -k|-m|-o|-p|-W|-c|-n|--deselect|--ignore|--rootdir|--confcutdir|--junitxml|--basetemp|--durations|--tb|--maxfail|--timeout|--color|--dist|--lfnf|--import-mode)
      expect_value=1 ;;
    -*) ;;    # incl. --flag=value (inline value) and bare flags
    *) has_selection=1 ;;
  esac
done

if [ "$(nproc)" -ge 2 ]; then
  if [ "$has_selection" = 1 ]; then
    # Don't union the hardcoded tests/ with the selection (that would
    # sweep the whole suite); pyproject's testpaths covers the bare case.
    exec python -m pytest -q "$@"
  fi
  exec python -m pytest tests/ -q "$@"
else
  echo "1-CPU host detected: using per-file fallback runner" >&2
  if [ "$has_selection" = 1 ]; then
    # The per-file runner takes no pytest selection args; run the
    # requested selection directly (single process, no xdist) instead of
    # silently ignoring it and sweeping the whole suite.
    exec python -m pytest -q -n0 "$@"
  fi
  if [ "$#" -gt 0 ]; then
    # Flag-only args would run the ENTIRE suite in one unbounded -n0
    # process — the exact segfault/wedge mode the per-file runner exists
    # to avoid. Refuse instead of wedging.
    echo "error: flag-only pytest args are unsupported on 1-CPU hosts" >&2
    echo "       (whole-suite single-process runs segfault here);" >&2
    echo "       name a test file/node id, or use scripts/run_tests_by_file.sh" >&2
    exit 2
  fi
  exec scripts/run_tests_by_file.sh
fi
