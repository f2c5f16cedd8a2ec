#!/usr/bin/env bash
# Pre-snapshot driver-contract check (VERDICT r3 Next #7, extended r5).
#
# Rounds 1 and 3 both shipped red driver artifacts (BENCH rc=1 / MULTICHIP
# rc=124) while the test suite was green, because nothing executed the two
# surfaces the driver actually measures; round 4 shipped a green driver but
# a RED suite (the pp CLI regression landed after the last full-suite run).
# Run this before ANY end-of-round commit; it is mandatory (CLAUDE.md
# "Invariants to preserve").
#
# Covers:
#   1. bench.py end-to-end on the CPU smoke config (one JSON line, rc 0)
#   2. dryrun_multichip(8) end-to-end, timed against the driver budget —
#      includes the budget-gated extra program shapes (pipe2_fsdp,
#      moe2_ep2); SVOL_DRYRUN_PP=1 SVOL_DRYRUN_MOE=1 forces both so the
#      preflight always exercises every driver-visible program at least
#      once on this host (warm cache makes the driver's own run cheap)
#   3. the suite's driver-contract tests (retry policy, default int8 path,
#      signatures)
#   4. the FULL test suite (~8 min warm cache / 100+ min cold). Never skip
#      this before a snapshot: a feature commit that lands after the last
#      full-suite run is exactly how round 4 shipped red
#      (tests/test_cli_pp_smoke.py). SVOL_PREFLIGHT_SKIP_SUITE=1 exists
#      ONLY for mid-round iteration, never for the end-of-round run.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] bench.py CPU smoke =="
timeout 600 python bench.py --tiny --cpu --quantize none \
    --iters 2 --batch-size 1 --attempts 1

echo "== [2/4] dryrun_multichip(8) with ALL extra programs forced =="
time timeout 1800 env SVOL_DRYRUN_PP=1 SVOL_DRYRUN_MOE=1 python -c \
    "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

echo "== [2b/4] dryrun_multichip(8) default budget gating (driver shape) =="
time timeout 560 python -c \
    "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

echo "== [3/4] driver-contract tests =="
timeout 1800 python -m pytest tests/test_driver_contract.py -q

if [ "${SVOL_PREFLIGHT_SKIP_SUITE:-0}" != "1" ]; then
  echo "== [4/4] FULL test suite =="
  timeout 10800 python -m pytest tests/ -q
else
  echo "== [4/4] SKIPPED full suite (SVOL_PREFLIGHT_SKIP_SUITE=1 — forbidden for end-of-round) =="
fi

echo "PREFLIGHT OK"
