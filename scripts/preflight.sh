#!/usr/bin/env bash
# Pre-snapshot driver-contract check (VERDICT r3 Next #7).
#
# Rounds 1 and 3 both shipped red driver artifacts (BENCH rc=1 / MULTICHIP
# rc=124) while the test suite was green, because nothing executed the two
# surfaces the driver actually measures. Run this before ANY end-of-round
# commit; it is mandatory (CLAUDE.md "Invariants to preserve").
#
# Covers:
#   1. bench.py end-to-end on the CPU smoke config (one JSON line, rc 0)
#   2. dryrun_multichip(8) end-to-end, timed against the driver budget
#   3. the suite's driver-contract tests (retry policy, default int8 path,
#      signatures)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/3] bench.py CPU smoke =="
timeout 600 python bench.py --tiny --cpu --quantize none \
    --iters 2 --batch-size 1 --attempts 1

echo "== [2/3] dryrun_multichip(8), timed (budget: <560 s) =="
time timeout 560 python -c \
    "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

echo "== [3/3] driver-contract tests =="
timeout 1800 python -m pytest tests/test_driver_contract.py -q

echo "PREFLIGHT OK"
