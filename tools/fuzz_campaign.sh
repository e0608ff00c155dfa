#!/bin/bash
# Fresh-seed fuzz campaign over every randomized-parity family
# (r16 verdict task 4 cadence, scripted r17).
#
# Each pass shifts EVERY family's committed seed by PARITY_SEED_OFFSET
# (tests/test_randomized_parity.py::_rng) and runs the whole family
# file; a failure prints the offset, so the exact draw is reproducible
# with PARITY_SEED_OFFSET=<offset> pytest <nodeid>.
#
# Usage: tools/fuzz_campaign.sh [offset1 offset2 ...]
#        (default: five offsets derived from the current round date)
set -u
cd "$(dirname "$0")/.."
OFFSETS=("$@")
if [ ${#OFFSETS[@]} -eq 0 ]; then
  base=$(( $(date +%y%m%d) % 100000 ))
  OFFSETS=($((base+11)) $((base+223)) $((base+3037)) $((base+40087)) $((base+500029)))
fi
fail=0
for off in "${OFFSETS[@]}"; do
  echo "=== PASS offset $off ==="
  # SPARK_GRAFT_SLOW_TESTS: the parity file is slow-gated out of the
  # default suite (r19, driver verify window) — this campaign IS the
  # out-of-band runner for it, so force the gate open.
  PARITY_SEED_OFFSET=$off SPARK_GRAFT_SLOW_TESTS=1 \
    python -m pytest tests/test_randomized_parity.py \
    -q -p no:cacheprovider 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && fail=1 && echo "*** FAILURE at offset $off (rc=$rc) ***"
done
echo "CAMPAIGN_DONE fail=$fail"
exit $fail
