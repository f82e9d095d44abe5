#!/bin/bash
# One-shot chip measurement plan (run when the axon tunnel is up).
# Collects the round-2-continuation kernel numbers sequentially (the
# box has ONE CPU - never run anything else concurrently) and tees
# everything to /tmp/chip_measurements.log for PERF.md updates.
#
#   bash scripts/chip_measurements.sh [quick]
#
# "quick" skips the sweeps and runs only the two ablations + bench.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/chip_measurements.log
: > "$LOG"
note() { echo "=== $* ===" | tee -a "$LOG"; }

note "tunnel probe"
if ! timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
  echo "tunnel down - aborting" | tee -a "$LOG"
  exit 1
fi
tail -1 "$LOG"

note "lz77 ablation: full graph (level 6)"
timeout 2400 python scripts/ablate_lz77.py 2>&1 | tail -3 | tee -a "$LOG"
note "lz77 ablation: cand"
DECOMPRESS_TPU_LZ77_ABLATE=cand timeout 1800 python scripts/ablate_lz77.py 2>&1 | tail -2 | tee -a "$LOG"
note "lz77 ablation: parse"
DECOMPRESS_TPU_LZ77_ABLATE=parse timeout 1800 python scripts/ablate_lz77.py 2>&1 | tail -2 | tee -a "$LOG"

note "inflate ablation (8 MB, default nw)"
timeout 2400 python scripts/ablate_inflate.py 8 2>&1 | tail -8 | tee -a "$LOG"

if [ "${1:-}" != "quick" ]; then
  note "descent mode: full (vs default compact above)"
  DECOMPRESS_TPU_DESCENT=full timeout 1800 python scripts/ablate_lz77.py 2>&1 | tail -2 | tee -a "$LOG"
  for nw in 14 12 8; do
    note "inflate nw=$nw"
    DECOMPRESS_TPU_INFLATE_NW=$nw timeout 1800 python scripts/ablate_inflate.py 8 2>&1 | tail -5 | tee -a "$LOG"
  done
  for c in 3 5; do
    note "parse C=$c"
    DECOMPRESS_TPU_PARSE_C=$c timeout 1800 python scripts/ablate_lz77.py 2>&1 | tail -2 | tee -a "$LOG"
  done
fi

note "bench (driver metric)"
timeout 3000 python bench.py --verbose 2>&1 | tail -3 | tee -a "$LOG"
note "done"
