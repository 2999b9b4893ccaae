#!/bin/bash
# Round-2 campaign, part 5 (waits for part 4): scale-tier verification.
#   - 512^2 CG leg, 10k epochs NaN-free in f32 on TPU (VERDICT #2 done
#     criterion), trajectory sanity vs dense;
#   - 1024^2 stretch (dense memory gives out; PCG is the only path);
#   - final bench.py numbers.
LOG=${1:-/tmp/round2e.log}
cd "$(dirname "$0")/.."

# wait for campaign D (which ends with the ~2h allencahn run)
while kill -0 "$(cat /tmp/campaignd.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

echo "=== largegrid 512^2, 5000 steps/chunk x2 = 10k epochs $(date +%H:%M:%S)" >> "$LOG"
timeout 4000 python tools/bench_largegrid.py 512 5000 >> "$LOG" 2>&1

echo "=== largegrid 1024^2 stretch, 100-step timing $(date +%H:%M:%S)" >> "$LOG"
timeout 4000 python tools/bench_largegrid.py 1024 100 >> "$LOG" 2>&1

echo "=== bench.py final $(date +%H:%M:%S)" >> "$LOG"
timeout 2000 python bench.py >> "$LOG" 2>&1

echo "CAMPAIGN-E DONE $(date +%H:%M:%S)" >> "$LOG"
