#!/bin/bash
# Round-5 serialized chip session: every VERDICT r4 measurement item at HEAD
# in ONE session — graded matrix + JSON artifact (#1), cold-start breakdown
# (#2), roofline/MFU (#3), realtime 1080p60 (#4), composed link-feasible
# export (#5), GLSL front-end throughput. ONE job on the chip at a time.
# Logs to /tmp/chip_session/. Run: bash tools/chip_r5.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session
mkdir -p "$LOG"
LOCK="$LOG/LOCK"
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export BENCH_INSIDE_CHIP_SESSION=1

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary.txt"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -3 "$LOG/$name.log" | tee -a "$LOG/summary.txt"
  echo "--- $name rc=$rc" | tee -a "$LOG/summary.txt"
}

# 0. Liveness (explicit marker from an actual device call)
step probe        180  python -u -c "import jax; print('DEVICES_OK', jax.devices())"
grep -q "DEVICES_OK" "$LOG/probe.log" || { echo "TUNNEL DEAD" | tee -a "$LOG/summary.txt"; exit 1; }

# 1. Full graded matrix at HEAD -> BENCHMARKS.md + BENCHMARKS.json (r4 #1)
step matrix       7200 env BENCH_SKIP_PROBE=1 python -u tools/bench_all.py

# 2. PSNR gate on device at HEAD (r4 weak #6)
step psnr         3600 python -u tools/psnr_gate.py

# 3. Roofline / MFU per graded config (r4 #3)
step roofline     3600 python -u tools/roofline.py

# 4. Realtime preview 1080p60 (r4 #4)
step preview      1800 python -u tools/bench_preview.py

# 5. Composed end-to-end export at link-feasible res (r4 #5)
step compose      1800 python -u tools/bench_compose.py

# 6. GLSL front-end throughput vs python fragments (round-5 feature)
step glsl         2400 python -u tools/bench_glsl.py

# 7. Video texture 4K60 decode/export (r4 #8)
step video        2400 python -u tools/bench_video.py

# 8. Cold-start phase breakdown, fresh compile cache (r4 #2) — LAST: slow
step coldstart    2400 python -u tools/coldstart.py

echo "=== DONE ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary.txt"
