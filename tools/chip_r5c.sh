#!/bin/bash
# FINAL round-5 measurement session: every graded artifact re-measured at
# one commit (VERDICT r4 #1's consistency requirement) with the fixed
# tools and the flat-take sampler:
#   matrix    -> BENCHMARKS.md + BENCHMARKS.json (bench_all)
#   psnr      -> PSNR_GATE.md on device (sampler change re-gated)
#   roofline  -> docs/roofline.md (block-level pallas traffic)
#   preview   -> steady-state paced 1080p60, display on/off
#   compose   -> warmed sink path (first-transfer setup excluded)
#   glsl      -> front-end A/B (flat-take effect)
#   video     -> decode / upload / resident-render / streaming export
#   coldstart -> fresh-cache phase breakdown
# ONE job on the chip at a time. Logs to /tmp/chip_session/*_c.log.
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
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary_c.txt"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -4 "$LOG/$name.log" | tee -a "$LOG/summary_c.txt"
  echo "--- $name rc=$rc" | tee -a "$LOG/summary_c.txt"
}

step probe_c      180  python -u -c "import jax; print('DEVICES_OK', jax.devices())"
grep -q "DEVICES_OK" "$LOG/probe_c.log" || { echo "TUNNEL DEAD" | tee -a "$LOG/summary_c.txt"; exit 1; }

step matrix_c     7200 env BENCH_SKIP_PROBE=1 python -u tools/bench_all.py
step psnr_c       3600 python -u tools/psnr_gate.py
step roofline_c   5400 python -u tools/roofline.py
step preview_c    2400 python -u tools/bench_preview.py
step compose_c    1800 python -u tools/bench_compose.py
step glsl_c       2400 python -u tools/bench_glsl.py
step video_c      2400 python -u tools/bench_video.py
step coldstart_c  2400 python -u tools/coldstart.py

echo "=== FINAL-C DONE ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary_c.txt"
