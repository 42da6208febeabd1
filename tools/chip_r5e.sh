#!/bin/bash
# Round-5 session E: re-measure the three paths fixed after session D —
#   glsl    — 4K sampler OOM (per-channel flat takes) removed
#   compose — flat-on-the-wire batch delivery (WireBatch)
#   video   — u8-on-the-wire streamed textures + wire delivery
# ONE job on the chip at a time. Logs to /tmp/chip_session/*_e.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session
mkdir -p "$LOG"
export BENCH_INSIDE_CHIP_SESSION=1

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary_e.txt"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -4 "$LOG/$name.log" | tee -a "$LOG/summary_e.txt"
  echo "--- $name rc=$rc" | tee -a "$LOG/summary_e.txt"
}

step probe_e    180  python -u -c "import jax; print('DEVICES_OK', jax.devices())"
grep -q "DEVICES_OK" "$LOG/probe_e.log" || { echo "TUNNEL DEAD" | tee -a "$LOG/summary_e.txt"; exit 1; }

step compose_e  1800 python -u tools/bench_compose.py
step glsl_e     2400 python -u tools/bench_glsl.py
step video_e    2400 python -u tools/bench_video.py

echo "=== SESSION-E DONE ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary_e.txt"
