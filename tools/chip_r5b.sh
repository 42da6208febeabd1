#!/bin/bash
# Round-5 RERUN of the measurement tools fixed on 2026-08-19:
#   roofline — per-config subprocess isolation (one process accumulating six
#              scenes exhausted HBM: raymarch read 43 ms/frame vs 0.27
#              isolated) + analytic jaxpr-walk cost model (flopcount.py)
#   preview  — steady-state timing after the micro-batch ladder's compiles
#              settle; display-on AND display-off variants
#   compose  — link probe fetches a FRESH device array per rep (jax caches
#              a fetched array's host copy; the old probe read 34 GB/s on a
#              ~20 MB/s tunnel)
#   video    — upload probe + device-resident render row (separates the
#              tunnel-bound host->device streaming from the render side)
# ONE job on the chip at a time. Logs to /tmp/chip_session/*_b.log.
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
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary_b.txt"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -4 "$LOG/$name.log" | tee -a "$LOG/summary_b.txt"
  echo "--- $name rc=$rc" | tee -a "$LOG/summary_b.txt"
}

step probe_b      180  python -u -c "import jax; print('DEVICES_OK', jax.devices())"
grep -q "DEVICES_OK" "$LOG/probe_b.log" || { echo "TUNNEL DEAD" | tee -a "$LOG/summary_b.txt"; exit 1; }

step roofline_b   5400 python -u tools/roofline.py
step preview_b    2400 python -u tools/bench_preview.py
step compose_b    1800 python -u tools/bench_compose.py
step video_b      2400 python -u tools/bench_video.py

echo "=== RERUN-B DONE ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary_b.txt"
