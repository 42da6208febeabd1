#!/bin/bash
# Focused round-4 chip queue (subset of chip_session.sh): the measurements
# that gate decisions, in decision order. ONE job on the chip at a time.
# Logs to /tmp/chip_session/. Run: bash tools/chip_focus.sh
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

step probe        180  python -u -c "import jax; print('DEVICES_OK', jax.devices())"
grep -q "DEVICES_OK" "$LOG/probe.log" || { echo "TUNNEL STILL DEAD" | tee -a "$LOG/summary.txt"; exit 1; }

# bf16 decision chain
step vpu_dtype    900  python -u tools/bench_vpu_dtype.py
step viz_base     1800 python -u bench.py
step viz_bf16     1800 env SHADERFLOW_TAIL_BF16=1 python -u bench.py

# mandelbrot >=10x chain
step mandel_base  1800 env BENCH_SCENE=mandelbrot python -u bench.py
step mandel_pred  1800 env BENCH_SCENE=mandelbrot SHADERFLOW_FRACTAL_PREDICT=1 python -u bench.py

# realtime preview 1080p60 verdict
step preview_1080 1800 python -u tools/bench_preview.py

# blocked-resample microbench
step resample     1200 python -u tools/bench_resample.py

# on-device PSNR gate refresh
step psnr_gate    3600 python -u tools/psnr_gate.py

echo "=== DONE ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary.txt"
