#!/bin/bash
# Sequential chip-work queue for when the tunnel is healthy. ONE job on the
# chip at a time (two processes => UNIMPLEMENTED errors / garbage timings).
# Logs to /tmp/chip_session/. Run: bash tools/chip_session.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session
mkdir -p "$LOG"
# Serialize against anything else that respects the lock (bench.py waits on
# it): two processes on the chip => UNIMPLEMENTED errors / garbage timings.
LOCK="$LOG/LOCK"
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT
# Our own bench.py children must not wait on OUR lock
export BENCH_INSIDE_CHIP_SESSION=1

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary.txt"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -3 "$LOG/$name.log" | tee -a "$LOG/summary.txt"
  echo "--- $name rc=$rc" | tee -a "$LOG/summary.txt"
}

# 0. Liveness: must print the explicit marker from an ACTUAL device call
# (warnings mention "axon" too — never grep for platform names; a wedged
# tunnel hangs inside jax.devices() while imports succeed)
step probe        180  python -u -c "import jax; print('DEVICES_OK', jax.devices())"
grep -q "DEVICES_OK" "$LOG/probe.log" || { echo "TUNNEL STILL DEAD" | tee -a "$LOG/summary.txt"; exit 1; }

# 1. Escape kernel: predicted-rounds A/B (VERDICT r2 #3 follow-up)
step escape_base  1200 python -u tools/bench_escape.py
step escape_pred  1200 env SHADERFLOW_FRACTAL_PREDICT=1 python -u tools/bench_escape.py

# 2. Mandelbrot graded bench, both settings (target >= 600 fps = 10x)
step mandel_base  1800 env BENCH_SCENE=mandelbrot python -u bench.py
step mandel_pred  1800 env BENCH_SCENE=mandelbrot SHADERFLOW_FRACTAL_PREDICT=1 python -u bench.py

# 3. bf16 VPU microbench (decides whether a bf16 tail mode is worth building)
step vpu_dtype    900  python -u tools/bench_vpu_dtype.py

# 4. Visualizer blur level A/B (GL-exactness vs device time)
step viz_L4       1800 python -u bench.py
step viz_L1       1800 env SHADERFLOW_VIZ_BLUR_LEVEL=1 python -u bench.py

# 4b. Blocked-resample microbench (VERDICT r3 #6: off-profile at 4K ssaa<1)
step resample     1200 python -u tools/bench_resample.py

# 4c. Realtime preview 1080p60 (VERDICT r3 #7: holds-60 verdict + HUD)
step preview_1080 1800 python -u tools/bench_preview.py
# 4d. bf16 tail A/B on the headline (gate: vpu_dtype + PSNR >= 40 dB)
step viz_bf16     1800 env SHADERFLOW_TAIL_BF16=1 python -u bench.py

# 5. On-device PSNR gate (refreshes PSNR_GATE.md)
step psnr_gate    3600 python -u tools/psnr_gate.py

# 6. Headline variance: five consecutive standalone runs (VERDICT r2 #4)
for i in 1 2 3 4 5; do
  step "viz_var_$i" 1800 python -u bench.py
done

# 7. Full graded matrix refresh
step bench_all    7200 python -u tools/bench_all.py

echo "=== DONE ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG/summary.txt"
