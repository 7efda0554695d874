#!/bin/bash
# Sequential TPU perf probes (one at a time — they share the single chip).
# Each runs in its own subprocess; results appended to /tmp/probe_sweep.log.
cd "$(dirname "$0")/.."
LOG=/tmp/probe_sweep.log
: > "$LOG"

run_probe() {
  desc="$1"; shift
  echo "=== PROBE $desc ($(date +%H:%M:%S))" >> "$LOG"
  timeout 1100 python tools/perf_probe.py "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. bf16 batch scaling: does bf16 move the B=16 saturation point?
run_probe "b32_bf16" 32 64 30 bf16
# 2. rbg PRNG: cheaper per-step noise generation than threefry
run_probe "b16_bf16_rbg" 16 64 30 bf16 prng=rbg
# 3. bigger scoped vmem for deeper fusions
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=98304" run_probe "b16_bf16_vmem96m" 16 64 30 bf16
# 4. very large batch
run_probe "b64_bf16" 64 64 30 bf16
echo "=== SWEEP DONE ($(date +%H:%M:%S))" >> "$LOG"
