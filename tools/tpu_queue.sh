#!/bin/bash
# Waits for the axon TPU relay to come back, then runs the remaining round-4
# measurement jobs: the reworked batch_scaling (peak-HBM disciplined, OOM ->
# microbatch retry) and the sustained-operation soak (SOAK_r04.json).
# Heartbeats every 10 probes so the log shows liveness.
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_compilation
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
probe() { timeout 90 python -c "import jax,jax.numpy as jnp; jax.device_get(jnp.ones((8,8))*2)" >/dev/null 2>&1; }
echo "waiting for relay... $(date -u)" | tee -a $LOG
n=0
until probe; do
  sleep 120
  n=$((n+1))
  if [ $((n % 10)) -eq 0 ]; then echo "still waiting (probe $n)... $(date -u)" >> $LOG; fi
done
echo "RELAY UP $(date -u)" | tee -a $LOG
run() { name="$1"; t="$2"; shift 2; echo "=== $name ($(date -u))" >> $LOG; timeout "$t" "$@" 2>&1 | grep --line-buffered -v "^WARNING" >> $LOG; echo "rc=${PIPESTATUS[0]}" >> $LOG; }
run "batch_scaling (OOM-retry rework)" 7200 python tools/batch_scaling.py
run "soak 200 frames" 5400 python tools/soak.py --frames 200 --out SOAK_r04.json
echo "QUEUE DONE $(date -u)" | tee -a $LOG
