#!/bin/bash
# Waits for the axon TPU relay to come back, then runs the remaining round-4
# hardware jobs: the serving-surface smoke (HTTP worker with the engine on
# the TPU) and a fresh headline bench. Heartbeats every 10 probes so the log
# shows liveness.
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_compilation
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
probe() { timeout 90 python -c "import jax,jax.numpy as jnp; jax.device_get(jnp.ones((8,8))*2)" >/dev/null 2>&1; }
echo "waiting for relay (serve smoke queue)... $(date -u)" | tee -a $LOG
n=0
until probe; do
  sleep 120
  n=$((n+1))
  if [ $((n % 10)) -eq 0 ]; then echo "still waiting (probe $n)... $(date -u)" >> $LOG; fi
done
echo "RELAY UP $(date -u)" | tee -a $LOG
run() { name="$1"; t="$2"; shift 2; echo "=== $name ($(date -u))" >> $LOG; timeout "$t" "$@" 2>&1 | grep --line-buffered -v "^WARNING" >> $LOG; echo "rc=${PIPESTATUS[0]}" >> $LOG; }
run "serve smoke (HTTP worker on TPU)" 3600 python tools/serve_smoke.py
run "bench (fresh window)" 9000 python bench.py
echo "QUEUE DONE $(date -u)" | tee -a $LOG
