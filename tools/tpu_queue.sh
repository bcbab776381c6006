#!/bin/bash
# Waits for the axon TPU relay to come back, then runs the full round-4
# measurement sequence. Heartbeats every 10 probes so the log shows liveness.
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
run() { name="$1"; t="$2"; shift 2; echo "=== $name ($(date -u))" >> $LOG; timeout "$t" "$@" 2>&1 | grep -v "^WARNING" >> $LOG; echo "rc=${PIPESTATUS[0]}" >> $LOG; }
run "tpu_parity 04" 4200 python tools/tpu_parity.py 04
run "profile_stages" 1800 python tools/profile_stages.py
run "bench" 9000 python bench.py
run "profile_sharded" 1800 python tools/profile_sharded.py
run "batch_scaling" 4800 python tools/batch_scaling.py
echo "QUEUE DONE $(date -u)" | tee -a $LOG
