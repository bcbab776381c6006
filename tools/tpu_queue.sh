#!/bin/bash
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_compilation
cd /root/repo
LOG=/root/repo/TPU_RUNS_r03.log
probe() { timeout 90 python -c "import jax,jax.numpy as jnp; jax.device_get(jnp.ones((8,8))*2)" >/dev/null 2>&1; }
echo "waiting for relay... $(date -u)" | tee -a $LOG
until probe; do sleep 120; done
echo "RELAY UP $(date -u)" | tee -a $LOG
run() { echo "=== $1 ($(date -u))" >> $LOG; shift; timeout "$1" "${@:2}" 2>&1 | grep -v "^WARNING" >> $LOG; echo "rc=$?" >> $LOG; }
run "tpu_parity 03" 3000 python tools/tpu_parity.py 03
run "profile_stages" 1800 python tools/profile_stages.py
run "bench" 5400 python bench.py
run "profile_sharded" 1800 python tools/profile_sharded.py
run "batch_scaling" 4800 python tools/batch_scaling.py
echo "QUEUE DONE $(date -u)" | tee -a $LOG
