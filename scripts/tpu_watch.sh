#!/bin/bash
# Poll the axon tunnel; when a tiny on-chip matmul succeeds, run the
# round-3 one-shot measurement batch (scripts/round3_measure.sh).
# Logs: /tmp/tpu_watch.log, probe attempts in /tmp/tpu_probe_N.log.
set -u
cd "$(dirname "$0")/.."
n=0
while true; do
  n=$((n + 1))
  if timeout 420 python -c "
import jax
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((128, 128))
print('PROBE_OK', d, float((x @ x).sum()))
" > "/tmp/tpu_probe_$((n % 3)).log" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP after $n probes" >> /tmp/tpu_watch.log
    bash scripts/round3_measure.sh >> /tmp/tpu_watch.log 2>&1
    echo "$(date -u +%FT%TZ) measurement batch done" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "$(date -u +%FT%TZ) probe $n failed" >> /tmp/tpu_watch.log
  sleep 240
done
