#!/bin/bash
# Outage-#4 recovery: probe device EXECUTION (not enumeration) in a
# bounded subprocess; when it works twice in a row, fire the evidence
# batch. Enumeration kept succeeding through every stall — only an
# execution round trip proves the tunnel is actually back.
set -u
cd "$(dirname "$0")/.."
ok=0
while true; do
  if timeout 45 python -c "
import jax, jax.numpy as jnp
x = jax.device_put(jnp.ones((128,128)))
print(float(jnp.sum(x)))" >/dev/null 2>&1; then
    ok=$((ok+1))
    echo "$(date -u +%FT%TZ) probe ok ($ok)"
    if [ "$ok" -ge 2 ]; then
      echo "$(date -u +%FT%TZ) tunnel back; launching evidence batch"
      TRAIN_LOG=/tmp/train_r6.log bash tools/post_train_r6.sh
      echo "$(date -u +%FT%TZ) batch done"
      exit 0
    fi
  else
    ok=0
    echo "$(date -u +%FT%TZ) probe failed"
  fi
  sleep 45
done
