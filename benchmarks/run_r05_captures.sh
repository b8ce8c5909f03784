#!/bin/bash
# Round-5 chip jobs (serialized — the chip is a single shared resource, and
# round 4 proved overlap corrupts captures: bench_oldv_r04.json recorded
# RESOURCE_EXHAUSTED at every size because a long run still held HBM).
# Guard: refuse to start while any other process is using the backend.
set -x
cd "$(dirname "$0")/.."

if ps aux | grep -E "vae_gan_mark_tpu.train|bench.py" | grep -v grep | grep -v $$; then
  echo "chip busy — refusing to start" >&2
  exit 1
fi

mkdir -p /root/runs

# 1. oldv 10-epoch on-chip training run (VERDICT r04 #1c) — same protocol as
#    examples/variant_runs/{vanilla,lr_sh,unet} (round 4).
timeout 3600 python -m vae_gan_mark_tpu.train --variant oldv --synthetic \
  --synthetic-samples 1024 --epochs 10 --batch-size 16 --multi-step 16 \
  --workdir /root/runs/oldv_run --set save_every=5 --seed 0 \
  > /root/runs/oldv_run.log 2>&1

# 2. GAN-on conditioning pilot (VERDICT r04 #2): structured backgrounds give
#    D a matchable distribution; full reference loss (v2 gan_weight=0.15).
timeout 3600 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --synthetic-structured --epochs 30 --batch-size 16 --multi-step 16 \
  --workdir /root/runs/gan_pilot --set save_every=10 --seed 0 \
  > /root/runs/gan_pilot.log 2>&1

echo ALLDONE
