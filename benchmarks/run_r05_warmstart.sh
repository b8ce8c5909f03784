#!/bin/bash
# Round-5 warm-start conditioning experiment (VERDICT r04 #2, after the
# from-scratch GAN runs came out text-blind for the third time):
# phase 1 establishes text conditioning under recon+KL+perc
# (gan_weight=0) on the structured-background tiled closed-vocab task;
# phase 2 CONTINUES the same workdir under the full reference loss
# (v2 gan_weight=0.15, vae-gan-v2.py:43). The deliverable is whether the
# true-vs-shuffled ablation gap survives adversarial training — the same
# order-of-optimization freedom the reference itself exploits by
# resuming from checkpoints with strict=False (vae-gan-v2.py:963-995).
# Run AFTER run_r05_chip_jobs.sh.
set -x
cd "$(dirname "$0")/.."

if ps aux | grep -E "vae_gan_mark_tpu.train|bench.py" | grep -v grep | grep -v $$; then
  echo "chip busy — refusing to start" >&2
  exit 1
fi

# Probe-and-wait for the tunneled chip (it wedges for long stretches).
wait_chip() {
  for _ in $(seq 1 120); do
    if timeout 75 python -c "
import jax, jax.numpy as jnp
(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()" 2>/dev/null; then
      echo "chip healthy"; return 0
    fi
    echo "chip wedged — waiting 120 s"; sleep 120
  done
  echo "chip never recovered" >&2; return 1
}

# Phase 1: conditioning first (gan_weight=0), 60 epochs.
wait_chip && timeout 1800 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --synthetic-structured --epochs 60 --batch-size 16 --multi-step 16 \
  --workdir .runs/gan_warmstart --set save_every=10 --set gan_weight=0.0 \
  --seed 0 > .runs/gan_warmstart_p1.log 2>&1

# Phase 2: full reference loss from the conditioned checkpoint, 60 more.
wait_chip && timeout 1800 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --synthetic-structured --epochs 120 --batch-size 16 --multi-step 16 \
  --workdir .runs/gan_warmstart --set save_every=10 --seed 0 \
  > .runs/gan_warmstart_p2.log 2>&1

for mode in "" "--shuffle-text"; do
  name=$([ -z "$mode" ] && echo true || echo shuf)
  timeout 1200 python -m vae_gan_mark_tpu.eval --variant v2 \
    --workdir .runs/gan_warmstart --checkpoint last_checkpoint \
    --synthetic --synthetic-samples 256 --synthetic-text-vocab 8 \
    --synthetic-text-tile --synthetic-structured $mode \
    2>/dev/null | tail -1 > .runs/gan_warmstart_eval_$name.json
done

echo ALLDONE
