#!/bin/bash
# Warm-start experiment, second protocol: FULL conditioning first (60
# epochs, gan_weight=0, mark-recovery saturated), then the adversarial
# term at the reference's mildest weight — oldv's GAN_WEIGHT=0.07
# (/root/reference/vae-gan-oldv.py:43) — for 60 more epochs. Protocol 1
# (run_r05_warmstart.sh) entered phase 2 from a partially-conditioned
# epoch-20 checkpoint at v2's 0.15 and the text pathway eroded; this
# tests whether a saturated pathway at the milder reference weight holds.
set -x
cd "$(dirname "$0")/.."

if ps aux | grep -E "vae_gan_mark_tpu.train|bench.py" | grep -v grep | grep -v $$; then
  echo "chip busy — refusing to start" >&2
  exit 1
fi

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

# Phase 1: conditioning to saturation (gan off), 60 epochs.
wait_chip && timeout 2700 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --synthetic-structured --epochs 60 --batch-size 16 --multi-step 16 \
  --workdir .runs/gan_warmstart2 --set save_every=10 --set gan_weight=0.0 \
  --seed 0 > .runs/gan_warmstart2_p1.log 2>&1

for mode in "" "--shuffle-text"; do
  name=$([ -z "$mode" ] && echo true || echo shuf)
  wait_chip && timeout 1200 python -m vae_gan_mark_tpu.eval --variant v2 \
    --workdir .runs/gan_warmstart2 --checkpoint last_checkpoint \
    --synthetic --synthetic-samples 256 --synthetic-text-vocab 8 \
    --synthetic-text-tile --synthetic-structured $mode \
    2>/dev/null | tail -1 > .runs/gan_warmstart2_eval_p1_$name.json
done

# Phase 2: + hinge GAN at oldv's reference weight, 60 more epochs.
wait_chip && timeout 2700 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --synthetic-structured --epochs 120 --batch-size 16 --multi-step 16 \
  --workdir .runs/gan_warmstart2 --set save_every=10 --set gan_weight=0.07 \
  --seed 0 > .runs/gan_warmstart2_p2.log 2>&1

for mode in "" "--shuffle-text"; do
  name=$([ -z "$mode" ] && echo true || echo shuf)
  wait_chip && timeout 1200 python -m vae_gan_mark_tpu.eval --variant v2 \
    --workdir .runs/gan_warmstart2 --checkpoint last_checkpoint \
    --synthetic --synthetic-samples 256 --synthetic-text-vocab 8 \
    --synthetic-text-tile --synthetic-structured $mode \
    --set gan_weight=0.07 \
    2>/dev/null | tail -1 > .runs/gan_warmstart2_eval_$name.json
done

echo ALLDONE
