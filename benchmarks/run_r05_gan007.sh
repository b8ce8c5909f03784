#!/bin/bash
# Continue the completed 150-epoch vocab run (fully conditioned,
# mark-recovery 0.9991, gan_weight=0) for 30 more epochs under the full
# reference loss with the hinge GAN at oldv's reference weight 0.07
# (/root/reference/vae-gan-oldv.py:43), then measure whether the
# true-vs-shuffled conditioning gap survives adversarial training.
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

cp -r .runs/vocab150 .runs/vocab150_gan007

wait_chip && timeout 2700 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --epochs 180 --batch-size 16 --multi-step 16 \
  --workdir .runs/vocab150_gan007 --set save_every=10 --set gan_weight=0.07 \
  --seed 0 > .runs/vocab150_gan007.log 2>&1

for mode in "" "--shuffle-text"; do
  name=$([ -z "$mode" ] && echo true || echo shuf)
  wait_chip && timeout 1200 python -m vae_gan_mark_tpu.eval --variant v2 \
    --workdir .runs/vocab150_gan007 --checkpoint last_checkpoint \
    --synthetic --synthetic-samples 256 --synthetic-text-vocab 8 \
    --synthetic-text-tile --set gan_weight=0.07 $mode \
    2>/dev/null | tail -1 > .runs/vocab150_gan007_eval_$name.json
done

echo ALLDONE
