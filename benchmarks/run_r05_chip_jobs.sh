#!/bin/bash
# Round-5 remaining chip jobs, serialized (single shared chip; overlap
# corrupts captures — see bench_oldv_r04.json post-mortem in DESIGN.md).
# Run AFTER benchmarks/run_r05_captures.sh (oldv run + GAN pilot).
set -x
cd "$(dirname "$0")/.."

if ps aux | grep -E "vae_gan_mark_tpu.train|bench.py" | grep -v grep | grep -v $$; then
  echo "chip busy — refusing to start" >&2
  exit 1
fi

# The tunneled chip wedges for long stretches (twice on 2026-08-21 alone;
# a trivial matmul hangs). Probe before each job and wait instead of
# burning every job's timeout against a dead backend.
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

mkdir -p .runs
wait_chip || exit 1

# Jobs 1-2 (gan_full 120-epoch run + ablation evals) completed 2026-08-21
# and are committed under examples/vocab_run/attempt3_structured_gan/.

# 3. Vocab run to its stated 150-epoch target (VERDICT r04 #6). The
#    epoch-106 checkpoint died with the build host (infra reset wiped the
#    workdir), so this is a fresh seed-identical run — deliberately
#    interrupted at epoch ~100 (timeout) and resumed, so the committed
#    record also shows the resume machinery doing its job at run scale.
wait_chip && timeout 1200 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --epochs 150 --batch-size 16 --multi-step 16 \
  --workdir .runs/vocab150 --set save_every=10 --set gan_weight=0.0 \
  --seed 0 > .runs/vocab150_part1.log 2>&1
wait_chip && timeout 3600 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --epochs 150 --batch-size 16 --multi-step 16 \
  --workdir .runs/vocab150 --set save_every=10 --set gan_weight=0.0 \
  --seed 0 > .runs/vocab150_part2.log 2>&1

# 4. End-to-end disk-pipeline throughput (VERDICT r04 #3 / advisor): the
#    reference's actual entry path (disk PNGs + JSON annotations).
wait_chip && timeout 1800 python benchmarks/e2e_train_bench.py --batch 128 \
  --out benchmarks/e2e_train_bench_r05.json > .runs/e2e_bs128.log 2>&1
wait_chip && timeout 1800 python benchmarks/e2e_train_bench.py --batch 16 \
  --out benchmarks/e2e_train_bench_r05_bs16.json > .runs/e2e_bs16.log 2>&1

# 5. Isolated-step bench with the lane-padded output conv (perf capture).
wait_chip && timeout 1800 python bench.py > .runs/bench_r05_lanepad.json 2>.runs/bench_r05_lanepad.err

echo ALLDONE
