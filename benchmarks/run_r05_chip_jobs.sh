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

mkdir -p .runs

# 1. Full GAN-on conditioning run (VERDICT r04 #2): the 30-epoch pilot
#    showed healthy adversarial dynamics (D-loss 0.9->0.14, mark-recovery
#    0 -> 0.78) on structured backgrounds with the full v2 reference loss
#    (gan_weight=0.15). Run to 120 epochs for the committed artifact.
timeout 3600 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --synthetic-structured --epochs 120 --batch-size 16 --multi-step 16 \
  --workdir .runs/gan_full --set save_every=10 --seed 0 \
  > .runs/gan_full.log 2>&1

# 2. Ablation evals for #1 (true vs shuffled text on held-out samples).
timeout 1200 python -m vae_gan_mark_tpu.eval --variant v2 \
  --workdir .runs/gan_full --synthetic --synthetic-samples 256 \
  --synthetic-text-vocab 8 --synthetic-text-tile --synthetic-structured \
  2>/dev/null | tail -1 > .runs/gan_full_eval_true.json
timeout 1200 python -m vae_gan_mark_tpu.eval --variant v2 \
  --workdir .runs/gan_full --synthetic --synthetic-samples 256 \
  --synthetic-text-vocab 8 --synthetic-text-tile --synthetic-structured \
  --shuffle-text 2>/dev/null | tail -1 > .runs/gan_full_eval_shuf.json

# 3. Vocab run to its stated 150-epoch target (VERDICT r04 #6). The
#    epoch-106 checkpoint died with the build host (infra reset wiped the
#    workdir), so this is a fresh seed-identical run — deliberately
#    interrupted at epoch ~100 (timeout) and resumed, so the committed
#    record also shows the resume machinery doing its job at run scale.
timeout 1200 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --epochs 150 --batch-size 16 --multi-step 16 \
  --workdir .runs/vocab150 --set save_every=10 --set gan_weight=0.0 \
  --seed 0 > .runs/vocab150_part1.log 2>&1
timeout 3600 python -m vae_gan_mark_tpu.train --variant v2 --synthetic \
  --synthetic-samples 2048 --synthetic-text-vocab 8 --synthetic-text-tile \
  --epochs 150 --batch-size 16 --multi-step 16 \
  --workdir .runs/vocab150 --set save_every=10 --set gan_weight=0.0 \
  --seed 0 > .runs/vocab150_part2.log 2>&1

# 4. End-to-end disk-pipeline throughput (VERDICT r04 #3 / advisor): the
#    reference's actual entry path (disk PNGs + JSON annotations).
timeout 1800 python benchmarks/e2e_train_bench.py --batch 128 \
  --out benchmarks/e2e_train_bench_r05.json > .runs/e2e_bs128.log 2>&1
timeout 1800 python benchmarks/e2e_train_bench.py --batch 16 \
  --out benchmarks/e2e_train_bench_r05_bs16.json > .runs/e2e_bs16.log 2>&1

# 5. Isolated-step bench with the lane-padded output conv (perf capture).
timeout 1800 python bench.py > .runs/bench_r05_lanepad.json 2>.runs/bench_r05_lanepad.err

echo ALLDONE
