#!/bin/bash
# Round-4 chip captures (serialized — the chip is a single shared resource).
# Run AFTER the long run releases the chip. Each bench is deadline-supervised
# by bench.py itself.
set -x
cd "$(dirname "$0")/.."

# 1. Per-variant train-step benches (VERDICT #3/#4): best batch size from
#    the r03 sweeps + the reference scale 16.
BENCH_VARIANT=vanilla BENCH_BATCH_SIZES=128,16 python bench.py \
  > benchmarks/bench_vanilla_r04.json 2> /tmp/bench_vanilla.log
BENCH_VARIANT=lr_sh BENCH_BATCH_SIZES=128,16 python bench.py \
  > benchmarks/bench_lr_sh_r04.json 2> /tmp/bench_lr_sh.log
BENCH_VARIANT=unet BENCH_BATCH_SIZES=128,16 python bench.py \
  > benchmarks/bench_unet_r04.json 2> /tmp/bench_unet.log

# 2. oldv r04: batch sweep (VERDICT #3).
BENCH_VARIANT=oldv BENCH_BATCH_SIZES=128,64,256 python bench.py \
  > benchmarks/bench_oldv_r04.json 2> /tmp/bench_oldv.log

# 3. Input-pipeline bench on the real TPU (VERDICT #6).
python benchmarks/loader_bench.py --images 24 --anns 8 --epochs 3 \
  --out benchmarks/loader_bench_r04.json > /tmp/loader_bench.log 2>&1

# 4. Multi-step probes (extras — last so a budget cutoff loses these first).
#    oldv at the reference scale: 56.75 ms/step at bs=16 means dispatch
#    latency is a real fraction. v2: does amortizing the tunnel dispatch
#    move the headline?
BENCH_VARIANT=oldv BENCH_BATCH_SIZES=16,64 BENCH_MULTISTEP=8 python bench.py \
  > benchmarks/bench_oldv_multistep_r04.json 2> /tmp/bench_oldv_ms.log
BENCH_BATCH_SIZES=128,16 BENCH_MULTISTEP=8 python bench.py \
  > benchmarks/bench_v2_multistep_r04.json 2> /tmp/bench_v2_ms.log

echo ALLDONE
