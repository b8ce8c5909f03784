"""MFU-ceiling probe (VERDICT r2 #3): is v2's MFU 0.49 a structural
lane-utilization ceiling, or is there headroom?

DESIGN.md argues the 64-channel first stage fills only 64 of the MXU's 128
lanes and that ~0.5 MFU is therefore structural for the reference's channel
plan. This probe tests that claim with a control experiment: the SAME train
step at bs=128 with every stage's channel count doubled (128/256/512/1024 —
not a parity config, purely a lane-utilization control). If the doubled
config's MFU jumps toward ~0.8, the lane story is confirmed; if it stays
~0.5, the bottleneck is elsewhere and the perf chapter stays open.

Optionally captures a jax.profiler trace of 3 steady-state steps
(--trace-dir) for kernel-level attribution.

Usage (on the TPU):
    python benchmarks/mfu_probe.py --out benchmarks/mfu_probe_r03.json \
        [--trace-dir benchmarks/trace_bs128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(cfg, label, batch_size, steps, peak_tflops, trace_dir=None):
    import jax
    import jax.numpy as jnp
    from vae_gan_mark_tpu.data.synthetic import (
        SyntheticPatchDataset, device_batch)
    from vae_gan_mark_tpu.models.vgg import load_vgg_params
    from vae_gan_mark_tpu.train.state import create_train_state
    from vae_gan_mark_tpu.train.step import jit_train_step

    ds = SyntheticPatchDataset(cfg, num_samples=batch_size, seed=0)
    batch = device_batch(ds.batch(batch_size, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    vgg = load_vgg_params()
    step = jit_train_step(cfg)
    rng = jax.random.PRNGKey(1)
    kl = jnp.float32(1e-3)

    step_flops = None
    try:
        cost = step.lower(state, vgg, batch, rng, kl).compile(
            ).cost_analysis()
        if cost and "flops" in cost:
            step_flops = float(cost["flops"])
    except Exception as e:
        log(f"[probe] cost_analysis unavailable: {e}")

    t0 = time.time()
    state, m = step(state, vgg, batch, rng, kl)
    float(m["loss_G"])  # axon completion barrier (block_until_ready lies)
    log(f"[probe] {label}: compile+first step {time.time() - t0:.1f}s")
    for _ in range(2):
        state, m = step(state, vgg, batch, rng, kl)
    float(m["loss_G"])

    t0 = time.time()
    for _ in range(steps):
        state, m = step(state, vgg, batch, rng, kl)
    float(m["loss_G"])
    dt = time.time() - t0
    ms = dt / steps * 1000
    ips = steps * batch_size / dt
    tflops = step_flops / (dt / steps) / 1e12 if step_flops else None
    mfu = tflops / peak_tflops if (tflops and peak_tflops) else None
    log(f"[probe] {label}: {ips:.1f} img/s, {ms:.1f} ms/step"
        + (f", {tflops:.1f} TFLOP/s" if tflops else "")
        + (f", MFU {mfu:.3f}" if mfu else ""))

    if trace_dir:
        import jax.profiler
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, m = step(state, vgg, batch, rng, kl)
        float(m["loss_G"])
        jax.profiler.stop_trace()
        log(f"[probe] {label}: trace written to {trace_dir}")

    return {"label": label, "batch": batch_size,
            "enc_chans": list(cfg.enc_chans),
            "bottleneck_ch": cfg.bottleneck_ch,
            "images_per_sec": round(ips, 2),
            "ms_per_step": round(ms, 2),
            "step_tflops": round(step_flops / 1e12, 3) if step_flops else None,
            "tflops_per_sec": round(tflops, 2) if tflops else None,
            "mfu": round(mfu, 3) if mfu else None}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/mfu_probe_r03.json")
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vae_gan_mark_tpu.config import get_config

    dev_kind = getattr(jax.devices()[0], "device_kind", "").lower()
    peak = (197.0 if "v5 lit" in dev_kind or "v5e" in dev_kind
            else 275.0 if "v4" in dev_kind else None)
    log(f"[probe] device {dev_kind!r} peak {peak} TFLOP/s bf16")

    results = []
    # Control first (it answers the question); baseline second (its number
    # is already in BENCH JSONs but re-measured here for same-run compare).
    cfg_wide = get_config("v2", enc_chans=(128, 256, 512, 1024))
    results.append(measure(cfg_wide, "v2-wide (128-1024, lane control)",
                           args.batch, args.steps, peak))
    cfg_base = get_config("v2")
    results.append(measure(cfg_base, "v2 (64-512, reference widths)",
                           args.batch, args.steps, peak,
                           trace_dir=args.trace_dir))

    out = {"device_kind": dev_kind, "peak_bf16_tflops": peak,
           "steps": args.steps, "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
