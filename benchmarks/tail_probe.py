"""Round-5 probe: attack the MEASURED step-time tail (VERDICT r04 #5).

The r03 trace (benchmarks/trace_bs128, tools/xplane_summary.py) pins the
non-conv-window cost of the v2 bs=128 step on a long tail: the top single
ops are the full-resolution 64-channel-stage work — the 64->3 RGB output
conv (3 of 128 MXU lanes, 4.8 ms), the 64-ch stage-1 convs and their
weight gradients, and f32[64] BN stat reductions over 64x448 maps (~10%
summed). This probe measures two *exact* (not approximate) interventions
in isolation before any wiring:

1. out-conv padding: run the 1x1 64->3 output conv as 64->8 (or ->128)
   with zero-padded kernel columns and slice the first 3 channels. Same
   math (extra columns are zeros, sliced away); the question is whether
   XLA tiles a 3-lane output onto the MXU so badly that 2.7x-43x padded
   FLOPs still win.
2. BN stat accumulation: one-pass sum/sum-of-squares with dtype=float32
   accumulation directly over the bf16 activations, vs the current
   astype(f32)-then-mean. Per-element convert-then-add is the same
   numerics; the question is whether XLA materializes the f32 copy today.

Run (on the chip): python benchmarks/tail_probe.py
Writes benchmarks/tail_probe_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timeit(fn, *args, steps=30):
    import jax
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # A host fetch is the reliable completion barrier on axon.
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / steps * 1000  # ms


def probe_out_conv(results):
    import jax
    import jax.numpy as jnp

    B, H, W, C = 128, 64, 448, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    k3 = jnp.asarray(rng.normal(0, 0.1, (1, 1, C, 3)), jnp.bfloat16)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def fwd_naive(x, k):
        return conv(x, k)

    @jax.jit
    def grad_naive(x, k):
        return jax.grad(lambda x, k: jnp.sum(jnp.sin(
            conv(x, k).astype(jnp.float32))), argnums=(0, 1))(x, k)

    def padded(pad_to):
        kp = jnp.zeros((1, 1, C, pad_to), jnp.bfloat16).at[..., :3].set(k3)

        @jax.jit
        def fwd(x, kp):
            return conv(x, kp)[..., :3]

        @jax.jit
        def grad(x, kp):
            return jax.grad(lambda x, k: jnp.sum(jnp.sin(
                conv(x, k)[..., :3].astype(jnp.float32))),
                argnums=(0, 1))(x, kp)
        return kp, fwd, grad

    results["out_conv"] = {
        "what": "1x1 64->3 output conv, bs=128 64x448 bf16 (4.8 ms fwd in "
                "the r03 trace)",
        "naive_fwd_ms": round(timeit(fwd_naive, x, k3), 3),
        "naive_fwdbwd_ms": round(timeit(grad_naive, x, k3), 3),
    }
    for pad_to in (8, 128):
        kp, fwd, grad = padded(pad_to)
        np.testing.assert_allclose(
            np.asarray(fwd(x, kp), np.float32),
            np.asarray(fwd_naive(x, k3), np.float32), rtol=1e-2, atol=1e-2)
        results["out_conv"][f"pad{pad_to}_fwd_ms"] = round(
            timeit(fwd, x, kp), 3)
        results["out_conv"][f"pad{pad_to}_fwdbwd_ms"] = round(
            timeit(grad, x, kp), 3)
    print(json.dumps(results["out_conv"], indent=1), flush=True)


def probe_bn_stats(results):
    import jax
    import jax.numpy as jnp

    B, H, W, C = 128, 64, 448, 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)

    @jax.jit
    def stats_astype(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        return mean, var

    @jax.jit
    def stats_accum(x):
        n = x.shape[0] * x.shape[1] * x.shape[2]
        s = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)
        sq = jnp.sum(jnp.square(x).astype(jnp.float32), axis=(0, 1, 2))
        mean = s / n
        return mean, sq / n - jnp.square(mean)

    m0, v0 = stats_astype(x)
    m1, v1 = stats_accum(x)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-3, atol=1e-3)
    results["bn_stats"] = {
        "what": "BN train stats over (128,64,448) per 64ch map, bf16 input "
                "(~10% of the r03 step summed across stages)",
        "astype_f32_then_mean_ms": round(timeit(stats_astype, x), 3),
        "f32_accum_reduce_ms": round(timeit(stats_accum, x), 3),
    }
    print(json.dumps(results["bn_stats"], indent=1), flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    results = {"platform": jax.devices()[0].platform}
    probe_out_conv(results)
    probe_bn_stats(results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tail_probe_r05.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
