"""Probe: width-fold lane packing for the lane-starved full-res conv stages.

Round-3 measured WHY the v2 step plateaus at MFU 0.49 (mfu_probe_r03.json +
trace): the full-resolution small-channel stages (64-ch v2 stage 1, 32-ch
oldv stages, the 64->3 output conv) fill a fraction of the MXU's 128 lanes.
This probe measures the candidate fix — an EXACT width-fold repack:

    X[h, q, b*C + ci] = x[h, q*f + b, ci]        (fold factor f)

A SAME 3x3 conv on x equals a SAME 3x3 conv on X with a sparse rearranged
kernel (each output phase b uses 3 of the 3f (tap, input-phase) pairs; the
rest are zeros). Channels grow f*C -> full lanes; spatial rows M shrink by f.
Whether that nets out positive depends on how XLA/Mosaic schedules the
contraction (zeros in the kernel are not free) — hence: measure, don't argue.

Candidates (each fwd+bwd, timed in isolation at bs=128 on the chip):
  v2_stage1   3x3 64->64 conv at 64x448 (v2 encoder stage 1 / decoder last)
  oldv_stage1 3x3 32->32 conv at 64x448 (oldv's worst starvation)
  out_conv    1x1 64->3 output conv (4.8 ms in the r03 trace) — fold is a
              block-diagonal matmul here (no cross-phase taps), so K fills
              sublanes and M halves with zero wasted contraction.

Equivalence is asserted (f32, small shape) before anything is timed.

Usage:  python benchmarks/pack_probe.py [--out benchmarks/pack_probe_r04.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def fold_w(x, f):
    """(B,H,W,C) -> (B,H,W/f,f*C); phase-major channels X[...,b*C+c]."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def unfold_w(x, f):
    b, h, q, fc = x.shape
    return x.reshape(b, h, q * f, fc // f)


def pack_kernel_3x3(k, f):
    """Naive (3,3,Cin,Cout) SAME kernel -> packed (3,3,f*Cin,f*Cout).

    KP[dh, dq, b_in*Cin+ci, b_out*Cout+co] = K[dh, dw, ci, co] where
    dq-1 = floor((b_out + dw-1)/f) and b_in = (b_out + dw-1) mod f.
    """
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    kp = np.zeros((3, 3, f * cin, f * cout), k.dtype)
    for b_out in range(f):
        for dw in (-1, 0, 1):
            pos = b_out + dw
            dq = pos // f          # -1, 0 or +1 (floor division)
            b_in = pos % f
            kp[:, dq + 1, b_in * cin:(b_in + 1) * cin,
               b_out * cout:(b_out + 1) * cout] = k[:, dw + 1]
    return kp


def pack_kernel_1x1(k, f):
    """(1,1,Cin,Cout) -> (1,1,f*Cin,f*Cout) block-diagonal (pure matmul)."""
    _, _, cin, cout = k.shape
    kp = np.zeros((1, 1, f * cin, f * cout), k.dtype)
    for b in range(f):
        kp[0, 0, b * cin:(b + 1) * cin, b * cout:(b + 1) * cout] = k[0, 0]
    return kp


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check_equivalence():
    rng = np.random.default_rng(0)
    for cin, cout, ksz in ((32, 32, 3), (64, 64, 3), (64, 3, 1)):
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 32, cin)), jnp.float32)
        k = rng.normal(0, 0.1, (ksz, ksz, cin, cout)).astype(np.float32)
        want = conv(x, jnp.asarray(k))
        for f in (2, 4):
            kp = (pack_kernel_3x3(k, f) if ksz == 3
                  else pack_kernel_1x1(k, f))
            got = unfold_w(conv(fold_w(x, f), jnp.asarray(kp)), f)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)
    print("[pack_probe] equivalence ok (f=2,4 for 3x3x32, 3x3x64, 1x1 64->3)")


def time_fwd_bwd(fn, args, iters=30):
    loss = jax.jit(lambda *a: jnp.sum(fn(*a)))
    g = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))
    out = g(*args)
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].ravel()[0])  # completion barrier
    t0 = time.time()
    for _ in range(iters):
        out = g(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.time() - t0) / iters * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/pack_probe_r04.json")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    check_equivalence()
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(1)
    B, H, W = args.batch, 64, 448
    results = {"platform": platform, "batch": B, "cases": {}}

    cases = [
        ("v2_stage1_3x3_64to64", 64, 64, 3),
        ("oldv_stage1_3x3_32to32", 32, 32, 3),
        ("out_conv_1x1_64to3", 64, 3, 1),
    ]
    for name, cin, cout, ksz in cases:
        x = jnp.asarray(rng.normal(0, 1, (B, H, W, cin)), jnp.bfloat16)
        k = rng.normal(0, 0.1, (ksz, ksz, cin, cout)).astype(np.float32)
        kj = jnp.asarray(k, jnp.bfloat16)
        entry = {}
        entry["naive_ms"] = round(time_fwd_bwd(conv, (x, kj)), 3)
        for f in (2, 4):
            if (f * cin) > 512:
                continue
            kp = (pack_kernel_3x3(k, f) if ksz == 3
                  else pack_kernel_1x1(k, f))
            kpj = jnp.asarray(kp, jnp.bfloat16)
            xp = fold_w(x, f)

            def packed(xp_, kp_, f=f):
                return conv(xp_, kp_)   # fold/unfold excluded: stage-level
            # integration keeps activations packed end to end, so the
            # repack cost is paid once per stage chain, not per conv.
            entry[f"fold{f}_ms"] = round(time_fwd_bwd(packed, (xp, kpj)), 3)
        results["cases"][name] = entry
        print(f"[pack_probe] {name}: {entry}")

    with open(args.out, "w") as fo:
        json.dump(results, fo, indent=1)
    print(f"[pack_probe] wrote {args.out}")


if __name__ == "__main__":
    main()
