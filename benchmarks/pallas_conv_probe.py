"""Probe: can a Pallas kernel beat XLA's conv on the lane-starved full-res
3x3 convolutions?

Motivation (round-4 VERDICT #2/#3): the v2/oldv MFU gap is pinned on the
full-resolution low-channel stages (benchmarks/mfu_probe_r03.json measures
0.655 reachable with filled lanes vs 0.491 at the reference's 64 channels;
the reference architecture is vae-gan-v2.py:152-187 stage 1). XLA's conv
emitter contracts over the 64 input channels — half the MXU's 128 lanes —
and the width-fold repack (benchmarks/fold.py) that fills lanes in XLA pays f-times
structural-zero FLOPs and did not transfer end-to-end
(benchmarks/fold_e2e_probe_r04.json).

The Pallas candidate ("superP") fills lanes with LESS waste than the XLA
fold can: width-fold the input by f (a free reshape), then im2col only the
f+2 width positions that the f output phases of a block actually read, per
row tap. One (SH, Q, 3*(f+2)*C) @ (3*(f+2)*C, f*C) MXU matmul per 8-row
strip computes all f output phases:

  * f=2, C=64  (v2 stage 1): contraction 768, output width 128, 25%
    structural zeros in the packed kernel (the XLA-level fold2 repack
    carries 50% — it cannot prune the never-read (dq, phase) blocks).
  * f=4, C=32 (oldv stage 1): contraction 576, output width 128, 50% zeros
    (vs naive's 32/128 = 25% lane fill).

The kernel walks 8-row strips: async-DMA the strip (+1 halo row each side)
from HBM, build P with three aligned VMEM writes per row tap, one dot.
Exact math (f32 accumulation) — verified against lax.conv_general_dilated
on every run before timing.

Results land in benchmarks/pallas_conv_probe_r04.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SH = 8  # rows per strip


def pack_kernel_superp(k: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3,3,C,Co) logical kernel -> (3*(f+2)*C, f*Co) packed for superP.

    P row layout, per row-tap t in {0,1,2} (t = dh+1): the f+2 width
    positions block q's outputs read at that row —
      slot 0:       q-1, phase f-1
      slot 1+i:     q,   phase i          (i in 0..f-1)
      slot f+1:     q+1, phase 0
    (C channels per slot). Column block b in {0..f-1} is the output phase;
    phase b reads logical taps (fq+b-1, fq+b, fq+b+1) = slots (b, b+1, b+2):

      KP[(t*(f+2) + b + j)*C : +C, b*Co : (b+1)*Co] = K[t, j]  j in {0,1,2}

    Zero fraction: 1 - 3/(f+2)  (f=2: 25%, f=4: 50%).
    """
    c, co = k.shape[2], k.shape[3]
    kp = jnp.zeros((3 * (f + 2) * c, f * co), k.dtype)
    for t in range(3):
        for b in range(f):
            for j in range(3):
                row = (t * (f + 2) + b + j) * c
                kp = kp.at[row:row + c, b * co:(b + 1) * co].set(k[t, j])
    return kp


def _superp_kernel(x_hbm, kp_ref, out_ref, slab, p, sem, *, f: int, c: int):
    """Grid (N, H/SH). x_hbm: (N, H+2, QP, f*C) prepadded+folded in HBM.
    out: (N, H/SH, SH, Q, f*C) folded. kp: (3*(f+2)*C, f*C)."""
    n = pl.program_id(0)
    s = pl.program_id(1)
    q = out_ref.shape[3]
    slot = f + 2

    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(s * SH, SH + 2)], slab, sem)
    cp.start()
    cp.wait()

    for t in range(3):
        base = t * slot * c
        # Dense middle: block q, all f phases — one aligned f*C write.
        p[:, :, base + c: base + (f + 1) * c] = slab[t:t + SH, 1:q + 1, :]
        # Left neighbour's last phase and right neighbour's first phase.
        p[:, :, base: base + c] = slab[t:t + SH, 0:q, (f - 1) * c:]
        p[:, :, base + (f + 1) * c: base + slot * c] = (
            slab[t:t + SH, 2:q + 2, :c])

    acc = jnp.dot(p[:], kp_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def conv3x3_superp(x: jnp.ndarray, k: jnp.ndarray, f: int = 2,
                   interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 3x3 conv, NHWC, via the fold-f superP Pallas kernel.
    C_out == C_in == C; W divisible by f; H divisible by SH."""
    n, h, w, c = x.shape
    co = k.shape[3]
    assert co == c and w % f == 0 and h % SH == 0, (h, w, c, co, f)
    q = w // f
    dt = x.dtype
    # DMA slices need the sublane (second-to-last) dim 8-aligned: pad the
    # folded width q+2 up to a multiple of 8 (the kernel never reads past
    # block q+1).
    qp = -(-(q + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (f, f + f * (qp - q - 2)), (0, 0)))
    x2 = xp.reshape(n, h + 2, qp, f * c)
    kp = pack_kernel_superp(k.astype(dt), f)

    out = pl.pallas_call(
        functools.partial(_superp_kernel, f=f, c=c),
        grid=(n, h // SH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * (f + 2) * c, f * c), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, SH, q, f * c),
                               lambda i, s: (i, s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // SH, SH, q, f * c), dt),
        scratch_shapes=[
            pltpu.VMEM((SH + 2, qp, f * c), dt),
            pltpu.VMEM((SH, q, 3 * (f + 2) * c), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x2, kp)
    return out.reshape(n, h, q, f * c).reshape(n, h, w, c)


def conv3x3_xla(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check(shape, c, f, interpret):
    n, h, w = shape
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, w, c), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (3, 3, c, c), jnp.float32) * (1 / (3 * c**0.5))
    ref = conv3x3_xla(x, k).astype(jnp.float32)
    y = conv3x3_superp(x, k, f=f, interpret=interpret).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    print(f"  superp f={f} c={c}: rel max err {err:.2e}")
    assert err < 5e-2, err  # bf16 matmul tolerance
    return err


def bench_one(fn, x, k, iters=30):
    f = jax.jit(fn)
    y = f(x, k)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x, k)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--out", default="benchmarks/pallas_conv_probe_r04.json")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")

    if args.check:
        interp = platform not in ("tpu", "axon")
        print("exactness (2,16,32):")
        check((2, 16, 32), 64, 2, interp)
        check((2, 16, 32), 32, 4, interp)
        print("exactness (2,64,448):")
        check((2, 64, 448), 64, 2, interp)
        check((2, 64, 448), 32, 4, interp)
        print("OK")

    if args.bench:
        results = {"platform": platform, "sh": SH, "cases": {}}
        for label, (n, h, w, c, f) in {
            "v2_full_res_64ch_f2": (128, 64, 448, 64, 2),
            "oldv_full_res_32ch_f4": (64, 64, 448, 32, 4),
        }.items():
            kx, kk = jax.random.split(jax.random.PRNGKey(0))
            x = jax.random.normal(
                kx, (n, h, w, c), jnp.float32).astype(jnp.bfloat16)
            k = jax.random.normal(kk, (3, 3, c, c), jnp.float32) * 0.05
            flops = 2 * n * h * w * 9 * c * c
            row = {"shape": [n, h, w, c], "fold": f,
                   "logical_gflop": round(flops / 1e9, 2)}
            ref = conv3x3_xla(x, k).astype(jnp.float32)
            sp = functools.partial(conv3x3_superp, f=f)
            for name, fn in (("xla", conv3x3_xla), ("superp", sp)):
                try:
                    if name != "xla":
                        y = jax.jit(fn)(x, k).astype(jnp.float32)
                        err = float(jnp.max(jnp.abs(y - ref))
                                    / jnp.max(jnp.abs(ref)))
                        row[f"{name}_relerr"] = round(err, 6)
                    ms = bench_one(fn, x, k)
                    row[f"{name}_ms"] = round(ms, 3)
                    row[f"{name}_tflops"] = round(flops / ms / 1e9, 1)
                except Exception as e:  # noqa: BLE001 — record, keep going
                    row[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            results["cases"][label] = row
            print(label, json.dumps(row))
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
