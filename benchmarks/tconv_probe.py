"""Probe: ConvTranspose(k2,s2) vs 1x1-conv + depth-to-space on TPU.

The v2 decoder's four upsampling ops (models/decoders.py:98, reference
`vae-gan-v2.py:209-230`) are stride-2 kernel-2 transposed convs. A k==s,
p=0 transposed conv has no output overlap, so it is algebraically a 1x1
conv producing (s*s*C_out) channels followed by depth-to-space:

    out[2i+a, 2j+b, o] = sum_c x[i,j,c] * K[a, b, c, o]

A 1x1 conv is a pure matmul — the MXU's best case — whereas
lax.conv_transpose lowers through lhs dilation, which XLA:TPU may or may
not rewrite. This probe measures both forms (fwd and fwd+bwd, bf16) at
the decoder's real shapes and asserts numerical equivalence, so the
result decides whether TConv should use the depth-to-space form.

Usage: python benchmarks/tconv_probe.py [out.json]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# (batch, h, w, c_in, c_out) for the four v2 decoder up-convs at bench
# batch 128 (stage input spatial extents; output is 2x).
SHAPES = [
    (128, 4, 28, 1024, 512),
    (128, 8, 56, 512, 256),
    (128, 16, 112, 256, 128),
    (128, 32, 224, 128, 64),
]

DTYPE = jnp.bfloat16


def tconv_ref(x, k):
    """Current form: lax.conv_transpose, kernel (2, 2, c_in, c_out)."""
    return jax.lax.conv_transpose(
        x, k, strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def tconv_d2s(x, k):
    """Equivalent form: 1x1 conv to 4*c_out channels + depth-to-space."""
    b, h, w, c_in = x.shape
    c_out = k.shape[-1]
    # lax.conv_transpose (transpose_kernel=False, as flax ConvTranspose uses)
    # applies the kernel spatially flipped relative to the plain scatter
    # out[2i+a, 2j+b] = sum_c x[i,j,c] * K[a,b,c,:], so flip before folding.
    # (2, 2, c_in, c_out) -> (1, 1, c_in, 4*c_out) with (a, b) fastest-major
    # so the reshape below scatters them to (2i+a, 2j+b).
    kf = k[::-1, ::-1]
    k11 = jnp.transpose(kf, (2, 0, 1, 3)).reshape(1, 1, c_in, 4 * c_out)
    y = jax.lax.conv_general_dilated(
        x, k11, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, h, w, 2, 2, c_out)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, 2 * h, 2 * w, c_out)


def time_fn(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    results = []
    for (b, h, w, ci, co) in SHAPES:
        key = jax.random.PRNGKey(0)
        kx, kk = jax.random.split(key)
        x = jax.random.normal(kx, (b, h, w, ci), DTYPE)
        k = jax.random.normal(kk, (2, 2, ci, co), DTYPE)

        # Numerical equivalence in f32 (bf16 matmul order can differ by ulps).
        xf, kf = x.astype(jnp.float32), k.astype(jnp.float32)
        ref = jax.jit(tconv_ref)(xf, kf)
        alt = jax.jit(tconv_d2s)(xf, kf)
        err = float(jnp.max(jnp.abs(ref - alt)))
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        assert err / scale < 1e-5, (err, scale)

        fwd_ref = time_fn(jax.jit(tconv_ref), (x, k))
        fwd_d2s = time_fn(jax.jit(tconv_d2s), (x, k))

        def loss_ref(x, k):
            return jnp.sum(jnp.square(tconv_ref(x, k).astype(jnp.float32)))

        def loss_d2s(x, k):
            return jnp.sum(jnp.square(tconv_d2s(x, k).astype(jnp.float32)))

        bwd_ref = time_fn(jax.jit(jax.grad(loss_ref, argnums=(0, 1))), (x, k))
        bwd_d2s = time_fn(jax.jit(jax.grad(loss_d2s, argnums=(0, 1))), (x, k))

        row = {"shape": [b, h, w, ci, co],
               "max_rel_err_f32": err / scale,
               "fwd_ms": {"conv_transpose": round(fwd_ref, 3),
                          "d2s": round(fwd_d2s, 3)},
               "fwd_bwd_ms": {"conv_transpose": round(bwd_ref, 3),
                              "d2s": round(bwd_d2s, 3)}}
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {"device": jax.devices()[0].device_kind, "dtype": "bfloat16",
           "results": results}
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    tot_ref = sum(r["fwd_bwd_ms"]["conv_transpose"] for r in results)
    tot_d2s = sum(r["fwd_bwd_ms"]["d2s"] for r in results)
    print(f"total fwd+bwd: conv_transpose {tot_ref:.2f} ms, "
          f"d2s {tot_d2s:.2f} ms ({tot_ref / tot_d2s:.2f}x)")


if __name__ == "__main__":
    main()
