"""Math checks for the width-fold lane-packing PROBE (benchmarks/fold.py).

lane_fold was a production config knob through round 4; it was demoted to a
recorded rejected optimization (VERDICT r04 weak #6): the isolated 6.8x
microbench win on the lane-starved 3x3 32-ch conv
(benchmarks/pack_probe_r04.json) does not transfer to the full train step
(benchmarks/fold_e2e_probe_r04.json: 288.0 img/s folded vs 290.4 unfolded on
oldv). The repack itself is exact; these tests pin that exactness so the
probe record stays trustworthy.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "bench_fold", os.path.join(os.path.dirname(__file__), "..",
                               "benchmarks", "fold.py"))
bench_fold = importlib.util.module_from_spec(_spec)
# flax.struct dataclass creation resolves type hints through
# sys.modules[cls.__module__]; register before exec.
sys.modules["bench_fold"] = bench_fold
_spec.loader.exec_module(bench_fold)
fold_width = bench_fold.fold_width
unfold_width = bench_fold.unfold_width
pack_kernel_3x3 = bench_fold.pack_kernel_3x3


def test_fold_unfold_roundtrip():
    x = jnp.arange(2 * 4 * 8 * 3, dtype=jnp.float32).reshape(2, 4, 8, 3)
    for f in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(unfold_width(fold_width(x, f), f)), np.asarray(x))
    # Phase-major packing: packed channel b*C+c holds column q*f+b.
    xf = fold_width(x, 2)
    np.testing.assert_array_equal(np.asarray(xf[0, 0, 0, :3]),
                                  np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(xf[0, 0, 0, 3:]),
                                  np.asarray(x[0, 0, 1]))


@pytest.mark.parametrize("f,cin,cout", [(2, 3, 5), (4, 4, 8), (2, 32, 32)])
def test_packed_conv_matches_naive(f, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 6, 16, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)), jnp.float32)

    def naive(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def folded(x, k):
        return unfold_width(
            naive(fold_width(x, f), pack_kernel_3x3(k, f)), f)

    # Tolerances are f32 accumulation-order rounding (the packed conv sums
    # the same products in a different order; near-zero sums cancel).
    want = naive(x, k)
    got = folded(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)
    # Gradients through the pack (scatter of slices) match the naive conv's.
    gw = jax.grad(lambda x, k: jnp.sum(jnp.sin(naive(x, k))), argnums=(0, 1))
    gf = jax.grad(lambda x, k: jnp.sum(jnp.sin(folded(x, k))), argnums=(0, 1))
    for a, b in zip(gw(x, k), gf(x, k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
