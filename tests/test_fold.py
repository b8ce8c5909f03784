"""Equivalence tests for width-fold lane packing (ops/fold.py).

The fold is a layout optimization, not an approximation: outputs, gradients
(wrt inputs AND the logical kernel), BN running-stat updates, and the
parameter tree must all match the unfolded path. Tolerances are float32
rounding only (the packed conv accumulates taps in a different order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_gan_mark_tpu.ops.fold import (
    FoldConv, fold_factor_for, fold_width, pack_kernel_3x3, unfold_width)


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


def test_foldconv_param_tree_matches_nn_conv():
    """FoldConv named "Conv_0" yields the identical parameter tree to the
    unfolded ConvBNRelu — checkpoints are layout-independent."""
    from vae_gan_mark_tpu.ops.convblocks import ConvBNRelu
    x = jnp.zeros((1, 4, 8, 6))
    v0 = ConvBNRelu(10, use_bias=False, train=False).init(
        jax.random.PRNGKey(7), x)
    v2 = ConvBNRelu(10, use_bias=False, train=False, fold=2).init(
        jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_foldconv_forward_matches_unfolded():
    from vae_gan_mark_tpu.ops.convblocks import DoubleConvBlock
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 5)), jnp.float32)
    base = DoubleConvBlock(12, train=True)
    folded = DoubleConvBlock(12, train=True, fold=2)
    variables = base.init(jax.random.PRNGKey(3), x)

    def run(m, v):
        return m.apply(v, x, mutable=["batch_stats"])

    y0, s0 = run(base, variables)
    y2, s2 = run(folded, variables)     # same variables: shared param tree
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0),
                               rtol=1e-3, atol=1e-4)
    # BN running stats (computed on the unfolded activations) match too.
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_fold_factor_for_guards():
    assert fold_factor_for((2, 1), 0, 64) == 2
    assert fold_factor_for((2, 1), 1, 32) == 1
    assert fold_factor_for((2,), 5, 64) == 1      # level beyond tuple
    assert fold_factor_for((3,), 0, 64) == 1      # 64 % 3 != 0
    assert fold_factor_for((), 0, 64) == 1


def test_generator_train_step_fold_equivalence():
    """Tiny v2: two jitted train steps with lane_fold on vs off produce the
    same losses and parameters to float32 rounding."""
    from vae_gan_mark_tpu.config import get_config
    from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset
    from vae_gan_mark_tpu.models.vgg import load_vgg_params
    from vae_gan_mark_tpu.train.state import create_train_state
    from vae_gan_mark_tpu.train.step import jit_train_step

    kw = dict(patch_h=32, patch_w=64, enc_chans=(8, 16), bottleneck_ch=24,
              z_ch=8, char_emb_dim=8, char_rnn_hidden=8, max_text_len=8,
              compute_dtype="float32", char_rnn_dropout=0.0, batch_size=4)
    cfgs = [get_config("v2", **kw),
            get_config("v2", lane_fold=(2, 2), **kw)]
    ds = SyntheticPatchDataset(cfgs[0], num_samples=8, seed=0)
    batches = [
        {k: jnp.asarray(v) for k, v in ds.batch(4, i).items()
         if k != "raw_text"} for i in range(2)]

    results = []
    for cfg in cfgs:
        state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0])
        step = jit_train_step(cfg)
        vgg = load_vgg_params()
        rng = jax.random.PRNGKey(1)
        hist = []
        for b in batches:
            state, m = step(state, vgg, b, rng, jnp.float32(1e-3))
            hist.append({k: float(v) for k, v in m.items()})
        results.append((hist, state))

    # Tolerance rationale: the packed conv sums identical products in a
    # different order, so per-op outputs differ by last-ulp rounding (the
    # exactness of the fold itself is pinned tightly above and in
    # test_packed_conv_matches_naive). This end-to-end check is about
    # WIRING (fold applied in both encoder and decoder, BN stats, shared
    # param tree), and two D-then-G GAN steps amplify rounding: losses by
    # up to ~2e-3 rel (TPU), and Adam's 1/sqrt(v)-normalized update can
    # move a near-zero-gradient coordinate by a full update quantum
    # (~lr=1e-4) when rounding flips its tiny gradient — hence the
    # absolute tolerance of a few update quanta on parameters.
    (h0, s0), (h1, s1) = results
    for m0, m1 in zip(h0, h1):
        for k in m0:
            assert m0[k] == pytest.approx(m1[k], rel=5e-3, abs=5e-5), k
    for a, b in zip(jax.tree.leaves(s0.g_params), jax.tree.leaves(s1.g_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=3e-4)
