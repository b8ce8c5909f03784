"""Exact-equivalence tests: row-factored SpatialFiLM vs the naive
full-resolution path (same parameters, same batch, float32).

The fast path is an algebraic refactoring (the upsampled height-1 text map is
constant along y, so the 3x3 conv collapses to three row types), not an
approximation — outputs and BN running-stat updates must agree to float
round-off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.ops.film import SpatialFiLM


def run_path(fast, train, x, tmap, variables):
    m = SpatialFiLM(num_features_main=x.shape[-1], train=train, fast=fast)
    if train:
        out, updated = m.apply(variables, x, tmap, mutable=["batch_stats"])
        return out, updated["batch_stats"]
    return m.apply(variables, x, tmap), None


@pytest.mark.parametrize("h,w", [(8, 56), (64, 448), (3, 16)])
def test_fast_equals_naive_train(h, w):
    rng = np.random.default_rng(0)
    b, c_main, c_t, w_t = 2, 12, 10, 14
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c_main)), jnp.float32)
    tmap = jnp.asarray(rng.normal(0, 1, (b, 1, w_t, c_t)), jnp.float32)
    m = SpatialFiLM(num_features_main=c_main, train=True, fast=False)
    variables = m.init(jax.random.PRNGKey(0), x, tmap)

    out_naive, bs_naive = run_path(False, True, x, tmap, variables)
    out_fast, bs_fast = run_path(True, True, x, tmap, variables)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_naive),
                               rtol=1e-3, atol=5e-5)
    for key in ("bn_mean", "bn_var"):
        np.testing.assert_allclose(
            np.asarray(bs_fast[key]), np.asarray(bs_naive[key]),
            rtol=1e-4, atol=1e-6, err_msg=key)


def test_fast_equals_naive_eval():
    rng = np.random.default_rng(1)
    b, h, w, c_main, c_t, w_t = 2, 16, 48, 8, 6, 12
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c_main)), jnp.float32)
    tmap = jnp.asarray(rng.normal(0, 1, (b, 1, w_t, c_t)), jnp.float32)
    m = SpatialFiLM(num_features_main=c_main, train=False, fast=False)
    variables = m.init(jax.random.PRNGKey(0), x, tmap)
    variables = {
        "params": variables["params"],
        "batch_stats": {"bn_mean": jnp.asarray(rng.normal(0, 1, (c_t,)),
                                               jnp.float32),
                        "bn_var": jnp.asarray(rng.uniform(0.5, 2, (c_t,)),
                                              jnp.float32)},
    }
    out_naive, _ = run_path(False, False, x, tmap, variables)
    out_fast, _ = run_path(True, False, x, tmap, variables)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_naive),
                               rtol=1e-4, atol=1e-5)


def test_fast_path_gradients_match():
    rng = np.random.default_rng(2)
    b, h, w, c_main, c_t, w_t = 2, 12, 32, 6, 4, 8
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c_main)), jnp.float32)
    tmap = jnp.asarray(rng.normal(0, 1, (b, 1, w_t, c_t)), jnp.float32)
    base = SpatialFiLM(num_features_main=c_main, train=True, fast=False)
    variables = base.init(jax.random.PRNGKey(0), x, tmap)

    def loss(params, fast):
        m = SpatialFiLM(num_features_main=c_main, train=True, fast=fast)
        out, _ = m.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         x, tmap, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(out))

    g_naive = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_fast = jax.grad(lambda p: loss(p, True))(variables["params"])
    for key in g_naive:
        np.testing.assert_allclose(
            np.asarray(g_fast[key]), np.asarray(g_naive[key]),
            rtol=2e-3, atol=1e-4, err_msg=key)


@pytest.mark.parametrize("h,w,h_t,w_t", [(8, 16, 4, 8), (64, 448, 4, 28),
                                         (16, 32, 3, 8)])
def test_strip_path_taller_text_maps(h, w, h_t, w_t):
    """oldv-style text maps (height > 1) use the strip-factored path — must
    equal the naive full-resolution conv exactly."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, 4)), jnp.float32)
    tmap = jnp.asarray(rng.normal(0, 1, (2, h_t, w_t, 6)), jnp.float32)
    m = SpatialFiLM(num_features_main=4, train=True, fast=True)
    variables = m.init(jax.random.PRNGKey(0), x, tmap)
    out, bs = m.apply(variables, x, tmap, mutable=["batch_stats"])
    m2 = SpatialFiLM(num_features_main=4, train=True, fast=False)
    out2, bs2 = m2.apply(variables, x, tmap, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-3, atol=5e-5)
    for key in ("bn_mean", "bn_var"):
        np.testing.assert_allclose(
            np.asarray(bs["batch_stats"][key]),
            np.asarray(bs2["batch_stats"][key]), rtol=1e-4, atol=1e-6)


def test_strip_path_gradients_match():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 32, 6)), jnp.float32)
    tmap = jnp.asarray(rng.normal(0, 1, (2, 4, 8, 4)), jnp.float32)
    base = SpatialFiLM(num_features_main=6, train=True, fast=False)
    variables = base.init(jax.random.PRNGKey(0), x, tmap)

    def loss(params, fast):
        m = SpatialFiLM(num_features_main=6, train=True, fast=fast)
        out, _ = m.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         x, tmap, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(out))

    g_naive = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_fast = jax.grad(lambda p: loss(p, True))(variables["params"])
    for key in g_naive:
        np.testing.assert_allclose(
            np.asarray(g_fast[key]), np.asarray(g_naive[key]),
            rtol=2e-3, atol=1e-4, err_msg=key)
