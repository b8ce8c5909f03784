"""Pallas GRU kernel: forward + custom-VJP gradients vs the lax.scan path.

Runs the kernel in interpreter mode so the test is backend-independent; on a
real TPU the same code path compiles via Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.ops.pallas.gru import fits_vmem, pallas_gru_layer
from vae_gan_mark_tpu.ops.rnn import GRULayer


def make_inputs(length=12, batch=4, emb=8, hidden=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (batch, length, emb)), jnp.float32)
    layer = GRULayer(hidden=hidden)
    variables = layer.init(jax.random.PRNGKey(0), x)
    return x, variables


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_scan(reverse):
    x, variables = make_inputs()
    ref = GRULayer(hidden=16, reverse=reverse).apply(variables, x)
    got = GRULayer(hidden=16, reverse=reverse, use_pallas=True,
                   pallas_interpret=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_scan_autodiff():
    x, variables = make_inputs(seed=1)

    def loss(params, use_pallas):
        y = GRULayer(hidden=16, use_pallas=use_pallas,
                     pallas_interpret=True).apply({"params": params}, x)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_pal = jax.grad(lambda p: loss(p, True))(variables["params"])
    for key in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_pal[key]), np.asarray(g_ref[key]),
            rtol=1e-4, atol=1e-5, err_msg=key)


def test_input_gradient_matches():
    x, variables = make_inputs(seed=2)

    def loss(xin, use_pallas):
        y = GRULayer(hidden=16, use_pallas=use_pallas,
                     pallas_interpret=True).apply(variables, xin)
        return jnp.sum(jnp.square(y))

    g_ref = jax.grad(lambda a: loss(a, False))(x)
    g_pal = jax.grad(lambda a: loss(a, True))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_vmem_guard():
    assert fits_vmem(60, 16, 256)
    assert not fits_vmem(60, 64, 256)   # 17 MB of buffers > VMEM
    assert not fits_vmem(60, 4096, 256)


def test_raw_kernel_shapes():
    length, batch, hidden = 7, 3, 8
    rng = np.random.default_rng(3)
    xp = jnp.asarray(rng.normal(0, 1, (length, batch, 3 * hidden)),
                     jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (hidden, 3 * hidden)), jnp.float32)
    b = jnp.zeros((3 * hidden,), jnp.float32)
    out = pallas_gru_layer(xp, w, b, True)
    assert out.shape == (length, batch, hidden)
    assert np.all(np.isfinite(np.asarray(out)))
