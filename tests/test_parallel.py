"""Multi-device tests on the virtual 8-device CPU mesh.

Asserts (SURVEY.md §4): the data-parallel train step over the mesh is
numerically equivalent to the single-device step on the same global batch
(pjit DP: params replicated, batch sharded, XLA inserts the psum), and the
tensor-parallel placement changes only layout, not results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset
from vae_gan_mark_tpu.models.vgg import load_vgg_params
from vae_gan_mark_tpu.parallel.mesh import (
    make_mesh, partition_params, replicate_tree, shard_batch)
from vae_gan_mark_tpu.train.state import create_train_state
from vae_gan_mark_tpu.train.step import build_train_step

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 64), bottleneck_ch=64, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
            batch_size=8)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("v2", **TINY)
    ds = SyntheticPatchDataset(cfg, num_samples=32, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(8, 0).items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    vgg = load_vgg_params()
    return cfg, batch, state, vgg


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_dp_equivalence(setup):
    cfg, batch, state, vgg = setup
    step = jax.jit(build_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    kl = jnp.float32(1e-4)

    # Single-device result.
    s1, m1 = step(state, vgg, batch, rng, kl)

    # Data-parallel over all 8 devices.
    mesh = make_mesh(jax.devices()[:8], model_parallel=1)
    state_r = replicate_tree(state, mesh)
    vgg_r = replicate_tree(vgg, mesh)
    batch_s = shard_batch(batch, mesh)
    s8, m8 = step(state_r, vgg_r, batch_s, rng, kl)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    # Updated params agree too (not just the scalar losses).
    a = jax.tree.leaves(s1.g_params)
    b = jax.tree.leaves(s8.g_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-5)


def test_tp_placement_equivalence(setup):
    cfg, batch, state, vgg = setup
    step = jax.jit(build_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    kl = jnp.float32(1e-4)
    s1, m1 = step(state, vgg, batch, rng, kl)

    mesh = make_mesh(jax.devices()[:8], model_parallel=2)
    state_r = replicate_tree(state, mesh)
    state_r = state_r.replace(
        g_params=partition_params(state_r.g_params, mesh, kernel_min_ch=64))
    vgg_r = replicate_tree(vgg, mesh)
    batch_s = shard_batch(batch, mesh)
    s2, m2 = step(state_r, vgg_r, batch_s, rng, kl)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_graft_entry_dryrun():
    import importlib
    mod = importlib.import_module("__graft_entry__")
    mod.dryrun_multichip(8)
