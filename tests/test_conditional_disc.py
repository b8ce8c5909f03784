"""Opt-in projection-conditional discriminator (models/discriminator.py).

The reference D is unconditional (vae-gan.py:148-159); cond_vocab=0 must
be byte-identical to it. cond_vocab>0 adds the Miyato-Koyama projection
head so D can judge realism *given the string* — the structural fix the
five-run GAN-conditioning series points to
(examples/vocab_run/gan007_continuation/README.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.synthetic import device_batch, SyntheticPatchDataset
from vae_gan_mark_tpu.models.discriminator import PatchDiscriminator
from vae_gan_mark_tpu.models.vgg import load_vgg_params
from vae_gan_mark_tpu.train.state import create_train_state
from vae_gan_mark_tpu.train.step import jit_train_step

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
            batch_size=4)


def test_default_off_is_reference_tree():
    x = jnp.zeros((2, 32, 64, 3))
    ref = PatchDiscriminator().init(jax.random.PRNGKey(0), x)
    new = PatchDiscriminator(cond_vocab=0).init(jax.random.PRNGKey(0), x,
                                                None)
    assert (jax.tree_util.tree_structure(ref)
            == jax.tree_util.tree_structure(new))
    for name in ref["params"]:
        assert "cond" not in name


def test_projection_head_is_text_sensitive():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 32, 64, 3)),
                    jnp.float32)
    tok_a = jnp.asarray([[1, 2, 3, 0], [4, 5, 6, 0]], jnp.int32)
    tok_b = jnp.asarray([[6, 5, 4, 0], [3, 2, 1, 0]], jnp.int32)
    d = PatchDiscriminator(cond_vocab=8, update_sn=False)
    p = d.init(jax.random.PRNGKey(0), x, tok_a)
    assert any("cond" in k for k in p["params"])
    out_a = d.apply(p, x, tok_a)
    out_b = d.apply(p, x, tok_b)
    assert out_a.shape == out_b.shape
    assert float(jnp.max(jnp.abs(out_a - out_b))) > 0


@pytest.mark.slow
def test_conditional_train_step_runs():
    cfg = get_config("v2", **{**TINY, "conditional_disc": True})
    ds = SyntheticPatchDataset(cfg, num_samples=8, seed=0)
    batch = device_batch(ds.batch(4, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    assert any("cond" in k for k in state.d_params)
    step = jit_train_step(cfg)
    state, metrics = step(state, load_vgg_params(), batch,
                          jax.random.PRNGKey(1), jnp.float32(0.001))
    for v in metrics.values():
        assert np.isfinite(float(v))
