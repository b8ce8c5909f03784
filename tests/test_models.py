"""Shape and behavior tests for every generator variant + discriminator.

Includes the regression encoding SURVEY.md §2.9: the "unet" variant must
produce full-resolution output (the reference's own unet decoder was
shape-broken and never ran; ours implements the corrected topology).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.models import PatchDiscriminator, VAEGANGenerator

pytestmark = pytest.mark.slow  # full-resolution model compiles

VARIANTS = ["vanilla", "lr_sh", "unet", "v2", "oldv"]


def make_inputs(cfg, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    image = jnp.asarray(
        rng.uniform(0, 1, (batch, cfg.patch_h, cfg.patch_w, 3)),
        jnp.float32)
    mask = jnp.asarray(
        rng.uniform(0, 1, (batch, cfg.patch_h, cfg.patch_w, 1)), jnp.float32)
    if cfg.text_encoder == "sbert":
        text = jnp.asarray(rng.normal(0, 1, (batch, cfg.sbert_dim)),
                           jnp.float32)
    else:
        text = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (batch, cfg.max_text_len)),
            jnp.int32)
    return image, mask, text


def init_and_apply(cfg, batch=2, train=True):
    model = VAEGANGenerator(cfg=cfg, train=train)
    image, mask, text = make_inputs(cfg, batch)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, image, mask, text)
    out, updated = model.apply(
        variables, image, mask, text,
        rngs={"sample": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"] if train else [])
    return out, variables


@pytest.mark.parametrize("variant", VARIANTS)
def test_generator_shapes(variant):
    # Small patch to keep CPU tests fast; all resolutions are config-driven.
    cfg = get_config(variant, patch_h=32, patch_w=64, compute_dtype="float32")
    (recon, mu, logvar), _ = init_and_apply(cfg)
    assert recon.shape == (2, 32, 64, 3)
    assert mu.shape == (2, 1, 1, cfg.z_ch)
    assert logvar.shape == (2, 1, 1, cfg.z_ch)
    r = np.asarray(recon)
    assert np.all(r >= 0.0) and np.all(r <= 1.0), "sigmoid output range"
    assert np.all(np.isfinite(r))


def test_full_resolution_v2():
    cfg = get_config("v2", compute_dtype="float32")
    (recon, mu, logvar), variables = init_and_apply(cfg, batch=1)
    assert recon.shape == (1, 64, 448, 3)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # ~60M generator params (SURVEY.md §6, derived from layer specs).
    assert 40e6 < n_params < 90e6, f"param count {n_params}"


def test_unet_variant_runs_full_res():
    """Regression for the reference's broken unet decoder (SURVEY.md §2.9)."""
    cfg = get_config("unet", compute_dtype="float32")
    (recon, _, _), _ = init_and_apply(cfg, batch=1)
    assert recon.shape == (1, 64, 448, 3)


def test_oldv_latent_is_div8():
    cfg = get_config("oldv", patch_h=32, patch_w=64, compute_dtype="float32")
    assert cfg.num_levels == 3
    assert cfg.latent_h == 4 and cfg.latent_w == 8


def test_discriminator_patch_logits():
    disc = PatchDiscriminator()
    x = jnp.zeros((2, 64, 448, 3), jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), x)
    y, updated = disc.apply(variables, x, mutable=["spectral"])
    # 3 stride-2 convs + ... : 64x448 -> 32x224 -> 16x112 -> 8x56 -> 4x28
    # then k4 s1 p1: 3x27 (torch formula (4-4+2)/1+1).
    assert y.shape == (2, 3, 27, 1)
    assert "spectral" in updated


def test_discriminator_spectral_updates_only_when_mutable():
    disc = PatchDiscriminator(update_sn=False)
    x = jnp.ones((1, 32, 64, 3), jnp.float32)
    variables = PatchDiscriminator().init(jax.random.PRNGKey(0), x)
    y1 = disc.apply(variables, x)
    y2 = disc.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_generator_bf16_forward():
    cfg = get_config("v2", patch_h=32, patch_w=64,
                     compute_dtype="bfloat16")
    (recon, mu, logvar), _ = init_and_apply(cfg)
    assert recon.dtype == jnp.float32  # outputs promoted back to f32
    assert np.all(np.isfinite(np.asarray(recon)))
