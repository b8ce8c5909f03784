"""Eval metrics + full-image paste-back inference round trip."""

import numpy as np

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.tokenizer import CharTokenizer
from vae_gan_mark_tpu.eval import (
    mark_recovery_rate, masked_l1, psnr, render_full_image)
from vae_gan_mark_tpu.models import VAEGANGenerator


def test_psnr_basics():
    x = jnp.ones((2, 8, 8, 3)) * 0.5
    assert float(psnr(x, x)) > 100.0
    noisy = x + 0.1
    assert 19.0 < float(psnr(noisy, x)) < 21.0  # 20 dB for mse=0.01


def test_masked_metrics():
    pred = jnp.zeros((1, 4, 4, 3))
    target = jnp.ones((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
    assert float(masked_l1(pred, target, mask)) == 1.0
    assert float(mark_recovery_rate(pred, target, mask)) == 0.0
    assert float(mark_recovery_rate(target, target, mask)) == 1.0


def test_render_full_image_roundtrip():
    cfg = get_config("v2", patch_h=32, patch_w=64, compute_dtype="float32",
                     enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
                     char_emb_dim=16, char_rnn_hidden=16, max_text_len=12)
    model = VAEGANGenerator(cfg=cfg, train=False)
    rng = np.random.default_rng(0)
    h_src, w_src = 100, 160
    image = rng.uniform(0, 1, (h_src, w_src, 3)).astype(np.float32)
    mask = np.zeros((h_src, w_src, 1), np.float32)
    mask[20:60, 30:120] = 1.0
    quad = np.array([[30, 20], [120, 22], [118, 60], [28, 58]], np.float32)
    tok = CharTokenizer(cfg.alphabet, cfg.max_text_len)
    text = tok.encode(["HELLO"])[0]

    ru = jnp.zeros((1, cfg.patch_h, cfg.patch_w, 3))
    mk = jnp.zeros((1, cfg.patch_h, cfg.patch_w, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        ru, mk, jnp.asarray(text)[None])

    out = render_full_image(cfg, variables["params"],
                            variables.get("batch_stats", {}),
                            image, mask, quad, text)
    out = np.asarray(out)
    assert out.shape == (h_src, w_src, 3)
    # Outside the quad, the original image is untouched.
    far_corner = out[85:, 140:]
    np.testing.assert_allclose(far_corner, image[85:, 140:], atol=1e-5)
    # Inside, the generator wrote something different from the input.
    assert not np.allclose(out[30:50, 50:100], image[30:50, 50:100])
    assert np.all(np.isfinite(out))
