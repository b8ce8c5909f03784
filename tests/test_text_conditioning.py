"""Text conditioning is falsifiable: the synthetic GT depends on the text,
changing tokens changes the generator output, and a trained model's output
tracks the *provided* text rather than ignoring it.

This closes the round-1 blind spot where the synthetic task was
text-independent, so training tests could pass even if the conditioning
path contributed nothing (task semantics mirror
/root/reference/vae-gan.py:267-288 — the EN patch is the region re-rendered
with the target text).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import get_config
from vae_gan_mark_tpu.data.synthetic import (
    SyntheticPatchDataset, device_batch, render_text_raster)
from vae_gan_mark_tpu.models import VAEGANGenerator
from vae_gan_mark_tpu.models.vgg import load_vgg_params
from vae_gan_mark_tpu.train.state import create_train_state
from vae_gan_mark_tpu.train.step import jit_train_step

TINY = dict(patch_h=32, patch_w=64, compute_dtype="float32",
            enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
            char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
            batch_size=8)


def test_synthetic_en_depends_on_text():
    """Same seed (same ru/mask), different texts -> different EN targets
    inside the mask, identical outside."""
    cfg = get_config("v2", **TINY)
    n = 4
    ds_a = SyntheticPatchDataset(cfg, n, seed=0, texts=["AAAA"] * n)
    ds_b = SyntheticPatchDataset(cfg, n, seed=0, texts=["xoxo"] * n)
    np.testing.assert_array_equal(ds_a.ru, ds_b.ru)
    np.testing.assert_array_equal(ds_a.mask, ds_b.mask)
    diff = np.abs(ds_a.en - ds_b.en)
    assert (diff * ds_a.mask).max() > 0.5, "EN must depend on the text"
    assert (diff * (1 - ds_a.mask)).max() == 0.0, \
        "outside the mask EN is text-independent"


def test_text_vocab_shared_across_seeds():
    """text_vocab=N draws every mark from a closed N-string vocabulary that
    is identical for train (seed s) and val (seed s+1) datasets — novel val
    images carry known marks, so conditioning is the only route to low val
    masked error (image->glyph memorization cannot transfer)."""
    cfg = get_config("v2", **TINY)
    train = SyntheticPatchDataset(cfg, 32, seed=0, text_vocab=8)
    val = SyntheticPatchDataset(cfg, 32, seed=1, text_vocab=8)
    v_train, v_val = set(train.texts), set(val.texts)
    # Seed-independent vocabulary: if each seed generated its own strings
    # the union would approach 16 distinct marks; a shared closed set
    # keeps it at <= 8.
    assert len(v_train | v_val) <= 8, sorted(v_train | v_val)
    both = SyntheticPatchDataset(cfg, 256, seed=2, text_vocab=8)
    assert len(set(both.texts)) == 8, "all 8 vocab strings appear"
    # Images still differ across seeds (novel val patches).
    assert np.abs(train.ru - val.ru).max() > 0.1


def test_render_text_raster_deterministic_and_distinct():
    a1 = render_text_raster("Hello", 16, 64)
    a2 = render_text_raster("Hello", 16, 64)
    b = render_text_raster("World", 16, 64)
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (16, 64) and 0.0 <= a1.min() and a1.max() <= 1.0
    assert a1.sum() > 0 and np.abs(a1 - b).max() > 0.5


def test_text_tile_task_semantics():
    """Watermark-style tiled task (text_tile=True): the string is rastered
    at fixed absolute positions, visible only inside the mask, glyphs cover
    a run-scale-demonstrable fraction of the masked region, and the pattern
    is text-dependent + deterministic."""
    from vae_gan_mark_tpu.data.synthetic import render_text_tiled

    cfg = get_config("v2", **TINY)
    n = 4
    a = SyntheticPatchDataset(cfg, n, seed=0, texts=["AAAA"] * n,
                              text_tile=True)
    b = SyntheticPatchDataset(cfg, n, seed=0, texts=["xoxo"] * n,
                              text_tile=True)
    np.testing.assert_array_equal(a.ru, b.ru)
    diff = np.abs(a.en - b.en)
    assert (diff * a.mask).max() > 0.5, "EN must depend on the text"
    assert (diff * (1 - a.mask)).max() == 0.0, "mask gates visibility"
    # Determinism + absolute positioning: the raster ignores the sample.
    r1 = render_text_tiled("Mark", cfg.patch_h, cfg.patch_w)
    r2 = render_text_tiled("Mark", cfg.patch_h, cfg.patch_w)
    np.testing.assert_array_equal(r1, r2)
    assert r1.shape == (cfg.patch_h, cfg.patch_w)
    # Tiling covers the canvas: glyphs present in every 16px row band and
    # in the right half (the single-line raster would leave both empty).
    assert all((r1[y:y + 16] > 0.1).any() for y in range(0, cfg.patch_h, 16))
    assert (r1[:, cfg.patch_w // 2:] > 0.1).any()
    # Coverage: a meaningful fraction of masked pixels are glyph pixels.
    g = render_text_tiled(a.texts[0], cfg.patch_h, cfg.patch_w)[..., None]
    cov = float(((g * a.mask[0]) > 0.1).sum() / a.mask[0].sum())
    assert cov > 0.10, cov


def test_tokens_causally_affect_generator_output():
    """At init, with identical image/mask/noise, different token ids must
    change the generated patch — the conditioning path is live."""
    cfg = get_config("v2", **TINY)
    ds = SyntheticPatchDataset(cfg, 8, seed=0)
    batch = device_batch(ds.batch(8, 0))
    model = VAEGANGenerator(cfg=cfg, train=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["ru"], batch["mask"], batch["text"])

    def run(tokens):
        out, _, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            batch["ru"], batch["mask"], tokens,
            rngs={"sample": jax.random.PRNGKey(7)})
        return np.asarray(out)

    tok_a = batch["text"]
    tok_b = jnp.roll(tok_a, shift=3, axis=1)  # same image/mask/noise
    assert not np.array_equal(np.asarray(tok_a), np.asarray(tok_b))
    out_a, out_b = run(tok_a), run(tok_b)
    assert np.abs(out_a - out_b).max() > 1e-5, \
        "changing tokens must change the output"


@pytest.mark.slow
def test_trained_model_output_tracks_text():
    """Two texts over the *same* ru/mask: after training, the output for
    text A must be closer to target A than to target B (and vice versa).
    With identical image inputs the latent z carries no text information,
    so low masked error is only reachable through the conditioning path —
    a shuffled-text ablation necessarily scores worse."""
    cfg = get_config("v2", **TINY, gan_weight=0.0, perc_weight=0.0,
                     lr_g=3e-3)
    h, w = cfg.patch_h, cfg.patch_w
    rng = np.random.default_rng(0)
    ru = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    # Full-patch mask: with a single shared ru, the latent z carries zero
    # text information, so *any* target separation must come through the
    # conditioning path. Maximally distinct strings keep the needed
    # training short enough for the CPU backend.
    mask = np.ones((1, h, w, 1), np.float32)
    text_a, text_b = "HHHHHHHHHH", "."

    def target(text):
        en = ru[..., [1, 2, 0]].copy()
        g = render_text_raster(text, h, w)[..., None]
        en[0] = en[0] * (1 - g) + g
        return en

    en_a, en_b = target(text_a), target(text_b)
    from vae_gan_mark_tpu.data.tokenizer import CharTokenizer
    tk = CharTokenizer(cfg.alphabet, cfg.max_text_len)
    tok = tk.encode([text_a] * 4 + [text_b] * 4)
    batch = {
        "ru": jnp.asarray(np.repeat(ru, 8, 0)),
        "en": jnp.asarray(np.concatenate([np.repeat(en_a, 4, 0),
                                          np.repeat(en_b, 4, 0)])),
        "mask": jnp.asarray(np.repeat(mask, 8, 0)),
        "text": jnp.asarray(tok),
    }
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    vgg = load_vgg_params()
    step = jit_train_step(cfg)
    rng_j = jax.random.PRNGKey(2)
    for _ in range(400):
        state, m = step(state, vgg, batch, rng_j, jnp.float32(1e-6))

    model = VAEGANGenerator(cfg=cfg, train=False)
    out, _, _ = model.apply(
        {"params": state.g_params, "batch_stats": state.g_batch_stats},
        batch["ru"], batch["mask"], batch["text"],
        rngs={"sample": jax.random.PRNGKey(3)})
    out = np.asarray(out)

    def masked_l1(x, t):
        return float(np.sum(np.abs(x - t) * mask[0]) / mask.sum())

    # Rows 0-3 carried text A, rows 4-7 text B.
    da_a = np.mean([masked_l1(out[i], en_a[0]) for i in range(4)])
    da_b = np.mean([masked_l1(out[i], en_b[0]) for i in range(4)])
    db_b = np.mean([masked_l1(out[i], en_b[0]) for i in range(4, 8)])
    db_a = np.mean([masked_l1(out[i], en_a[0]) for i in range(4, 8)])
    assert da_a < da_b, f"text-A output not tracking A: {da_a} vs {da_b}"
    assert db_b < db_a, f"text-B output not tracking B: {db_b} vs {db_a}"
